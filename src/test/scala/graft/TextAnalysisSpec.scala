package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

/** Pins for the text-analysis operators whose production shape is a
  * custom kernel: the kernel must stay bit-identical to the plain
  * relational formulation it replaced (which is also what the DuckDB
  * oracle computes).
  */
class TextAnalysisSpec extends SparkFunSuite {
  import spark.implicits._

  test("token_stats equals the explode + double-groupBy formulation on real docs") {
    val docs = Tables.load(spark, sfDir, "documents")
    val viaKernel = SparkEntry.queries("text_repetition")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5))).toMap
    val viaExplode = docs
      .select(col("doc_id"), size(split(col("text"), " ")).as("n_tokens"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"), col("n_tokens"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"), col("n_tokens"))
      .agg(count(lit(1)).as("distinct_tokens"), max(col("c")).as("top_c"))
      .select(col("doc_id"), col("n_tokens"), col("distinct_tokens"),
        ((col("n_tokens") - col("distinct_tokens")).cast("double")
          / col("n_tokens")).as("dup_frac"),
        (col("top_c").cast("double") / col("n_tokens")).as("top_tok_frac"),
        (col("top_c") * 5 <= col("n_tokens") &&
          (col("n_tokens") - col("distinct_tokens")) * 2 <= col("n_tokens"))
          .cast("int").as("keep"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getInt(5))).toMap
    assert(viaKernel.size == viaExplode.size && viaKernel.size > 0)
    assert(viaKernel == viaExplode,
      "kernel and relational formulation must agree doc-for-doc, bit-for-bit")
  }

  test("token_stats edge tokens: doubled spaces, empty text, single token") {
    import graft.functions.TokenStats.token_stats
    val df = Seq(
      (1L, "a b  b c"), // doubled space -> empty token counts as a token
      (2L, ""),         // split('') = [''] -> one token
      (3L, "x"),
      (4L, "y y y y")
    ).toDF("id", "t")
      .select(col("id"), token_stats(split(col("t"), " ")).as("s"))
      .select(col("id"), col("s.n_tokens"), col("s.distinct_tokens"), col("s.top_c"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2), r.getLong(3))).toMap
    assert(df(1L) == ((5, 4L, 2L)), s"got ${df(1L)}") // tokens: a,b,'',b,c
    assert(df(2L) == ((1, 1L, 1L)))
    assert(df(3L) == ((1, 1L, 1L)))
    assert(df(4L) == ((4, 1L, 4L)))
  }

  test("text_pack: bins respect the 512-token budget; shards pack independently") {
    val rows = SparkEntry.queries("text_pack")(spark, sfDir)
      .collect().map(r => (r.getLong(1), r.getLong(4), r.getInt(2))) // (shard, bin, n)
    val perBin = rows.groupBy(t => (t._1, t._2)).view.mapValues(_.map(_._3.toLong).sum)
    perBin.foreach { case ((shard, bin), toks) =>
      // a bin only exceeds the budget via the one straddling doc that
      // closed it — so the bin minus its largest member fits
      val members = rows.filter(t => t._1 == shard && t._2 == bin).map(_._3)
      assert(toks - members.max <= 512,
        s"bin ($shard,$bin) holds $toks tokens beyond one straddler")
    }
    val shards = rows.map(_._1).distinct
    assert(shards.length == 8, s"expected 8 shards, got ${shards.length}")
  }

  test("temperature sampling upsamples low-resource languages") {
    val rows = SparkEntry.queries("text_temperature_sample")(spark, sfDir)
      .select("lang", "rate").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    // sf0.001 corpus is en-heavy; sqrt-temperature must give the rarest
    // language a strictly higher keep rate than the dominant one
    val (minLang, maxLang) = {
      val counts = Tables.load(spark, sfDir, "documents")
        .groupBy(col("lang")).count().collect()
        .map(r => r.getString(0) -> r.getLong(1))
      (counts.minBy(_._2)._1, counts.maxBy(_._2)._1)
    }
    assert(rows(minLang) > rows(maxLang),
      s"rare $minLang rate ${rows(minLang)} must exceed dominant $maxLang rate ${rows(maxLang)}")
    rows.values.foreach(r => assert(r > 0.0 && r <= 1.0))
  }

  test("text_chunk: every token covered, stride overlap, short docs one chunk") {
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = SparkEntry.queries("text_chunk")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
      .groupBy(_._1)
    assert(chunks.keySet == docs.keySet)
    chunks.foreach { case (id, cs) =>
      val n = docs(id).toLong
      val sorted = cs.sortBy(_._2)
      // starts are exactly 0, 48, 96, ...
      sorted.zipWithIndex.foreach { case ((_, cid, start, _, _), i) =>
        assert(cid == i && start == 48L * i)
      }
      // last chunk reaches the end of the doc; no chunk starts past it
      val (_, _, lastStart, _, lastLen) = sorted.last
      assert(lastStart + lastLen == n, s"doc $id tail uncovered")
      assert(lastStart < n)
      if (n <= 64) assert(sorted.length == 1, s"short doc $id split needlessly")
      // chunk text is the real token slice (spot-check row arity)
      sorted.foreach { case (_, _, _, text, len) =>
        assert(text.split(" ").length.toLong == len)
      }
    }
  }

  test("text_normalize redacts URLs and emails and collapses whitespace") {
    import spark.implicits._
    val crafted = Seq(
      (1L, "Visit https://example.com/x?y=1 NOW", "en", "s", 30),
      (2L, "mail Bob.Smith%x@corp-mail.io  twice   ", "en", "s", 30),
      (3L, "plain already clean text", "en", "s", 24))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    // run the same projection the query uses, against the crafted rows
    val out = SparkEntry.queries("text_normalize")(spark, sfDir)
    val exprs = out.schema.fieldNames // pin output schema
    assert(exprs.sameElements(Seq("doc_id", "norm_text", "n_urls", "n_emails", "changed")))
    val normed = crafted.select(col("doc_id"),
      trim(regexp_replace(regexp_replace(regexp_replace(lower(col("text")),
        "https?://\\S+", "<URL>"), "[a-z0-9._%-]+@[a-z0-9.-]+", "<EMAIL>"),
        " +", " ")).as("norm_text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(normed(1L) == "visit <URL> now")
    assert(normed(2L) == "mail <EMAIL> twice")
    assert(normed(3L) == "plain already clean text")
  }

  test("bloom decontamination: no false negatives, equals the exact variant") {
    // probe-level pin: every value aggregated into the sketch tests
    // positive (bloom contract — false negatives impossible)
    import spark.implicits._
    val vals = (0 until 2000).map(i => s"gram-$i").toDF("g")
    val sketch = graft.functions.BloomFilterOps.buildBloom(vals, "g", 4096L, 524288L)
    val misses = vals.where(
      !graft.functions.BloomFilterOps.might_contain(sketch, col("g"))).count()
    assert(misses == 0, s"$misses false negatives — bloom contract broken")

    // operator-level pin: identical frame to the exact join variant
    val exact = SparkEntry.queries("text_decontaminate")(spark, sfDir)
    val bloom = SparkEntry.queries("text_decontaminate_bloom")(spark, sfDir)
    assert(bloom.exceptAll(exact).count() == 0 && exact.exceptAll(bloom).count() == 0)
    assert(exact.where(col("contaminated") === 1).count() > 0,
      "fixture should contain contaminated docs")
  }

  test("text_repetition plan is a zero-shuffle projection") {
    val plan = SparkEntry.queries("text_repetition")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"per-doc repetition stats must not shuffle:\n$plan")
  }

  test("per-row text ops stay zero-shuffle; joins stay broadcast") {
    // plan-shape pins for the round-10 ops: a regression that
    // introduces a shuffle into an embarrassingly-parallel projection,
    // or degrades a broadcast join to a shuffled one, must fail loudly
    for (q <- Seq("text_chunk", "text_normalize")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$q must not shuffle:\n$plan")
    }
    for (q <- Seq("text_decontaminate_bloom", "text_decontaminate")) {
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastHashJoin") &&
        !plan.contains("SortMergeJoin"),
        s"$q gram joins must broadcast:\n$plan")
    }
  }

  test("text_bm25_topk: sane ranking, and the top-k never globally sorts") {
    val out = SparkEntry.queries("text_bm25_topk")(spark, sfDir)
    val rows = out.collect()
    assert(rows.length == 20)
    // ranks are 1..20 and scores are positive and non-increasing
    assert(rows.map(_.getInt(1)).sorted.toSeq == (1 to 20))
    val byRank = rows.sortBy(_.getInt(1)).map(_.getDouble(2))
    assert(byRank.forall(_ > 0))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    // the global top-20 must run as TakeOrdered (bounded per-partition
    // heaps), never a full Sort of the scored-doc table
    val plan = out.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("TakeOrderedAndProject"),
      s"top-k must be TakeOrdered:\n$plan")
  }

  test("expectations: split partitions exactly, null rule results violate") {
    import graft.operators.{Expectations, TextAnalysis}
    val docs = Tables.load(spark, sfDir, "documents")
    val (pass, bad) = Expectations.split(docs, TextAnalysis.docRules)
    assert(pass.count() + bad.count() == docs.count())
    // quarantined rows carry the exact failing rules; hand-check one
    val q = bad.select(col("doc_id"), col("_violations"), col("text")).collect()
    assert(q.nonEmpty, "fixture should quarantine some rows")
    q.foreach { r =>
      val toks = r.getString(2).split(" ", -1).length
      val vs = r.getSeq[String](1).toSet
      assert(vs.nonEmpty)
      assert(vs.contains("min_tokens") == (toks < 20), s"doc ${r.getLong(0)}")
      assert(vs.contains("max_tokens") == (toks > 90), s"doc ${r.getLong(0)}")
    }
    // NULL rule result = violation (the three-valued-logic trap):
    // a null lang row must fail lang_known, not silently pass
    import spark.implicits._
    val withNull = Seq((1L, "some text here", null.asInstanceOf[String], "src0", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val s = Expectations.summary(withNull, TextAnalysis.docRules).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(s("lang_known") == 1L, "null lang must count as a violation")
    // summary is ONE aggregation over one scan — no per-rule passes
    val plan = SparkEntry.queries("text_expectations")(spark, sfDir)
      .queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(plan.linesIterator.count(_.contains("FileScan parquet")) == 1,
      s"summary must scan once:\n$plan")
  }

  test("text_domain_mix hits target weights within coin tolerance, caps at 2 epochs") {
    val rows = SparkEntry.queries("text_domain_mix")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val targets = Map("en" -> 0.4, "zh" -> 0.2, "de" -> 0.15,
      "fr" -> 0.15, "es" -> 0.1)
    val byLang = rows.groupBy(_._2).view.mapValues(_.length.toDouble).toMap
    val total = rows.length.toDouble
    assert(total > 0)
    targets.foreach { case (lang, w) =>
      val got = byLang.getOrElse(lang, 0.0) / total
      // the fractional coin adds at most ±(#docs-in-lang) absolute
      // noise; on this fixture realized shares land well within 5pp
      assert(math.abs(got - w) < 0.05, s"$lang: got $got want ~$w")
    }
    // repeat cap: no doc emits more than ceil(cap)=2 copies, and
    // copy_ids are dense 0..k-1 per doc
    rows.groupBy(_._1).foreach { case (id, copies) =>
      val ids = copies.map(_._3).sorted.toSeq
      assert(ids == (0L until ids.length).toSeq, s"doc $id copy ids: $ids")
      assert(ids.length <= 2, s"doc $id exceeded the 2-epoch cap")
    }
    // at least one language must actually upsample (rate > 1 → some
    // doc with 2 copies), else the mix degenerates to pure filtering
    assert(rows.groupBy(_._1).exists(_._2.length == 2),
      "expected upsampled docs under the binding-domain construction")
  }

  test("heavy-hitter sketch returns a superset of true heavy hitters") {
    // freqItems' lossy-counting contract: no false negatives above the
    // support threshold. Pin it against exact counts on the same
    // tokenization.
    val toks = Tables.load(spark, sfDir, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
    val total = toks.count()
    val exact = toks.groupBy(col("tok")).count()
      .where(col("count") > lit(total * 0.01))
      .collect().map(_.getString(0)).toSet
    assert(exact.nonEmpty, "fixture should have tokens above 1% support")
    val approx = SparkEntry.queries("text_heavy_hitters_approx")(spark, sfDir)
      .collect().map(_.getString(0)).toSet
    val missed = exact.diff(approx)
    assert(missed.isEmpty, s"sketch missed true heavy hitters: $missed")
    // and the exact top-k agrees with a driver-side recount
    val top = SparkEntry.queries("text_heavy_hitters")(spark, sfDir).collect()
    assert(top.length == 20)
    assert(top.map(_.getLong(1)).toSeq == top.map(_.getLong(1)).sorted.reverse.toSeq)
  }

  test("bpeTrain matches an in-memory reference trainer, merge by merge") {
    import spark.implicits._
    // reference BPE: pair counts over (distinct word, count), best by
    // (count desc, pair asc), greedy left-to-right non-overlap rewrite
    def ref(words: Map[String, Long], merges: Int): Seq[(Int, String, String, String, Long)] = {
      var ws = words.toSeq.map { case (w, c) => (w.map(_.toString).toList, c) }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, String, Long)]
      for (it <- 1 to merges) {
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        ws.foreach { case (sym, c) =>
          sym.zip(sym.drop(1)).foreach(p => pc(p) = pc.getOrElse(p, 0L) + c)
        }
        if (pc.nonEmpty) {
          val ((a, b), n) = pc.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
          out += ((it, a, b, a + b, n))
          ws = ws.map { case (sym, c) =>
            val acc = scala.collection.mutable.ListBuffer.empty[String]
            sym.foreach { x =>
              if (acc.nonEmpty && acc.last == a && x == b)
                acc(acc.length - 1) = a + b
              else acc += x
            }
            (acc.toList, c)
          }
        }
      }
      out.toSeq
    }
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "low new lower newer",
      "aaa aa aaa aaa").toDF("text")
    val wordCounts = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ref(wordCounts, 6)
    val got = TextAnalysis.bpeTrain(docs, 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    assert(got == want, s"\ngot  $got\nwant $want")
    // the "aaa …" doc forces the overlapping-pair case through both
    // trainers, so got == want pins greedy non-overlap rewriting too
    // and the corpus-scale query runs, releases its checkpoints
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val real = SparkEntry.queries("text_bpe_train")(spark, sfDir).collect()
    assert(real.length == 8)
    assert(real.map(_.getInt(0)).toSeq == (1 to 8))
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("bpe delta tie-break matches the distributed UTF-8 order above the BMP") {
    import spark.implicits._
    // two pairs tie on count where one symbol is an astral char
    // (U+1F600, UTF-16 lead 0xD83D, UTF-8 F0 9F 98 80) and the other
    // a high-BMP char (U+F901, UTF-8 EF A4 81): JVM String order
    // picks the emoji first (code-unit compare), Spark's UTF8String
    // binary sort and DuckDB pick U+F901 — the delta trainer's
    // driver-side argmax must agree with the distributed one
    val docs = Seq("😀x 更x").toDF("text")
    def seqOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    val full = seqOf(TextAnalysis.bpeTrain(docs, 2))
    val delta = seqOf(TextAnalysis.bpeTrainDelta(docs, 2))
    assert(delta == full, s"\ndelta $delta\nfull  $full")
    assert(full.head._2 == "更",
      s"first merge must take the UTF-8-smaller symbol, got ${full.head}")
  }

  test("bpeTrainDelta == bpeTrain merge-by-merge (pair-delta maintenance is exact)") {
    import spark.implicits._
    // the delta trainer replaces the per-round full recount with an
    // incrementally-maintained driver-side pair table; integers are
    // exact, so the merge sequences (pairs AND freqs, tie-breaks
    // included) must be identical across 16 rounds of delta folding,
    // and the "aaa" doc drives the overlapping-run rewrite through
    // the delta path (where a wrong delta would corrupt round k+1's
    // argmax, not round k's — exactly what merge-by-merge equality
    // catches).
    val docs = Seq(
      "low lower lowest low low",
      "new newer newest new",
      "low new lower newer lowest newest",
      "aaa aa aaa aaa aaaa").toDF("text")
    def seqOf(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .toSeq
    val full = seqOf(TextAnalysis.bpeTrain(docs, 16))
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val delta = seqOf(TextAnalysis.bpeTrainDelta(docs, 16))
    assert(delta == full, s"\ndelta $delta\nfull  $full")
    // hygiene: the delta trainer's pair-table + COW checkpoints all
    // released (the bpeTrain convention)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
    // and on the real corpus (what the catalog row now runs)
    val realFull = seqOf(TextAnalysis.bpeTrain(Tables.load(spark, sfDir, "documents"), 8))
    val realDelta = seqOf(TextAnalysis.bpeTrainDelta(Tables.load(spark, sfDir, "documents"), 8))
    assert(realDelta == realFull)
  }

  test("text_source_divergence equals brute-force TV and Hellinger distances") {
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      .where(length(col("tok")) > 0)
      .collect().map(r => (r.getString(0), r.getString(1)))
    val nAll = toks.length.toDouble
    val q = toks.groupBy(_._2).view.mapValues(_.length / nAll).toMap
    val want = toks.groupBy(_._1).map { case (src, rs) =>
      val ns = rs.length.toDouble
      val p = rs.groupBy(_._2).view.mapValues(_.length / ns).toMap
      val tv = q.keysIterator.map { t =>
        math.abs(p.getOrElse(t, 0.0) - q(t))
      }.sum / 2
      val h2 = q.keysIterator.map { t =>
        val d = math.sqrt(p.getOrElse(t, 0.0)) - math.sqrt(q(t))
        d * d
      }.sum / 2
      (src, (rs.length.toLong, tv, h2))
    }
    val got = SparkEntry.queries("text_source_divergence")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    want.foreach { case (srcName, (n, tv, h2)) =>
      val (gn, gtv, gh2) = got(srcName)
      assert(gn == n)
      assert(math.abs(gtv - tv) < 1e-6, s"$srcName: tv $gtv vs $tv")
      assert(math.abs(gh2 - h2) < 1e-6, s"$srcName: h2 $gh2 vs $h2")
      // both divergences live in [0, 1]; a same-as-corpus slice is ~0
      assert(gtv >= 0 && gtv <= 1 && gh2 >= 0 && gh2 <= 1)
    }
  }

  test("bpe_encode kernel matches a brute-force reimplementation and round-trips") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges = TextAnalysis.bpeTrain(docs, 8).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    assert(merges.length == 8)
    val words = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .where(length(col("w")) > 0).distinct()
    val got = words
      .select(col("w"),
        graft.functions.BpeEncode.bpe_encode(col("w"), merges).as("e"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    assert(got.nonEmpty)
    // independent spelling: the trainer's fold-based rewrite, in Scala
    def brute(w: String): Seq[String] =
      merges.foldLeft(w.map(_.toString): Seq[String]) { case (syms, (a, b)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b)
            acc.init :+ (a + b)
          else acc :+ x
        }
      }
    got.foreach { case (w, e) =>
      assert(e == brute(w), s"word '$w': $e != ${brute(w)}")
      assert(e.mkString == w, s"word '$w' does not round-trip: $e")
    }
    // at least one real word actually merged, or the pin is vacuous
    assert(got.exists(_._2.exists(_.length > 1)))
    // the overlap trap: greedy left-to-right, non-overlapping
    val trap = graft.functions.BpeEncode.bpe_encode(lit("aaa"), Seq("a" -> "a"))
    val trapped = spark.range(1).select(trap.as("e"))
      .collect().head.getSeq[String](0)
    assert(trapped == Seq("aa", "a"))

    // the corpus-scale query composes the kernel zero-shuffle
    val applied = SparkEntry.queries("text_bpe_apply")(spark, sfDir).collect()
    assert(applied.length == docs.count())
    applied.foreach { r =>
      assert(r.getInt(2) <= 0 + r.getInt(1) * 100 && r.getInt(2) >= r.getInt(1),
        s"doc ${r.getLong(0)}: n_sym ${r.getInt(2)} vs n_words ${r.getInt(1)}")
    }
  }

  test("text_dedup_rewrite equals the brute-force keep-first-occurrence rewrite") {
    // in-memory reference: chunk every doc into 8-token spans, keep a
    // span only at its globally first (doc_id, idx), rebuild in order
    val docs = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val chunksOf = docs.map { case (id, text) =>
      id -> text.split(" ", -1).grouped(8).map(_.mkString(" ")).toSeq
    }.toMap
    val firstSeen = scala.collection.mutable.Map.empty[String, (Long, Int)]
    for ((id, _) <- docs; (ch, i) <- chunksOf(id).zipWithIndex)
      if (!firstSeen.contains(ch)) firstSeen(ch) = (id, i)
    val want = docs.map { case (id, _) =>
      val ch = chunksOf(id)
      val kept = ch.zipWithIndex.filter { case (c, i) => firstSeen(c) == (id, i) }
      id -> (kept.map(_._1).mkString(" "), kept.size.toLong,
        (ch.size - kept.size).toLong)
    }.toMap

    val got = SparkEntry.queries("text_dedup_rewrite")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == want.keySet, "every doc must survive the rewrite")
    got.foreach { case (id, g) =>
      assert(g == want(id), s"doc $id: got $g want ${want(id)}")
    }
    // global invariant: each distinct chunk survives exactly once
    val keptTotal = got.values.map(_._2).sum
    assert(keptTotal == firstSeen.size.toLong)
  }

  test("text_curriculum_shards equals the brute-force global sort cut") {
    val scores = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ordered = scores.sortBy { case (id, s) => (s, id) }
    val n = ordered.length
    val want = ordered.zipWithIndex
      .groupBy { case (_, pos) => pos.toLong * 8 / n }
      .map { case (shard, rows) =>
        val ss = rows.map(_._1._2)
        shard -> (rows.length.toLong, ss.min, ss.max, ss.sum)
      }
    val got = SparkEntry.queries("text_curriculum_shards")(spark, sfDir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == want)
    // shards are contiguous score ranges (boundaries may split a tie)
    val byShard = got.toSeq.sortBy(_._1)
    byShard.sliding(2).foreach {
      case Seq((_, a), (_, b)) => assert(a._3 <= b._2)
      case _ =>
    }
  }

  test("text_pmi_collocations: staged integer PMI matches brute force") {
    import org.apache.spark.sql.functions._
    // brute-force bigram statistics over sf0.001 with the exact staged
    // integer-division formula the query and the oracle restate
    val texts = Tables.load(spark, sfDir, "documents")
      .select(col("text")).collect().map(_.getString(0))
    val bigrams = texts.iterator.flatMap { t =>
      val a = t.split(" ", -1)
      if (a.length < 2) Iterator.empty
      else a.iterator.zip(a.iterator.drop(1))
    }.toSeq
    val cXY = bigrams.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cX = bigrams.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cY = bigrams.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val nBig = bigrams.size.toLong
    val want = cXY.toSeq
      .filter(_._2 >= 10L)
      .map { case ((x, y), c) =>
        val pmi = (((c * 1000000L) / cX(x)) * nBig) / cY(y)
        (x, y, c, pmi)
      }
      .sortBy { case (x, y, c, p) => (-p, -c, x, y) }.take(40)

    val got = SparkEntry.queries("text_pmi_collocations")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length == want.length,
      s"row count: got ${got.length} want ${want.length}")
    (got zip want).foreach { case (g, w) =>
      assert(g == w, s"mismatch: got $g want $w")
    }
    // independence baseline: a bigram drawn by chance has pmi_q ≈ 1e6;
    // the reported top collocations must clear it
    assert(got.forall(_._4 >= 1000000L),
      "top collocations should beat the independence baseline")
  }

  test("text_group_split: every source lands in exactly one split") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("text_group_split")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(got.nonEmpty)
    // leakage invariant: the split is a function of the group key
    val bySource = got.groupBy(_._1)
    bySource.foreach { case (src, rows) =>
      assert(rows.map(_._2).distinct.length == 1,
        s"source '$src' split across ${rows.map(_._2).toSeq}")
    }
    assert(got.map(_._2).toSet.subsetOf(Set("train", "val", "test")))
    // doc counts reconcile with the corpus
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(got.map(_._3).sum == total)
  }

  test("text_cms_counts: sketch matches in-memory CMS; never undercounts") {
    import org.apache.spark.sql.functions._
    val toks = Tables.load(spark, sfDir, "documents")
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
    def tokHash(t: String): Long =
      t.codePoints().toArray.foldLeft(0L)((a, c) => (a * 131 + c) % 2147483647L)
    val primes = Array(31L, 131L, 1009L)
    val counters = Array.fill(3, 16)(0L)
    toks.foreach { t =>
      val h = tokHash(t)
      for (i <- 0 until 3)
        counters(i)(((h * primes(i) + i) % 16).toInt) += 1
    }
    val exact = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    def cmsEst(t: String): Long = {
      val h = tokHash(t)
      (0 until 3).map(i => counters(i)(((h * primes(i) + i) % 16).toInt)).min
    }

    val got = SparkEntry.queries("text_cms_counts")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == exact.size)
    got.foreach { case (tok, est, cExact) =>
      assert(cExact == exact(tok), s"exact count drifted for '$tok'")
      assert(est == cmsEst(tok), s"sketch estimate drifted for '$tok'")
      assert(est >= cExact, s"CMS undercounted '$tok': $est < $cExact")
    }
    // each row of counters conserves the total token mass
    assert(counters.forall(_.sum == toks.length.toLong))
  }

  test("rag_retrieve_rerank: dense rerank stays inside the sparse candidates") {
    val bmTop = SparkEntry.queries("text_bm25_topk")(spark, sfDir).collect()
      .map(_.getLong(0)).toSet
    val rows = SparkEntry.queries("rag_retrieve_rerank")(spark, sfDir).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getInt(1)).toSeq.sorted == (1 to 10))
    // cosine must be the rerank key: non-increasing down the list
    val cos = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
    assert(cos.zip(cos.tail).forall { case (a, b) => a >= b })
    // every reranked doc carries a real BM25 score (came from stage 1)
    rows.foreach(r => assert(r.getDouble(2) > 0.0))
    // stage-1 candidates are the BM25 top-50, so the BM25 top-20 and
    // the reranked 10 overlap unless rerank inverted everything
    assert(rows.map(_.getLong(0)).exists(bmTop.contains))
  }

  test("rag_hybrid_rrf: fusion score is monotone and bounded") {
    val rows = SparkEntry.queries("rag_hybrid_rrf")(spark, sfDir).collect()
      .sortBy(_.getInt(1))
    assert(rows.length == 20)
    val rrf = rows.map(_.getDouble(2))
    assert(rrf.zip(rrf.tail).forall { case (a, b) => a >= b })
    // max possible fused score is rank-1 in both lists: 2/61
    assert(rrf.head <= 2.0 / 61 + 1e-9)
    assert(rrf.forall(_ > 0.0))
  }

  test("text_curation_e2e: planted duplicates fall to their stages; packing is greedy") {
    val out = SparkEntry.queries("text_curation_e2e")(spark, sfDir)
      .select("doc_id", "shard", "n_tokens", "bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3)))
    assert(out.nonEmpty)
    // at this sf, 6 planted exact copies (id ≥ 1e6) and 6 planted
    // near-dup copies (id ≥ 2e6) PASS the quality/lang gates — their
    // absence from the output proves the exact-dedup and LSH stages
    // fired, not that the plants were filtered upstream (which would
    // make the funnel's dedup stages vacuously green)
    assert(!out.exists(_._1 >= 1000000L), "a planted duplicate survived curation")
    // the survivors are a strict subset of the original corpus that
    // passed the gates — the near-dup stage must have dropped the
    // larger side of every verified pair, never an original canonical
    assert(out.forall(_._1 >= 0L))
    // packing: within each shard, bin = (running-sum − n) / 2048 over
    // doc_id order — recompute and compare exactly
    out.groupBy(_._2).foreach { case (_, rows) =>
      var cum = 0L
      rows.sortBy(_._1).foreach { case (_, _, n, bin) =>
        assert(bin == cum / 2048, s"greedy bin drifted: $bin vs ${cum / 2048}")
        cum += n
      }
    }
  }

  test("text_dp_release: binomial noise is bounded, live, and PRF-exact") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("text_dp_release")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val truth = Tables.load(spark, sfDir, "documents")
      .groupBy(col("lang"), col("source")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got.keySet == truth.keySet)
    // recompute the PRF noise independently: popcount of the first 64
    // md5 bits of "<lang>|<source>|dp1", minus 32
    def noise(k: (String, String)): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val d = md.digest(s"${k._1}|${k._2}|dp1".getBytes("UTF-8"))
      (0 until 8).map(i => java.lang.Integer.bitCount(d(i) & 0xFF)).sum - 32L
    }
    val diffs = got.map { case (k, v) => k -> (v - truth(k)) }
    diffs.foreach { case (k, dlt) =>
      assert(dlt == noise(k), s"noise for $k: got $dlt, PRF says ${noise(k)}")
      assert(math.abs(dlt) <= 32L)
    }
    assert(diffs.values.exists(_ != 0L), "noise must be live somewhere")
  }
}
