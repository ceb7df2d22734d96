package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Pins the non-oracle dedup ops: MinHash-LSH recall vs the exact
  * brute-force pair set, SimHash locality.
  */
class DedupSpec extends SparkFunSuite {

  test("minhash-lsh finds (almost) all true near-dup pairs") {
    val docs = Tables.load(spark, sfDir, "documents")
    // ground truth: all pairs with shingle-jaccard >= 0.8 (O(n²) is
    // fine at sf0.001's 500 docs)
    val d = docs.select(col("doc_id"), col("text"))
    val truth = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jacc", Dedup.shingleJaccard(col("a.text"), col("b.text")))
      .where(col("jacc") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val found = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    // every LSH hit is a true near-dup (exact verify pass guarantees it)
    assert(found.subsetOf(truth))
    // recall: 8 bands × 4 rows at s>=0.8 → hit prob ≥ 1-(1-0.8^4)^8 ≈ 0.98
    assert(found.size.toDouble / truth.size >= 0.8,
      s"LSH recall too low: ${found.size}/${truth.size}")
  }

  test("md5 minhash twin: exact precision, LSH-grade recall") {
    val docs = Tables.load(spark, sfDir, "documents")
    val d = docs.select(col("doc_id"), col("text"))
    val truth = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jacc", Dedup.shingleJaccard(col("a.text"), col("b.text")))
      .where(col("jacc") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val found = SparkEntry.queries("dedup_minhash_md5")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    // exact-Jaccard verify pass ⇒ zero false positives
    assert(found.subsetOf(truth))
    // recall: 4 bands × 4 rows at s ≥ 0.9 → ≥ 1-(1-0.9^4)^4 ≈ 0.986;
    // the planted pairs sit near 0.9+, so 0.7 is a safe floor
    assert(found.size.toDouble / truth.size >= 0.7,
      s"md5-LSH recall too low: ${found.size}/${truth.size}")
  }

  test("md5 simhash twin: bands reassemble the signature; locality holds") {
    val rows = SparkEntry.queries("dedup_simhash_md5")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val sig = rows.map { r =>
      val s = r.getLong(1)
      assert(s >= 0L && s < (1L << 32), s"sig32 out of range: $s")
      assert(((r.getLong(5) << 24) | (r.getLong(4) << 16) |
        (r.getLong(3) << 8) | r.getLong(2)) == s,
        "band keys must reassemble sig32")
      r.getLong(0) -> s
    }.toMap
    // locality: true near-dups are closer in Hamming space than the
    // population average
    val nearDup = SparkEntry.queries("dedup_minhash_md5")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDup.nonEmpty)
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val dupAvg = nearDup.map { case (a, b) => ham(sig(a), sig(b)) }.sum.toDouble / nearDup.length
    val ids = sig.keys.toArray.sorted
    val rndPairs = ids.indices.flatMap(i => if (i + 7 < ids.length) Some((ids(i), ids(i + 7))) else None)
    val rndAvg = rndPairs.map { case (a, b) => ham(sig(a), sig(b)) }.sum.toDouble / rndPairs.length
    assert(dupAvg < rndAvg,
      s"simhash should separate near-dups (dup $dupAvg vs random $rndAvg)")
  }

  test("prefix-filtered jaccard equals the block ground truth, no cartesian") {
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val block = SparkEntry.queries("dedup_jaccard_block")(spark, sfDir)
      .collect().map(key).toSet
    val prefixed = SparkEntry.queries("dedup_jaccard_prefix")(spark, sfDir)
    assert(prefixed.collect().map(key).toSet == block)
    assert(block.nonEmpty, "fixture should contain near-dup pairs")
    val plan = prefixed.queryExecution.executedPlan.toString()
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"prefix join must stay an equi-join:\n$plan")
  }

  test("simhash: near-dup pairs are close in hamming space") {
    val sigs = SparkEntry.queries("dedup_simhash")(spark, sfDir)
      .select(col("doc_id"), col("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nearDups = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(nearDups.nonEmpty)
    def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    val dupDists = nearDups.map { case (a, b) => hamming(sigs(a), sigs(b)) }
    // random pairs (fixed ids) for contrast
    val ids = sigs.keys.toArray.sorted
    val rndDists = ids.take(50).flatMap(a => ids.takeRight(50).map(b =>
      hamming(sigs(a), sigs(b))))
    assert(dupDists.sum.toDouble / dupDists.length <
      rndDists.sum.toDouble / rndDists.length / 2,
      "near-dups should be much closer in hamming space than random pairs")
  }

  test("simhash pair stage agrees exactly with a brute-force Hamming scan") {
    val sigs = SparkEntry.queries("dedup_simhash")(spark, sfDir)
      .select(col("doc_id"), col("sig"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // brute force: every pair within Hamming distance 3 (O(n²) fine at
    // sf0.001) — the banded index must find ALL of them (pigeonhole:
    // ≤3 differing bits can't touch all 4 bands) and nothing else
    // (exact popcount verify)
    val ids = sigs.keys.toArray.sorted
    val want = (for {
      i <- ids.indices.iterator; j <- (i + 1) until ids.length
      h = java.lang.Long.bitCount(sigs(ids(i)) ^ sigs(ids(j))) if h <= 3
    } yield (ids(i), ids(j), h)).toSet
    val got = SparkEntry.queries("dedup_simhash_pairs")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(want.nonEmpty, "fixture should contain Hamming-close pairs")
    assert(got == want)
  }

  test("prefix bound holds across odd and even distinct-shingle counts") {
    import spark.implicits._
    // ADVICE pin: plen = |sh| - floor(|sh|/2) + 1 must stay a safe
    // superset where floor vs ceil of t·|sh| differs. Build near-dup
    // pairs (b = a plus one trailing word => jacc = n/(n+1) >= 0.5)
    // whose distinct-3-shingle counts straddle odd/even: n words =>
    // n-2 shingles, so word counts 7..12 give 5,6,7,8,9,10 shingles.
    // Disjoint vocabularies per pair keep cross-pair jaccard at 0; a
    // same-block control pair sits just under the threshold.
    val docs = (7 to 12).zipWithIndex.flatMap { case (nWords, p) =>
      val words = (0 until nWords).map(w => s"p${p}w$w")
      Seq((2L * p, words.mkString(" ")),
          (2L * p + 1, (words :+ s"p${p}extra").mkString(" ")))
    } ++ Seq((100L, "c0 c1 c2 c3 c4 c5 c6 c7 c8"),
             (101L, "c0 c1 c2 c3 x4 x5 x6 x7 x8")) // jacc 4/10 < 0.5
    val df = docs.toDF("doc_id", "text")
      .select($"doc_id", lit("en").as("lang"), lit("syn").as("source"),
        lit(50L).as("n_chars"), $"text")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2))
    val block = graft.operators.Dedup.jaccardBlock(df).collect().map(key).toSet
    val prefix = graft.operators.Dedup.jaccardPrefix(df).collect().map(key).toSet
    assert(block.map(t => (t._1, t._2)) == (0 to 5).map(p => (2L * p, 2L * p + 1)).toSet,
      s"ground truth should be exactly the planted pairs: $block")
    assert(prefix == block)
  }

  test("connected components: chain, triangle, pair, star converge to minima") {
    import spark.implicits._
    // chain 1-2-3-4 needs label hops across 3 edges (multi-round);
    // triangle and a 2-cycle-free pair pin the easy shapes; 40-star
    // pins a high-degree hub
    val edges = Seq(
      (2L, 1L), (2L, 3L), (4L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (21L, 20L),
      (40L, 41L), (40L, 42L), (40L, 43L), (40L, 44L))
      .toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(2L -> 1L, 3L -> 1L, 4L -> 1L,
      11L -> 10L, 12L -> 10L, 21L -> 20L,
      41L -> 40L, 42L -> 40L, 43L -> 40L, 44L -> 40L)
    assert(got == want)
  }

  test("dedup_cluster matches brute-force union-find on the real corpus") {
    val docs = Tables.load(spark, sfDir, "documents")
    val d = docs.select(col("doc_id"), col("text"))
    val truth = d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .withColumn("jacc", Dedup.shingleJaccard(col("a.text"), col("b.text")))
      .where(col("jacc") >= 0.8)
      .select(col("a.doc_id"), col("b.doc_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(truth.nonEmpty, "fixture should contain planted near-dups")
    // driver-side union-find over the brute edge set
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    truth.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val got = SparkEntry.queries("dedup_cluster")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    docs.select(col("doc_id")).collect().map(_.getLong(0)).foreach { id =>
      assert(got(id) == find(id), s"doc $id: got ${got(id)}, want ${find(id)}")
    }
    // survivor flags: exactly one keep per cluster, and it's the min
    val keeps = SparkEntry.queries("dedup_cluster")(spark, sfDir)
      .where(col("keep") === 1).collect()
    assert(keeps.forall(r => r.getLong(0) == r.getLong(1)))
    assert(keeps.length == got.values.toSet.size)
  }

  test("exact dedup keeps deterministic survivor") {
    val df = SparkEntry.queries("dedup_exact")(spark, sfDir)
    assert(df.count() > 0)
    assert(df.where(col("keep_id").isNull).count() == 0)
  }

  test("postings containment is row-identical to the broadcast variant") {
    // The prefix-postings candidate set must be LOSSLESS (pigeonhole
    // bound) — any divergence from the broadcast cross-join spelling
    // means a candidate was dropped or a threshold drifted.
    val broad = SparkEntry.queries("dedup_containment_broadcast")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    val post = SparkEntry.queries("dedup_containment")(spark, sfDir)
      .collect().map(_.toSeq).toSet
    assert(post == broad)
    assert(broad.nonEmpty)
  }

  test("dedup_canonical keeps exactly the best member of every cluster") {
    val nChars = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val clusters = SparkEntry.queries("dedup_cluster")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val rows = SparkEntry.queries("dedup_canonical")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
    // same clustering as dedup_cluster
    rows.foreach { case (id, cl, _, _) => assert(cl == clusters(id)) }
    rows.groupBy(_._2).foreach { case (cl, rs) =>
      // one canonical id per cluster, flagged on exactly that member
      val canon = rs.map(_._3).distinct
      assert(canon.length == 1, s"cluster $cl: several canonicals $canon")
      assert(rs.count(_._4 == 1) == 1, s"cluster $cl: keep count != 1")
      assert(rs.find(_._4 == 1).get._1 == canon.head)
      // the pick is the longest member, smallest doc_id on ties
      val best = rs.map(_._1).minBy(id => (-nChars(id), id))
      assert(canon.head == best, s"cluster $cl: canonical ${canon.head} != $best")
    }
    // clusters with >1 member exist and pick a non-root sometimes or
    // the arg-max is vacuously the min-id root everywhere
    assert(rows.groupBy(_._2).exists(_._2.length > 1))
  }

  test("dedup_cluster leaves no persisted RDD blocks behind") {
    // VERDICT r10 #3: a long-lived shared session must be able to run
    // clustering in a loop without checkpoint blocks accruing in the
    // block manager. Delta-checked (not asserted globally empty) so an
    // unrelated suite's persisted state can't flake this.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val df = SparkEntry.queries("dedup_cluster")(spark, sfDir)
    df.write.format("noop").mode("overwrite").save()
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked RDD blocks: $leaked")
  }

  test("dedup_incremental equals the brute-force delta restriction") {
    import spark.implicits._
    // near-dups planted on BOTH sides of the 0.9·max(id)=90 boundary:
    // (1,3) is prior×prior and must NOT appear; (·,95/97/100) must.
    val a = "the quick brown fox jumps over the lazy dog and runs far away today"
    val b = "completely different words describing another unrelated subject entirely now"
    val docs = Seq(
      (1L, a), (2L, b), (3L, a + " extra"),
      (95L, a + " tail"), (97L, b + " ok"), (100L, a))
      .toDF("doc_id", "text")
    val d = docs.select(col("doc_id"),
      array_distinct(Dedup.shingles(col("text"))).as("sh"))
    val brute = d.as("x").join(d.as("y"), col("x.doc_id") < col("y.doc_id"))
      .withColumn("jacc", Dedup.shingleSetJaccard(col("x.sh"), col("y.sh")))
      .where(col("jacc") >= 0.5 && col("y.doc_id") > 90)
      .select(col("x.doc_id"), col("y.doc_id"), round(col("jacc"), 6))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val got = Dedup.jaccardIncremental(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(got == brute, s"got $got want $brute")
    assert(got.contains((1L, 100L, 1.0)), "exact copy of doc 1 must surface")
    assert(got.forall(_._2 > 90), "every pair must involve a new doc")
    assert(!got.exists(p => p._1 == 1L && p._2 == 3L),
      "prior×prior pairs must never re-emit")
  }

  test("connectedComponents on an empty edge set returns an empty mapping") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(empty)
    assert(got.columns.toSeq == Seq("doc_id", "cluster_id"))
    assert(got.count() == 0)
  }

  test("er_entity_resolution: entity sizes partition the record set") {
    import org.apache.spark.sql.functions._
    val nParts = Tables.load(spark, sfDir, "part").count()
    val got = SparkEntry.queries("er_entity_resolution")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty)
    // every record resolves to exactly one entity
    assert(got.map { case (sz, n) => sz * n }.sum == nParts,
      "entity sizes × counts must cover every record exactly once")
    // singletons exist (unblocked or unmatched records) and at least
    // one real merge happened at the 0.9 threshold on this fixture
    assert(got.contains(1L) && got.keys.exists(_ > 1L))
  }

  test("strm_neardup equals a driver-side three-wave verified fold incl. intra-wave keep-first") {
    import org.apache.spark.sql.functions._
    // The oracle re-derives banding + verify in SQL; this differential
    // re-derives the ACCUMULATION in plain Scala from the shared
    // md5Bands output and exact shingle Jaccard — if the streaming
    // store/candidate-join/verify/append machinery dropped a wave,
    // reprocessed a batch, mis-ordered the intra-wave keep-first rule,
    // or dropped an unverified LSH candidate, the fold would disagree.
    val got = SparkEntry.queries("strm_neardup")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val docs = Tables.load(spark, sfDir, "documents")
      .where(size(split(col("text"), " ")) >= 3)
    val sh = docs.select(col("doc_id"),
      array_distinct(Dedup.shingles(col("text"))).as("sh"))
    val shSets: Map[Long, Set[String]] = sh.collect()
      .map(r => r.getLong(0) -> r.getSeq[String](1).toSet).toMap
    val bands: Map[Long, Seq[(Int, String)]] = Dedup.md5Bands(sh).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSeq).toMap
    def jacc(a: Long, b: Long): Double = {
      val (x, y) = (shSets(a), shSets(b))
      x.intersect(y).size.toDouble / x.union(y).size.toDouble
    }
    val allIds = docs.select(col("doc_id")).collect().map(_.getLong(0))
    val seenKeys = scala.collection.mutable.Map.empty[(Int, String),
      scala.collection.mutable.Set[Long]]
    val expected = scala.collection.mutable.Set.empty[(Long, Long)]
    (0 to 2).foreach { w =>
      val wave = allIds.filter(_ % 3 == w)
      // stage 1: cross-batch drops against the accumulated kept store
      val cross = wave.filterNot { id =>
        val colliders = bands.getOrElse(id, Nil)
          .flatMap(k => seenKeys.getOrElse(k, Set.empty)).distinct
        colliders.exists(kid => jacc(id, kid) >= 0.8)
      }
      // stage 2 (r19): intra-wave pair-min-wins among cross-survivors
      val crossSet = cross.toSet
      val waveKeys = scala.collection.mutable.Map
        .empty[(Int, String), scala.collection.mutable.Set[Long]]
      cross.foreach(id => bands.getOrElse(id, Nil).foreach(k =>
        waveKeys.getOrElseUpdate(k,
          scala.collection.mutable.Set.empty) += id))
      val kept = cross.filterNot { id =>
        val peers = bands.getOrElse(id, Nil)
          .flatMap(k => waveKeys.getOrElse(k, Set.empty)).distinct
        peers.exists(p => p < id && crossSet(p) && jacc(id, p) >= 0.8)
      }
      kept.foreach(id => expected += ((id, w.toLong)))
      kept.foreach(id => bands.getOrElse(id, Nil).foreach(k =>
        seenKeys.getOrElseUpdate(k,
          scala.collection.mutable.Set.empty) += id))
    }
    assert(got == expected.toSet)
    // the fixture's planted near-dups make at least one drop happen
    // (the filter is not vacuously keeping everything)
    assert(got.size < allIds.length,
      s"no doc was ever dropped (${got.size} of ${allIds.length})")
  }

  test("strm_neardup: same-wave duplicates keep-first; a same-wave FP collision survives") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // ids 1, 4, 7 are all wave 1 (id % 3): 1 and 4 are verbatim
    // duplicates arriving in the SAME micro-batch — the r18 pipeline
    // kept both (the store holds prior batches only); keep-first must
    // now keep 1 and drop 4. id 7 shares a band key with nothing
    // similar (distinct text), and ids 0, 3 pad waves 0 with
    // unrelated docs so every batch is non-trivial.
    val dupText = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (0L, "completely unrelated filler alpha beta gamma"),
      (3L, "another unrelated wave zero document right here"),
      (1L, dupText), (4L, dupText),
      (7L, "seven has its very own unique words entirely"),
      (2L, "wave two document with its own content too"))
      .toDF("doc_id", "text")
    val kept = Dedup.streamNearDupKept(spark, docs)
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L), "the SMALLER same-wave duplicate must be kept")
    assert(!kept.contains(4L), "the larger same-wave duplicate must drop")
    assert(kept == Set(0L, 3L, 1L, 7L, 2L),
      s"got $kept — everything else survives")
  }

  test("strm_neardup: same-wave chain A~B~C drops both B and C (pair-min-wins, documented)") {
    import spark.implicits._
    // three near-identical docs in ONE wave (ids 1, 4, 7): 1~4 and
    // 4~7 verify; pair-min-wins drops 4 (loses to 1) AND 7 (loses to
    // cross-surviving 4), pinning the documented non-greedy semantics
    val t1 = "shared shingle body one two three four five six seven eight nine"
    val docs = Seq(
      (0L, "unrelated wave zero padding document here"),
      (1L, t1), (4L, t1), (7L, t1))
      .toDF("doc_id", "text")
    val kept = Dedup.streamNearDupKept(spark, docs)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(0L, 1L), s"got $kept")
  }

  test("strm_neardup: a planted LSH false positive SURVIVES the exact-verify stage") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Doc 0 (wave 0) has exactly ONE shingle s, so each of its four
    // band keys is built purely from s's md5 lanes. Doc 1 (wave 1)
    // starts with the same three tokens and appends a searched
    // 3-token tail such that for SOME band b, every derived extra
    // shingle's four b-lanes are >= s's — doc 1's band-b minima then
    // equal s's and its band-b KEY collides with doc 0's (an LSH
    // candidate), while true Jaccard is 1/4 < 0.8: the textbook LSH
    // false positive (~2^-12 per trial, found in a few thousand).
    // Doc 4 (wave 1) is doc 0 verbatim (Jaccard 1.0): a true
    // duplicate that must drop. Doc 3 (wave 0) is filler so wave 0
    // isn't a single doc.
    val base = "alpha beta gamma"
    val s0 = base // the single shingle of a 3-token doc
    def lanes(sh: String): Seq[String] = {
      val md = (0 to 3).map { s =>
        java.security.MessageDigest.getInstance("MD5")
          .digest(s"$s:$sh".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString
      }
      (0 to 15).map(k => md(k / 4).substring((k % 4) * 8, (k % 4) * 8 + 8))
    }
    val l0 = lanes(s0)
    // deterministic search: a token-triple tail with ONE band whose
    // four lanes are dominated (>=) by every extra shingle
    val tail = (1 to 200000).iterator.map(i => s"w${i}a w${i}b w${i}c")
      .find { t =>
        val toks = (base + " " + t).split(" ")
        val shs = toks.sliding(3).map(_.mkString(" ")).toSeq.distinct
          .filter(_ != s0)
        val ls = shs.map(lanes)
        (0 to 3).exists(b => (b * 4 until b * 4 + 4).forall(k =>
          ls.forall(l => l(k) >= l0(k))))
      }.getOrElse(fail("no band-dominating tail found in 200000 tries"))
    val fp = base + " " + tail // 4 shingles, shares only s0 with doc 0
    val docs = Seq(
      (0L, base), (3L, "totally different filler words here"),
      (1L, fp), (4L, base)).toDF("doc_id", "text")
    val kept = Dedup.streamNearDupKept(spark, docs)
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(1L),
      "the false-positive collision must SURVIVE exact verification")
    assert(!kept.contains(4L), "the true duplicate must drop")
    assert(kept.contains(0L) && kept.contains(3L))
    // sanity: the plant really is a band-key collision, i.e. the old
    // LSH-only filter WOULD have dropped it
    val bnd = Dedup.md5Bands(docs.where(col("doc_id").isin(0L, 1L))
        .select(col("doc_id"),
          array_distinct(Dedup.shingles(col("text"))).as("sh")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2)))
    val k0 = bnd.filter(_._1 == 0L).map(t => (t._2, t._3)).toSet
    val k1 = bnd.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet
    assert(k0.intersect(k1).nonEmpty, "plant must collide on some band key")
  }
}
