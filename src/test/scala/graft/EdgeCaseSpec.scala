package graft

import org.apache.spark.sql.functions._
import graft.functions.WordShingles.word_shingles
import graft.operators.FuzzyOccurrence

/** Edge cases the golden fixtures don't force: exact score ties
  * (first-wins), lyrics longer than every page, supplementary-plane
  * codepoints, and kernel ≡ HOF equivalence for shingling.
  */
class EdgeCaseSpec extends SparkFunSuite {
  import spark.implicits._

  test("score tie: first (page, window) strictly-best wins") {
    // identical window text planted at page 0 w0=1 and page 1 w0=0 —
    // scores are exactly equal, reference keeps the FIRST (fuzz.py:27)
    val segments = Seq(
      ("BV", 0, 0, 0.0, "开场白"),
      ("BV", 0, 1, 5.0, "重复的歌词"),
      ("BV", 1, 0, 2.0, "重复的歌词"),
      ("BV", 1, 1, 7.0, "结束")
    ).toDF("recording_id", "page", "seg_idx", "start", "text")
    val songs = Seq((1L, "重复的歌词")).toDF("song_id", "lyrics")
    val out = FuzzyOccurrence.scan(segments, songs, 40.0).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getInt(2) == 1 && r.getDouble(3) == 5.0, // page 1 (1-based), start 5
      s"tie must resolve to first window, got page=${r.getInt(2)} start=${r.getDouble(3)}")
  }

  test("lyrics longer than every page: whole-page fallback everywhere") {
    val segments = Seq(
      ("BV", 0, 0, 1.0, "夜空中最亮的星"),
      ("BV", 0, 1, 6.0, "能否听清"),
      ("BV", 1, 0, 2.0, "那仰望的人")
    ).toDF("recording_id", "page", "seg_idx", "start", "text")
    // 5-line fragment, pages have 2 and 1 segments
    val songs = Seq((1L, "夜空中最亮的星\n能否听清\n那仰望的人\n谢谢\n再见"))
      .toDF("song_id", "lyrics")
    val out = FuzzyOccurrence.scan(segments, songs, 10.0).collect()
    assert(out.length == 1)
    // page 0's whole-page window shares more content → must win
    assert(out(0).getInt(2) == 1 && out(0).getDouble(3) == 1.0)
  }

  test("supplementary-plane codepoints survive the pipeline") {
    val segments = Seq(
      ("BV", 0, 0, 0.0, "前奏🎵🎶"),
      ("BV", 0, 1, 5.0, "𝄞乐谱记号𝄢"),
      ("BV", 0, 2, 9.0, "尾奏")
    ).toDF("recording_id", "page", "seg_idx", "start", "text")
    val songs = Seq((1L, "𝄞乐谱记号𝄢")).toDF("song_id", "lyrics")
    val out = FuzzyOccurrence.scan(segments, songs, 40.0).collect()
    assert(out.length == 1 && out(0).getDouble(4) == 100.0 &&
      out(0).getDouble(3) == 5.0)
  }

  test("word_shingles kernel ≡ HOF formulation (incl. short texts)") {
    val hof = {
      val toks = split(col("t"), " ")
      filter(
        transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))),
          i => array_join(slice(toks, i + 1, lit(3)), " ")),
        s => length(s) > lit(0))
    }
    val texts = Seq("", "a", "a b", "a b c", "a b c d e",
      "x  y", " lead", "trail ", "夜 空 中 最 亮").toDF("t")
    val rows = texts
      .select(col("t"), word_shingles(col("t"), 3).as("k"), hof.as("h"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"mismatch for '${r.getString(0)}': ${r.getSeq[String](1)} vs ${r.getSeq[String](2)}")
    }
  }

  test("dot_d uses the shorter length on mismatched arrays") {
    import graft.functions.DotProduct.dot_d
    val r = Seq((Seq(1.0, 2.0, 3.0), Seq(10.0, 20.0)))
      .toDF("a", "b").select(dot_d(col("a"), col("b"))).collect()(0)
    assert(r.getDouble(0) == 50.0)
  }

  test("l2_q kernel equals the HOF fold on random long arrays, and via SQL") {
    import graft.functions.L2Quant.l2_q
    // the kernel's contract: value-identical to the interpreted
    // aggregate(zip_with(...)) spelling it replaced — integer
    // arithmetic, so strict equality on pseudo-random micro-unit
    // ranges (the quantized-ANN value domain, ±6e5, plus negatives)
    val rnd = new scala.util.Random(20260815L)
    val rows = Seq.fill(50)((
      Seq.fill(64)(rnd.nextLong(1200001L) - 600000L),
      Seq.fill(64)(rnd.nextLong(1200001L) - 600000L)))
    val df = rows.toDF("a", "b")
    val got = df.select(
      l2_q(col("a"), col("b")).as("k"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x).as("h")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    // mismatched lengths: shorter wins (the dot_d contract)
    val short = Seq((Seq(3L, 4L, 5L), Seq(1L, 1L)))
      .toDF("a", "b").select(l2_q(col("a"), col("b"))).collect()(0)
    assert(short.getLong(0) == 13L)
    // registered as a SQL function through GraftExtensions
    GraftExtensions.register(spark)
    val sql = spark.sql(
      "SELECT l2_q(array(1L, 2L), array(4L, 6L)) AS d").collect()(0)
    assert(sql.getLong(0) == 25L)
  }

  test("empty documents produce no windows, not a crash") {
    val segments = Seq.empty[(String, Int, Int, Double, String)]
      .toDF("recording_id", "page", "seg_idx", "start", "text")
    val songs = Seq((1L, "任意歌词")).toDF("song_id", "lyrics")
    assert(FuzzyOccurrence.scan(segments, songs, 40.0).count() == 0)
  }

  test("documentSegments chunking semantics are pinned: \\S+ runs, 6 words max, odd whitespace defined") {
    // The segmenter is one greedy regexp pass: a segment is up to 6
    // \S+ tokens joined by SINGLE spaces; any other whitespace
    // (consecutive spaces, tabs) ends the segment, empty tokens never
    // appear, and empty text yields zero segments (NOT one empty
    // segment). This is the DEFINED contract; the single-space
    // documents fixture makes it coincide with a split-on-space
    // chunking, but this pin is what future corpora with irregular
    // whitespace get.
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("seg_pin").toString
    Seq(
      (1L, "w1 w2 w3 w4 w5 w6 w7", "en", "s", 20L),   // 6-word chunk + tail
      (2L, "a  b", "en", "s", 4L),                     // double space splits segments
      (3L, " lead trail ", "en", "s", 12L),            // edge whitespace dropped
      (4L, "", "en", "s", 0L),                         // empty: no segments
      (5L, "x\ty", "en", "s", 3L)                      // tab splits too
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = FuzzyOccurrence.documentSegments(spark, dir)
      .select(col("recording_id"), col("seg_idx"), col("text"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).toSet
    assert(got == Set(
      (1L, 0, "w1 w2 w3 w4 w5 w6"), (1L, 1, "w7"),
      (2L, 0, "a"), (2L, 1, "b"),
      (3L, 0, "lead trail"),
      (5L, 0, "x"), (5L, 1, "y")))
  }

  test("span coverage: sub-5-token docs hit the empty-gram guard, 5 exactly one") {
    // the fixture's documents all have >= 10 tokens, so the
    // sequence(1, size-4) DESCENDING-ramp guard (size < 5 -> empty
    // array) never executes there — pin it on synthetic shorts.
    // Two identical 5-token docs make their single gram duplicated.
    val dir = java.nio.file.Files.createTempDirectory("span_edge_").toString
    Seq(
      (1L, "only four words here", "en", "src0", 20L),
      (2L, "", "en", "src0", 0L),
      (3L, "a b c d e", "en", "src0", 9L),
      (4L, "a b c d e", "en", "src0", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("dedup_span_coverage")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // split("") yields one empty token -> n_tokens 1, no grams
    assert(got == Map(
      1L -> ((4L, 0L, 0L)), 2L -> ((1L, 0L, 0L)),
      3L -> ((5L, 1L, 5L)), 4L -> ((5L, 1L, 5L))))
  }

  test("variant extraction preserves types, missing paths, and JSON null vs absent") {
    // The f11_variant oracle row hash-pins VALUES; this pins the TYPE
    // surface a user of the variant ingestion path relies on:
    // variant_get's target type becomes the column type, a missing
    // path is SQL NULL, and a JSON null is a present-but-null variant
    // (is_variant_null true) — distinct from an absent field.
    val df = Seq(
      """{"i": 42, "s": "hi", "arr": [10, 20, 30], "o": {"x": 7}, "z": null}""",
      """{"i": -1, "s": "", "arr": [], "o": {}}"""
    ).toDF("js").select(parse_json(col("js")).as("v"))
    val out = df.select(
      variant_get(col("v"), "$.i", "bigint").as("i"),
      variant_get(col("v"), "$.s", "string").as("s"),
      variant_get(col("v"), "$.arr[2]", "bigint").as("a2"),
      variant_get(col("v"), "$.o.x", "bigint").as("ox"),
      variant_get(col("v"), "$.missing", "bigint").as("gone"),
      is_variant_null(variant_get(col("v"), "$.z", "variant")).as("z_is_null"),
      variant_get(col("v"), "$.z", "variant").isNull.as("z_absent"))
    // target types drive the schema — bigint -> LongType, string -> StringType
    val sch = out.schema
    assert(sch("i").dataType == org.apache.spark.sql.types.LongType)
    assert(sch("s").dataType == org.apache.spark.sql.types.StringType)
    val rows = out.collect().sortBy(r => r.getLong(0))
    val (r1, r2) = (rows(1), rows(0)) // i=42 and i=-1
    assert(r1.getLong(0) == 42L && r1.getString(1) == "hi")
    assert(r1.getLong(2) == 30L && r1.getLong(3) == 7L)
    assert(r1.isNullAt(4), "missing path must extract as SQL NULL")
    // JSON null: present (not absent) but variant-null
    assert(r1.getBoolean(5) && !r1.getBoolean(6))
    // absent field z on row 2: extraction is SQL NULL, and
    // is_variant_null(NULL) is FALSE (it asks "does this variant
    // encode JSON null", and there is no variant) — so the pair
    // (z_absent=true, z_is_null=false) is how absent distinguishes
    // itself from JSON null's (false, true)
    assert(!r2.getBoolean(5) && r2.getBoolean(6))
    // out-of-bounds array index on the empty array is SQL NULL
    assert(r2.isNullAt(2))
  }

  test("mixed-type variant key: strict get throws on cast failure, try_ nulls, string reads all") {
    // the f11_variant_hetero oracle row hash-pins VALUES across the
    // three payload shapes; this pins the cast-failure SEMANTICS of a
    // key carrying a number on one row and a non-numeric string on
    // another — the schema-on-read hazard VARIANT exists to manage
    val df = Seq(
      """{"x": 7}""",
      """{"x": "s7"}""",
      """{"note": "n"}"""
    ).toDF("js").select(parse_json(col("js")).as("v"))
    // try_variant_get: number casts, bad-cast string nulls, absent nulls
    val tried = df.select(
      try_variant_get(col("v"), "$.x", "bigint").as("xl"),
      variant_get(col("v"), "$.x", "string").as("xs")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        Option(r.getString(1)))).toSet
    assert(tried == Set(
      (Some(7L), Some("7")),   // number row: casts, and reads as text
      (None, Some("s7")),      // string row: bigint cast fails -> null
      (None, None)))           // absent row: both null
    // strict variant_get must THROW on the uncastable row, not
    // silently null — the difference between the two spellings is
    // the contract users pick between
    val boom = intercept[Exception] {
      df.select(variant_get(col("v"), "$.x", "bigint")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(boom).exists(e =>
      String.valueOf(e.getMessage).toLowerCase.contains("cast")),
      s"expected an invalid-cast error, got: $boom")
  }

  test("malformed JSON: PERMISSIVE quarantines the raw payload, FAILFAST throws") {
    // the f11_json_malformed oracle row hash-pins the routed VALUES;
    // this pins the mode surface itself — the contract between "keep
    // the scan flowing, quarantine bad rows" and "abort the job"
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("_corrupt",
        org.apache.spark.sql.types.StringType)))
    val df = Seq("""{"k": 5}""", """{"k": 6""", "not json").toDF("js")
    val got = df.select(from_json(col("js"), schema, Map(
        "mode" -> "PERMISSIVE",
        "columnNameOfCorruptRecord" -> "_corrupt")).as("j"))
      .select(col("j.k"), col("j._corrupt")).collect()
      .map(r => (if (r.isNullAt(0)) None else Some(r.getLong(0)),
        Option(r.getString(1)))).toSet
    // well-formed parses with NO corrupt payload; both malformed
    // shapes yield null fields and carry the EXACT raw text
    assert(got == Set(
      (Some(5L), None),
      (None, Some("""{"k": 6""")),
      (None, Some("not json"))))
    val boom = intercept[Exception] {
      df.select(from_json(col("js"), schema, Map(
        "mode" -> "FAILFAST",
        "columnNameOfCorruptRecord" -> "_corrupt")).as("j")).collect()
    }
    def chain(t: Throwable): Seq[Throwable] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(8).toSeq
    assert(chain(boom).exists(e =>
      String.valueOf(e.getMessage).toLowerCase.contains("malformed")),
      s"expected a malformed-record error, got: $boom")
  }

  test("labelProp on an empty edge set returns empty, not a crash") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    val labels = graft.operators.Graph.labelProp(empty, rounds = 3)
    assert(labels.count() == 0)
    graft.operators.Dedup.releaseCheckpoints(labels)
  }

  test("labelProp on a single edge converges to the min endpoint") {
    val edges = Seq((7L, 3L), (3L, 7L)).toDF("src", "dst")
    val labels = graft.operators.Graph.labelProp(edges, rounds = 3)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.operators.Dedup.releaseCheckpoints(labels)
    // round 1: each adopts the other's label (7->3, 3->7); round 2
    // swaps back... the 2-cycle oscillates under synchronous updates,
    // so pin the DEFINED deterministic outcome at round 3 (odd rounds
    // = swapped once): node 7 holds 3, node 3 holds 7
    assert(got == Map(7L -> 3L, 3L -> 7L))
  }
}
