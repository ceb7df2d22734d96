package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{QueryModule, Tables}
import graft.functions.IndelRatio.indel_ratio

/** The flagship operator: sliding-window fuzzy lyric search
  * (reference `src/firefly_vcut/fuzz.py:3-43`, driven by
  * `src/firefly_vcut/modal/occurrence.py:78-130` and
  * `src/firefly_vcut/cmdline.py:182-367`).
  *
  * Reference semantics, restated: for a song whose lyrics fragment has
  * N lines and a transcript of pages of timed segments, score every
  * window of N consecutive segments (joined with '\n') against the
  * fragment with indel-ratio; pages shorter than N collapse to one
  * whole-page window; keep the single best window per (song,
  * recording) with FIRST-strictly-best tie-breaking (page asc, then
  * window start asc — `fuzz.py:27,37` uses `score > max_score`);
  * report `(start of first segment in window, 1-based page)`; drop
  * results under the threshold (default 40).
  *
  * Spark-first design (not a loop port):
  *  1. one shuffle groups segments into per-(recording, page) sorted
  *     arrays — O(segments), map-side combinable;
  *  2. the distinct window sizes N (tiny: one per distinct lyric line
  *     count) are broadcast; `sequence` + `slice` + `array_join`
  *     generate each page's windows inside whole-stage codegen —
  *     O(distinct_N × segments) window rows, NOT O(songs × segments)
  *     like the reference (`fuzz.py:23-41` recomputes windows per
  *     song);
  *  3. songs broadcast-join on N, scoring runs in the codegen'd
  *     [[graft.functions.IndelRatio]] expression;
  *  4. arg-max is a hash aggregate over `max(struct(score, -page,
  *     -w0, payload…))` — lexicographic struct max reproduces the
  *     reference tie-break with partial (map-side) aggregation and no
  *     sort, which is the 100 TB-safe shape (no per-key row explosion
  *     survives the map side).
  *
  * At cluster scale the only wide exchanges are the page grouping (1)
  * and the final arg-max (4); both key on high-cardinality ids, and
  * the song side stays broadcast.
  */
object FuzzyOccurrence extends QueryModule {

  /** Core pipeline.
    *
    * @param segments flat transcript relation
    *                 `(recording_id, page, seg_idx, start, text)`
    *                 (0-based page / seg_idx, see
    *                 [[graft.sources.TranscriptJson.readSegments]])
    * @param songs    `(song_id, lyrics)` — small side, broadcast
    * @param threshold minimum score kept (reference default 40)
    * @return one row per (song_id, recording_id) that clears the
    *         threshold: `(song_id, recording_id, page (1-based),
    *         start, score, matched_text)`
    */
  def scan(segments: DataFrame, songs: DataFrame, threshold: Double): DataFrame = {
    // (3) score against all songs with this window size.
    val scored = windowed(segments, songs)
      .withColumn("score", indel_ratio(col("lyrics"), col("win_text")))

    // (4) first-strictly-best arg-max per (song, recording):
    // lexicographic struct max on (score, -page, -w0) == reference
    // iteration order with `>` updates; (page, w0) is unique per key
    // so payload fields never participate in the comparison.
    scored
      .groupBy(col("song_id"), col("recording_id"))
      .agg(max(struct(col("score"), (-col("page")).as("neg_page"),
        (-col("w0")).as("neg_w0"), col("start"), col("win_text"))).as("best"))
      .where(col("best.score") >= threshold)
      .select(
        col("song_id"), col("recording_id"),
        (-col("best.neg_page") + 1).cast("int").as("page"),
        col("best.start").as("start"),
        col("best.score").as("score"),
        col("best.win_text").as("matched_text"))
  }

  /** Stages (1)+(2)+(song join) of [[scan]], shared with the
    * `fuzzy_occurrence_q` oracle twin so the window algebra the twin
    * hash-checks is THE flagship's, not a restatement: per-page sorted
    * segment arrays, `sequence`+`slice`+`array_join` window
    * generation (whole-page fallback for short pages), broadcast song
    * join on the window size. Output: one row per (window × song of
    * that size) — `(recording_id, page, n, w0, win_text, start,
    * song_id, lyrics)`.
    */
  private[graft] def windowed(segments: DataFrame, songs: DataFrame): DataFrame = {
    // spread (opt guide §2.5): the window explode × song join × scoring
    // kernel is the pipeline's dominant compute, and it runs in the
    // stage fed by the tiny per-page exchange — which AQE coalesces to
    // ONE partition at fixture scale (measured: 3.2 s of
    // fuzzy_occurrence_q's 4.1 s in that single-task stage). Hashing
    // the segments onto defaultParallelism partitions BY the page key
    // is reused by the pages groupBy (same clustering, no second
    // exchange) and, being user-specified, is exempt from AQE
    // coalescing — so the window stage keeps its parallelism. At scale
    // the segments scan is already parallel and this is the identity.
    val segs = Tables.spread(segments, col("recording_id"), col("page"))
    val songsN = songs
      .where(col("lyrics").isNotNull && col("lyrics") =!= "")
      .withColumn("n", greatest(lit(1), size(split(col("lyrics"), "\n"))))

    // Distinct window sizes; bounded by distinct lyric line counts.
    val ns = songsN.select(col("n")).distinct()

    // (1) one page = one row: sorted texts + starts arrays.
    val pages = segs
      .groupBy(col("recording_id"), col("page"))
      .agg(sort_array(collect_list(struct(col("seg_idx"), col("start"), col("text"))))
        .as("segs"))
      .select(
        col("recording_id"), col("page"),
        expr("transform(segs, s -> s.text)").as("texts"),
        expr("transform(segs, s -> s.start)").as("starts"),
        size(col("segs")).as("page_len"))

    // (2) windows per (page × distinct N). A page shorter than N
    // yields exactly one whole-page window (slice caps at the end).
    val windows = pages
      .join(broadcast(ns))
      .withColumn("w0",
        explode(when(col("page_len") >= col("n"),
          sequence(lit(0), col("page_len") - col("n")))
          .otherwise(array(lit(0)))))
      .select(
        col("recording_id"), col("page"), col("n"), col("w0"),
        array_join(slice(col("texts"), col("w0") + 1, col("n")), "\n").as("win_text"),
        element_at(col("starts"), col("w0") + 1).as("start"))

    windows.join(broadcast(songsN), "n")
  }

  /** Deterministic "transcript-ification" of the `documents` table so
    * the fuzzy pipeline has a testdata-native flagship query: each doc
    * becomes a 1-page transcript whose segments are runs of 6 words,
    * each segment 5 "seconds" after the previous.
    *
    * The 6-word runs come from one greedy `regexp_extract_all` pass —
    * a codegen'd expression, measured ~4× faster than the equivalent
    * `transform(sequence)/slice/filter` higher-order-function chain
    * (HOF lambdas evaluate interpreted), byte-identical on the
    * single-space-separated `documents` fixture (asymmetric-difference
    * audited at sf0.1; the sf0.01 golden file in FuzzyOccurrenceSpec
    * pins the whole flagship frame). Whitespace contract (pinned in
    * EdgeCaseSpec): a segment is up to 6 `\S+` tokens joined by
    * SINGLE spaces; other whitespace ends the segment, and empty text
    * yields zero segments.
    */
  def documentSegments(s: SparkSession, dir: String): DataFrame = {
    Tables.load(s, dir, "documents")
      .select(col("doc_id").as("recording_id"), lit(0).as("page"),
        posexplode(regexp_extract_all(col("text"),
          lit("\\S+(?: \\S+){0,5}"), lit(0))).as(Seq("seg_idx", "text")))
      .withColumn("start", col("seg_idx").cast("double") * 5.0)
  }

  /** Probe "songs": a FIXED set of 8 documents (ids exist at every
    * scale factor) each contributes a 3-segment planted lyric
    * (segments 2..4 of its own transcript) — so exact matches (score
    * 100) exist by construction, plus near/cross matches across
    * near-duplicate documents.
    *
    * The probe list is deliberately small and broadcast: that mirrors
    * the reference's real shape (a bounded song catalog vs unbounded
    * transcripts, `modal/occurrence.py:90-100`) and keeps total
    * scoring work linear in the transcript volume at any SF. All-pairs
    * fuzzy matching at scale goes through the MinHash-LSH prefilter in
    * the dedup module instead.
    */
  def documentProbes(s: SparkSession, dir: String): DataFrame = {
    // probe lengths cycle 2/3/4 lines so the flagship exercises the
    // multi-window-size path (windows built once per distinct N)
    documentSegments(s, dir)
      .where(col("recording_id").isin(0L, 25L, 50L, 75L, 100L, 125L, 150L, 175L))
      .withColumn("probe_len",
        ((col("recording_id") / 25).cast("int") % 3 + 2))
      .where(col("seg_idx") >= 2 && col("seg_idx") < col("probe_len") + 2)
      .groupBy(col("recording_id"))
      .agg(array_join(sort_array(collect_list(struct(col("seg_idx"), col("text"))))
        .getField("text"), "\n").as("lyrics"),
        count(lit(1)).as("nseg"), first(col("probe_len")).as("probe_len"))
      .where(col("nseg") === col("probe_len"))
      .select(col("recording_id").as("song_id"), col("lyrics"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The flagship (rows-only check: indel-ratio is not expressible in
    // DuckDB SQL; correctness is pinned by FuzzSpec's differential
    // test against a direct reference-semantics reimplementation).
    "fuzzy_occurrence" -> ((s, dir) => {
      scan(documentSegments(s, dir), documentProbes(s, dir), threshold = 40.0)
    }),

    // FULL-ORACLE TWIN of the flagship (r19, VERDICT r18 #5): the
    // SAME window machinery — [[windowed]] verbatim: per-page sorted
    // segment arrays, sequence/slice/array_join window generation
    // with the whole-page fallback, broadcast song join on window
    // size — and the same first-strictly-best arg-max + post-argmax
    // threshold, with ONLY the scoring kernel swapped: plain
    // `levenshtein` (exact integers on both engines) instead of
    // indel-ratio, which DuckDB cannot compute (the kernel itself is
    // pinned by FuzzSpec's DP-oracle property tests). The transcript
    // is additionally PAGED (8 segments per page) so the per-page
    // window scan, short-last-page fallback, and 1-based page
    // arithmetic — trivial in the flagship's 1-page fixture — are all
    // hash-checked. Keep rule in exact integer units:
    // lev·100 ≤ 55·max(len(lyrics), len(win_text)). The transcript
    // CORPUS is a deterministic subset (doc_id ≡ 1 (mod 8), plus the
    // probe docs so exact self-matches exist): levenshtein is an
    // O(m·n) DP with no bit-parallel kernel on either engine, so the
    // full corpus would make this row cost 10× the flagship it
    // verifies — the subset keeps every pipeline stage exercised at
    // flagship-comparable cost on BOTH engines.
    "fuzzy_occurrence_q" -> ((s, dir) => {
      val paged = documentSegments(s, dir)
        .where(pmod(col("recording_id"), lit(8)) === 1 ||
          pmod(col("recording_id"), lit(25)) === 0)
        .select(col("recording_id"),
          (col("seg_idx") / 8).cast("int").as("page"),
          (col("seg_idx") % 8).cast("int").as("seg_idx"),
          col("start"), col("text"))
      windowed(paged, documentProbes(s, dir))
        .withColumn("lev", levenshtein(col("lyrics"), col("win_text")))
        .groupBy(col("song_id"), col("recording_id"))
        .agg(max(struct((-col("lev")).as("neg_lev"), (-col("page")).as("neg_page"),
          (-col("w0")).as("neg_w0"), col("start"), col("win_text"),
          col("lyrics"))).as("best"))
        .where((-col("best.neg_lev")) * 100 <=
          lit(55) * greatest(length(col("best.lyrics")), length(col("best.win_text"))))
        .select(
          col("song_id"), col("recording_id"),
          (-col("best.neg_page") + 1).cast("int").as("page"),
          col("best.start").as("start"),
          (-col("best.neg_lev")).cast("long").as("lev"),
          col("best.win_text").as("matched_text"))
    }),

    // Oracle-checkable fuzzy scalar: plain Levenshtein (built-in on
    // both engines) between each doc's first 5 words and a fixed probe.
    "fuzzy_lev" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .select(col("doc_id"),
          levenshtein(
            array_join(slice(split(col("text"), " "), 1, 5), " "),
            lit("the fast key order sort")).as("lev"))
        .where(col("lev") <= 15)
    }),

    // Record linkage with BLOCKED Jaro–Winkler (the native codegen
    // kernel graft.functions.JaroWinkler — classic Winkler semantics,
    // matching DuckDB's jaro_winkler_similarity, so the whole query
    // hash-checks). Blocking is the standard linkage scale lever:
    // candidate pairs are generated only inside (brand, head-noun)
    // blocks — an equi-join, never an all-pairs cross — so pair work
    // is Σ block² with block sizes bounded by the key's selectivity,
    // not corpus². The comparator runs inside whole-stage codegen
    // over the blocked pairs (no UDF boxing). Scores are quantized at
    // 1e6 for cross-engine hash parity (both engines compute the same
    // small-denominator rationals in double; FuzzSpec pins the kernel
    // against a direct definition restatement and DuckDB agreement
    // was probed before the oracle was committed).
    "fuzzy_jaro_winkler" -> ((s, dir) => {
      val p = Tables.load(s, dir, "part")
        .select(col("p_partkey"), col("p_name"), col("p_brand"),
          element_at(split(col("p_name"), " "), -1).as("noun"))
      val a = p.select(col("p_partkey").as("p1"), col("p_name").as("nm1"),
        col("p_brand").as("br"), col("noun"))
      val b = p.select(col("p_partkey").as("p2"), col("p_name").as("nm2"),
        col("p_brand").as("br"), col("noun"))
      val jw = graft.functions.JaroWinkler.jaro_winkler(col("nm1"), col("nm2"))
      // Threshold on the QUANTIZED score: jw = 0.8 is exactly
      // achievable as a rational, so `jw >= 0.8` sits one ulp from
      // flipping per engine; `jw_q >= 800000` is ulp-proof (the
      // nearest achieved score is 0.056 quantization units from any
      // round-half boundary — probed at sf0.01 before committing).
      a.join(b, Seq("br", "noun"))
        .where(col("p1") < col("p2"))
        .withColumn("jw_q", round(jw * 1e6).cast("long"))
        .where(col("jw_q") >= 800000L)
        .select(col("p1"), col("p2"), col("jw_q"))
    })
  )

  def oracle: Map[String, String] = Map(
    // the flagship pipeline restated end-to-end: segmentation (the
    // same 6-word regex), probe construction, 8-segment paging,
    // per-page window generation with the whole-page fallback,
    // levenshtein scoring, first-strictly-best arg-max (min lev, page
    // asc, w0 asc), post-argmax integer threshold
    "fuzzy_occurrence_q" ->
      """WITH segs AS (
           SELECT doc_id,
             CAST(generate_subscripts(l, 1) - 1 AS BIGINT) AS gidx,
             unnest(l) AS txt
           FROM (SELECT doc_id,
                   regexp_extract_all(text, '\S+( \S+){0,5}') AS l
                 FROM documents)),
         probes AS (
           SELECT doc_id AS song_id,
             array_to_string(list(txt ORDER BY gidx), chr(10)) AS lyrics,
             any_value(plen) AS plen
           FROM (SELECT doc_id, gidx, txt, (doc_id // 25) % 3 + 2 AS plen
                 FROM segs
                 WHERE doc_id IN (0, 25, 50, 75, 100, 125, 150, 175)) s
           WHERE gidx >= 2 AND gidx < plen + 2
           GROUP BY doc_id
           HAVING count(*) = any_value(plen)),
         songs AS (
           SELECT song_id, lyrics,
             len(string_split(lyrics, chr(10))) AS n
           FROM probes WHERE lyrics IS NOT NULL AND lyrics <> ''),
         pages AS (
           SELECT doc_id AS recording_id, gidx // 8 AS page,
             list(txt ORDER BY gidx) AS texts,
             list(gidx * 5.0 ORDER BY gidx) AS starts,
             count(*) AS page_len
           FROM segs
           WHERE doc_id % 8 = 1 OR doc_id % 25 = 0
           GROUP BY doc_id, gidx // 8),
         wins AS (
           SELECT recording_id, page, n, texts, starts,
             unnest(CASE WHEN page_len >= n
                         THEN range(0, page_len - n + 1)
                         ELSE [CAST(0 AS BIGINT)] END) AS w0
           FROM pages, (SELECT DISTINCT n FROM songs)),
         scored AS (
           SELECT w.recording_id, w.page, w.w0,
             array_to_string(w.texts[w.w0 + 1 : w.w0 + w.n], chr(10)) AS win_text,
             w.starts[w.w0 + 1] AS start, s.song_id, s.lyrics,
             levenshtein(s.lyrics,
               array_to_string(w.texts[w.w0 + 1 : w.w0 + w.n], chr(10))) AS lev
           FROM wins w JOIN songs s ON s.n = w.n),
         best AS (
           SELECT *, row_number() OVER (
             PARTITION BY song_id, recording_id
             ORDER BY lev ASC, page ASC, w0 ASC) AS rn
           FROM scored)
         SELECT song_id, recording_id, CAST(page + 1 AS INT) AS page,
           start, CAST(lev AS BIGINT) AS lev, win_text AS matched_text
         FROM best
         WHERE rn = 1
           AND lev * 100 <= 55 * greatest(length(lyrics), length(win_text))""",

    "fuzzy_lev" ->
      """SELECT doc_id,
           levenshtein(array_to_string(string_split(text, ' ')[1:5], ' '),
                       'the fast key order sort') AS lev
         FROM documents
         WHERE levenshtein(array_to_string(string_split(text, ' ')[1:5], ' '),
                           'the fast key order sort') <= 15""",

    "fuzzy_jaro_winkler" ->
      """WITH p AS (
           SELECT p_partkey AS k, p_name AS nm, p_brand AS br,
                  string_split(p_name, ' ')[-1] AS noun
           FROM part
         )
         SELECT p1, p2, jw_q FROM (
           SELECT a.k AS p1, b.k AS p2,
                  CAST(round(jaro_winkler_similarity(a.nm, b.nm) * 1e6) AS BIGINT) AS jw_q
           FROM p a JOIN p b ON a.br = b.br AND a.noun = b.noun AND a.k < b.k
         ) WHERE jw_q >= 800000"""
  )
}
