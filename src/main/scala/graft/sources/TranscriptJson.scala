package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Reader for the reference's nested transcript documents (S2).
  *
  * The reference stores one JSON file per recording with shape
  * `array<array<{start: double, text: string}>>` — outer index is the
  * video page, inner index the transcript segment (reference
  * `src/firefly_vcut/transcribe.py:54-63`, read back at
  * `src/firefly_vcut/cmdline.py:532-546` and
  * `src/firefly_vcut/modal/occurrence.py:94-97`).
  *
  * We read whole files (one row per file), parse with an explicit
  * schema (no inference in production paths), and flatten with two
  * `posexplode`s into the flat `transcript_segments` relation the
  * fuzzy pipeline consumes: `(bvid, page, seg_idx, start, text)` with
  * 0-based `page`/`seg_idx`.
  *
  * Scale: each input file is one row until the explode, so
  * parallelism = number of files; downstream ops repartition on
  * (bvid, page). Empty transcripts (`[]`) produce zero segment rows
  * (the reference raises instead, `cmdline.py:314-315` — SURVEY §7.4
  * requires the engine to define the empty case: no rows, no match).
  */
object TranscriptJson {

  val segmentSchema: StructType = StructType(Seq(
    StructField("start", DoubleType),
    StructField("text", StringType)))

  val transcriptSchema: ArrayType =
    ArrayType(ArrayType(segmentSchema))

  /** Whole-text `<bvid>.json` rows (a `value` column from
    * `.option("wholetext").text(...)`) → flat segments. Shared by the
    * batch reader below and the streaming reader
    * ([[graft.streaming.OccurrenceStream.readSegmentsStream]]), so
    * their batch/stream parity holds by construction instead of by
    * keeping two copies in sync.
    */
  def flattenWholeText(raw: DataFrame): DataFrame =
    raw
      .select(
        regexp_extract(input_file_name(), "([^/]+)\\.json$", 1).as("bvid"),
        from_json(col("value"), transcriptSchema).as("pages"))
      .select(col("bvid"), posexplode(col("pages")).as(Seq("page", "segs")))
      .select(col("bvid"), col("page"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))
      .select(col("bvid"), col("page"), col("seg_idx"),
        col("seg.start").as("start"), col("seg.text").as("text"))

  /** `pathGlob` → flat segments. bvid = file stem. */
  def readSegments(spark: SparkSession, pathGlob: String): DataFrame =
    flattenWholeText(spark.read.option("wholetext", "true").text(pathGlob))

  /** Inverse of [[readSegments]] (K5): reassemble the nested document
    * shape, e.g. before `df.write.json`. Ordering inside pages is
    * restored by sorting the collected structs (collect_list order is
    * otherwise nondeterministic across partitions).
    */
  def assembleNested(segments: DataFrame): DataFrame = {
    segments
      .groupBy(col("bvid"), col("page"))
      .agg(sort_array(collect_list(struct(col("seg_idx"), col("start"), col("text"))))
        .as("segs"))
      .groupBy(col("bvid"))
      .agg(sort_array(collect_list(struct(col("page"),
        expr("transform(segs, s -> struct(s.start as start, s.text as text))").as("segs"))))
        .as("pages_s"))
      .select(col("bvid"), expr("transform(pages_s, p -> p.segs)").as("pages"))
  }
}
