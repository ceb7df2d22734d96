package graft

import org.apache.spark.sql.functions._
import graft.api.Vcut
import graft.operators.{FuzzyOccurrence, TranscribeStub}
import graft.sources.TranscriptJson

/** The whole reference pipeline in one test, audio-in to
  * occurrences-out: stub-transcribe binary audio pages → nested-JSON
  * sink and re-read (K5/S2 round trip) → fuzzy occurrence sync —
  * proving the stages compose on the same relations the reference
  * passes between its cron stages.
  */
class EndToEndSpec extends SparkFunSuite {
  import spark.implicits._

  test("audio bytes → transcripts → occurrences, end to end") {
    // two recordings, two audio pages each; payload bytes drive the
    // deterministic stub segments
    val audio = Seq(
      ("BVe2e1", 0, Array.fill[Byte](256)(1)),
      ("BVe2e1", 1, Array.fill[Byte](320)(2)),
      ("BVe2e2", 0, Array.fill[Byte](192)(3))
    ).toDF("bvid", "page", "payload")

    val segments = TranscribeStub.transcribe(audio)
    assert(segments.count() == 4 + 5 + 3)

    // K5: persist as the reference's nested JSON documents, re-read S2
    val outDir = java.nio.file.Files.createTempDirectory("e2e_json").toString
    TranscriptJson.assembleNested(segments)
      .write.mode("overwrite").json(outDir)
    val reread = spark.read
      .schema("bvid STRING, pages ARRAY<ARRAY<STRUCT<start: DOUBLE, text: STRING>>>")
      .json(outDir)
      .select(col("bvid"), posexplode(col("pages")).as(Seq("page", "segs")))
      .select(col("bvid"), col("page"), posexplode(col("segs")).as(Seq("seg_idx", "seg")))
      .select(col("bvid"), col("page"), col("seg_idx"),
        col("seg.start").as("start"), col("seg.text").as("text"))
    assert(reread.count() == segments.count())

    // probe = the first two stub segments of BVe2e1 page 0 → must be
    // found at score 100, page 1, start 0
    val probeText = segments
      .where(col("bvid") === "BVe2e1" && col("page") === 0 && col("seg_idx") < 2)
      .orderBy("seg_idx").select("text").as[String].collect().mkString("\n")
    val songs = Seq((7L, probeText)).toDF("song_id", "lyrics")
    val occ = FuzzyOccurrence.scan(
      reread.withColumnRenamed("bvid", "recording_id"), songs, 40.0)
      .collect()
    val hit = occ.find(r => r.getString(1) == "BVe2e1").get
    assert(hit.getInt(2) == 1 && hit.getDouble(3) == 0.0 &&
      hit.getDouble(4) == 100.0)
  }
}
