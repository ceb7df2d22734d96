package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The speech-to-text boundary (SURVEY.md §2.10 X1): the reference
  * ships audio bytes to a Whisper model on a GPU container
  * (`modal/transcribe.py:19-48`, `transcribe.py:41-108`) and gets back
  * `array<struct<start, text>>` per page.
  *
  * No ASR model ships in this container, so the model call is a
  * clearly-marked deterministic STUB (segments derived from the byte
  * content); everything else is the production shape:
  *  - input: `(bvid, page, payload binary)` — one row per audio page;
  *  - per-partition model initialization (a real deployment loads the
  *    checkpoint once per executor-core, exactly here);
  *  - output: flat `(bvid, page, seg_idx, start, text)` segments, the
  *    same relation `TranscriptJson.readSegments` produces, so the
  *    whole downstream pipeline (fuzzy scan → occurrences, or
  *    `assembleNested` → JSON sink K5) runs unchanged on stub or real
  *    transcripts.
  *
  * Scale: transcription parallelism = audio-page rows; each task holds
  * one model instance and streams rows through it — the Spark-native
  * form of the reference's one-container-per-call fan-out.
  */
object TranscribeStub {

  /** Stands in for a loaded ASR model. */
  private final class StubAsrModel {
    /** Deterministic fake: one ~5-second segment per 64-byte chunk,
      * "text" = hex of the chunk's first 4 bytes.
      */
    def transcribe(bytes: Array[Byte]): Seq[(Double, String)] = {
      (0 until math.max(1, bytes.length / 64)).map { i =>
        val off = i * 64
        val word = bytes.slice(off, math.min(off + 4, bytes.length))
          .map(b => f"${b & 0xFF}%02x").mkString
        (i * 5.0, s"seg_$word")
      }
    }
  }

  private val outSchema = StructType(Seq(
    StructField("bvid", StringType),
    StructField("page", IntegerType),
    StructField("seg_idx", IntegerType),
    StructField("start", DoubleType),
    StructField("text", StringType)))

  /** `(bvid, page, payload)` audio pages → flat transcript segments. */
  def transcribe(audioPages: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(outSchema)
    audioPages.select(col("bvid"), col("page"), col("payload"))
      .mapPartitions { it =>
        val model = new StubAsrModel // once per partition/task
        it.flatMap { r =>
          model.transcribe(r.getAs[Array[Byte]]("payload")).zipWithIndex.map {
            case ((start, text), i) =>
              Row(r.getString(0), r.getInt(1), i, start, text)
          }
        }
      }(enc)
  }
}
