package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.{QueryModule, Tables}

/** Multimodal-column plumbing (north-star): image/audio/video as
  * opaque `binary` columns with typed metadata, decoded/featurized at
  * a per-partition UDF boundary — the same boundary the reference
  * crosses for Whisper inference (SURVEY.md §2.10 X1, GPU container at
  * `modal/transcribe.py:11-48`).
  *
  * No media codecs ship in this container, so the decoder is a
  * clearly-marked deterministic STUB keyed only on the bytes' length;
  * everything around it — binary schema, explicit output StructType,
  * mapPartitions batch shape with per-partition "model" init,
  * downstream frame-sampling explode — is the real Spark plumbing a
  * cluster job would use. Because the stub is length-deterministic,
  * the whole path stays DuckDB-oracle-checkable.
  *
  * Scale: decode runs once per row inside a partition-wise boundary
  * (model loaded once per partition, not per row); frame sampling is a
  * generator (`explode`) so downstream per-frame work parallelizes
  * without materializing frames on the driver.
  */
object Multimodal extends QueryModule {

  /** STUB decoder: deterministic metadata from the byte payload.
    * A real deployment replaces this body with an image/audio codec;
    * the signature (bytes per row, inside a partition iterator, model
    * initialized once per partition) is the contract.
    */
  private final class StubDecoder { // stands in for a codec/model handle
    def decode(bytes: Array[Byte]): (Int, Int, Int, Int) = {
      val n = bytes.length
      (n, n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1)
    }
  }

  val metaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType)))

  /** Binary payload → typed metadata via the per-partition boundary. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(metaSchema)
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        val decoder = new StubDecoder // once per partition
        it.map { r =>
          val (n, w, h, f) = decoder.decode(r.getAs[Array[Byte]]("payload"))
          Row(r.getLong(0), n, w, h, f)
        }
      }(enc)
  }

  /** The documents table as fake media: text bytes as the payload. */
  def mediaTable(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")
      .select(col("doc_id"), col("text").cast("binary").as("payload"))

  /** STUB featurizer: deterministic 8-dim "embedding" from byte
    * statistics (stands in for a vision/audio encoder; the plumbing —
    * binary in, fixed-width vector out, per-partition model init — is
    * the real contract).
    */
  def embedMedia(media: DataFrame): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("embedding", ArrayType(DoubleType, containsNull = false))))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        val dims = 8 // "model" loaded once per partition
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val v = new Array[Double](dims)
          var i = 0
          while (i < bytes.length) {
            v(i % dims) += (bytes(i) & 0xFF).toDouble
            i += 1
          }
          Row(r.getLong(0), v.toSeq)
        }
      }(enc)
  }

  /** STUB resize: truncate the payload to `maxBytes` (stands in for an
    * image downscale; binary-to-binary per-partition transform).
    */
  def resizeMedia(media: DataFrame, maxBytes: Int): DataFrame = {
    val schema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("payload", BinaryType),
      StructField("n_bytes", IntegerType)))
    val enc = RowEncoder.encoderFor(schema)
    media.select(col("doc_id"), col("payload"))
      .mapPartitions { it =>
        it.map { r =>
          val bytes = r.getAs[Array[Byte]]("payload")
          val out =
            if (bytes.length <= maxBytes) bytes
            else java.util.Arrays.copyOfRange(bytes, 0, maxBytes)
          Row(r.getLong(0), out, out.length)
        }
      }(enc)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary decode → typed metadata (oracle on the length-determined
    // stub values; strlen(text) == n_bytes for ASCII payloads).
    "mm_decode_meta" -> ((s, dir) => decodeMeta(mediaTable(s, dir))),

    // Binary → fixed-width feature vector at the partition boundary
    // (sum of byte values per modulo-8 lane — integer-exact in double,
    // so the oracle reproduces it engine-agnostically).
    "mm_embed" -> ((s, dir) => {
      embedMedia(mediaTable(s, dir))
        .select(col("doc_id"),
          round(element_at(col("embedding"), 1), 1).as("e0"),
          round(element_at(col("embedding"), 8), 1).as("e7"))
    }),

    // Binary resize/truncate; checksum proves the byte transform.
    "mm_resize" -> ((s, dir) => {
      resizeMedia(mediaTable(s, dir), maxBytes = 100)
        .select(col("doc_id"), col("n_bytes"),
          md5(col("payload")).as("digest"))
    }),

    // Frame sampling: every 10th frame index per "video" — a
    // generator expansion, one output row per sampled frame.
    "mm_frame_sample" -> ((s, dir) => {
      decodeMeta(mediaTable(s, dir))
        .select(col("doc_id"), col("n_frames"),
          explode(filter(sequence(lit(0), col("n_frames") - 1),
            i => i % 10 === 0)).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"))
    })
  )

  def oracle: Map[String, String] = Map(
    "mm_embed" ->
      """SELECT doc_id,
           round(CAST(list_sum([unicode(substr(text, i, 1))
             for i in range(1, CAST(strlen(text) AS INT) + 1)
             if (i - 1) % 8 = 0]) AS DOUBLE), 1) AS e0,
           round(CAST(coalesce(list_sum([unicode(substr(text, i, 1))
             for i in range(1, CAST(strlen(text) AS INT) + 1)
             if (i - 1) % 8 = 7]), 0) AS DOUBLE), 1) AS e7
         FROM documents""",
    "mm_resize" ->
      """SELECT doc_id,
           CAST(least(strlen(text), 100) AS INT) AS n_bytes,
           md5(substr(text, 1, 100)) AS digest
         FROM documents""",
    "mm_decode_meta" ->
      """SELECT doc_id,
           CAST(strlen(text) AS INT) AS n_bytes,
           CAST(strlen(text) % 640 + 1 AS INT) AS width,
           CAST((strlen(text) * 7) % 480 + 1 AS INT) AS height,
           CAST(strlen(text) % 30 + 1 AS INT) AS n_frames
         FROM documents""",
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(f AS INT) AS frame_idx
         FROM documents,
              LATERAL (SELECT unnest(range(0, strlen(text) % 30 + 1)) AS f)
         WHERE f % 10 = 0"""
  )
}
