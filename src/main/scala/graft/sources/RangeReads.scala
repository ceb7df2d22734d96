package graft.sources

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types._

/** Distributed BYTE-RANGE reads over a shared binary object
  * (SURVEY.md §2.1 S7): the reference streams audio by issuing one
  * HTTP `Range:` GET per chunk against object storage
  * (reference `modal/stream.py:133-153,175-219` — HEAD for
  * Content-Length, then bounded `Range: bytes=lo-hi` fetches). The
  * Spark spelling distributes the CHUNK LIST, not the bytes: each row
  * of the ranges frame is one (offset, length) fetch, executed inside
  * a partition-wise boundary with ONE open stream handle per
  * (partition, file) reused across that partition's ranges — the
  * HTTP-session reuse of the reference, re-expressed as
  * `FSDataInputStream.seek + readFully`.
  *
  * Scale: a 100 TB audio corpus is fetched by exactly this shape —
  * the work list (object, offset, len) is a DataFrame partitioned
  * across executors, each task pulls only its own byte windows (never
  * whole objects), and the downstream decode/transcribe boundary
  * (graft.operators.Multimodal) consumes the chunks in place. No
  * driver-side byte movement at any point.
  */
object RangeReads {

  val outSchema: StructType = StructType(Seq(
    StructField("range_id", LongType),
    StructField("offset", LongType),
    StructField("len", IntegerType),
    StructField("chunk_md5", StringType)))

  /** Read each (range_id, offset, len) row's byte window from `file`
    * and return its md5 (hex). Ranges must lie within the file; a
    * short read fails loudly (readFully) rather than returning a
    * truncated chunk — the reference's bounded-GET contract.
    *
    * The SESSION's Hadoop conf (captured at plan time on the driver,
    * shipped in the task closure via `SerializableConfiguration`) is
    * what opens the file on the executor — a `new Configuration()`
    * there would drop every session-scoped filesystem setting (S3A
    * credentials/endpoints, HDFS nameservices, kerberos), so the open
    * would fail or resolve the wrong FS on any cluster whose storage
    * needs non-default conf. SourcesSpec pins the propagation with a
    * custom key set only on the session conf and read back inside the
    * task.
    */
  def readRanges(file: String, ranges: DataFrame): DataFrame = {
    val enc = RowEncoder.encoderFor(outSchema)
    val hadoopConf = new org.apache.spark.util.SerializableConfiguration(
      ranges.sparkSession.sessionState.newHadoopConf())
    ranges.select("range_id", "offset", "len")
      .mapPartitions { it =>
        // one handle per partition, NOT per range: open lazily so
        // empty partitions touch nothing; closed on task completion
        // (covers early termination — e.g. a LIMIT above this map —
        // where the iterator is never exhausted).
        var opened: org.apache.hadoop.fs.FSDataInputStream = null
        def in = {
          if (opened == null) {
            val p = new org.apache.hadoop.fs.Path(file)
            opened = p.getFileSystem(hadoopConf.value).open(p)
          }
          opened
        }
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ =>
            if (opened != null) opened.close()))
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { r =>
          val off = r.getLong(1); val len = r.getInt(2)
          val buf = new Array[Byte](len)
          in.seek(off)
          in.readFully(buf)
          md.reset()
          Row(r.getLong(0), off, len,
            md.digest(buf).map(b => f"$b%02x").mkString)
        }
      }(enc)
  }
}
