package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Parquet carries its own schema; we rely on the footer rather than
  * re-declaring StructTypes here (explicit schemas are used for JSON
  * sources, see [[graft.sources.TranscriptJson]]). Filters/projections
  * applied downstream push into the scan (PushedFilters / ReadSchema).
  *
  * events.ts contract — SCHEMA-ADAPTIVE, the file footer decides:
  *  - parquet TIMESTAMP(NANOS): Spark 4 refuses to read nanos as a
  *    timestamp, so under `spark.sql.legacy.parquet.nanosAsLong=true`
  *    (set at session build by Verify/Bench/SparkTestBase; build.sbt
  *    also sets it JVM-wide for forked runs) it arrives as raw BIGINT
  *    nanos and is truncated to a microsecond TimestampType with
  *    integer division (`div` — a double division would lose precision
  *    above 2^53 ns; DuckDB performs the same nanos → micros
  *    truncation on read).
  *  - parquet TIMESTAMP(MICROS) with isAdjustedToUTC=false (the
  *    driver's current export): Spark reads TIMESTAMP_NTZ; the session
  *    timezone is pinned UTC everywhere, so a cast to TimestampType
  *    preserves the wall-clock instant bit-for-bit and downstream
  *    window/date_format expressions see the exact type they always
  *    did. DuckDB reads the same file as plain TIMESTAMP — parity.
  *  - already TimestampType: pass through.
  * The nanosAsLong conf is deliberately NOT mutated per load call: a
  * global `conf.set` in a read path races concurrent queries on the
  * same session.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Normalize an events-shaped frame so `ts` is a microsecond
    * TimestampType regardless of which physical schema the file
    * carries (BIGINT nanos / TIMESTAMP_NTZ / TIMESTAMP — see object
    * doc). Shared by the batch loader and the streaming source.
    */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast("timestamp"))
      case _ => df
    }

  /** (total length, max mtime) fingerprint of a source file or
    * directory-shaped export — two filesystem metadata ops. Artifact
    * cache keys ([[graft.operators.Graph.edgeArtifactRoot]],
    * [[graft.operators.Similarity.pqArtifactRoot]]) fold this in so a
    * REGENERATED corpus at the same path busts the key instead of
    * silently serving the previous corpus's derived artifacts.
    */
  def sourceFingerprint(spark: SparkSession, path: String): (Long, Long) = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isDirectory) {
      val children = fs.listStatus(p)
      (children.map(_.getLen).sum,
        if (children.isEmpty) 0L else children.map(_.getModificationTime).max)
    } else (st.getLen, st.getModificationTime)
  }

  /** Input-parallelism restoration for compute-heavy kernels
    * (optimization guide §2.5 input skew / §6 input split size): a
    * small parquet export is ONE file with ONE row group, so the scan
    * gets a single task and every expression evaluated before the
    * first exchange — shingle/signature kernels, regex tokenization,
    * pairwise similarity after a broadcast join — runs on one core
    * while the rest of the session idles (measured at local[32]:
    * dedup_simhash_md5 spent 1.9 s of its 2.4 s wall in a 1-task scan
    * stage). When the frame has fewer partitions than the session's
    * default parallelism, redistribute by `key` (hash — no
    * sort-before-repartition cost, deterministic layout) or
    * round-robin before the heavy projection. When the scan is
    * already parallel — the 100 TB case, thousands of splits — this
    * is the IDENTITY: no exchange is added, so it never pays a
    * corpus-scale shuffle where parallelism already exists.
    *
    * Precondition: `df` must be a scan-stage frame (no exchange
    * beneath). The partition probe reads the physical RDD's partition
    * count, which is static for a scan but would force AQE stage
    * materialization (i.e. run jobs) through an exchange.
    */
  def spread(df: DataFrame, key: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= p) df
    else if (key.nonEmpty) df.repartition(p, key: _*)
    else df.repartition(p)
  }

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      normalizeEventTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
