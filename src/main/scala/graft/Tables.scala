package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Parquet carries its own schema; we rely on the footer rather than
  * re-declaring StructTypes here (explicit schemas are used for JSON
  * sources, see [[graft.sources.TranscriptJson]]). Filters/projections
  * applied downstream push into the scan (PushedFilters / ReadSchema).
  *
  * Session contract: `spark.sql.legacy.parquet.nanosAsLong=true` must
  * be set AT SESSION BUILD (Verify/Bench/SparkTestBase all do; build.sbt
  * also sets it as a JVM-wide default for forked runs) — events.ts is
  * parquet TIMESTAMP(NANOS), which Spark 4 refuses to read as a
  * timestamp, so it arrives as raw nanos and is truncated to a
  * microsecond TimestampType here with integer division (`div` — a
  * double division would lose precision above 2^53 ns; DuckDB performs
  * the same nanos → micros truncation on read). The conf is
  * deliberately NOT mutated per load call: a global `conf.set` in a
  * read path races concurrent queries on the same session.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }
  }
}
