package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md).
  *
  * Parquet carries its own schema; we rely on the footer rather than
  * re-declaring StructTypes here (explicit schemas are used for JSON
  * sources, see [[graft.sources.TranscriptJson]]). Filters/projections
  * applied downstream push into the scan (PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
