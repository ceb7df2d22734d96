package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC edge of the engine — the reference's entire storage layer is
  * psycopg against Postgres (reference `db/conn.py:1-22`,
  * `dblocal.py:18-38`); this adapter is the Spark-native mapping of
  * that surface onto `format("jdbc")`:
  *
  *  - '''reads''' (S1): a full-table read for dimension-sized tables,
  *    and a range-partitioned read for fact tables — `numPartitions`
  *    concurrent connections each scanning a `partitionColumn` stripe,
  *    so a 1000-executor cluster does not funnel the table through one
  *    JDBC cursor;
  *  - '''writes''' (K4): executors write `foreachPartition`-style via
  *    Spark's JDBC sink with the `batchsize` knob — the reference
  *    chunks inserts at 50 rows per executemany (`dblocal.py:118-133`,
  *    kept as [[ReferenceParityBatchSize]]); the write DEFAULT is
  *    Spark's 1000 — 50-row round trips would throttle a large
  *    cluster's insert throughput;
  *  - '''merge semantics''' stay in [[Merge]]/[[PartitionedMerge]]:
  *    Spark's JDBC sink has no ON CONFLICT, so K1–K3 run as
  *    read → merge plan → write-back, exactly the shape the catalog's
  *    k1/k2/k3 queries pin.
  *
  * Tested against the Derby embedded driver that ships with Spark
  * (JdbcSpec round-trip); against a real PG deployment only the url /
  * driver options change.
  */
object JdbcAdapter {

  /** Reference insert chunk size (`dblocal.py:118-133`) — kept as a
    * documented parity constant for callers reproducing the
    * reference's exact round-trip pattern. NOT the write default:
    * 50 rows per round trip is a throughput hazard at scale, so
    * [[write]] defaults to Spark's own JDBC batch size (1000).
    */
  val ReferenceParityBatchSize = 50

  /** Spark's JDBC sink default (`JDBCOptions.JDBC_BATCH_INSERT_SIZE`). */
  val DefaultBatchSize = 1000

  def read(spark: SparkSession, url: String, driver: String,
      table: String): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", table)
      .load()

  /** Range-partitioned parallel read: `numPartitions` stripes of
    * `[lower, upper]` on a numeric/date column, one connection each.
    */
  def readPartitioned(spark: SparkSession, url: String, driver: String,
      table: String, partitionColumn: String, lower: Long, upper: Long,
      numPartitions: Int): DataFrame =
    spark.read.format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lower)
      .option("upperBound", upper)
      .option("numPartitions", numPartitions)
      .load()

  /** Batched write: each executor task inserts its partition in
    * `batchsize`-row chunks (one addBatch/executeBatch cycle per
    * chunk — the JDBC-level equivalent of the reference's
    * executemany(chunk=50)).
    */
  def write(df: DataFrame, url: String, driver: String, table: String,
      mode: SaveMode = SaveMode.Append,
      batchSize: Int = DefaultBatchSize): Unit =
    df.write.format("jdbc")
      .option("url", url)
      .option("driver", driver)
      .option("dbtable", table)
      .option("batchsize", batchSize)
      .mode(mode)
      .save()
}
