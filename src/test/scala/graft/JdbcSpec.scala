package graft

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import graft.sinks.JdbcAdapter

/** K4/S1: the JDBC edge, demonstrated against the embedded Derby
  * driver that ships with Spark — batched writes (reference chunk=50,
  * `dblocal.py:118-133`), full and range-partitioned reads, and the
  * read → merge-plan → write-back shape that replaces ON CONFLICT.
  */
class JdbcSpec extends SparkFunSuite {

  private val driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private def url(db: String) = s"jdbc:derby:memory:$db;create=true"

  test("batched write then read round-trips a domain table") {
    val u = url("graft_rt")
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .limit(137) // odd size: exercises a final short chunk < batchsize
    JdbcAdapter.write(orders, u, driver, "ORDERS_RT",
      mode = SaveMode.Overwrite, batchSize = JdbcAdapter.ReferenceParityBatchSize)
    val back = JdbcAdapter.read(spark, u, driver, "ORDERS_RT")
    val key = (r: org.apache.spark.sql.Row) =>
      (r.getLong(0), r.getLong(1), r.getDouble(2), r.getString(3))
    assert(back.collect().map(key).toSet == orders.collect().map(key).toSet)
  }

  test("range-partitioned read splits the scan across connections") {
    val u = url("graft_part")
    val src = spark.range(0, 1000).select(col("id"),
      (col("id") % 7).cast("double").as("v"))
    JdbcAdapter.write(src, u, driver, "NUMS", mode = SaveMode.Overwrite)
    val back = JdbcAdapter.readPartitioned(
      spark, u, driver, "NUMS", "id", 0L, 1000L, numPartitions = 4)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 1000)
    assert(back.agg(sum(col("id"))).head.getLong(0) == 499500L)
  }

  test("read -> merge plan -> write-back replaces ON CONFLICT") {
    val u = url("graft_merge")
    import spark.implicits._
    val base = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    JdbcAdapter.write(base, u, driver, "T", mode = SaveMode.Overwrite)
    val incoming = Seq((2L, "B2"), (3L, "c")).toDF("id", "v")
    val merged = graft.sinks.Merge.upsertUpdate(
      JdbcAdapter.read(spark, u, driver, "T"), incoming, Seq("id"))
    JdbcAdapter.write(merged, u, driver, "T2", mode = SaveMode.Overwrite)
    val back = JdbcAdapter.read(spark, u, driver, "T2")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(back == Set((1L, "a"), (2L, "B2"), (3L, "c")))
  }
}
