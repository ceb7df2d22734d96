package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Pins the scale mechanics: salted joins preserve join semantics,
  * bucketed tables co-locate joins (no shuffle exchange on either
  * side), and AQE is active in the sessions the driver runs.
  */
class ScaleSpec extends SparkFunSuite {

  test("salted join == plain join under a skewed key") {
    import spark.implicits._
    // 90% of the big side lands on key 1 — the classic hot key
    val big = spark.range(10000)
      .select((when(col("id") % 10 =!= 0, 1L).otherwise(col("id")))
        .as("k"), col("id").as("payload"))
    val small = Seq((1L, "hot"), (20L, "cold"), (30L, "colder"))
      .toDF("k", "v")
    val plain = big.join(small, "k")
    val salted = Skew.saltedJoin(big, small, "k", salt = 8)
    assert(salted.count() == plain.count())
    val a = plain.select("k", "payload", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val b = salted.select("k", "payload", "v").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    assert(a == b)
  }

  test("skew_salted_join actually shuffles the fact side on (key, salt)") {
    // the driver query's oracle pins the ROWS; this pins the POINT —
    // the join runs as a SHUFFLED hash join (not a broadcast, which
    // would make salting vacuous) and the exchange partitions on the
    // salt, so no reducer owns a whole hot key
    val plan = SparkEntry.queries("skew_salted_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(plan.contains("ShuffledHashJoin"), s"join must shuffle:\n$plan")
    assert(plan.linesIterator.exists(l =>
      l.contains("hashpartitioning") && l.contains("__salt")),
      s"fact side must partition on the salt:\n$plan")
  }

  test("bucketed tables join without a shuffle exchange") {
    // a fresh session's in-memory catalog can't DROP tables left on
    // disk by a previous JVM — clear the locations directly
    val wh = java.net.URI.create(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val dir = java.nio.file.Paths.get(wh, t)
      if (java.nio.file.Files.exists(dir)) {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
          .foreach(java.nio.file.Files.delete)
      }
    }
    Tables.load(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables.load(spark, sfDir, "lineitem")
      .withColumnRenamed("l_orderkey", "o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_orders")
      .join(spark.table("b_lineitem"), "o_orderkey")
      // disable broadcast so the co-location is what avoids the shuffle
      .hint("merge")
    val plan = joined.queryExecution.executedPlan.toString()
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not reshuffle:\n$plan")
    assert(joined.count() > 0)
  }

  test("AQE enabled in driver-shaped sessions") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }
}
