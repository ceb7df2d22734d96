package graft

import org.apache.spark.sql.SparkSession

/** Plan sweep: one summary line per catalog query — shuffle/broadcast
  * exchange counts and join strategies — to catch plan regressions
  * (an unexpected cartesian, a missed broadcast, a shuffle that should
  * be map-side). `runMain graft.ExplainAll [sfDir]`.
  */
object ExplainAll {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // 64k coalesce floor: keep compute-dense small shuffles parallel
      // (see OPTIMIZATION_r20.md; scale-inert — parallelism-first AQE
      // sizing dominates once shuffles exceed a few MB)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      // fork-free local fs (graft.hadoop.FastLocalFileSystem scaladoc)
      .config("spark.hadoop.fs.file.impl",
        classOf[graft.hadoop.FastLocalFileSystem].getName)
      .config("spark.hadoop.fs.AbstractFileSystem.file.impl",
        classOf[graft.hadoop.FastLocalFs].getName)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString()
        def n(p: String) = p.r.findAllIn(plan).length
        val bc = n("BroadcastExchange")
        val sh = n("Exchange hashpartitioning") + n("Exchange rangepartitioning") +
          n("Exchange SinglePartition")
        val joins = Seq(
          "BroadcastHashJoin" -> n("BroadcastHashJoin"),
          "SortMergeJoin" -> n("SortMergeJoin"),
          "ShuffledHashJoin" -> n("ShuffledHashJoin"),
          "BroadcastNestedLoopJoin" -> n("BroadcastNestedLoopJoin"),
          "CartesianProduct" -> n("CartesianProduct"))
          .filter(_._2 > 0).map { case (k, v) => s"$k×$v" }.mkString(",")
        println(f"$name%-24s shuffles=$sh%-3d broadcasts=$bc%-3d $joins")
      } catch {
        case e: Throwable => println(s"$name FAILED: ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
