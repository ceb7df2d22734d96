package graft

import org.apache.spark.sql.SparkSession

/** Plan inspector: `runMain graft.Explain <query> [sfDir]` prints the
  * formatted physical plan (and a shuffle/codegen summary) for one
  * catalog query — the iterate-on-the-plan loop SURVEY §7 calls for.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
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
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.explain("formatted")
    val plan = df.queryExecution.executedPlan.toString()
    val nEx = "Exchange".r.findAllIn(plan).length
    val nBc = "BroadcastExchange".r.findAllIn(plan).length
    println(s"[explain] $name: exchanges=$nEx (broadcast=$nBc, " +
      s"shuffle=${nEx - nBc})")
    spark.stop()
  }
}
