package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Scale-crossover measurement harness (NOTES_r4): times a chosen
  * subset of catalog queries against an arbitrary table dir (e.g. a
  * K-times corpus from `scripts/gen_scale_corpus.py`), noop-sink
  * materialized like [[Bench]]. Not part of the driver contract.
  *
  * Usage: `runMain graft.CrossoverBench <dir> <query1,query2,…>`
  */
object CrossoverBench {
  private def consume(df: DataFrame): Unit =
    df.write.format("noop").mode("overwrite").save()

  def main(args: Array[String]): Unit = {
    val Array(dir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_SHUFFLE: shuffle partition count, default = cpus.
    // K-times probe corpora need partitions scaled with the data —
    // the fixed-per-partition-size regime a real cluster holds (a
    // 100x corpus on 32 local partitions packs ~7M rows of hash-agg
    // state per task and OOMs where 100x executors never would).
    val shuffle = sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", shuffle)
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
    spark.sparkContext.setLogLevel("WARN")
    try Tables.names.foreach(n => consume(Tables.load(spark, dir, n)))
    catch { case _: Throwable => }
    val results = names.split(",").toSeq.map { name =>
      val t0 = System.nanoTime()
      consume(SparkEntry.queries(name)(spark, dir))
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => f""""$k":$v%.2f""" }.mkString("{", ",", "}")
    println(s"""{"crossover":$qs,"dir":"$dir"}""")
    spark.stop()
  }
}
