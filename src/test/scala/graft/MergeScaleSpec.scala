package graft

import java.nio.file.{Files, Paths}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import graft.sinks.{PartitionedMerge, SnapshotMerge, SnapshotStore}

/** Partition-count scale proof for the merge paths (guards the
  * linear IN-list prune, `PartitionedMerge.scala`, against a
  * regression back to an OR-of-ANDs whose Catalyst analysis blows up
  * in the thousands of partitions).
  *
  * The only-touched-directories claim is pinned MECHANICALLY: an
  * untouched partition dir gets a garbage file with a `.parquet` name
  * planted in it. Directory-level pruning never opens data files of
  * untouched partitions, so the merge succeeds; any regression that
  * scans untouched partitions hits the corrupt footer and fails the
  * test loudly.
  */
class MergeScaleSpec extends SparkFunSuite {
  import spark.implicits._

  private val nParts = 2000
  private val touched = Seq(3L, 700L, 999L, 1500L, 1997L)

  private def seedFrame = spark.range(nParts)
    .select(col("id"), lit(0L).as("v"), col("id").as("pk"))

  private def incoming = touched.map(k => (k, 1L, k)).toDF("id", "v", "pk")

  test("partitioned merge into 2,000 partitions: pruned, untouched never opened, time-boxed") {
    val dir = Files.createTempDirectory("pscale").toString + "/t"
    seedFrame.repartition(4, col("pk")).write.partitionBy("pk").parquet(dir)
    // corrupt decoy in an untouched partition — opened = failed test
    Files.write(Paths.get(dir, "pk=1998", "part-99999-decoy.snappy.parquet"),
      "not a parquet file".getBytes)
    def realFiles(pk: Long): Map[String, Seq[Byte]] = {
      import scala.jdk.CollectionConverters._
      Files.list(Paths.get(dir, s"pk=$pk")).iterator().asScala
        .filter(_.getFileName.toString.startsWith("part-"))
        .map(p => p.getFileName.toString -> Files.readAllBytes(p).toSeq).toMap
    }
    val decoyBefore = realFiles(1998L)

    val t0 = System.nanoTime()
    PartitionedMerge.upsertUpdate(spark, dir, incoming, Seq("id"), Seq("pk"))
    val secs = (System.nanoTime() - t0) / 1e9
    // generous CI box: the OR-of-ANDs regression this guards against
    // costs minutes of analysis at this partition count
    assert(secs < 120, f"2k-partition merge took $secs%.1f s")

    // read back pruned on the PARTITION column (an id filter would
    // scan every partition and hit the decoy itself)
    val got = spark.read.parquet(dir)
      .where(col("pk").isin(touched :+ 42L: _*))
      .select(col("id"), col("v")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(touched.forall(got(_) == 1L) && got(42L) == 0L)
    assert(realFiles(1998L) == decoyBefore,
      "decoy partition must survive byte-identical, decoy included")
  }

  test("snapshot merge at 2,000 partitions: manifest carries 1,995 forward, touched dirs only") {
    val dir = Files.createTempDirectory("sscale").toString + "/t"
    val t0 = System.nanoTime()
    SnapshotMerge.upsertUpdate(spark, dir, seedFrame, Seq("id"), Seq("pk"))
    val store = new SnapshotStore(spark, new Path(dir))
    val m1 = store.current().get._2
    assert(m1.size == nParts)
    // corrupt decoy inside an untouched partition's committed batch dir
    val untouchedDir = new Path(store.dataPath(m1("pk=1998")), "pk=1998")
    Files.write(Paths.get(untouchedDir.toUri.getPath, "part-99999-decoy.snappy.parquet"),
      "not a parquet file".getBytes)

    SnapshotMerge.upsertUpdate(spark, dir, incoming, Seq("id"), Seq("pk"))
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 180, f"2k-partition snapshot seed+merge took $secs%.1f s")

    val m2 = store.current().get._2
    assert(m2.size == nParts)
    val carried = m2.filter { case (s, b) => m1.get(s).contains(b) }
    assert(carried.size == nParts - touched.size,
      s"exactly the untouched ${nParts - touched.size} partitions must carry forward")
    // pruned read of the touched slice — never lists the decoy's dir
    val got = store.readPartitions(seedFrame.schema, touched.map(k => s"pk=$k").toSet)
      .select(col("id"), col("v")).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == touched.map(_ -> 1L).toMap)
  }
}
