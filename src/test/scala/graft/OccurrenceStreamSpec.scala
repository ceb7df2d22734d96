package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.streaming.OccurrenceStream

/** The cron-as-stream test: transcript files dropped into a folder
  * drive incremental occurrence sync; a second run with a new file
  * processes ONLY that file (checkpoint offsets replace the
  * reference's lastSongOccurrenceScan state column) and merges into
  * the accumulated target.
  */
@scala.annotation.nowarn("cat=deprecation") // runAvailable's small-table contract is itself under test
class OccurrenceStreamSpec extends SparkFunSuite {
  import spark.implicits._

  private def songs = Seq(
    (10L, "s", "夜空中最亮的星\n能否听清\n那仰望的人")
  ).toDF("id", "title", "lyrics_fragment")

  private def vtuberSongs = Seq(
    (100L, 10L, 1L, "BVs", 1L)
  ).toDF("id", "song_id", "vtuber_profile_id", "bvid", "pubdate")

  private def archives = {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("vtuber_profile_id", LongType),
      StructField("bvid", StringType)))
    spark.createDataFrame(java.util.Arrays.asList(
      org.apache.spark.sql.Row(1L, 1L, "BVa"),
      org.apache.spark.sql.Row(2L, 1L, "BVb")), schema)
  }

  private val doc =
    """[[{"start": 4.0, "text": "夜空中最亮的星"}, {"start": 9.0, "text": "能否听清"}, {"start": 14.0, "text": "那仰望的人"}]]"""

  test("incremental transcript stream merges occurrences per batch") {
    val root = Files.createTempDirectory("occ_stream")
    val drop = root.resolve("transcripts"); Files.createDirectories(drop)
    val target = root.resolve("occurrences").toString
    val ckpt = root.resolve("ckpt").toString

    // no pre-seeded target: the first batch must start from an empty
    // frame, not fail on the missing path

    // batch 1: one transcript
    Files.writeString(drop.resolve("BVa.json"), doc)
    OccurrenceStream.runAvailable(spark, drop.toString, ckpt, target,
      songs, vtuberSongs, archives)
    val after1 = spark.read.parquet(target)
    assert(after1.count() == 1)
    assert(after1.select("live_recording_archive_id").as[Long].collect()(0) == 1L)

    // batch 2: a second file appears; only it is processed, target
    // accumulates both occurrences
    Files.writeString(drop.resolve("BVb.json"), doc)
    OccurrenceStream.runAvailable(spark, drop.toString, ckpt, target,
      songs, vtuberSongs, archives)
    val after2 = spark.read.parquet(target)
    assert(after2.count() == 2)
    assert(after2.select("live_recording_archive_id").as[Long].collect().toSet ==
      Set(1L, 2L))

    // re-run with nothing new: no change (exactly-once file tracking)
    OccurrenceStream.runAvailable(spark, drop.toString, ckpt, target,
      songs, vtuberSongs, archives)
    assert(spark.read.parquet(target).count() == 2)
  }

  test("snapshot-sink stream upserts increments, untouched buckets carry forward") {
    val root = Files.createTempDirectory("occ_snap")
    val drop = root.resolve("transcripts"); Files.createDirectories(drop)
    val target = root.resolve("occurrences").toString
    val ckpt = root.resolve("ckpt").toString
    def run() = OccurrenceStream.runAvailableSnapshot(spark, drop.toString,
      ckpt, target, songs, vtuberSongs, archives, buckets = 8)
    def table() = {
      val schema = StructType(Seq(
        StructField("song_id", LongType), StructField("vtuber_song_id", LongType),
        StructField("live_recording_archive_id", LongType),
        StructField("start", LongType), StructField("page", IntegerType),
        StructField("bucket", LongType)))
      graft.sinks.SnapshotMerge.read(spark, target, schema)
    }

    // batch 1 creates the table (no pre-seeding needed)
    Files.writeString(drop.resolve("BVa.json"), doc)
    run()
    assert(table().select("live_recording_archive_id").as[Long].collect().toSeq == Seq(1L))

    // batch 2: archive 2 lands in a different bucket; bucket 1's
    // manifest entry must carry forward untouched. The freshness
    // guard's scan is pinned MECHANICALLY to the touched bucket: a
    // corrupt decoy parquet planted in bucket 1's committed dir makes
    // any whole-table guard read fail loudly (the regression this
    // guards against re-read the full table every micro-batch).
    val store = new graft.sinks.SnapshotStore(
      spark, new org.apache.hadoop.fs.Path(target))
    val m1 = store.current().get._2
    val decoyDir = new org.apache.hadoop.fs.Path(
      store.dataPath(m1("bucket=1")), "bucket=1").toUri.getPath
    val decoy = Paths.get(decoyDir, "part-99999-decoy.snappy.parquet")
    Files.write(decoy, "not a parquet file".getBytes)
    Files.writeString(drop.resolve("BVb.json"), doc)
    run()
    val m2 = store.current().get._2
    assert(m2("bucket=1") == m1("bucket=1"),
      "bucket of archive 1 must carry forward by reference")
    assert(m2.contains("bucket=2") && !m1.contains("bucket=2"))
    Files.delete(decoy) // so the full-table reads below stay valid
    assert(table().select("live_recording_archive_id").as[Long].collect().toSet ==
      Set(1L, 2L))

    // drained re-run: no new version
    val v = store.currentVersion()
    run()
    assert(store.currentVersion() == v)
  }

  test("auto-compact folds stream churn once the manifest exceeds compactAbove") {
    val root = Files.createTempDirectory("occ_compact")
    val drop = root.resolve("transcripts"); Files.createDirectories(drop)
    val target = root.resolve("occurrences").toString
    val ckpt = root.resolve("ckpt").toString
    val store = new graft.sinks.SnapshotStore(
      spark, new org.apache.hadoop.fs.Path(target))
    def batches() = store.current().get._2.values.toSet.size
    // 3 archives in 3 different buckets (buckets = 8); each drain adds
    // one transcript => one new single-bucket batch dir
    val archives3 = {
      val schema = StructType(Seq(
        StructField("id", LongType), StructField("vtuber_profile_id", LongType),
        StructField("bvid", StringType)))
      spark.createDataFrame(java.util.Arrays.asList(
        org.apache.spark.sql.Row(1L, 1L, "BVa"),
        org.apache.spark.sql.Row(2L, 1L, "BVb"),
        org.apache.spark.sql.Row(3L, 1L, "BVc")), schema)
    }
    def run() = OccurrenceStream.runAvailableSnapshot(spark, drop.toString,
      ckpt, target, songs, vtuberSongs, archives3, buckets = 8, compactAbove = 2)

    Files.writeString(drop.resolve("BVa.json"), doc)
    run()
    assert(batches() == 1)
    Files.writeString(drop.resolve("BVb.json"), doc)
    run()
    assert(batches() == 2, "within bound: no fold yet")
    Files.writeString(drop.resolve("BVc.json"), doc)
    run()
    assert(batches() <= 2, "third batch must trigger the incremental fold")
    // all three occurrences intact after folding
    val schema = StructType(Seq(
      StructField("song_id", LongType), StructField("vtuber_song_id", LongType),
      StructField("live_recording_archive_id", LongType),
      StructField("start", LongType), StructField("page", IntegerType),
      StructField("bucket", LongType)))
    assert(graft.sinks.SnapshotMerge.read(spark, target, schema)
      .select("live_recording_archive_id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
