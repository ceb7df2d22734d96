package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.api.Vcut

/** The reference's cron stage 4 (`populate_occurrences`,
  * `modal/cron.py:14-21` + `modal/occurrence.py:78-130`) as a real
  * incremental stream: transcript JSON files landing in a directory
  * ARE the trigger — each micro-batch fuzzy-scans only the NEW
  * transcripts and merges the occurrences into the target, replacing
  * the reference's cron + `lastSongOccurrenceScan` state column with
  * the stream's own source offsets (exactly-once file tracking).
  *
  * `Trigger.AvailableNow` gives the cron semantics ("drain whatever
  * arrived, then stop"); a continuous deployment would use a
  * processing-time trigger unchanged.
  */
object OccurrenceStream {

  /** Stream of flat transcript segments from a drop-folder of
    * `<bvid>.json` documents — the streaming twin of
    * [[graft.sources.TranscriptJson.readSegments]], sharing its
    * flatten so the twins cannot drift.
    */
  def readSegmentsStream(spark: SparkSession, dir: String): DataFrame =
    graft.sources.TranscriptJson.flattenWholeText(
      spark.readStream.option("wholetext", "true").text(dir))

  /** Run the incremental occurrence sync over a transcript drop-folder
    * until all currently-available files are processed. The target
    * parquet path accumulates occurrences across batches (MERGE per
    * micro-batch via [[graft.api.Vcut.syncOccurrences]]). Checkpoint
    * state makes re-runs process only unseen files.
    *
    * SMALL TABLES ONLY: every micro-batch rewrites the WHOLE target —
    * cost grows with the accumulated table, not the batch. The
    * scale-correct twin is [[runAvailableSnapshot]], which upserts
    * just the batch's increment into hash buckets; this variant
    * remains for targets a plain unpartitioned parquet dir serves
    * (tooling that can't read the snapshot layout).
    */
  @deprecated("rewrites the whole target per micro-batch; use " +
    "runAvailableSnapshot for anything beyond small tables", "round-5")
  def runAvailable(
      spark: SparkSession,
      transcriptsDir: String,
      checkpointDir: String,
      targetDir: String,
      songs: DataFrame,
      vtuberSongs: DataFrame,
      archives: DataFrame,
      threshold: Double = 40.0): Unit = {
    val segments = readSegmentsStream(spark, transcriptsDir)
    val q = segments.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          // Crash-safe swap (graft.sinks.AtomicDir): recover any
          // half-finished swap from a previous crashed run, merge, then
          // publish via rename-aside — a checkpoint-driven retry always
          // finds a readable target, and a FIRST batch with no target
          // yet starts from an empty frame instead of failing on the
          // missing path.
          import graft.sinks.AtomicDir
          import org.apache.spark.sql.types._
          val occSchema = StructType(Seq(
            StructField("song_id", LongType), StructField("vtuber_song_id", LongType),
            StructField("live_recording_archive_id", LongType),
            StructField("start", LongType), StructField("page", IntegerType)))
          val dst = new org.apache.hadoop.fs.Path(targetDir)
          val fs = AtomicDir.fileSystem(spark, dst)
          AtomicDir.recover(fs, dst)
          val existing = AtomicDir.readOrEmpty(spark, targetDir, occSchema)
          val merged = Vcut.syncOccurrences(
            existing, songs, vtuberSongs, archives, batch, threshold)
            .select(existing.columns.map(col): _*)
          merged.write.mode("overwrite").parquet(targetDir + ".staging")
          AtomicDir.commit(fs, dst)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** [[runAvailable]] with a bucketed snapshot-table sink: the 100 TB
    * variant. Instead of rewriting the whole occurrence table each
    * micro-batch, the batch's occurrence INCREMENT upserts through
    * [[graft.sinks.SnapshotMerge]] into a table hash-bucketed on
    * `live_recording_archive_id` (part of the merge key, so the
    * key→partition contract holds): only buckets holding new
    * occurrences are read or rewritten, untouched buckets carry
    * forward by manifest reference, and each batch commits with one
    * atomic pointer swap — a checkpoint-driven retry of a crashed
    * batch finds the previous snapshot intact and re-merges
    * idempotently (upsert on the unique key).
    */
  def runAvailableSnapshot(
      spark: SparkSession,
      transcriptsDir: String,
      checkpointDir: String,
      targetDir: String,
      songs: DataFrame,
      vtuberSongs: DataFrame,
      archives: DataFrame,
      threshold: Double = 40.0,
      buckets: Int = 64,
      compactAbove: Int = 16): Unit = {
    import org.apache.spark.sql.types._
    val tableSchema = StructType(Seq(
      StructField("song_id", LongType), StructField("vtuber_song_id", LongType),
      StructField("live_recording_archive_id", LongType),
      StructField("start", LongType), StructField("page", IntegerType),
      StructField("bucket", LongType)))
    val segments = readSegmentsStream(spark, transcriptsDir)
    val q = segments.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          import graft.sinks.{SnapshotMerge, SnapshotStore}
          // The fuzzy scan runs WITHOUT the skip guard; freshOnly then
          // anti-joins against ONLY the buckets the scan's output
          // touches (bucket is derived from the merge key, so an
          // already-recorded pair can live nowhere else) — the guard
          // must not re-read the whole accumulated table every batch.
          val inc = SnapshotMerge.freshOnly(spark, targetDir,
            Vcut.occurrenceScan(songs, vtuberSongs, archives, batch, threshold)
              .withColumn("bucket",
                pmod(col("live_recording_archive_id"), lit(buckets.toLong))),
            Seq("vtuber_song_id", "live_recording_archive_id"), Seq("bucket"))
          SnapshotMerge.upsertUpdate(spark, targetDir, inc,
            Seq("vtuber_song_id", "live_recording_archive_id"), Seq("bucket"))
          val store = new SnapshotStore(
            spark, new org.apache.hadoop.fs.Path(targetDir))
          // bound read fragmentation: a long-running stream commits a
          // new batch dir per micro-batch; once the manifest references
          // more than `compactAbove` batches, fold the small churn
          // batches together — the cold bulk of the table is never
          // rewritten from this hot loop
          store.compactIncremental(tableSchema, Seq("bucket"), compactAbove)
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
