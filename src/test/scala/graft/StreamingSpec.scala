package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventStreams

/** Streaming/batch parity: the streaming tumbling aggregation must
  * produce exactly the batch `ev_tumbling` result when drained with
  * AvailableNow, and keyed state must reproduce a batch groupBy.
  */
class StreamingSpec extends SparkFunSuite {

  /** File streams consume directories: stage the single events
    * parquet into one.
    */
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("streaming tumbling window == batch ev_tumbling") {
    val stream = EventStreams.tumblingCounts(
      EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.drainToMemory(spark, stream, "tumbling_out")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val want = SparkEntry.queries("ev_tumbling")(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got == want)
  }

  test("streaming session windows emit a correct subset of batch sessions") {
    import org.apache.spark.sql.streaming.OutputMode
    val stream = EventStreams.sessionCounts(
      EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.drainToMemory(spark, stream, "session_out",
      OutputMode.Append())
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val want = SparkEntry.queries("ev_session")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    // append mode withholds sessions the watermark hasn't closed (the
    // tail of the data) — everything emitted must match batch exactly
    assert(got.nonEmpty, "watermark should have closed most sessions")
    got.foreach { case (k, v) =>
      assert(want.get(k).contains(v), s"streamed session $k -> $v not in batch result")
    }
    assert(got.size >= want.size / 2,
      s"only ${got.size}/${want.size} sessions emitted")
  }

  test("foreachBatch streaming MERGE upserts idempotently") {
    import spark.implicits._
    val targetDir = java.nio.file.Files.createTempDirectory("merge_target")
      .toString + "/t"
    // seed target: event 0 with a stale value, plus a row the stream
    // never touches
    Seq((0L, -1.0), (-42L, 7.0)).toDF("event_id", "value")
      .write.parquet(targetDir)
    val incoming = EventStreams.readEvents(spark, eventsDir)
      .select(org.apache.spark.sql.functions.col("event_id"),
        org.apache.spark.sql.functions.col("value"))
    EventStreams.upsertStream(spark, incoming, targetDir, Seq("event_id"))
    val merged = spark.read.parquet(targetDir)
    val batch = Tables.load(spark, sfDir, "events")
    assert(merged.count() == batch.count() + 1) // untouched row survives
    val v0 = merged.where($"event_id" === 0L).select("value").as[Double].collect()(0)
    val want0 = batch.where($"event_id" === 0L)
      .select("value").as[Double].collect()(0)
    assert(v0 == want0) // stale value overwritten by the stream
    assert(merged.where($"event_id" === -42L).count() == 1)
  }

  test("mapGroupsWithState running counts == batch groupBy count") {
    import org.apache.spark.sql.streaming.OutputMode
    val counts = EventStreams.userRunningCounts(
      spark, EventStreams.readEvents(spark, eventsDir))
    val got = EventStreams.drainToMemory(
      spark, counts.toDF("user_id", "n"), "state_out", OutputMode.Update())
      // multiple micro-batches emit running values: keep the max per user
      .groupBy(col("user_id")).agg(max(col("n")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Tables.load(spark, sfDir, "events")
      .groupBy(col("user_id")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }
}
