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
