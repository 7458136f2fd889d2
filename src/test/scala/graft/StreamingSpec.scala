package graft

import org.apache.spark.sql.functions._
import graft.streaming.EventsStream

/** Streaming ≡ batch equivalence on the events fixture: the Structured
  * Streaming slices must produce the same rollups as their batch
  * counterparts (q24 / q23) once all input is processed. */
class StreamingSpec extends SparkTestBase {
  import spark.implicits._

  private def eventsDir: String = {
    // stream source dir containing just the events parquet
    val tmp = java.nio.file.Files.createTempDirectory("events_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      tmp.resolve("events.parquet"))
    tmp.toString
  }

  test("streaming hourly counts equal the batch rollup") {
    val q = EventsStream.hourlyCounts(EventsStream.readEvents(spark, eventsDir))
      .writeStream.format("memory").queryName("hourly")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("hourly")
      .select("hour_start", "event_type", "n_events")
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    val batch = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("h"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(streamed == batch)
  }

  test("streaming sessionizer closes batch-q23 sessions minus the open tail") {
    val src = EventsStream.readEvents(spark, eventsDir)
      .select(col("event_id"), unix_micros(col("ts")).as("ts"), col("user_id"))
      .as[EventsStream.Evt]
    val q = EventsStream.sessionize(src).writeStream
      .format("memory").queryName("sessions").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()

    val closedPerUser = spark.table("sessions")
      .groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batchPerUser = graft.ops.Windows.q23(spark, sfDir)
      .groupBy("user_id").agg(max(col("session_id")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batchPerUser.nonEmpty)
    batchPerUser.foreach { case (u, n) =>
      // all events arrive in one micro-batch → every session except the
      // still-open tail must have been emitted as closed
      assert(closedPerUser.getOrElse(u, 0L) == n - 1,
        s"user $u: closed=${closedPerUser.getOrElse(u, 0L)} batch=$n")
    }
  }
}
