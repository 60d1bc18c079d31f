package graft

import org.apache.spark.sql.streaming.OutputMode

import graft.operators.Events
import graft.streaming.EventStreams

/** Streaming twins vs batch operators on the real events fixture:
  * run the stream to completion over the static parquet and compare
  * with the batch result (which the DuckDB oracle already arbitrates).
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  // file stream sources need a DIRECTORY of (non-nanos) parquet: stage
  // the converted events table once
  private lazy val streamDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-stream").toString
    graft.sources.Tables(spark, dir).events.write.mode("overwrite").parquet(d)
    d
  }

  test("streaming hourly rollup == batch hourly rollup") {
    val tables = graft.sources.Tables(spark, dir)
    val stream = EventStreams.readEvents(spark, streamDir)
    // complete mode: emit all windows regardless of watermark, since
    // the static file is one batch (append would hold the tail back)
    val got = EventStreams.runToMemory(
      EventStreams.hourlyRollup(stream), "rollup_test", OutputMode.Complete())
      .select($"hour", $"event_type", $"n",
        $"sum_value".cast("decimal(18,2)").cast("double").as("sum_value"))
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    val want = Events.hourlyRollup(tables.events)
      .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    assert(got.size === want.size)
    // compare counts exactly; sums via the same decimal rounding
    assert(got.map(t => (t._1, t._2, t._3)) === want.map(t => (t._1, t._2, t._3)))
  }

  test("streaming sessionize == batch sessionize (single-batch case)") {
    val tables = graft.sources.Tables(spark, dir)
    val events = EventStreams.readEvents(spark, streamDir)
      .as[EventStreams.Event]
    val sessions = EventStreams.sessionize(events)
    val q = sessions.writeStream.outputMode("append")
      .format("memory").queryName("sess_test").start()
    try q.processAllAvailable() finally q.stop()
    // append mode only emits CLOSED sessions; every batch session that
    // closed (i.e., all but each user's last) must appear identically
    val got = spark.table("sess_test")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    val batch = Events.sessionize(tables.events)
    val lastPerUser = batch.groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.max($"session_id").as("last"))
    val closed = batch.join(lastPerUser, "user_id")
      .filter($"session_id" < $"last")
      .select("user_id", "session_id", "n_events")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === closed)
    assert(got.nonEmpty)
  }
}
