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
// Serializable: the sessionize closure calls tsOfMicros on this object,
// so the object itself rides along in the flatMapGroupsWithState task.
object EventStreams extends Serializable {

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

  /** Windowed hot-key monitor — the streaming twin of
    * `SkewJoin.keySkewProfile` for live pipelines: per tumbling
    * window, per key, the exact row count (append-emitted once the
    * watermark passes). The rank/top-k read deliberately happens
    * DOWNSTREAM (foreachBatch or the serving store): an in-flight
    * global rank would force complete-mode state over the whole key
    * space, which is exactly the unbounded-state shape streaming
    * operators here avoid. State is (in-flight windows × keys seen in
    * them), watermark-bounded.
    */
  def hotKeys(events: DataFrame, keyCol: String = "user_id",
      windowLen: String = "1 hour", watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen),
        col(keyCol).cast("string").as("key_value"))
      .agg(count(lit(1)).as("n_rows"))
      .select(col("window.start").as("window_start"), col("key_value"),
        col("n_rows"))

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double, props: String)

  final case class SessionState(sessionId: Long, lastTs: Long,
      start: Long, n: Long, sum: Double)

  final case class SessionOut(user_id: Long, session_id: Long,
      session_start: Timestamp, session_end: Timestamp,
      n_events: Long, sum_value: Double)

  /** Microsecond-exact Timestamp from epoch micros. `new Timestamp(ms)`
    * alone would truncate to millis and diverge from the batch twin
    * (whose parquet fixture carries micros); setNanos replaces the
    * whole fractional second, so the constructor gets second-floored
    * millis first.
    */
  private def tsOfMicros(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Gap-based sessionization via flatMapGroupsWithState — streaming
    * twin of Events.sessionize. Emits a session when a new event
    * arrives more than `gapMinutes` after the previous one, or when
    * the user's state times out (event-time watermark passes
    * last-event + gap): the open session is flushed and its state
    * removed, so state size stays O(users active within the watermark
    * horizon), not O(all users ever seen).
    *
    * After a timeout flush, a user reappearing restarts session ids at
    * 1 (the state — including the id counter — was dropped; keeping it
    * would mean per-user state never shrinks, the exact leak the
    * timeout exists to prevent).
    *
    * Within a micro-batch, events for a user are sorted by (ts,
    * event_id) before folding — same total order as the batch twin.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      watermarkDelay: String = "2 hours"): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val gapMillis = gapMinutes * 60L * 1000L

    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L

    def emit(userId: Long, st: SessionState): SessionOut =
      SessionOut(userId, st.sessionId,
        tsOfMicros(st.start), tsOfMicros(st.lastTs), st.n, st.sum)

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // idle user: flush the open session, drop the state
            val st = state.get
            state.remove()
            Iterator.single(emit(userId, st))
          } else {
            val sorted = it.toSeq.sortBy(e => (micros(e.ts), e.event_id))
            var st = state.getOption.orNull
            val out = Seq.newBuilder[SessionOut]
            for (e <- sorted) {
              val t = micros(e.ts)
              if (st == null) {
                st = SessionState(1L, t, t, 1L, e.value)
              } else if (t - st.lastTs > gapMicros) {
                out += emit(userId, st)
                st = SessionState(st.sessionId + 1L, t, t, 1L, e.value)
              } else {
                st = st.copy(lastTs = t, n = st.n + 1L, sum = st.sum + e.value)
              }
            }
            if (st != null) {
              state.update(st)
              // flush when the watermark passes the session's gap edge;
              // must exceed the current watermark or Spark rejects it
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs + 1,
                Math.floorDiv(st.lastTs, 1000L) + gapMillis))
            }
            out.result().iterator
          }
      }
  }

  final case class AttributionOut(event_id: Long, user_id: Long,
      click_id: Long, click_ts: Timestamp)

  final case class ClickState(clickId: Long, ts: Long)

  /** Streaming as-of attribution — incremental twin of
    * Events.clickAttribution. Per-user state is just the LATEST click
    * (one row), updated as clicks arrive; each purchase emits
    * immediately with the current state if that click is strictly
    * earlier. Within a micro-batch events fold in (ts, kind, event_id)
    * order with purchases before clicks at equal ts — the same total
    * order that encodes the strict `<` in the batch twin — and
    * same-ts clicks resolve to the max event_id.
    *
    * State is dropped once `stateTtlMinutes` of event time pass the
    * last click (EventTimeTimeout), so state size is O(users active
    * within the horizon). Consequences, both inherent to
    * single-pass streaming: a click landing later than the watermark
    * delay cannot attribute purchases that already streamed through,
    * and a purchase arriving after a longer idle gap than the horizon
    * finds no click state (the batch twin attributes arbitrarily far
    * back). Both twins agree on in-horizon data — StreamingSpec pins
    * the equivalence.
    */
  def clickAttribution(events: Dataset[Event],
      watermarkDelay: String = "2 hours", stateTtlMinutes: Int = 120,
      clickType: String = "click", purchaseType: String = "purchase")
      : Dataset[AttributionOut] = {
    import events.sparkSession.implicits._
    def micros(t: Timestamp): Long = t.getTime * 1000L + (t.getNanos / 1000L) % 1000L
    events
      .filter(e => e.event_type == clickType || e.event_type == purchaseType)
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[ClickState, AttributionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, it: Iterator[Event], state: GroupState[ClickState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            // purchases (kind 0) before clicks (kind 1) at equal ts
            val sorted = it.toSeq.sortBy(e =>
              (micros(e.ts), if (e.event_type == clickType) 1 else 0, e.event_id))
            var st = state.getOption.orNull
            val out = Seq.newBuilder[AttributionOut]
            for (e <- sorted) {
              val t = micros(e.ts)
              if (e.event_type == clickType) {
                // latest click wins; same-ts clicks resolve to max id
                if (st == null || t > st.ts || (t == st.ts && e.event_id > st.clickId))
                  st = ClickState(e.event_id, t)
              } else if (st != null && st.ts < t) {
                out += AttributionOut(e.event_id, userId, st.clickId, tsOfMicros(st.ts))
              }
            }
            if (st != null) {
              state.update(st)
              // keep the click state for stateTtlMinutes of EVENT time
              // past the click; must exceed the current watermark or
              // Spark rejects the timestamp
              state.setTimeoutTimestamp(math.max(
                state.getCurrentWatermarkMs + 1,
                Math.floorDiv(st.ts, 1000L) + stateTtlMinutes * 60000L))
            }
            out.result().iterator
          }
      }
  }

  /** Stream-stream interval join — the canonical Structured Streaming
    * two-stream pattern: purchases joined to the same user's clicks of
    * the last `horizonMinutes`, both sides watermarked so Spark can
    * bound the join state (clicks older than the horizon + watermark
    * delay are evicted; without the time-range condition the state
    * would grow forever and Spark rejects the append-mode query).
    * Incremental twin of [[graft.operators.Events.recentClickJoin]];
    * multi-match, unlike [[clickAttribution]]'s latest-only state.
    */
  def recentClickJoin(events: DataFrame, horizonMinutes: Int = 60,
      watermarkDelay: String = "2 hours"): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", watermarkDelay)
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", watermarkDelay)
    purchases.join(clicks,
        col("c_user") === col("user_id") &&
          col("click_ts") < col("p_ts") &&
          col("click_ts") >= col("p_ts") - expr(s"interval $horizonMinutes minutes"))
      .select(col("purchase_id"), col("user_id"), col("click_id"),
        expr("(unix_micros(p_ts) - unix_micros(click_ts)) div 1000000")
          .as("gap_sec"))
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
