package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Batch analytics over the `events` table — the batch twins of the
  * Structured Streaming operators in graft.streaming (same logical
  * results, so the streaming path can be validated against these and
  * the DuckDB oracle arbitrates both).
  */
object Events {

  private def $(name: String): Column = col(name)

  private def dsum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Tumbling 1-hour rollup per event type: count + exact value sum.
    * Streaming twin: groupBy(window($"ts", "1 hour"), $"event_type")
    * with a watermark.
    */
  def hourlyRollup(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("hour", $("ts")).as("hour"), $("event_type"))
      .agg(count(lit(1)).as("n"), dsum($("value")).as("sum_value"))

  /** Semi-structured props parsing: extract the numeric `k` property
    * from the JSON `props` string (regexp extraction — RE2-compatible,
    * so the oracle recomputes it; Spark's native `get_json_object` is
    * the drop-in for richer JSON) and aggregate it per event type.
    * Integer sums → exact cross-engine parity.
    */
  def propsKeyStats(events: DataFrame): DataFrame =
    events
      .withColumn("k",
        regexp_extract($("props"), "\"k\":\\s*(\\d+)", 1).cast("long"))
      .filter($("k").isNotNull)
      .groupBy($("event_type"))
      .agg(count(lit(1)).as("n"), sum($("k")).as("sum_k"),
        (sum($("k")).cast("double") / count(lit(1))).as("avg_k"))

  /** Gap-based sessionization: a new session starts when a user is
    * idle longer than `gapMinutes`. Classic prefix-sum over a window
    * partitioned by user — fully parallel across users, no driver
    * state. Streaming twin: flatMapGroupsWithState.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy($("user_id"))
      .orderBy($("ts").asc, $("event_id").asc)
    // integer microseconds: subsecond-exact and identical in the oracle
    // (unix_timestamp would truncate; DuckDB's epoch() is fractional)
    val gapMicros = gapMinutes * 60L * 1000000L
    val withNew = events
      .withColumn("prev_ts", lag($("ts"), 1).over(byUser))
      .withColumn("is_new",
        when($("prev_ts").isNull ||
          unix_micros($("ts")) - unix_micros($("prev_ts")) > gapMicros, 1L)
          .otherwise(0L))
    val withSession = withNew.withColumn("session_id",
      sum($("is_new")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
    withSession
      .groupBy($("user_id"), $("session_id"))
      .agg(
        min($("ts")).as("session_start"),
        max($("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        dsum($("value")).as("sum_value"))
  }
}
