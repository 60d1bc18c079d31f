package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar layer for the airline on-time domain (SURVEY.md §2.7).
  *
  * All functions are pure `Column` expressions — they stay inside
  * whole-stage codegen (no UDFs) and so cost nothing extra at 100 TB.
  *
  * References: /root/reference/README.md (R:<line>).
  */
object AirlineFunctions {

  /** F3 (R:513) — malformed-time repair. `DepTime` is local "HHmm" as
    * an integer 0..2400+ ; "some records have flight dates with hours
    * greater than 23, in which case a day is added to attempt to
    * rectify the malformed date". Returns struct(minutes, dayCarry):
    * minutes-since-midnight in [0, 1440) and the number of days to
    * carry forward (2400 → 00:00 next day; 2515 → 01:15 next day).
    */
  def repairedDepTime(depTime: Column): Column = {
    val raw = depTime.cast("int")
    val hh  = (raw / 100).cast("int")
    val mm  = (raw % 100).cast("int")
    val carry = (hh / 24).cast("int")
    struct(
      ((hh % 24) * 60 + mm).as("minutes"),
      carry.as("dayCarry"))
  }

  /** F4 (R:514) — scheduled local departure: `actual departure −
    * DepDelay` minutes, where actual departure = FlightDate + repaired
    * DepTime (with day carry from F3). Timestamp arithmetic is done in
    * seconds to stay codegen-friendly.
    */
  def scheduledDeparture(flightDate: Column, depTime: Column,
      depDelay: Column): Column = {
    val rep = repairedDepTime(depTime)
    val actualSecs = unix_timestamp(flightDate.cast("timestamp")) +
      (rep("dayCarry") * 86400L) + (rep("minutes") * 60L)
    timestamp_seconds(actualSecs - depDelay.cast("long") * 60L)
  }

  /** P4/F7 (R:436, R:546) — minutes-since-midnight of a timestamp, for
    * the before/after-noon leg predicates. Noon itself (720) is pinned
    * to the "after" side (see AirlineSpec — README says "before 12:00"
    * / "after 12:00" without fixing the boundary).
    */
  def minutesOfDay(ts: Column): Column = hour(ts) * 60 + minute(ts)

  /** F5 (R:507, R:521-531) — the reference's leg-schedule output
    * format.
    */
  def legTimestampFormat(ts: Column): Column =
    date_format(ts, "HH:mm dd/MM/yyyy")

  /** F8 (R:521-531) — `%.2f` delay rendering (e.g. `17.00`, `-14.00`). */
  def delayFormat(d: Column): Column = format_string("%.2f", d)

  /** F1 (R:201-202) — space-joined composite key, output formatting
    * only (grouping always uses real columns).
    */
  def compositeKey(cols: Column*): Column = concat_ws(" ", cols: _*)
}
