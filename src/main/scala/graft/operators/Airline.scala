package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.AirlineFunctions._

/** The reference's eight queries (R:141-575), re-expressed as
  * composable `DataFrame => DataFrame` transforms over the on-time
  * table (schema: graft.engine.Ingest.flightSchema).
  *
  * Group 1: top-10 airports by traffic (R:143-165), top-10 airlines by
  * on-time arrival (R:167-189).
  * Group 2: per-airport carrier ranking (R:191-243), per-airport dest
  * ranking (R:285-331), per-route carrier ranking (R:333-371).
  * Group 3: traffic frequency distribution (R:373-430) and the
  * two-leg trip planner "Tom's legs" (R:432-575).
  *
  * Ordering convention: "decreasing order of on-time performance" =
  * ASCENDING average delay (goldens R:179-185, R:206-239); ties break
  * on the key ascending (SURVEY.md §2.5).
  *
  * Scale: every transform is partial-agg → single shuffle (or a window
  * partitioned by a high-cardinality key); nothing collects to the
  * driver; the trip planner broadcasts the (small) request table.
  */
object Airline {

  private def $(name: String): Column = col(name)

  /** A1 (R:148-149) — each flight counts toward BOTH its Origin and
    * Dest airport: the Mapper's two emitted records become a 2-element
    * explode. Partial aggregation runs before the shuffle, so the
    * exchange carries (airport, partialCount) — ~few hundred keys —
    * regardless of input size.
    */
  def airportTraffic(flights: DataFrame): DataFrame =
    flights
      .select(explode(array($("Origin"), $("Dest"))).as("airport"))
      .where($("airport").isNotNull)
      .groupBy("airport").agg(count(lit(1)).as("cnt"))

  /** Group 1 Q1 / T1 (R:143-165) — top-10 airports by total traffic.
    * Physical plan: TakeOrderedAndProject (per-partition heap + driver
    * merge) — the reference's entire second MR job with its single
    * sorting reducer collapses into this one operator.
    */
  def top10Airports(flights: DataFrame): DataFrame =
    airportTraffic(flights)
      .orderBy($("cnt").desc, $("airport").asc)
      .limit(10)

  /** Group 1 Q2 / A2+T2 (R:167-189) — top-10 carriers by on-time
    * arrival performance: smallest average ArrDelay first.
    */
  def top10AirlinesOnTime(flights: DataFrame): DataFrame =
    flights
      .where($("ArrDelay").isNotNull && $("UniqueCarrier").isNotNull)
      .groupBy($("UniqueCarrier"))
      .agg(avg($("ArrDelay")).as("avg_arr_delay"))
      .orderBy($("avg_arr_delay").asc, $("UniqueCarrier").asc)
      .limit(10)

  /** T3 helper (R:195) — per-group top-k by ascending average delay:
    * `Top10ReducerByFloatV1` as a window. The window partitions on the
    * group key (airport / route): per-group sorts are tiny and fully
    * parallel across executors.
    */
  private def groupTopK(df: DataFrame, groupCols: Seq[String],
      valueCol: String, orderKeyCols: Seq[String], k: Int): DataFrame = {
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col(valueCol).asc +: orderKeyCols.map(col(_).asc): _*)
    df.withColumn("rank", row_number().over(w)).filter($("rank") <= k)
  }

  /** Group 2 Q1 / A3+T3 (R:191-243) — top-10 carriers by avg DepDelay
    * per origin airport.
    */
  def top10CarriersPerAirport(flights: DataFrame, k: Int = 10): DataFrame =
    groupTopK(
      flights.where($("DepDelay").isNotNull)
        .groupBy($("Origin"), $("UniqueCarrier"))
        .agg(avg($("DepDelay")).as("avg_dep_delay")),
      Seq("Origin"), "avg_dep_delay", Seq("UniqueCarrier"), k)

  /** Aggregator-based variant of top10CarriersPerAirport: same result
    * via the bounded-heap [[graft.functions.TopKAggregator]] instead
    * of a window sort. The scalable form when groups are huge; the
    * window form wins when per-group input is already small.
    * Differential-tested against the window version (AirlineSpec).
    */
  def top10CarriersPerAirportAgg(flights: DataFrame, k: Int = 10): DataFrame = {
    import graft.functions.TopKAggregator
    val spark = flights.sparkSession
    import spark.implicits._
    val agg = flights.where($("DepDelay").isNotNull)
      .groupBy($("Origin"), $("UniqueCarrier"))
      .agg(avg($("DepDelay")).as("avg_dep_delay"))
    agg.select($("Origin").as("origin"),
        struct($("UniqueCarrier").as("label"), $("avg_dep_delay").as("value")).as("e"))
      .as[(String, TopKAggregator.Entry)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(TopKAggregator.topKAsc(k).toColumn)
      .flatMap { case (origin, entries) =>
        entries.zipWithIndex.map { case (e, i) => (origin, e.label, e.value, i + 1) }
      }
      .toDF("Origin", "UniqueCarrier", "avg_dep_delay", "rank")
  }

  /** Group 2 Q2 / A3+T3 (R:285-331) — top-10 destination airports by
    * avg DepDelay per origin.
    */
  def top10DestPerAirport(flights: DataFrame, k: Int = 10): DataFrame =
    groupTopK(
      flights.where($("DepDelay").isNotNull)
        .groupBy($("Origin"), $("Dest"))
        .agg(avg($("DepDelay")).as("avg_dep_delay")),
      Seq("Origin"), "avg_dep_delay", Seq("Dest"), k)

  /** Group 2 Q3 / A4+T3 (R:333-371) — top-10 carriers by avg ArrDelay
    * per (origin, dest) route.
    */
  def top10CarriersPerRoute(flights: DataFrame, k: Int = 10): DataFrame =
    groupTopK(
      flights.where($("ArrDelay").isNotNull)
        .groupBy($("Origin"), $("Dest"), $("UniqueCarrier"))
        .agg(avg($("ArrDelay")).as("avg_arr_delay")),
      Seq("Origin", "Dest"), "avg_arr_delay", Seq("UniqueCarrier"), k)

  /** Group 3 Q1 / T4 (R:373-401) — airport traffic frequencies,
    * globally sorted descending (input to the distribution fit,
    * R:403-430). The custom `DescendingIntegerComparator` is just
    * `.desc`; the global sort is a distributed range-partitioned sort.
    */
  def sortedFrequencies(flights: DataFrame): DataFrame =
    airportTraffic(flights).select($("cnt")).orderBy($("cnt").desc)

  /** A5 (R:446-454) — distinct airports from both roles. */
  def airports(flights: DataFrame): DataFrame =
    flights
      .select(explode(array($("Origin"), $("Dest"))).as("airport"))
      .where($("airport").isNotNull)
      .distinct()

  /** J3 (R:456-483) — all (origin, stop, dest) triplets with
    * stop ≠ origin and stop ≠ dest (origin MAY equal dest, R:458).
    * Inputs are the (small) distinct-airport dim — Spark broadcasts
    * it; the reference needed an external combinatorics library in a
    * single reducer.
    */
  def originStopDest(airports: DataFrame): DataFrame = {
    val a = airports.select($("airport").as("origin"))
    val b = airports.select($("airport").as("stop"))
    val c = airports.select($("airport").as("dest"))
    a.crossJoin(b).crossJoin(c)
      .filter($("stop") =!= $("origin") && $("stop") =!= $("dest"))
  }

  /** J4 (R:485-503) — triplets × every day of 2008 (366, leap year).
    * `maxRequests` mirrors the reference's own dev-time limit (R:500):
    * the full cross product is combinatorially huge by design; the
    * primary path treats requests as an input table (SURVEY.md §3.2).
    */
  def generateRequests(triplets: DataFrame, maxRequests: Long = 100000L): DataFrame =
    triplets
      .crossJoin(
        triplets.sparkSession.range(1).select(
          explode(sequence(
            to_date(lit("2008-01-01")), to_date(lit("2008-12-31")),
            expr("interval 1 day"))).as("request_date")))
      .limit(if (maxRequests > Int.MaxValue) Int.MaxValue else maxRequests.toInt)

  /** P1+P3+F3+F4 (R:505-534) — leg candidates: 2008 flights with the
    * derived scheduled local departure (= actual DepTime − DepDelay,
    * with malformed-hour repair). All expression work — fused into the
    * scan stage by Catalyst; the year filter prunes partitions.
    */
  def legCandidates(flights: DataFrame): DataFrame =
    flights
      .where(year($("FlightDate")) === 2008 &&
        $("ArrDelay").isNotNull && $("DepDelay").isNotNull &&
        $("DepTime").isNotNull)
      .withColumn("sched_dep",
        scheduledDeparture($("FlightDate"), $("DepTime"), $("DepDelay")))
      .select($("FlightDate"), $("UniqueCarrier"), $("FlightNum"),
        $("Origin"), $("Dest"), $("sched_dep"), $("ArrDelay"))

  /** Group 3 Q2 / J1+J2+P4+F6 (R:432-575) — the two-leg trip planner.
    *
    * For each request (origin, stop, dest, request_date):
    *   leg 1: origin→stop departing request_date BEFORE noon;
    *   leg 2: stop→dest departing request_date + 2 days AFTER noon
    *          (the reference normalizes "+2 days" into the join key
    *          map-side, R:542-543 — here a derived equi-join key);
    *   per leg keep the candidate with least ArrDelay (constraint c,
    *   R:549), tiebreak (carrier, flightNum, sched_dep) for a total
    *   order.
    *
    * Requests are typically tiny vs flights → broadcast joins; the
    * argmin is `min_by` (hash-agg, partial-combinable, no sort).
    * Noon boundary pinned: leg1 strictly before 720 min, leg2 at/after
    * 720 (README says "before"/"after 12:00" without fixing 12:00
    * itself; AirlineSpec pins this).
    *
    * `broadcastRequests = false` drops the broadcast hint for a
    * GENERATED request table (the q13 full cross × date-dim shape) too
    * large to ship to every executor — the joins then fall back to
    * Catalyst's choice (shuffle joins on the equi-keys), same rows.
    */
  def bestLegs(requests: DataFrame, legs: DataFrame,
      broadcastRequests: Boolean = true): DataFrame = {
    // Request columns are renamed req_* internally: Spark resolves
    // column names case-insensitively by default, so `origin` (request)
    // vs `Origin` (leg) would be ambiguous after the join.
    val projected = requests.select(
      $("origin").as("req_origin"), $("stop").as("req_stop"),
      $("dest").as("req_dest"), $("request_date").as("req_date"))
    val reqs = if (broadcastRequests) broadcast(projected) else projected

    val reqKey = Seq("req_origin", "req_stop", "req_dest", "req_date")
    val ord = struct($("ArrDelay"), $("UniqueCarrier"), $("FlightNum"), $("sched_dep"))
    val pick = min_by(struct(Seq("UniqueCarrier", "FlightNum", "Origin",
      "Dest", "sched_dep", "ArrDelay").map(col): _*), ord)

    val leg1Cand = legs.filter(minutesOfDay($("sched_dep")) < 720)
    val leg2Cand = legs.filter(minutesOfDay($("sched_dep")) >= 720)

    val leg1 = reqs.join(leg1Cand,
        leg1Cand("Origin") === $("req_origin") &&
        leg1Cand("Dest") === $("req_stop") &&
        leg1Cand("FlightDate") === $("req_date"))
      .groupBy(reqKey.map(col): _*)
      .agg(pick.as("leg1"))

    val leg2 = reqs.join(leg2Cand,
        leg2Cand("Origin") === $("req_stop") &&
        leg2Cand("Dest") === $("req_dest") &&
        leg2Cand("FlightDate") === date_add($("req_date"), 2))
      .groupBy(reqKey.map(col): _*)
      .agg(pick.as("leg2"))

    leg1.join(leg2, reqKey)
      .select($("req_origin").as("origin"), $("req_stop").as("stop"),
        $("req_dest").as("dest"), $("req_date").as("request_date"),
        $("leg1"), $("leg2"))
  }

  /** Output formatting for bestLegs per the goldens (R:553-571):
    * leg timestamps as `HH:mm dd/MM/yyyy`, delays as `%.2f`.
    */
  def formatBestLegs(best: DataFrame): DataFrame = {
    def legOut(l: String) = Seq(
      col(s"$l.UniqueCarrier").as(s"${l}_carrier"),
      col(s"$l.FlightNum").as(s"${l}_flightnum"),
      col(s"$l.Origin").as(s"${l}_origin"),
      col(s"$l.Dest").as(s"${l}_dest"),
      legTimestampFormat(col(s"$l.sched_dep")).as(s"${l}_sched_dep"),
      delayFormat(col(s"$l.ArrDelay")).as(s"${l}_arr_delay"))
    best.select(
      Seq($("origin"), $("stop"), $("dest"), $("request_date")) ++
        legOut("leg1") ++ legOut("leg2"): _*)
  }
}
