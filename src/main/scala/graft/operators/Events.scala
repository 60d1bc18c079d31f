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

  /** As-of join (point-in-time attribution): for each purchase event,
    * the latest click by the same user STRICTLY before it — the
    * q53-gated specialization of the generic [[AsOf.join]] (see its
    * Scaladoc for the tagged-union mechanics: strict `<` via the kind
    * sort, max-event_id tie resolution, inner semantics, and why zero
    * join nodes is the shape that survives a 100 TB event log). The
    * DuckDB oracle uses its native ASOF JOIN — an independent
    * formulation, which is what makes this pair a strong gate.
    */
  def clickAttribution(events: DataFrame,
      clickType: String = "click", purchaseType: String = "purchase"): DataFrame = {
    val purchases = events.filter($("event_type") === purchaseType)
      .select($("event_id"), $("user_id"), $("ts"))
    val clicks = events.filter($("event_type") === clickType)
      .select($("user_id"), $("ts"), $("event_id"))
    AsOf.join(purchases, clicks, key = "user_id",
        leftTs = "ts", rightTs = "ts", tieBreak = "event_id")
      .select($("event_id"), $("user_id"),
        $("right_event_id").as("click_id"), $("right_ts").as("click_ts"))
  }

  /** Interval (range) join: count and sum the events falling inside
    * each of `nWindows` analysis windows (`lenHours` long, opening
    * every `everyHours`, so windows may overlap and events may match
    * several) — the q54-gated specialization of the generic
    * [[RangeJoin.overlap]] (see its Scaladoc for the bucketization
    * mechanics and why the naive BETWEEN join is a nested loop).
    */
  def windowRollup(events: DataFrame, nWindows: Int = 64,
      everyHours: Int = 11, lenHours: Int = 6): DataFrame = {
    val spark = events.sparkSession
    // session tz is UTC (Verify/Bench/specs), so this literal is the
    // same instant the DuckDB oracle's naive TIMESTAMP '2024-01-01' is
    val windows = spark.range(nWindows.toLong).toDF("window_id")
      .withColumn("ws", expr(
        s"timestamp'2024-01-01 00:00:00' + make_interval(0,0,0,0, $everyHours * window_id)"))
      .withColumn("we", expr(s"ws + make_interval(0,0,0,0, $lenHours)"))
    RangeJoin.overlap(events, windows, pointTs = "ts",
        startTs = "ws", endTs = "we", bucketUs = lenHours * 3600L * 1000000L)
      .groupBy($("window_id"))
      .agg(count(lit(1)).as("n"), dsum($("value")).as("sum_value"))
  }

  /** Self interval join: for each purchase, ALL of the same user's
    * clicks within the last `horizonMinutes` (strictly before —
    * multi-match, unlike [[clickAttribution]]'s latest-only). Batch
    * twin of the stream-stream join showcase
    * (graft.streaming.EventStreams.recentClickJoin); delegates to
    * [[RangeJoin.overlap]] keyed on user_id, so the plan is a
    * hash-partitionable equi-join on (bucket, user) — never a
    * per-user cross product. gap_sec is an integer division of exact
    * microsecond longs (oracle-identical).
    */
  def recentClickJoin(events: DataFrame, horizonMinutes: Int = 60,
      clickType: String = "click", purchaseType: String = "purchase"): DataFrame = {
    val horizonUs = horizonMinutes * 60L * 1000000L
    val purchases = events.filter($("event_type") === purchaseType)
      .select($("event_id").as("purchase_id"), $("user_id"), $("ts"))
      .withColumn("wstart", expr(s"ts - interval $horizonMinutes minutes"))
    val clicks = events.filter($("event_type") === clickType)
      .select($("event_id").as("click_id"), $("user_id"),
        $("ts").as("click_ts"))
    // intervals = purchases' lookback windows [ts - horizon, ts);
    // points = clicks; equi-key = user_id
    RangeJoin.overlap(clicks, purchases, pointTs = "click_ts",
        startTs = "wstart", endTs = "ts", bucketUs = horizonUs,
        keys = Seq("user_id"), broadcastIntervals = false)
      .select($("purchase_id"), $("user_id"), $("click_id"),
        expr("(unix_micros(ts) - unix_micros(click_ts)) div 1000000")
          .as("gap_sec"))
  }

  /** Statistical outlier report: the `topK` most extreme values per
    * event type by |z-score|. The moments come from DECIMAL sums
    * (exact, order-independent) cast to double once, and the variance
    * uses the textbook `(Σx² − (Σx)²/n)/(n−1)` written identically in
    * the oracle — every double op is then IEEE-correctly-rounded on
    * identical inputs, so z-scores are bit-identical cross-engine
    * (same contract as dsum; `stddev_samp` would NOT be, its Welford
    * path is engine-specific). Ties: event_id asc.
    *
    * Scale: one partial-aggregated pass for the 5-row stats table
    * (broadcast back), then WindowGroupLimit keeps a topK heap per
    * partition before the per-type exchange — per-event z computation
    * never shuffles.
    *
    * Degenerate groups are excluded up front: a single-row type
    * (n−1 = 0) or a constant-valued type (variance 0) has no defined
    * z-score — Spark's non-ANSI double division would yield NULL where
    * DuckDB yields inf/NaN, so without the filter the ranking diverges
    * cross-engine exactly on those inputs. The same two predicates
    * appear in the oracle SQL.
    */
  def valueOutliers(events: DataFrame, topK: Int = 20): DataFrame = {
    val dec = $("value").cast(DecimalType(18, 2))
    val stats = events.groupBy($("event_type")).agg(
        count(lit(1)).as("n"),
        sum(dec).cast("double").as("s"),
        sum(dec * dec).cast("double").as("sq"))
      .filter($("n") > 1)
      .withColumn("mean", $("s") / $("n"))
      .withColumn("variance", ($("sq") - $("s") * $("s") / $("n")) / ($("n") - 1))
      .filter($("variance") > 0)
    val w = Window.partitionBy($("event_type"))
      .orderBy(abs($("z")).desc, $("event_id").asc)
    events.join(broadcast(stats), Seq("event_type"))
      .withColumn("z", ($("value") - $("mean")) / sqrt($("variance")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter($("rn") <= topK)
      .select($("event_type"), $("event_id"), $("value"), $("z"), $("rn"))
  }

  /** Sliding-frame aggregate (§2.8's remaining frame shape): per
    * user, the trailing 5-event mean and max of `value` in stream
    * order. DECIMAL window sums keep the mean exact (each frame's sum
    * is computed over ≤ 5 exact cents values — no running-double
    * drift), divided once by the frame's actual row count.
    */
  def movingStats(events: DataFrame, frame: Int = 5): DataFrame = {
    val w = Window.partitionBy($("user_id"))
      .orderBy($("ts").asc, $("event_id").asc)
      .rowsBetween(-(frame - 1), 0)
    events.select(
      $("event_id"), $("user_id"),
      (sum($("value").cast(DecimalType(18, 2))).over(w).cast("double") /
        count(lit(1)).over(w)).as("moving_avg"),
      max($("value").cast(DecimalType(18, 2))).over(w).cast("double")
        .as("moving_max"))
  }

  /** Fixed-width value histogram per event type: bin = floor(value /
    * width) over exact DECIMAL(18,2) values (float `floor(v/w)` at a
    * bin edge could land either side across engines; integer cents
    * divided integerly cannot). One partial-aggregated shuffle.
    */
  def valueHistogram(events: DataFrame, widthCents: Long = 200): DataFrame =
    events
      .withColumn("bin",
        expr(s"CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) div $widthCents"))
      .groupBy($("event_type"), $("bin"))
      .agg(count(lit(1)).as("n"))

  /** Robust outliers by median/MAD — the skew-proof sibling of
    * [[valueOutliers]] (whose mean/std are themselves dragged by the
    * outliers they hunt; one whale purchase can mask every other
    * anomaly of its type). Flags events with
    * |value − median| > k·MAD per event type, top-`topK` by absolute
    * deviation. ENTIRELY exact-integer: values in decimal cents, both
    * medians via the run-length/cumulative-rank rule
    * ([[graft.operators.Curation.lengthQuantiles]]'s machinery, lower
    * median rk = (n+1) div 2) — no floating point anywhere, so the
    * report hash-matches the oracle with no decimal gymnastics.
    *
    * Degenerate distributions: when ≥ half of a type's values are
    * identical its MAD is 0 and k·MAD flags everything off-median —
    * the textbook rule would either flag all deviation or (filtered
    * naively) suppress even a 10000× whale, the exact masking this
    * operator exists to fix. Here MAD=0 falls back to flagging any
    * absdev > 0: every departure from the (majority) median value of
    * such a type is anomalous by that type's own evidence.
    *
    * Scale: two run-length aggregates per type (map-side combined to
    * (type, value) rows — bounded by distinct cents values, not
    * events), medians join back BROADCAST (types-bounded), final
    * top-k is TakeOrderedAndProject.
    */
  def robustOutliers(events: DataFrame, k: Long = 3, topK: Int = 20): DataFrame = {
    def medianBy(df: DataFrame, vCol: String): DataFrame = {
      val runs = df.groupBy($("event_type"), col(vCol))
        .agg(count(lit(1)).as("c"))
      val byK = Window.partitionBy($("event_type"))
      val cum = Window.partitionBy($("event_type")).orderBy(col(vCol).asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      runs.withColumn("cum", sum($("c")).over(cum))
        .withColumn("n", sum($("c")).over(byK))
        .withColumn("rk", expr("(n + 1) div 2"))
        .filter($("rk") > $("cum") - $("c") && $("rk") <= $("cum"))
        .select($("event_type"), col(vCol).as("m"))
    }
    val cents = events.select($("event_type"), $("event_id"),
      expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)").as("cents"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val med = medianBy(cents, "cents")
      .withColumnRenamed("m", "med_cents")
    val dev = cents.join(broadcast(med), Seq("event_type"))
      .withColumn("absdev", abs($("cents") - $("med_cents")))
    val mad = medianBy(dev.select($("event_type"), $("absdev")), "absdev")
      .withColumnRenamed("m", "mad_cents")
    val result = dev.join(broadcast(mad), Seq("event_type"))
      .filter(($("mad_cents") > 0 && $("absdev") > lit(k) * $("mad_cents")) ||
        ($("mad_cents") === 0 && $("absdev") > 0))
      .select($("event_type"), $("event_id"), $("cents"),
        $("med_cents"), $("mad_cents"), $("absdev"))
      .orderBy($("absdev").desc, $("event_id").asc)
      .limit(topK)
      .localCheckpoint(true)
    cents.unpersist(false)
    result
  }

  /** Hour-of-day × event-type activity matrix via `pivot` — the
    * wide-format report shape. The pivot values are declared (the five
    * fixture types): an undeclared pivot scans once to discover them;
    * declaring keeps it a single-pass aggregate with one column per
    * type, and the output schema static for the oracle.
    */
  def hourlyTypePivot(events: DataFrame): DataFrame = {
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = events
      .withColumn("hod", hour($("ts")).cast("long"))
      .groupBy($("hod"))
      .pivot("event_type", types)
      .agg(count(lit(1)))
    // absent (hour, type) combos pivot to NULL; report 0 instead
    pivoted.select($("hod") +: types.map(t =>
      coalesce(col(t), lit(0L)).as(t)): _*)
  }

  /** CUBE over (event_type, day): counts at ALL four grouping levels
    * (detail, per-type, per-day, grand total) in one aggregation —
    * rollup's lattice sibling (see Curation.corpusRollup); gid
    * disambiguates levels.
    */
  def typeDayCube(events: DataFrame): DataFrame =
    events
      // STRING day: at cube levels the dimension is NULL, and a null
      // DATE round-trips as None vs NaT across parquet/pandas — a
      // null VARCHAR compares cleanly (same choice as corpusRollup's
      // string dims)
      .withColumn("day", to_date($("ts")).cast("string"))
      .cube($("event_type"), $("day"))
      .agg(count(lit(1)).as("n"), grouping_id().cast("long").as("gid"))

  /** Event-type transition matrix (first-order Markov counts): how
    * often event type A is immediately followed by type B within a
    * user's stream, plus terminal transitions to 'END'. One lag
    * window per user — the sessionize shuffle shape.
    */
  def typeTransitions(events: DataFrame): DataFrame = {
    val byUser = Window.partitionBy($("user_id"))
      .orderBy($("ts").asc, $("event_id").asc)
    events
      .withColumn("next_type", lead($("event_type"), 1).over(byUser))
      .groupBy($("event_type").as("from_type"),
        coalesce($("next_type"), lit("END")).as("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** Sessionized conversion funnel: of all gap-based sessions, how
    * many contain a view, a click after a view, and a purchase after
    * such a click — the classic ordered-step funnel. Single window
    * pass with running "seen" flags (a step counts only once every
    * earlier step has occurred, in stream order (ts, event_id) — no
    * self-joins, no per-step passes); the session grouping then
    * reuses the same user partitioning. Returns one row of step
    * counts.
    */
  def sessionFunnel(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy($("user_id"))
      .orderBy($("ts").asc, $("event_id").asc)
    val run = byUser.rowsBetween(Window.unboundedPreceding, 0)
    val gapMicros = gapMinutes * 60L * 1000000L
    val sessioned = events
      .withColumn("prev_ts", lag($("ts"), 1).over(byUser))
      .withColumn("is_new",
        when($("prev_ts").isNull ||
          unix_micros($("ts")) - unix_micros($("prev_ts")) > gapMicros, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($("is_new")).over(run))
    val bySession = Window
      .partitionBy($("user_id"), $("session_id"))
      .orderBy($("ts").asc, $("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val flagged = sessioned
      .withColumn("seen_view",
        max(when($("event_type") === "view", 1L).otherwise(0L)).over(bySession))
      .withColumn("is_cav",
        when($("event_type") === "click" && $("seen_view") === 1L, 1L).otherwise(0L))
      .withColumn("seen_cav", max($("is_cav")).over(bySession))
      .withColumn("is_pacav",
        when($("event_type") === "purchase" && $("seen_cav") === 1L, 1L).otherwise(0L))
    flagged
      .groupBy($("user_id"), $("session_id"))
      .agg(max($("seen_view")).as("has_view"),
        max($("is_cav")).as("has_cav"),
        max($("is_pacav")).as("has_pacav"))
      .agg(
        count(lit(1)).as("n_sessions"),
        sum($("has_view")).as("n_view"),
        sum($("has_cav")).as("n_view_click"),
        sum($("has_pacav")).as("n_view_click_purchase"))
  }

  /** Retention cohort matrix: users grouped by first-active day
    * (their cohort), counted on each later active day as an offset
    * from the cohort day — the classic product-analytics triangle.
    *
    * Scale: (user, day) activity dedups with map-side combine, the
    * cohort aggregate and the join both reuse the user_id keying, and
    * the final matrix is tiny (days × days). No text, no wide rows.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val activity = events
      .select($("user_id"), to_date($("ts")).as("day")).distinct()
    val cohorts = activity.groupBy($("user_id")).agg(min($("day")).as("cohort"))
    activity.join(cohorts, Seq("user_id"))
      .groupBy($("cohort"),
        datediff($("day"), $("cohort")).cast("long").as("day_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Rolling active users — (day, dau, wau): distinct users that day
    * and over the trailing `windowDays` — the engagement report every
    * product dashboard leads with. EXACT sliding-window distinct (no
    * HLL): the (user, day) activity table joins a broadcast day
    * spine over the window range, so each activity row fans out to at
    * most `windowDays` day rows — bounded expansion, then one
    * count_distinct per day.
    *
    * Scale: |days| is tiny (broadcast); what shuffles is
    * windowDays·|user-days| (user, day) pairs — linear in activity,
    * never in raw events (the distinct pre-aggregates first). For
    * very long windows, switch to mergeable sketches
    * ([[graft.operators.Curation.approxProfile]]'s HLL discipline) —
    * exactness is windowDays-priced.
    */
  def rollingActives(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val ud = events.select($("user_id"), to_date($("ts")).as("uday")).distinct()
    val days = ud.select($("uday").as("day")).distinct()
    ud.join(broadcast(days),
        $("uday") >= date_sub($("day"), windowDays - 1) &&
          $("uday") <= $("day"))
      .groupBy($("day"))
      .agg(
        count_distinct(when($("uday") === $("day"), $("user_id"))).as("dau"),
        count_distinct($("user_id")).as("wau"))
  }

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
