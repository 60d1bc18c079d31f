package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.StarQueries
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps every implemented operator from SURVEY.md §2 to a
  * runnable DataFrame; `oracleSql` gives the DuckDB-equivalent SQL the
  * driver hash-compares against. Column names, types, and row order are
  * part of the contract (see StarQueries' determinism notes).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    StarQueries.q01PricingSummary(Tables(spark, "/root/testdata/sf0.001"))

  private def q(f: Tables => DataFrame): (SparkSession, String) => DataFrame =
    (s, dir) => f(Tables(s, dir))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"   -> q(StarQueries.q01PricingSummary),   // A2
    "q02_explode_count"     -> q(StarQueries.q02ExplodeCount),     // A1
    "q03_distinct_keys"     -> q(StarQueries.q03DistinctKeys),     // A5
    "q04_top10_by_count"    -> q(StarQueries.q04Top10ByCount),     // T1
    "q05_top10_avg_asc"     -> q(StarQueries.q05Top10AvgAsc),      // T2
    "q06_avg_by_pair"       -> q(StarQueries.q06AvgByPair),        // A3
    "q07_avg_by_triple"     -> q(StarQueries.q07AvgByTriple),      // A4
    "q08_group_topk"        -> q(StarQueries.q08GroupTopK),        // T3
    "q09_freq_sorted"       -> q(StarQueries.q09FreqSorted),       // T4
    "q10_join_argmin"       -> q(StarQueries.q10JoinArgmin),       // J1+J2/A6
    "q11_derived_key_join"  -> q(StarQueries.q11DerivedKeyJoin),   // F6+J1
    "q12_triplets"          -> q(StarQueries.q12Triplets),         // J3
    "q13_requests"          -> q(StarQueries.q13Requests),         // J4
    "q14_union_tag"         -> q(StarQueries.q14UnionTag),         // §2.6
    "q15_date_functions"    -> q(StarQueries.q15DateFunctions),    // F2/F5/F6/F8
    "q16_filter_pushdown"   -> q(StarQueries.q16FilterPushdown),   // P1-P3
    "q17_serving_lookup"    -> q(StarQueries.q17ServingLookup),    // S8+S9
    "q18_set_ops"           -> q(StarQueries.q18SetOps),           // §2.6
    "q19_moving_stats"      -> q(t =>                              // §2.8 frames
      graft.operators.Events.movingStats(t.events)),
  ) ++ TrainingEntries.queries ++ AirlineEntries.queries

  private val exqtySum  = "CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)"
  private val exprcSum  = "CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)"
  private val explodedKeys =
    "(SELECT l_partkey AS key FROM lineitem UNION ALL SELECT l_suppkey FROM lineitem)"

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q01_pricing_summary" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  $exqtySum AS sum_qty,
         |  $exprcSum AS sum_base_price,
         |  $exqtySum / COUNT(*) AS avg_qty,
         |  $exprcSum / COUNT(*) AS avg_price,
         |  COUNT(*) AS count_order
         |FROM lineitem GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_explode_count" ->
      s"""SELECT key, COUNT(*) AS cnt FROM $explodedKeys
         |GROUP BY key ORDER BY cnt DESC, key ASC""".stripMargin,
    "q03_distinct_keys" ->
      s"SELECT DISTINCT key FROM $explodedKeys ORDER BY key",
    "q04_top10_by_count" ->
      s"""SELECT key, COUNT(*) AS cnt FROM $explodedKeys
         |GROUP BY key ORDER BY cnt DESC, key ASC LIMIT 10""".stripMargin,
    "q05_top10_avg_asc" ->
      s"""SELECT l_suppkey, $exqtySum / COUNT(*) AS avg_qty
         |FROM lineitem GROUP BY l_suppkey
         |ORDER BY avg_qty ASC, l_suppkey ASC LIMIT 10""".stripMargin,
    "q06_avg_by_pair" ->
      s"""SELECT l_suppkey, l_returnflag, $exqtySum / COUNT(*) AS avg_qty
         |FROM lineitem GROUP BY l_suppkey, l_returnflag
         |ORDER BY l_suppkey, l_returnflag""".stripMargin,
    "q07_avg_by_triple" ->
      s"""SELECT l_suppkey, l_returnflag, l_linestatus, $exqtySum / COUNT(*) AS avg_qty
         |FROM lineitem GROUP BY l_suppkey, l_returnflag, l_linestatus
         |ORDER BY l_suppkey, l_returnflag, l_linestatus""".stripMargin,
    "q08_group_topk" ->
      s"""SELECT l_suppkey, l_partkey, avg_qty, rn FROM (
         |  SELECT l_suppkey, l_partkey, avg_qty,
         |    CAST(row_number() OVER (PARTITION BY l_suppkey
         |      ORDER BY avg_qty ASC, l_partkey ASC) AS BIGINT) AS rn
         |  FROM (SELECT l_suppkey, l_partkey, $exqtySum / COUNT(*) AS avg_qty
         |        FROM lineitem GROUP BY l_suppkey, l_partkey)
         |) WHERE rn <= 5 ORDER BY l_suppkey, rn""".stripMargin,
    "q09_freq_sorted" ->
      s"""SELECT cnt, COUNT(*) AS n_keys FROM (
         |  SELECT key, COUNT(*) AS cnt FROM $explodedKeys GROUP BY key
         |) GROUP BY cnt ORDER BY cnt DESC""".stripMargin,
    "q10_join_argmin" ->
      """SELECT o_orderkey, o_orderdate, l_partkey, l_shipdate, l_linenumber FROM (
        |  SELECT o.o_orderkey, o.o_orderdate, l.l_partkey, l.l_shipdate, l.l_linenumber,
        |    row_number() OVER (PARTITION BY o.o_orderkey
        |      ORDER BY l.l_shipdate, l.l_linenumber, l.l_partkey) AS rn
        |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |) WHERE rn = 1 ORDER BY o_orderkey""".stripMargin,
    "q11_derived_key_join" ->
      """SELECT o_orderkey, l_linenumber, l_shipdate
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  AND l.l_shipdate = o.o_orderdate + INTERVAL 60 DAY
        |ORDER BY o_orderkey, l_linenumber""".stripMargin,
    "q12_triplets" ->
      """SELECT a.n_name AS origin, b.n_name AS stop, c.n_name AS dest
        |FROM nation a CROSS JOIN nation b CROSS JOIN nation c
        |WHERE b.n_name <> a.n_name AND b.n_name <> c.n_name
        |ORDER BY origin, stop, dest""".stripMargin,
    "q13_requests" ->
      """SELECT origin, stop, dest, CAST(g AS DATE) AS request_date
        |FROM (SELECT a.r_name AS origin, b.r_name AS stop, c.r_name AS dest
        |      FROM region a CROSS JOIN region b CROSS JOIN region c
        |      WHERE b.r_name <> a.r_name AND b.r_name <> c.r_name)
        |CROSS JOIN generate_series(TIMESTAMP '2008-01-01',
        |  TIMESTAMP '2008-12-31', INTERVAL 1 DAY) t(g)
        |ORDER BY origin, stop, dest, request_date""".stripMargin,
    "q14_union_tag" ->
      """SELECT * FROM (
        |  SELECT c_custkey AS key, c_name AS name, c_acctbal AS acctbal,
        |    'customer' AS tag FROM customer
        |  UNION ALL
        |  SELECT s_suppkey, s_name, s_acctbal, 'supplier' FROM supplier
        |) ORDER BY tag, key""".stripMargin,
    "q15_date_functions" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS o_year,
        |  CAST(month(o_orderdate) AS BIGINT) AS o_month,
        |  CAST(o_orderdate + INTERVAL 2 DAY AS DATE) AS plus2,
        |  strftime(o_orderdate, '%H:%M %d/%m/%Y') AS sched_fmt,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q16_filter_pushdown" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE year(l_shipdate) = 1997 AND l_quantity < 10
        |  AND l_returnflag IS NOT NULL
        |ORDER BY l_orderkey, l_linenumber, l_quantity""".stripMargin,
    "q17_serving_lookup" ->
      """SELECT o_orderkey,
        |  CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS price_str,
        |  o_orderpriority
        |FROM orders WHERE o_orderpriority = '1-URGENT'
        |ORDER BY o_orderkey""".stripMargin,
    "q18_set_ops" ->
      """WITH c AS (SELECT user_id FROM events WHERE event_type = 'click'
        |             AND CAST(ts AS DATE) = DATE '2024-01-01'),
        |p AS (SELECT user_id FROM events WHERE event_type = 'purchase'
        |        AND CAST(ts AS DATE) = DATE '2024-01-01')
        |SELECT user_id, 'both' AS tag FROM (SELECT * FROM c INTERSECT SELECT * FROM p)
        |UNION ALL
        |SELECT user_id, 'click_only' AS tag FROM (SELECT * FROM c EXCEPT SELECT * FROM p)
        |ORDER BY tag, user_id""".stripMargin,
    "q19_moving_stats" ->
      """SELECT event_id, user_id,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
        |    / COUNT(*) OVER w AS moving_avg,
        |  CAST(MAX(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS moving_max
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,
  ) ++ TrainingEntries.oracleSql ++ AirlineEntries.oracleSql
}
