package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.operators.OrderedOut._

/** Mergeable frequency sketches for corpus profiling — the count-min
  * sketch (Cormode & Muthukrishnan 2005) as a relational artifact.
  *
  * The reference's rank/frequency pipelines (R:151, zipf.py R:403-430)
  * compute exact token counts; at 100 TB a pipeline often wants a
  * CONSTANT-SIZE summary it can merge across shards/days instead: the
  * CMS is `depth × width` counters, every update touches `depth`
  * cells, point queries return min over the row cells —
  * overestimates only, by ≤ εN with probability 1−δ for
  * width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * Determinism contract (the repo-wide discipline): the `depth` hash
  * functions derive from md5 of `"row:token"` — identical hex in
  * Spark and DuckDB, seedless, shard-order-free — so both the sketch
  * table and the estimates are hash-gated against the oracle.
  *
  * Scale design: the token stream partial-aggregates to the TYPE
  * table first (map-side combine on the only corpus-sized pass), and
  * the ×depth expansion happens on the vocabulary-sized type table,
  * not on the raw token stream — the sketch build adds one
  * vocabulary-bounded aggregate to [[TextAnalysis.vocabulary]]'s
  * plan. The sketch itself is depth·width rows (constant), hence
  * broadcastable to any probe site; union-merging sketches from two
  * corpora is a groupBy(row, col) SUM — the property that makes CMS
  * the per-shard/per-day profile format at warehouse scale.
  */
object Sketches {

  private def $(name: String): Column = col(name)

  /** The CMS cell coordinate of `tok` under hash row `row`: first 8
    * md5 hex chars of `"row:tok"` mod `width` (the [[Curation.hashBucket]]
    * family, keyed per row).
    */
  def cmsCol(row: Column, tok: Column, width: Int): Column =
    conv(substring(md5(concat(row.cast("string"), lit(":"), tok)), 1, 8),
      16, 10).cast("long") % width

  private def typeTable(documents: DataFrame): DataFrame =
    TextAnalysis.tokens(documents)
      .groupBy($("token")).agg(count(lit(1)).as("n"))

  private def cmsFromTypes(types: DataFrame, depth: Int,
      width: Int): DataFrame = {
    val rows = explode(array((0 until depth).map(lit(_)): _*)).as("row")
    types
      .select($("token"), $("n"), rows)
      .select($("row").cast("long").as("row"),
        cmsCol($("row"), $("token"), width).as("col"), $("n"))
      .groupBy($("row"), $("col"))
      .agg(sum($("n")).as("cnt"))
  }

  /** Build the sketch: (row, col, cnt) with cnt = Σ counts of all
    * tokens hashing to (row, col). At most depth·width rows (dense
    * cells only — absent cells are zero).
    */
  def cmsTable(documents: DataFrame, depth: Int = 4,
      width: Int = 1024): DataFrame =
    cmsFromTypes(typeTable(documents), depth, width)

  /** Heavy-hitter report: the exact top-`topK` tokens by corpus count
    * next to their CMS estimates — (token, exact_n, est_n) with
    * est_n ≥ exact_n always (CMS never undercounts). The table a
    * pipeline reads to decide whether the constant-size sketch is
    * accurate enough to replace the exact type table for its hot
    * keys.
    *
    * Scale: exact top-k is TakeOrderedAndProject over the map-side-
    * combined type table (never a vocabulary sort); the probe joins
    * k·depth rows against the depth·width sketch — both tiny, both
    * broadcastable.
    */
  def cmsHeavyHitters(documents: DataFrame, depth: Int = 4,
      width: Int = 1024, topK: Int = 50): DataFrame = {
    // one corpus pass feeds both the sketch and the exact top-k
    // (q48's persist-once discipline on the fan-out node)
    val types = typeTable(documents).persist()
    val top = types.orderBy($("n").desc, $("token").asc).limit(topK)
      .withColumnRenamed("n", "exact_n")
    val sketch = cmsFromTypes(types, depth, width)
    val rows = explode(array((0 until depth).map(lit(_)): _*)).as("row")
    val probes = top
      .select($("token"), $("exact_n"), rows)
      .select($("token"), $("exact_n"), $("row").cast("long").as("row"),
        cmsCol($("row"), $("token"), width).as("col"))
    val result = probes.join(sketch, Seq("row", "col"))
      .groupBy($("token"), $("exact_n"))
      .agg(min($("cnt")).as("est_n"))
      .localCheckpoint(true)
    types.unpersist(false)
    result
  }
}
