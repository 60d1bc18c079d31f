package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Salted join for skewed keys (builder brief: "salting for skew").
  *
  * A plain equi-join shuffles both sides by key: one hot key → one
  * straggler task. Salting splits every fact-side key into `salt`
  * sub-keys (deterministic `pmod(hash, salt)` over the whole row) and
  * replicates the dim side `salt`× (explode over 0..salt-1), so the
  * hot key's rows spread over `salt` tasks. Inner-join semantics are
  * unchanged; dim-side cost is ×salt — use when the dim side is much
  * smaller but too big (or too hot) to broadcast outright.
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * sort-merge joins automatically; explicit salting remains the tool
  * for aggregation-feeding joins and for engines/stages where AQE
  * cannot split (e.g. a skewed groupBy after the join: salt the
  * aggregation key the same way, aggregate twice).
  */
object SkewJoin {

  private val SaltCol = "__graft_salt"

  /** Inner equi-join of `fact` (skewed side) with `dim` on `keys`,
    * spreading each fact key over `salt` partitions.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
      salt: Int = 8): DataFrame = {
    require(salt > 0, "salt must be positive")
    // per-row spread: hash all fact columns PLUS a per-row ordinal —
    // byte-identical duplicate rows (common in training corpora: the
    // hot key often IS a mass-duplicated row) would otherwise all hash
    // to one salt bucket and the skew would survive salting untouched
    val factSalted = fact.withColumn(SaltCol,
      pmod(hash(fact.columns.map(col).toIndexedSeq :+
        monotonically_increasing_id(): _*), lit(salt)))
    val dimSalted = dim.withColumn(SaltCol,
      explode(array((0 until salt).map(lit(_)): _*)))
    factSalted.join(dimSalted, keys :+ SaltCol)
      .drop(SaltCol)
  }

  /** Key-skew profile: the top-`topK` heaviest values of `key` with
    * exact counts and integer-micro share of all (non-null-keyed)
    * rows — the diagnostic read BEFORE choosing a skew strategy. A
    * top key at 10%+ share predicts a straggler task in any shuffle
    * on that key; the then-available tools are [[saltedJoin]] /
    * [[saltedAgg]], `broadcast`, or AQE skew-join. Returns (rank,
    * key_value, n_rows, share_micro) under a total order (count
    * desc, value asc). Nulls are excluded: they hash to one
    * partition like any hot key, but every engine orders them
    * differently — count them separately if null-skew matters.
    *
    * Scale: map-side-combined count per key, distributed
    * TakeOrderedAndProject top-k (never a global sort of the key
    * space), one-row total broadcast; the rank window sees only the
    * k survivors. The q97 vocabCoverage plan shape.
    */
  def keySkewProfile(df: DataFrame, key: String, topK: Int = 20): DataFrame = {
    val rows = df.filter(col(key).isNotNull)
      .select(col(key).cast("string").as("key_value"))
    val counts = rows
      .groupBy("key_value").agg(count(lit(1)).as("n_rows"))
    // denominator straight off the scan — NOT sum over `counts`,
    // which would recompute the per-key shuffle a second time just
    // to fold it back into one number
    val total = rows.agg(count(lit(1)).cast("long").as("total"))
    val w = Window.orderBy(col("n_rows").desc, col("key_value").asc)
    counts
      .orderBy(col("n_rows").desc, col("key_value").asc).limit(topK)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("rank"), col("key_value"), col("n_rows"),
        expr("(n_rows * 1000000) div total").cast("long").as("share_micro"))
  }

  /** Two-phase skewed aggregation: aggregate on (keys + salt) first
    * (spreads the hot key), then merge the partials. `partial` builds
    * the salted partial aggregate; `merge` combines partials — e.g.
    * partial = count → merge = sum.
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], salt: Int)(
      partial: org.apache.spark.sql.RelationalGroupedDataset => DataFrame,
      merge: org.apache.spark.sql.RelationalGroupedDataset => DataFrame): DataFrame = {
    val salted = df.withColumn(SaltCol,
      pmod(hash(df.columns.map(col).toIndexedSeq :+
        monotonically_increasing_id(): _*), lit(salt)))
    val partials = partial(salted.groupBy((keys :+ SaltCol).map(col): _*))
    merge(partials.groupBy(keys.map(col): _*))
  }
}
