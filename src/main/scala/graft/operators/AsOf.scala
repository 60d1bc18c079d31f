package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (point-in-time) join — Spark has no native ASOF JOIN;
  * the naive formulation (`l.key = r.key AND r.ts < l.ts` then argmax)
  * degenerates to a per-key cross product. This is the library-grade
  * generalization of the tagged-union trick (see
  * [[Events.clickAttribution]], its q53-gated specialization):
  *
  *  1. collapse the right side to ONE row per (key, ts) — latest by
  *     `tieBreak` — so ties are deterministic;
  *  2. stack both sides with a kind tag (left=0 < right=1, so at
  *     equal timestamps a left row does NOT see that right row:
  *     strict `<` semantics);
  *  3. one window per key carries the most recent right row forward;
  *  4. keep left rows that found a match (inner semantics).
  *
  * Output: all left columns, plus the right side's columns prefixed
  * `right_`. Cost: one exchange on the right-side dedup aggregate and
  * one on the window — no join node at all, which is the shape that
  * survives arbitrarily large inputs on both sides.
  */
object AsOf {

  /** @param key       equi-key column name (present in both sides)
    * @param leftTs    left event-time column name
    * @param rightTs   right event-time column name
    * @param tieBreak  right column resolving equal (key, ts) rows
    *                  (max wins) — required for determinism
    */
  def join(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, tieBreak: String): DataFrame = {
    val rCols = right.columns.toSeq
    require(rCols.contains(tieBreak), s"tieBreak '$tieBreak' not in right side")
    // one right row per (key, ts): greatest tieBreak
    val rn = Window.partitionBy(col(key), col(rightTs))
      .orderBy(col(tieBreak).desc)
    val rightOne = right
      .withColumn("__rn", row_number().over(rn))
      .filter(col("__rn") === 1).drop("__rn")

    val rStruct = struct(rCols.map(col): _*)
    val lStruct = struct(left.columns.toSeq.map(col): _*)
    val tagged = left.select(col(key).as("__k"),
        col(leftTs).as("__t"), lit(0).as("__kind"),
        lStruct.as("__l"), lit(null).cast(structTypeOf(rightOne)).as("__r"))
      .unionByName(rightOne.select(col(key).as("__k"),
        col(rightTs).as("__t"), lit(1).as("__kind"),
        lit(null).cast(structTypeOf(left)).as("__l"), rStruct.as("__r")))

    val w = Window.partitionBy(col("__k"))
      .orderBy(col("__t").asc, col("__kind").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val matched = tagged
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__kind") === 0 && col("__m").isNotNull)
    val leftOut = left.columns.toSeq.map(c => col(s"__l.$c").as(c))
    val rightOut = rCols.map(c => col(s"__m.$c").as(s"right_$c"))
    matched.select(leftOut ++ rightOut: _*)
  }

  private def structTypeOf(df: DataFrame) =
    org.apache.spark.sql.types.StructType(df.schema.fields)
}
