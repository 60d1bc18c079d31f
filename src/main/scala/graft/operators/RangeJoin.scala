package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Generic interval (range) join — `point BETWEEN start AND end` has
  * no equi-key, so Catalyst plans it as BroadcastNestedLoopJoin (a
  * cross product). This is the library-grade generalization of the
  * epoch-bucketization used by [[Events.windowRollup]] (its q54-gated
  * specialization): quantize time into `bucketUs`-wide buckets, explode
  * each interval onto the buckets it covers, map each point to its
  * single bucket, equi-join on the bucket key, re-check the exact
  * range predicate.
  *
  * Pick `bucketUs` near the typical interval length: each interval
  * then covers ~2 buckets (row amplification ≤ len/bucket + 1) and
  * each point meets only the intervals overlapping its bucket. With
  * that, the join is hash-partitionable on the bucket key — no
  * nested loop, broadcastable when the interval side is small.
  */
object RangeJoin {

  /** Inner-join `points` (event-time column `pointTs`) to the
    * `intervals` rows whose `[startTs, endTs)` contains the point.
    * Returns points columns + interval columns (caller guarantees
    * disjoint names beyond `keys`). `keys` adds equi-key columns
    * (present in both sides, e.g. a shared user id) to the join — the
    * bucket key alone would make every interval a candidate for every
    * point in its time bucket regardless of key.
    */
  def overlap(points: DataFrame, intervals: DataFrame, pointTs: String,
      startTs: String, endTs: String, bucketUs: Long,
      keys: Seq[String] = Nil,
      broadcastIntervals: Boolean = true): DataFrame = {
    require(bucketUs > 0, "bucketUs must be positive")
    // Empty/inverted intervals (endTs <= startTs) contain no point, so
    // dropping them is semantics-preserving — and load-bearing: Spark's
    // sequence(a, b) generates a DESCENDING sequence when a > b, so an
    // inverted interval would otherwise explode a spurious bucket row
    // per bucket between its bounds (correct output only by grace of
    // the exact re-check below, at arbitrary cost).
    val exploded = intervals
      .filter(col(endTs) > col(startTs))
      .withColumn("__bucket", explode(expr(
        s"sequence(unix_micros($startTs) div $bucketUs, " +
          s"unix_micros($endTs - interval 1 microsecond) div $bucketUs)")))
    val dim = if (broadcastIntervals) broadcast(exploded) else exploded
    points
      .withColumn("__bucket", expr(s"unix_micros($pointTs) div $bucketUs"))
      .join(dim, "__bucket" +: keys)
      .filter(col(pointTs) >= col(startTs) && col(pointTs) < col(endTs))
      .drop("__bucket")
  }
}
