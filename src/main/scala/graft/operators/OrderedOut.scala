package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism helpers for operator pipelines.
  *
  * Operators deliberately emit UNORDERED results: the driver's oracle
  * compare (and tools/local_oracle.py) sorts rows before hashing, and
  * a production pipeline orders only at its final sink if at all. A
  * `repartition(1).sortWithinPartitions` funnel on an O(input) result
  * would serialize the whole output through one task at cluster scale
  * — the exact anti-pattern this module used to encode; global top-k
  * queries use `orderBy.limit` (TakeOrderedAndProject) instead, which
  * never sorts globally.
  */
object OrderedOut {

  implicit final class SmallOrderOps(private val df: DataFrame) extends AnyVal {

    /** Decouple compute parallelism from scan splits before CPU-heavy
      * narrow work (explode + hashing + regex chains). A small input
      * (here: one parquet file → ONE scan task) otherwise serializes
      * the whole derivation into a single thread — observed as 50-113s
      * single-task stages. The repartition shuffles only the small raw
      * rows; the expensive derived work then runs wide.
      *
      * CONDITIONAL: when the scan already yields at least
      * defaultParallelism splits — the normal case for any real table,
      * where a 100 TB scan has far more splits than cores — this is a
      * no-op and inserts NO Exchange (a full shuffle of raw text just
      * to re-bin already-wide data would be pure cost). The partition
      * count comes from the physical scan plan; no job runs.
      */
    def spread(): DataFrame = {
      // streaming frames have no .rdd to probe — and micro-batch
      // sources already control their split count, so the widening
      // heuristic is a no-op there (this is what lets the narrow
      // operator layer run UNCHANGED over readStream)
      if (df.isStreaming) return df
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df
      else df.repartition(target)
    }
  }
}
