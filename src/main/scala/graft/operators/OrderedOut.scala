package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Deterministic total ordering for SMALL final results.
  *
  * `orderBy` plans a range-partitioned sort whose `RangePartitioner`
  * runs a SAMPLING JOB over the child first — executing the whole
  * upstream pipeline twice. For a query whose upstream is expensive
  * and whose result is small (every oracle-checked query here), a
  * single-partition shuffle + in-partition sort gives the same total
  * order for one upstream execution and no sampling pass.
  *
  * Only for bounded outputs: the final sort runs in one task (the
  * upstream keeps full parallelism — `repartition` is a shuffle
  * barrier, unlike `coalesce` which would collapse the parent stage).
  * Global top-k queries should keep `orderBy.limit` instead: that
  * plans TakeOrderedAndProject, which never sorts globally at all.
  */
object OrderedOut {

  implicit final class SmallOrderOps(private val df: DataFrame) extends AnyVal {
    def orderedSmall(c1: Column, cs: Column*): DataFrame =
      df.repartition(1).sortWithinPartitions((c1 +: cs): _*)
    def orderedSmall(c1: String, cs: String*): DataFrame =
      df.repartition(1).sortWithinPartitions(c1, cs: _*)

    /** Decouple compute parallelism from scan splits before CPU-heavy
      * narrow work (explode + hashing + regex chains). A small input
      * (here: one parquet file → ONE scan task) otherwise serializes
      * the whole derivation into a single thread — observed as 50-113s
      * single-task stages. The repartition shuffles only the small raw
      * rows; the expensive derived work then runs wide. At cluster
      * scale the same holds whenever row-amplifying work sits on top
      * of a few fat splits.
      */
    def spread(): DataFrame =
      df.repartition(df.sparkSession.sparkContext.defaultParallelism)
  }
}
