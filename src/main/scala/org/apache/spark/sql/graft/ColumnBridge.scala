package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Bridge into Spark's `private[sql]` Column↔Expression conversions
  * (Spark 4 Columns wrap ColumnNodes, not Expressions). Lives under
  * `org.apache.spark.sql` for access; the graft library's custom
  * expressions are the only callers.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The reliable-checkpoint files backing `df`'s plan: every
    * `LogicalRDD` leaf whose RDD reports a checkpoint file. A
    * `Dataset.checkpoint(eager = true)` result is exactly one such
    * leaf, so this returns precisely the files THAT call created —
    * the safe input for checkpoint-hygiene deletion. (The previous
    * listing-diff discovery attributed ANY checkpoint written
    * concurrently on the same SparkContext to the caller and deleted
    * it — silent data loss in a shared session.)
    */
  def checkpointFiles(df: DataFrame): Set[String] =
    df.queryExecution.analyzed.collect {
      case l: LogicalRDD => l.rdd.getCheckpointFile.toList
    }.flatten.toSet

  /** Re-wrap an (already materialized) DataFrame's rows as a fresh
    * `LogicalRDD` WITHOUT the origin plan's `Statistics`.
    *
    * `Dataset.localCheckpoint` deliberately carries the checkpointed
    * plan's stats into the new leaf (`LogicalRDD.originStats`) so
    * broadcast decisions survive the cut — but in an ITERATIVE
    * checkpoint-per-round loop the carried `sizeInBytes` COMPOUNDS:
    * round k's leaf inherits round k-1's join-product estimate, each
    * round's joins multiply it again (size-only stats estimate a join
    * as the PRODUCT of its children), so the estimate grows like
    * s^(3^k). The number stays a BigInteger — no overflow, no error —
    * but by round ~12 it has millions of bits and every stats product
    * in the optimizer becomes a multi-second Toom-Cook multiplication:
    * a 64-round BPE training was measured spending 25+ DRIVER-cpu
    * minutes inside `SizeInBytesOnlyStatsPlanVisitor` before being
    * killed. Any checkpoint-per-round operator (BPE, connected
    * components, PageRank) hits this wall once rounds reach the teens.
    *
    * The caller must pass an EAGERLY materialized frame (e.g.
    * `df.localCheckpoint(true)`): `queryExecution.toRdd` on such a
    * frame is a zero-cost handle to the stored rows, and the fresh
    * leaf falls back to `spark.sql.defaultSizeInBytes` — per-round
    * estimates stay bounded forever.
    */
  def freshStatsView(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    spark.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false).toDF()
  }
}
