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
}
