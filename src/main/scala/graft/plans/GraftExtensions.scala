package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom
  * expressions as SQL functions, so `spark.sql("SELECT
  * simhash32(split(text, ' ')) ...")` works next to the Column API.
  *
  * Use: `SparkSession.builder().withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.plans.GraftExtensions`, or
  * [[GraftExtensions.register]] on a live session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.simhash32Descriptor)
    ext.injectFunction(GraftExtensions.charEntropyDescriptor)
  }
}

object GraftExtensions {

  private[plans] val simhash32Descriptor:
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("simhash32"),
    new ExpressionInfo(classOf[SimHash32Expression].getName, "simhash32"),
    (children: Seq[Expression]) => {
      require(children.length == 1, "simhash32 takes exactly one argument")
      SimHash32Expression(children.head)
    })

  private[plans] val charEntropyDescriptor:
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("char_entropy_milli"),
    new ExpressionInfo(classOf[CharEntropyExpression].getName,
      "char_entropy_milli"),
    (children: Seq[Expression]) => {
      require(children.length == 1,
        "char_entropy_milli takes exactly one argument")
      CharEntropyExpression(children.head)
    })

  /** Register on an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash32", exprs => SimHash32Expression(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy_milli", exprs => CharEntropyExpression(exprs.head),
      "built-in")
  }
}
