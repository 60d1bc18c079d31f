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
    ext.injectFunction(GraftExtensions.windowHashesDescriptor)
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

  private def windowHashesBuilder(children: Seq[Expression]): Expression = {
    require(children.length == 2,
      "window_hashes takes (tokens array, k int literal)")
    val k = children(1) match {
      case e if e.foldable => e.eval() match {
        case i: Int => i
        case l: Long => l.toInt
        case other => throw new IllegalArgumentException(
          s"window_hashes k must be an int literal, got $other")
      }
      case _ => throw new IllegalArgumentException(
        "window_hashes k must be a literal")
    }
    // fail at plan time with a clear message: k=0 would silently
    // return n+1 garbage hashes and k<0 would AIOOBE inside compute
    require(k >= 1, s"window_hashes k must be >= 1, got $k")
    WindowHashesExpression(children.head, k)
  }

  private[plans] val windowHashesDescriptor:
      (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    FunctionIdentifier("window_hashes"),
    new ExpressionInfo(classOf[WindowHashesExpression].getName,
      "window_hashes"),
    windowHashesBuilder)

  /** Register on an already-built session (tests, REPL). */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "simhash32", exprs => SimHash32Expression(exprs.head), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "char_entropy_milli", exprs => CharEntropyExpression(exprs.head),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "window_hashes", windowHashesBuilder, "built-in")
  }
}
