package graft.plans

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Custom Catalyst expression: 32-bit SimHash of a token array in ONE
  * per-row pass.
  *
  * Replaces the composed-expression formulation (explode tokens →
  * groupBy(doc) with 32 conditional-sum aggregates → pack), which
  * costs a full shuffle of every token. As an expression the whole
  * computation is per-row: no explode, no aggregation, no shuffle —
  * a simhash over N docs is exactly one scan. This is the preference
  * order the build follows: compose built-ins where they fit; write a
  * native `Expression` with `doGenCode` when the composition forces a
  * shuffle the semantics don't need.
  *
  * Bit-compatible with the portable SQL formula (TrainingEntries
  * q28): for each non-empty token, bit j of the first 4 md5 digest
  * bytes (MSB-first) votes ±1 on counter j; result bit j is set iff
  * counter j > 0; packed little-endian into a BIGINT (bit j →
  * 1L << j).
  *
  * Codegen: emits a static call to [[SimHash32Expression.compute]] —
  * stays inside whole-stage codegen with no boxing or fallback to
  * interpreted eval.
  */
case class SimHash32Expression(child: Expression)
    extends UnaryExpression {

  // input contract: ArrayType(StringType) — constructed only via the
  // typed `simhash32(tokens)` surface below (AbstractDataType-based
  // input validation is private[sql])
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash32"

  override def nullSafeEval(input: Any): Any =
    SimHash32Expression.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SimHash32Expression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash32Expression {

  private val digestTL: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** One-pass simhash over the token array (empty tokens skipped —
    * same as the composed form's `length(tok) > 0` filter).
    */
  def compute(tokens: ArrayData): Long = {
    val counters = new Array[Int](32)
    val md = digestTL.get()
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      val tok = tokens.getUTF8String(i)
      if (tok != null && tok.numBytes() > 0) {
        md.reset()
        val digest = md.digest(tok.getBytes)
        // bit j = (digest[j/8] >>> (7 - j%8)) & 1 over the first 4
        // bytes — identical to nibble arithmetic on the hex string
        var j = 0
        while (j < 32) {
          val bit = (digest(j >> 3) >>> (7 - (j & 7))) & 1
          counters(j) += (bit << 1) - 1   // +1 or -1
          j += 1
        }
      }
      i += 1
    }
    var packed = 0L
    var j = 0
    while (j < 32) {
      if (counters(j) > 0) packed |= 1L << j
      j += 1
    }
    packed
  }

  /** Column-API surface (Spark 4: Column wraps a ColumnNode; the
    * bridge converts through the classic ExpressionUtils).
    */
  def simhash32(tokens: Column): Column =
    ColumnBridge.column(SimHash32Expression(ColumnBridge.expression(tokens)))
}
