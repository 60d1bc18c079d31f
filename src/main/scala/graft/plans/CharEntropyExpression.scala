package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expression: per-row Shannon character entropy in
  * integer milli-bits — the compression-proxy quality signal a
  * curation pass uses to drop low-entropy boilerplate (repeated-char
  * padding, template soup) and high-entropy noise (base64 blobs,
  * minified JS) in one scan.
  *
  * Like [[SimHash32Expression]], this exists because the composed
  * formulation (split to chars → explode → two groupBys per doc)
  * would shuffle every character in the corpus; as an expression the
  * histogram lives in a per-row local array and the corpus-wide cost
  * is exactly one scan, zero shuffle, inside whole-stage codegen.
  *
  * Determinism contract (hash-gated vs DuckDB, q79): entropy
  * H = Σ_c (cnt_c/n)·log2(n/cnt_c) is NOT summed in floating point —
  * each distinct codepoint's term is rounded HALF_UP to integer
  * milli-bits first and the milli-terms are summed exactly, in
  * codepoint order on both engines (the oracle mirrors with
  * SUM(CAST(round(1e6·cnt·log2(n/cnt)/n) AS BIGINT))). A float Σ
  * would be partition-order-dependent; an integer Σ of per-term
  * roundings is associative and engine-portable.
  *
  * Codepoint semantics: the histogram is over Unicode code points
  * (surrogate pairs counted once), matching DuckDB's per-character
  * string_split(text, '').
  */
case class CharEntropyExpression(child: Expression)
    extends UnaryExpression {

  // input contract: StringType — constructed via the typed
  // `charEntropyMilli(text)` surface below
  override def dataType: DataType = LongType
  override def prettyName: String = "char_entropy_milli"

  override def nullSafeEval(input: Any): Any =
    CharEntropyExpression.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.CharEntropyExpression.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CharEntropyExpression {

  private val LOG2 = math.log(2.0)

  /** Entropy in milli-bits: Σ over distinct codepoints of
    * round(1e3 · cnt · log2(n/cnt) / n), summed as longs. Empty
    * string → 0.
    */
  def compute(text: UTF8String): Long = {
    val s = text.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return 0L
    // histogram over codepoints (TreeMap: deterministic iteration,
    // though the integer Σ is order-independent anyway)
    val counts = new java.util.TreeMap[Integer, Integer]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val prev = counts.get(cp)
      counts.put(cp, if (prev == null) 1 else prev + 1)
      i += Character.charCount(cp)
    }
    var milliSum = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toDouble
      val term = 1e3 * c * (math.log(n / c) / LOG2) / n
      milliSum += math.floor(term + 0.5).toLong   // HALF_UP, terms >= 0
    }
    milliSum
  }

  /** Column-API surface (Spark 4 ColumnNode bridge, as simhash32). */
  def charEntropyMilli(text: Column): Column =
    ColumnBridge.column(CharEntropyExpression(ColumnBridge.expression(text)))
}
