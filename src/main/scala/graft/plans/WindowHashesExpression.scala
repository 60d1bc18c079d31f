package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Custom Catalyst expression: all `k`-token window fingerprints of a
  * token array as 64-bit ROLLING hashes in ONE O(n) per-row pass —
  * the third native expression (after SimHash32, CharEntropy), built
  * for the span-dedup hot path.
  *
  * The md5 formulation ([[graft.operators.SubstringDedup
  * .windowFpArray]]) re-concatenates and re-digests every window:
  * O(n·k) string bytes hashed per document, and each fingerprint is a
  * 32-char string — 4× the bytes of a BIGINT on the (fp) shuffle that
  * dominates the family. This expression computes per-token FNV-1a
  * hashes once, then rolls a degree-(k−1) polynomial in the odd base
  * B over them — add a token, drop a token, O(1) per step, exact in
  * wrap-around Long arithmetic (B odd ⇒ B^i invertible mod 2^64, so
  * removal via subtracting h·B^(k−1) is exact). Window identity is
  * preserved exactly for equal windows; distinct windows collide with
  * ~2^-64 probability per pair — the same collision budget the md5
  * design already accepts (SubstringDedup Scaladoc).
  *
  * Contract split: the ORACLE-GATED queries (q111/q112/q116/q132)
  * keep md5 fingerprints — DuckDB has no FNV — while the rolling
  * variant ([[graft.operators.SubstringDedup
  * .windowOccurrencesRolling]]) is the scale path, spec-pinned to
  * produce the IDENTICAL duplicated-window (doc, pos) set.
  *
  * Codegen: a static call — stays inside whole-stage codegen, no
  * boxing, no interpreted fallback.
  */
case class WindowHashesExpression(child: Expression, k: Int)
    extends UnaryExpression {

  // k=0 would return n+1 garbage hashes, k<0 would read h at a
  // negative index — reject at construction (plan time), both from
  // the Column API and the SQL builder
  require(k >= 1, s"window_hashes k must be >= 1, got $k")

  // input contract: ArrayType(StringType) — constructed only via the
  // typed `windowHashes(tokens, k)` surface below
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "window_hashes"

  override def nullSafeEval(input: Any): Any =
    WindowHashesExpression.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.WindowHashesExpression.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WindowHashesExpression {

  /** Rolling base: odd (invertible mod 2^64) and large. */
  private val B = 0x100000001b3L // the FNV-1a prime, reused as base

  /** FNV-1a 64 over the token's UTF-8 bytes. */
  private def fnv1a(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= bytes(i) & 0xffL
      h *= B
      i += 1
    }
    h
  }

  /** All n−k+1 window hashes (empty array when n < k):
    * w_i = Σ_{j=0..k−1} h(tok_{i+j})·B^(k−1−j) in wrap-around Long
    * arithmetic, rolled in O(1) per step.
    */
  def compute(tokens: ArrayData, k: Int): ArrayData = {
    val n = tokens.numElements()
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val h = new Array[Long](n)
    var i = 0
    while (i < n) {
      val t = tokens.getUTF8String(i)
      h(i) = if (t == null) 0L else fnv1a(t.getBytes)
      i += 1
    }
    // Bk = B^(k-1): the weight of the outgoing token
    var bk = 1L
    i = 1
    while (i < k) { bk *= B; i += 1 }
    val out = new Array[Long](n - k + 1)
    var w = 0L
    i = 0
    while (i < k) { w = w * B + h(i); i += 1 }
    out(0) = w
    i = k
    while (i < n) {
      w = (w - h(i - k) * bk) * B + h(i)
      out(i - k + 1) = w
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-API surface. */
  def windowHashes(tokens: Column, k: Int): Column =
    ColumnBridge.column(
      WindowHashesExpression(ColumnBridge.expression(tokens), k))
}
