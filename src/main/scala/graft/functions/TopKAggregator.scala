package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k aggregator: the typed-`Aggregator` form of the
  * reference's `Top10ReducerByFloatV1` (R:151, R:195) — a bounded
  * sorted buffer per group, merged associatively.
  *
  * Compared with the window `row_number` formulation (Airline
  * .groupTopK), this never sorts a whole group: each partial buffer
  * holds ≤ k entries, combines map-side, and the shuffle carries at
  * most k entries per group per partition. For groups with millions of
  * members (airport×carrier at 100 TB) that's the difference between
  * a per-group sort and an O(n·log k) streaming pass. The window form
  * remains the right choice when the per-group input is already small
  * (e.g. post-aggregated averages) — both are provided and
  * differential-tested.
  *
  * Ordering: ascending by `value`, ties broken by `label` ascending
  * (SURVEY.md §2.5 "ascending average delay = best on-time" +
  * deterministic tiebreak).
  */
object TopKAggregator {

  final case class Entry(label: String, value: Double)

  private def lt(a: Entry, b: Entry): Boolean =
    a.value < b.value || (a.value == b.value && a.label < b.label)

  /** Insert into a sorted-ascending bounded list (k is small). */
  private def insert(buf: List[Entry], e: Entry, k: Int): List[Entry] = {
    if (buf.length >= k && !lt(e, buf.last)) buf
    else {
      val (before, after) = buf.span(x => lt(x, e))
      (before ::: e :: after).take(k)
    }
  }

  final class TopKAsc(k: Int) extends Aggregator[Entry, List[Entry], Seq[Entry]] {
    require(k > 0)
    override def zero: List[Entry] = Nil
    override def reduce(buf: List[Entry], e: Entry): List[Entry] =
      insert(buf, e, k)
    override def merge(a: List[Entry], b: List[Entry]): List[Entry] =
      b.foldLeft(a)((acc, e) => insert(acc, e, k))
    override def finish(buf: List[Entry]): Seq[Entry] = buf
    override def bufferEncoder: Encoder[List[Entry]] =
      Encoders.kryo[List[Entry]]
    override def outputEncoder: Encoder[Seq[Entry]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Entry]]()
  }

  def topKAsc(k: Int): TopKAsc = new TopKAsc(k)
}
