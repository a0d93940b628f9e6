package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** (doc_id, set size) member row collected per shingle group — the input
  * and output element of [[CappedDocList]]. Top-level case class so
  * Catalyst codegen can reach it (nested/private classes break encoder
  * codegen).
  */
case class DocSize(doc_id: Long, n_sh: Int)

/** Mutable aggregation buffer: exact group count + member list retained
  * only up to the cap (past the cap the members can never be emitted, so
  * holding them would re-create the mega-row this aggregator exists to
  * prevent).
  */
case class CapBuf(var cnt: Long, var items: List[DocSize])

/** Document-frequency-capped `collect_list` over (doc_id, n_sh) structs:
  * groups whose EXACT cardinality exceeds `cap` finish as an empty list,
  * all other groups finish complete. One pass, O(cap) memory per group.
  *
  * This is the scale-safe form of hot-shingle pruning for the Jaccard
  * pair generator: the plain `collect_list → filter(size ≤ cap)` shape
  * would first MATERIALIZE a df-sized row (a stop-shingle present in 100M
  * docs ⇒ a ~1 GB aggregate row) before filtering it, and the anti-join
  * alternative (pre-aggregate document frequencies, anti-join the hot
  * set) runs the shingle pipeline twice. Here the buffer tracks the exact
  * count but retains at most `cap` members: if the final count ≤ cap no
  * truncation ever happened (each partial buffer saw ≤ cap rows), so the
  * emitted list is complete; if it exceeded cap the group is dropped and
  * the truncated content was never needed. Emitted order is
  * merge-order-dependent — callers must `array_sort` the result (they
  * already did for plain collect_list, which is equally unordered).
  */
class CappedDocList(cap: Int) extends Aggregator[DocSize, CapBuf, Seq[DocSize]] {
  override def zero: CapBuf = CapBuf(0L, Nil)

  override def reduce(b: CapBuf, a: DocSize): CapBuf = {
    b.cnt += 1L
    if (b.items.lengthCompare(cap) < 0) b.items = a :: b.items
    b
  }

  override def merge(b1: CapBuf, b2: CapBuf): CapBuf = {
    b1.cnt += b2.cnt
    b1.items = (b1.items reverse_::: b2.items).take(cap)
    b1
  }

  override def finish(r: CapBuf): Seq[DocSize] =
    if (r.cnt > cap) Nil else r.items

  override def bufferEncoder: Encoder[CapBuf] = Encoders.product[CapBuf]
  override def outputEncoder: Encoder[Seq[DocSize]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[DocSize]]()
}
