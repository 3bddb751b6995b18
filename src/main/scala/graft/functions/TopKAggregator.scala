package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One top-k entry: the ordering value and its unique tie-break id. */
case class TopKEntry(value: Double, id: Long)

/** Bounded-state top-k as a typed aggregate (SURVEY.md §2.12) — the
  * SCALE-SHAPE alternative to the `row_number() <= k` window for top-k per
  * group: a window must shuffle EVERY row of the group to one partition
  * and sort it, while this aggregate keeps a k-element buffer that
  * Catalyst evaluates as partial + final (ObjectHashAggregate), so each
  * map task forwards at most k rows per key — shuffle volume is k·|keys|
  * instead of |rows|, the difference between a re-sort of the fact table
  * and a near-free agg at 100 TB (hot keys stop mattering entirely).
  *
  * Ordering: value desc, then id asc (unique id ⇒ fully deterministic).
  * The buffer is a sorted Vector capped at k — insertion and merge are
  * O(k); k is a small constant by contract (the same bounded-group
  * contract as [[MmrAggregator]]). */
class TopKAggregator(k: Int)
    extends Aggregator[TopKEntry, Seq[TopKEntry], Seq[TopKEntry]] {

  private def lt(a: TopKEntry, b: TopKEntry): Boolean =
    a.value > b.value || (a.value == b.value && a.id < b.id)

  override def zero: Seq[TopKEntry] = Vector.empty

  override def reduce(buf: Seq[TopKEntry], in: TopKEntry): Seq[TopKEntry] = {
    if (buf.length == k && !lt(in, buf.last)) buf
    else ((buf :+ in).sortWith(lt)).take(k)
  }

  override def merge(a: Seq[TopKEntry], b: Seq[TopKEntry]): Seq[TopKEntry] =
    (a ++ b).sortWith(lt).take(k)

  override def finish(r: Seq[TopKEntry]): Seq[TopKEntry] = r

  override def bufferEncoder: Encoder[Seq[TopKEntry]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[TopKEntry]] = ExpressionEncoder()
}

object TopK3 extends TopKAggregator(3)

/** The per-block eval-sample cut (dd_lsh_recall): 64 smallest portable
  * hashes per (lang, source) block via value = −hash. */
object TopK64 extends TopKAggregator(64)
