package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch (typed Aggregator, SURVEY.md §2.12 /
  * §2.5): at most `k` counters regardless of stream length, mergeable via
  * the Agarwal-et-al. "subtract the (k+1)-th largest count" rule — so
  * Catalyst plans it partial+final like any built-in and the state is
  * O(k) per group at any scale.
  *
  * Input is WEIGHTED `(item, count)` — callers pre-count items in a
  * codegen'd hash aggregate and feed one update per distinct item, so the
  * ObjectHashAggregate path pays |vocab| UDAF calls instead of |tokens|
  * (the same shape as [[CountMin]] / `Aggs.cmsTokens`). A weighted update
  * is exactly a merge with the singleton sketch {item → w}, so the MG
  * guarantees carry over unchanged (order- and partition-free):
  *   - every item with true weight > n/(k+1) survives in the sketch;
  *   - each surviving estimate underestimates by at most n/(k+1)
  * (each overflow subtracts the (k+1)-th largest count t from ≥ k+1
  * counters, removing ≥ (k+1)·t of total weight n, so the cumulative
  * subtraction per item is ≤ n/(k+1)).
  * Estimates (not membership) depend on merge order, so consuming queries
  * are rows-only gated; the guarantees are property-tested in Round3Spec. */
class HeavyHitters(k: Int)
    extends Aggregator[(String, Long), Map[String, Long], Seq[(String, Long)]] {

  override def zero: Map[String, Long] = Map.empty

  override def reduce(buf: Map[String, Long], in: (String, Long)): Map[String, Long] = {
    val (item, w) = in
    if (w <= 0L) buf
    else buf.get(item) match {
      case Some(c) => buf.updated(item, c + w)
      case None if buf.size < k => buf.updated(item, w)
      case None => merge(buf, Map(item -> w)) // overflow: the merge rule
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    val sum = (a.keySet ++ b.keySet).iterator
      .map(s => s -> (a.getOrElse(s, 0L) + b.getOrElse(s, 0L))).toMap
    if (sum.size <= k) sum
    else {
      val thresh = sum.values.toIndexedSeq.sorted(Ordering[Long].reverse).apply(k)
      sum.flatMap { case (s, c) =>
        if (c - thresh > 0L) Some(s -> (c - thresh)) else None
      }
    }
  }

  /** Deterministic output order: estimate desc, then item asc. */
  override def finish(r: Map[String, Long]): Seq[(String, Long)] =
    r.toSeq.sortBy { case (s, c) => (-c, s) }

  override def bufferEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
