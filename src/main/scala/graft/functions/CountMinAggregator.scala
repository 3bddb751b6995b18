package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count-min sketch (typed Aggregator, SURVEY.md §2.12 / §2.5): a
  * depth × width counter matrix giving frequency estimates for ANY item in
  * O(depth) probes with fixed memory — the point-query complement to the
  * Misra-Gries top-k sketch ([[HeavyHitters]]) and the HLL cardinality
  * sketch. Counters are purely additive, so partial/final merge is
  * elementwise sum and the result is independent of partitioning and merge
  * order (unlike Misra-Gries) — Catalyst plans it partial+final like any
  * built-in aggregate, O(depth·width) state per group at any scale.
  *
  * Guarantees (Cormode & Muthukrishnan '05): est ≥ true always (counters
  * only overcount via collisions); est ≤ true + N/width per row, so the
  * min over `depth` independent rows is within εN, ε = e/width, with
  * probability 1 − e^−depth. Both pinned in SketchSpec.
  *
  * Row hashes are FNV-1a with a row-salted seed — deterministic across
  * JVMs and executors, no RNG state.
  *
  * Input is weighted (item, count): because the sketch is additive,
  * feeding exact pre-aggregated counts produces bit-identical counters to
  * feeding each occurrence — but the per-row Aggregator boundary is then
  * paid |vocab| times, not |tokens| times (measured 3.4 s → sub-second at
  * sf0.1). Under Zipfian vocabularies the pre-agg is the right plan; for
  * unbounded key domains feed weight 1 per row instead. */
class CountMin(depth: Int, width: Int, probes: Seq[String])
    extends Aggregator[(String, Long), Array[Long], Seq[(String, Long)]] {

  private def h(row: Int, s: String): Int = {
    var x = 0x811c9dc5 ^ (row * 0x9e3779b9)
    var i = 0
    while (i < s.length) { x = (x ^ s.charAt(i)) * 0x01000193; i += 1 }
    math.floorMod(x, width)
  }

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(buf: Array[Long], item: (String, Long)): Array[Long] = {
    var r = 0
    while (r < depth) { buf(r * width + h(r, item._1)) += item._2; r += 1 }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  /** Point-query the probe set: est(p) = min over rows of its counter. */
  override def finish(buf: Array[Long]): Seq[(String, Long)] =
    probes.map { p =>
      var best = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = buf(r * width + h(r, p))
        if (c < best) best = c
        r += 1
      }
      p -> best
    }

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
