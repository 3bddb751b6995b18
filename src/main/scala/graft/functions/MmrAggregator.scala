package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One retrieval candidate entering MMR re-ranking. */
case class MmrCand(cand_id: Long, rel: Double, emb: Seq[Float])

/** One MMR selection: rank (1-based pick order), candidate id, and the
  * marginal-relevance score at pick time. */
case class MmrPick(rank: Int, cand_id: Long, mmr_score: Double)

/** Maximal Marginal Relevance re-ranker as a typed aggregate (SURVEY.md
  * §2.12 custom-Aggregator row; the diversity-aware retrieval stage after
  * any ANN/brute top-k).
  *
  * Greedy MMR is inherently sequential (pick i depends on picks 1..i-1),
  * so it cannot be a distributed fold over an unbounded group — the scale
  * contract is that the INPUT is already a bounded per-query candidate
  * list (top-N from the retrieval stage, N ≈ 20), making the buffer O(N)
  * and the finish O(k·N²) with tiny constants. Partition order never leaks:
  * `finish` sorts candidates by (rel desc, id) before the greedy loop, and
  * every float op runs in that fixed order, so the output is deterministic
  * for any merge order of partial buffers.
  *
  * score(i) = λ·rel(i) − (1−λ)·max_{j∈selected} cos(i, j), λ = 0.7, k = 5;
  * ties break toward the smaller candidate id. */
object MmrAggregator extends Aggregator[MmrCand, Seq[MmrCand], Seq[MmrPick]] {
  private val lambda = 0.7
  private val k = 5

  override def zero: Seq[MmrCand] = Nil
  override def reduce(buf: Seq[MmrCand], in: MmrCand): Seq[MmrCand] = in +: buf
  override def merge(a: Seq[MmrCand], b: Seq[MmrCand]): Seq[MmrCand] = a ++ b

  private def dot(a: Seq[Float], b: Seq[Float]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length && i < b.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
    s
  }

  override def finish(buf: Seq[MmrCand]): Seq[MmrPick] = {
    val cands = buf.sortBy(c => (-c.rel, c.cand_id)).toArray
    val norms = cands.map(c => math.sqrt(dot(c.emb, c.emb)))
    def cos(i: Int, j: Int): Double = dot(cands(i).emb, cands(j).emb) / (norms(i) * norms(j))
    val selected = scala.collection.mutable.ArrayBuffer.empty[Int]
    val picks = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
    while (selected.size < k && selected.size < cands.length) {
      var bestIdx = -1
      var bestScore = Double.NegativeInfinity
      var i = 0
      while (i < cands.length) {
        if (!selected.contains(i)) {
          val maxSim = if (selected.isEmpty) 0.0 else selected.map(j => cos(i, j)).max
          val score = lambda * cands(i).rel - (1 - lambda) * maxSim
          if (score > bestScore ||
              (score == bestScore && bestIdx >= 0 && cands(i).cand_id < cands(bestIdx).cand_id)) {
            bestScore = score; bestIdx = i
          }
        }
        i += 1
      }
      // All remaining scores NaN (zero-norm emb → cos = 0/0, or NaN rel):
      // no candidate beats -Inf, bestIdx stays -1 — stop rather than index
      // out of bounds.
      if (bestIdx < 0) return picks.toSeq
      selected += bestIdx
      picks += MmrPick(selected.size, cands(bestIdx).cand_id, bestScore)
    }
    picks.toSeq
  }

  override def bufferEncoder: Encoder[Seq[MmrCand]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Seq[MmrPick]] = ExpressionEncoder()
}
