package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed Aggregator computing the element-wise mean of float vectors
  * (the §2.11 "custom typed agg for vector centroids" ★): buffer is
  * (running double sums, count), mergeable → partial+final hash agg, so a
  * per-label centroid costs one shuffle of |labels| × dim doubles
  * regardless of corpus size.
  *
  * Float addition order varies with partitioning, so results are
  * reproducible-to-ulp rather than bitwise-stable — which is why the
  * ORACLE-gated centroid query (`vec_centroids`) uses the sorted-fold
  * formulation instead; this aggregator is the production-scale form,
  * exercised in LlmSpec against a 1e-9 tolerance. */
object VectorMeanAggregator
    extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {

  override def zero: (Array[Double], Long) = (Array.emptyDoubleArray, 0L)

  override def reduce(b: (Array[Double], Long), v: Array[Float]): (Array[Double], Long) = {
    val sums = if (b._1.isEmpty) new Array[Double](v.length) else b._1
    var i = 0
    while (i < v.length && i < sums.length) { sums(i) += v(i); i += 1 }
    (sums, b._2 + 1)
  }

  override def merge(a: (Array[Double], Long), b: (Array[Double], Long)): (Array[Double], Long) = {
    if (a._1.isEmpty) b
    else if (b._1.isEmpty) a
    else {
      var i = 0
      while (i < a._1.length && i < b._1.length) { a._1(i) += b._1(i); i += 1 }
      (a._1, a._2 + b._2)
    }
  }

  override def finish(r: (Array[Double], Long)): Array[Double] =
    if (r._2 == 0) Array.emptyDoubleArray else r._1.map(_ / r._2)

  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
