package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed UDAF (SURVEY.md §2.12): arg-max with a deterministic tie-break —
  * returns the key of the row with the largest value; on equal values the
  * smallest key wins, so results are partition-order-free.
  *
  * Mergeable buffer ((value, key) pair) → Catalyst plans it as partial +
  * final aggregate like any built-in, so it scales as a normal hash agg. */
object ArgMaxLong extends Aggregator[(Long, Double), (Double, Long), Long] {
  override def zero: (Double, Long) = (Double.NegativeInfinity, Long.MaxValue)

  private def better(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    if (a._1 > b._1) a
    else if (b._1 > a._1) b
    else if (a._2 <= b._2) a else b

  override def reduce(buf: (Double, Long), in: (Long, Double)): (Double, Long) =
    better(buf, (in._2, in._1))
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    better(a, b)
  override def finish(r: (Double, Long)): Long = r._2
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}
