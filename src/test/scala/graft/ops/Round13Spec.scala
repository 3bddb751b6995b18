package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions: skyline dominance and the exact-dyadic grid EWMA,
  * each pinned against a brute-force plain-Scala reference. */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rel_skyline: equals brute-force pairwise dominance") {
    val pts = Tables.orders(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf),
        col("o_custkey") === col("c_custkey"))
      .select(floor(col("o_totalprice")).cast("long").as("x"),
        floor(col("c_acctbal") * 100.0).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Brute force: p survives iff no q with q ≥ p in both and > in one.
    val want = pts.distinct.filter { case (x, y) =>
      !pts.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) }
    }.sorted
    val got = SparkEntry.queries("rel_skyline")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == want.toSeq)
    // Counts: n is the multiplicity of the surviving point.
    val counts = SparkEntry.queries("rel_skyline")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    counts.foreach { case (p, n) =>
      assert(n == pts.count(_ == p).toLong)
    }
  }

  test("ev_ewma_grid: equals the truncated recurrence computed locally") {
    val counts = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hmax = counts.keys.map(_._2).max
    val got = SparkEntry.queries("ev_ewma_grid")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keys.map(_._2).max == hmax) // grid capped at the last hour
    got.foreach { case ((ty, t), (x, s)) =>
      assert(x == counts.getOrElse((ty, t), 0L))
      // Local truncated EWMA: Σ_{k=0..29} x_{t−k} · 2^{−(k+1)} — exact
      // dyadic arithmetic, so equality is EXACT, not approximate.
      val want = (0 to 29).map { k =>
        counts.getOrElse((ty, t - k), 0L).toDouble * math.pow(0.5, k + 1)
      }.sum
      assert(s == want, s"($ty,$t): $s vs $want")
    }
  }
}
