package graft.ops

import graft.{SparkEntry, TestSpark}
import graft.functions.BitmapDistinctAggregator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mechanics tests for the round-10 operators — invariants the DuckDB
  * oracle can't express (the gates pin values; these pin behavior under
  * partitioning, merge order, and edge inputs). */
class Round10Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("BitmapDistinctAggregator: popcount over growth + asymmetric merges") {
    val agg = new BitmapDistinctAggregator
    assert(agg.finish(agg.zero) == 0L)
    // growth: ids straddling word boundaries, duplicates collapse
    val b = Seq(0L, 63L, 64L, 64L, 1000L, 0L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) == 4L)
    // merge is symmetric regardless of buffer lengths
    val small = Seq(1L, 2L).foldLeft(agg.zero)(agg.reduce)
    val big = Seq(2L, 700L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(agg.merge(small, big)) == 3L)
    assert(agg.finish(agg.merge(big, small)) == 3L)
    // contract: dense non-negative ids only
    intercept[IllegalArgumentException](agg.reduce(agg.zero, -1L))
  }

  test("bitmap distinct equals countDistinct under adversarial partitioning") {
    import spark.implicits._
    val bm = udaf(new BitmapDistinctAggregator)
    val df = (0L until 5000L).map(i => (i % 7, i % 911))
      .toDF("g", "id").repartition(13, col("id"))
    val got = df.groupBy(col("g"))
      .agg(bm(col("id")).as("b"), countDistinct(col("id")).as("e"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), s"group ${r.get(0)}"))
  }

  test("ev_attribution_multi: per-touch credit caps and channel structure hold") {
    val rows = SparkEntry.queries("ev_attribution_multi")(spark, TestSpark.sf)
      .collect()
    assert(rows.map(_.getString(0)).toSet == Set("click", "view"))
    rows.foreach { r =>
      val touches = r.getLong(1)
      assert(r.getLong(2) <= touches, "a conversion needs at least one touch")
      // every touch's credit is 1e6 div n ∈ (0, 1e6] for both models
      assert(r.getLong(3) > 0 && r.getLong(3) <= 1000000L * touches)
      assert(r.getLong(4) > 0 && r.getLong(4) <= 1000000L * touches)
    }
  }
}
