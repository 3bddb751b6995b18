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

  test("rel_ri_audit: fixture FKs are clean and the audit detects an injected orphan") {
    val rows = SparkEntry.queries("rel_ri_audit")(spark, TestSpark.sf).collect()
    assert(rows.length == 5)
    rows.foreach(r => assert(r.getInt(4) == 1, s"unexpected orphans: $r"))
    // The detector itself must fire: a child row with an impossible key.
    import spark.implicits._
    val child = Seq(1L, 2L, -999L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("k")
    val orphans = child.join(parent, Seq("k"), "left_anti").count()
    assert(orphans == 1L)
  }

  test("win_rolling_slope: constant series slopes 0; manufactured linear trend slopes 1") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("x")).rowsBetween(-6, 0)
    def slope(df: org.apache.spark.sql.DataFrame) = df
      .withColumn("cnt", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .filter(col("cnt") === 7)
      .select(((col("cnt") * col("sxy") - col("sx") * col("sy")).cast("double") /
        (col("cnt") * col("sxx") - col("sx") * col("sx")).cast("double")).as("s"))
      .collect().map(_.getDouble(0))
    val const = (1L to 20L).map(x => (x, 5L)).toDF("x", "y")
    assert(slope(const).forall(_ == 0.0))
    val linear = (1L to 20L).map(x => (x, x + 100L)).toDF("x", "y")
    assert(slope(linear).forall(_ == 1.0))
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
