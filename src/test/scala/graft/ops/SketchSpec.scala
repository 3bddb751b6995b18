package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Count-min sketch guarantees (agg_cms_tokens is rows-only gated; the
  * sketch's contract is pinned here instead). */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def tokensDf = graft.Tables.documents(spark, TestSpark.sf)
    .select(col("lang"),
      explode(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
        .as("token"))

  test("agg_cms_tokens: never underestimates; overcount bounded by depth*N/width") {
    val est = Aggs.cmsTokens(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("token")) ->
        r.getAs[Long]("est")).toMap
    val truth = tokensDf.groupBy("lang", "token").count().collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[String]("token")) ->
        r.getAs[Long]("count")).toMap
    val n = tokensDf.groupBy("lang").count().collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("count")).toMap
    assert(est.nonEmpty)
    est.foreach { case ((lang, tok), e) =>
      val t = truth.getOrElse((lang, tok), 0L)
      assert(e >= t, s"CMS underestimated $lang/$tok: $e < $t")
      // deterministic per-row bound: each row overcounts by at most N/width;
      // the min over rows can't exceed the worst row.
      assert(e <= t + n(lang) / 256 + 1,
        s"CMS overcount out of bound for $lang/$tok: est=$e true=$t n=${n(lang)}")
    }
    // the absent control probe must stay near zero (collisions only)
    est.filter(_._1._2 == "zzz_absent").foreach { case ((lang, _), e) =>
      assert(e <= n(lang) / 256 + 1, s"absent probe too high in $lang: $e")
    }
  }

  test("agg_hll_union: slice-union estimate equals one-pass estimate " +
    "and stays within 5% of exact") {
    // Merge losslessness: HLL registers are per-item maxima, so the union
    // of per-month sketches holds the same state as one sketch over the
    // whole group — the property that makes stored sketch columns safe to
    // merge incrementally.
    val merged = Aggs.hllUnion(spark, TestSpark.sf).collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        (r.getAs[Long]("approx_customers"), r.getAs[Long]("exact_customers")))
      .toMap
    val onePass = graft.Tables.orders(spark, TestSpark.sf)
      .groupBy(col("o_orderpriority"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"))).as("est"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") -> r.getAs[Long]("est"))
      .toMap
    assert(merged.nonEmpty)
    merged.foreach { case (prio, (approx, exact)) =>
      assert(approx == onePass(prio),
        s"union-of-slices must equal the one-pass sketch for $prio")
      assert(math.abs(approx - exact) <= 0.05 * exact,
        s"HLL estimate off for $prio: approx=$approx exact=$exact")
    }
  }

  test("agg_cms_tokens: estimates are partitioning-independent (additive merge)") {
    val probes = Seq("the", "data", "spark", "query", "table", "zzz_absent")
    val cms = org.apache.spark.sql.functions.udaf(
      new graft.functions.CountMin(4, 256, probes),
      org.apache.spark.sql.Encoders.tuple(
        org.apache.spark.sql.Encoders.STRING,
        org.apache.spark.sql.Encoders.scalaLong))
    // weight-1 feed (no pre-agg): proves the raw-stream form gives the same
    // counters as the pre-aggregated registered query
    def run(parts: Int) = tokensDf.repartition(parts)
      .groupBy(col("lang")).agg(cms(col("token"), lit(1L)).as("sketch"))
      .select(col("lang"), posexplode(col("sketch")).as(Seq("pos", "e")))
      .collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("pos")) ->
        r.getAs[org.apache.spark.sql.Row]("e").getLong(1)).toMap
    assert(run(1) == run(8),
      "CMS result must not depend on partition layout or merge order")
    // ...and the registered query's weighted pre-agg feed is bit-identical
    // to the raw stream feed (additivity)
    val registered = Aggs.cmsTokens(spark, TestSpark.sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Int]("pos")) ->
        r.getAs[Long]("est")).toMap
    assert(registered == run(1),
      "pre-aggregated weighted updates must equal per-occurrence updates")
  }
}
