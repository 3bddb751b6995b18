package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-4 operators — invariants the DuckDB
  * oracle can't express (it only pins equality of one run). */
class Round4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("vec_kmeans: Lloyd iterations monotonically decrease mean " +
    "within-cluster distance") {
    // the defining property of Lloyd's algorithm: each assign→update step
    // can only lower the total L2² objective. Compare the seed assignment
    // (iteration 0) against the registered 2-iteration result.
    val e = Tables.embeddings(spark, TestSpark.sf)
    def meanDist(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg(col("dist"))).head.getDouble(0)
    // iteration-0 objective: distance to the nearest SEED centroid
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").cast("int").as("cid"),
        transform(col("embedding"), x => x.cast("double")).as("cent"))
    val d0 = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("v_id")).orderBy(col("dist"), col("cid"))
      e.select(col("vec_id").as("v_id"), col("embedding"))
        .join(broadcast(seeds), col("v_id") >= 0)
        .withColumn("dist", aggregate(zip_with(col("embedding"), col("cent"),
          (x, y) => (x.cast("double") - y) * (x.cast("double") - y)),
          lit(0.0), (acc, v) => acc + v))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("v_id"), col("dist"))
    }
    val obj0 = meanDist(d0)
    val obj2 = meanDist(LlmSimilarity.kmeans(spark, TestSpark.sf))
    assert(obj2 <= obj0 + 1e-12,
      s"Lloyd objective must not increase: iter0=$obj0 iter2=$obj2")
    assert(obj2 < obj0, "two iterations should strictly improve on the seeds")
  }

  test("rel_cdc_apply: tombstoned keys vanish, updates win, inserts pass") {
    val out = Relational.cdcApply(spark, TestSpark.sf)
    val orders = Tables.orders(spark, TestSpark.sf)
    // no deleted key survives
    assert(out.filter(col("o_orderkey") % 13 === 0).isEmpty,
      "delete tombstones must remove their keys")
    // every surviving key ≡ 0 (mod 7) carries the update, exactly +100.0
    val updated = out.filter(col("o_orderkey") % 7 === 0)
      .join(orders, Seq("o_orderkey"))
    assert(updated.filter(col("last_op") =!= "U").isEmpty)
    assert(updated.filter(col("price") =!= col("o_totalprice") + 100.0).isEmpty,
      "latest update must win with the exact updated price")
    // everything else is the untouched insert, and the row count is exact
    val plain = out.filter(col("o_orderkey") % 7 =!= 0)
    assert(plain.filter(col("last_op") =!= "I").isEmpty)
    val expected = orders.filter(col("o_orderkey") % 13 =!= 0).count()
    assert(out.count() == expected)
  }

  test("sim_ann_recall: the second band table can only add recall") {
    val r = LlmSimilarity.annRecall(spark, TestSpark.sf).head
    val (n, c1, c2) = (r.getAs[Long]("n_true"),
      r.getAs[Long]("caught_1t"), r.getAs[Long]("caught_2t"))
    assert(n == 50)
    assert(c2 >= c1, "OR-ing a second table is monotone in recall")
    assert(r.getAs[Double]("recall_2t") == c2.toDouble / n)
  }

  test("agg_hll_union estimates are partitioning-independent") {
    // sketch merge must commute with the data layout — re-partitioning the
    // input cannot change the merged estimate
    val base = Aggs.hllUnion(spark, TestSpark.sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val repart = Tables.orders(spark, TestSpark.sf).repartition(17)
    val alt = repart
      .groupBy(col("o_orderpriority"),
        trunc(col("o_orderdate"), "month").as("mon"))
      .agg(hll_sketch_agg(col("o_custkey")).as("sk"))
      .groupBy(col("o_orderpriority"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("est"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(base == alt,
      "HLL union estimate must not depend on partition layout")
  }
}
