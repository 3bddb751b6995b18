package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** §2.7 partition-local sort: the oracle only checks content (the comparer
  * is order-insensitive), so the ordering property itself is pinned here. */
class SetOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tablesample: seeded sample is deterministic and near the fraction") {
    val a = SetOps.tableSample(spark, TestSpark.sf).collect()
    val b = SetOps.tableSample(spark, TestSpark.sf).collect()
    assert(a.toSeq == b.toSeq, "same seed must sample identically")
    val sampled = a.map(_.getLong(1)).sum.toDouble
    val total = graft.Tables.lineitem(spark, TestSpark.sf).count().toDouble
    val frac = sampled / total
    assert(frac > 0.07 && frac < 0.13, s"fraction $frac out of band")
  }

  test("observe: pipeline metrics ride the query without a second scan") {
    import org.apache.spark.sql.functions._
    val df = graft.Tables.orders(spark, TestSpark.sf)
      .observe("metrics", count(lit(1)).as("rows"),
        sum(col("o_totalprice")).as("price_sum"))
      .filter(col("o_totalprice") > 0)
    df.collect()
    val m = df.queryExecution.observedMetrics("metrics")
    assert(m.getAs[Long]("rows") ==
      graft.Tables.orders(spark, TestSpark.sf).count())
    assert(m.getAs[Double]("price_sum") > 0)
  }

  test("sort_within_partitions: rows are sorted within every partition") {
    val df = SetOps.partitionLocalSort(spark, TestSpark.sf)
    // plan shape: no global range exchange — only the hash repartition
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("rangepartitioning"),
      s"unexpected global sort exchange in:\n$plan")
    val badPartitions = df
      .select("o_custkey", "o_orderkey")
      .rdd
      .mapPartitions { it =>
        val rows = it.map(r => (r.getLong(0), r.getLong(1))).toSeq
        Iterator.single(rows == rows.sorted)
      }
      .filter(!_)
      .count()
    assert(badPartitions == 0, s"$badPartitions partitions out of order")
  }
}
