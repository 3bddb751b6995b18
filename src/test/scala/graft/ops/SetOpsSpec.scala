package graft.ops

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** §2.7 partition-local sort: the oracle only checks content (the comparer
  * is order-insensitive), so the ordering property itself is pinned here. */
class SetOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

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
