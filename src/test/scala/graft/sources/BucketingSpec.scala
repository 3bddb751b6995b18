package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed tables co-locate join keys at WRITE time so a later join on
  * the bucket key needs NO shuffle — the 100-TB join strategy for
  * repeatedly-joined fact tables (SURVEY §2.1 "partitioned write" class /
  * prompt's bucketing requirement). Asserts the plan property, not just
  * the row counts. */
class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("partition pruning: filter on partition column skips directories") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Tables.orders(spark, TestSpark.sf)
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("o_orderstatus") === "F")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.contains("o_orderstatus"), s"no partition filter:\n$scan")
    val all = Tables.orders(spark, TestSpark.sf)
      .filter(col("o_orderstatus") === "F").count()
    assert(q.count() == all)
  }

  test("join on bucketed tables plans without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.orders(spark, TestSpark.sf)
        .write.mode("overwrite").bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey").saveAsTable("orders_b")
      Tables.lineitem(spark, TestSpark.sf)
        .write.mode("overwrite").bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))

      val plan = joined.queryExecution.executedPlan.toString
      // the join keys must NOT be shuffled (bucket layout satisfies the
      // distribution); the groupBy's own exchange is expected and fine
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
             !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join should not shuffle its keys:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan not bucketed:\n$plan")

      // and it still computes the right thing
      val expected = Tables.lineitem(spark, TestSpark.sf)
        .join(Tables.orders(spark, TestSpark.sf),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).isEmpty &&
        expected.exceptAll(joined).isEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
