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

  test("dynamic partition pruning: a filtered dim join prunes fact " +
    "partitions at runtime") {
    // The 100-TB star-join pattern: the fact table is partitioned on the
    // join key's column; a selective filter on the dim side must reach the
    // fact SCAN as a runtime (dynamicpruning) partition filter — without
    // it, every partition of a 100 TB fact is read to serve a two-priority
    // query. The dim is written to parquet first so its filter cannot
    // constant-fold away.
    val factDir = java.nio.file.Files.createTempDirectory("graft_dpp_f").toString
    val dimDir = java.nio.file.Files.createTempDirectory("graft_dpp_d").toString
    // At fixture scale the stats-based benefit estimate rounds to "not
    // worth it"; the fixed fallback ratio models the 100-TB fact where
    // pruning always pays.
    spark.conf.set("spark.sql.optimizer.dynamicPartitionPruning.useStats", "false")
    try {
    Tables.orders(spark, TestSpark.sf)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(factDir)
    Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderpriority").as("prio")).distinct()
      // the dim filter must be a literal comparison — a bare boolean
      // column is not "likely selective" to the DPP planner
      .withColumn("grp",
        when(col("prio").startsWith("1") || col("prio").startsWith("2"),
          "urgent").otherwise("other"))
      .write.mode("overwrite").parquet(dimDir)
    val fact = spark.read.parquet(factDir)
    val dim = spark.read.parquet(dimDir).filter(col("grp") === "urgent")
    val q = fact.join(dim, fact("o_orderpriority") === dim("prio"))
      .groupBy(col("prio")).agg(count(lit(1)).as("n"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"fact scan must carry a runtime partition-pruning filter:\n$plan")
    val expected = Tables.orders(spark, TestSpark.sf)
      .filter(col("o_orderpriority").startsWith("1") ||
        col("o_orderpriority").startsWith("2"))
      .groupBy(col("o_orderpriority").as("prio")).agg(count(lit(1)).as("n"))
    assert(q.exceptAll(expected).isEmpty && expected.exceptAll(q).isEmpty)
    } finally spark.conf.unset("spark.sql.optimizer.dynamicPartitionPruning.useStats")
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
