package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Parquet FOOTER AGGREGATE PUSHDOWN — the metadata-only fast path for
  * COUNT/MIN/MAX: with the V2 parquet reader and
  * `spark.sql.parquet.aggregatePushdown`, a bare aggregate is answered
  * from row-group statistics in the footers, reading ZERO data pages — at
  * 100 TB that is the difference between a cluster-wide scan and a
  * listing-scale metadata job. Spark routes parquet through the V1 path
  * by default (`useV1SourceList`), so this capability is config-gated;
  * the spec flips both configs for its scope, asserts the plan actually
  * pushed the aggregation into the scan, and proves the footer-derived
  * answers equal the full-scan ones. Test-gated (plan-shape capability):
  * the driver's DuckDB gate cannot see Spark plan internals. */
class FooterAggSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def withPushdown[A](f: => A): A = {
    val savedV1 = spark.conf.get("spark.sql.sources.useV1SourceList")
    val savedPd = spark.conf.get("spark.sql.parquet.aggregatePushdown")
    try {
      spark.conf.set("spark.sql.sources.useV1SourceList", "")
      spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
      f
    } finally {
      spark.conf.set("spark.sql.sources.useV1SourceList", savedV1)
      spark.conf.set("spark.sql.parquet.aggregatePushdown", savedPd)
    }
  }

  test("COUNT/MIN/MAX are answered from footers: plan pushes, values match the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_footer_").toString
    Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"))
      .write.mode("overwrite").parquet(dir)
    val expected = spark.read.parquet(dir)
      .agg(count(lit(1)), min(col("o_orderkey")), max(col("o_orderkey")))
      .collect().head
    withPushdown {
      val df = spark.read.parquet(dir)
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).as("mn"),
          max(col("o_orderkey")).as("mx"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation: [COUNT(*)"),
        s"aggregation must reach the scan, got:\n$plan")
      val r = df.collect().head
      assert(r.getLong(0) == expected.getLong(0))
      assert(r.getLong(1) == expected.getLong(1))
      assert(r.getLong(2) == expected.getLong(2))
    }
  }

  test("GROUP BY a partition column still pushes: per-directory footer counts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_footer_p").toString
    Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_orderstatus"))
      .write.mode("overwrite").partitionBy("o_orderstatus").parquet(dir)
    val expected = spark.read.parquet(dir)
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    withPushdown {
      val df = spark.read.parquet(dir)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("PushedAggregation"),
        s"grouped-by-partition-column count must push, got:\n$plan")
      assert(df.collect().map(r => (r.getString(0), r.getLong(1))).toSeq
        == expected)
    }
  }

  test("a residual filter disables the fast path — correctness beats metadata") {
    val dir = java.nio.file.Files.createTempDirectory("graft_footer_f").toString
    Tables.orders(spark, TestSpark.sf).select(col("o_orderkey"))
      .write.mode("overwrite").parquet(dir)
    withPushdown {
      val df = spark.read.parquet(dir)
        .filter(col("o_orderkey") % 2 === 0).agg(count(lit(1)).as("n"))
      assert(!df.queryExecution.executedPlan.toString
        .contains("PushedAggregation: [COUNT"),
        "a data-dependent filter cannot be answered from footers")
      val expected = Tables.orders(spark, TestSpark.sf)
        .filter(col("o_orderkey") % 2 === 0).count()
      assert(df.collect().head.getLong(0) == expected)
    }
  }
}
