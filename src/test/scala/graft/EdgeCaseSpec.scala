package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Empty-input and degenerate-shape behavior of the reusable library
  * operators — a production engine must not throw on the boring cases
  * (empty partitions, empty sides, no-op updates). */
class EdgeCaseSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Redact applies to an empty DataFrame: schema transforms, zero rows") {
    val df = Seq.empty[(Long, String, String)].toDF("id", "email", "note")
    val out = pii.Redact(df, Seq(
      pii.Redact.Drop("note"),
      pii.Redact.HashPseudonym("email", "s")))
    assert(out.columns.toSeq == Seq("id", "email"))
    assert(out.count() == 0)
  }

  test("native as-of join with an empty right side: all-null matches, no crash") {
    val left = Seq((1L, 10L), (2L, 20L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long, String)].toDF("k", "t", "v")
    val out = plans.AsOfJoin(spark, left, right,
      left("k"), right("k"), left("t"), right("t"))
    assert(out.count() == 2)
    assert(out.filter(col("v").isNotNull).count() == 0)
  }

  test("native as-of join with an empty left side: empty output") {
    val left = Seq.empty[(Long, Long)].toDF("k", "t")
    val right = Seq((1L, 5L, "x")).toDF("k", "t", "v")
    val out = plans.AsOfJoin(spark, left, right,
      left("k"), right("k"), left("t"), right("t"))
    assert(out.count() == 0)
  }

  test("scd2Merge with zero updates is a pure pass-through") {
    val dim = Seq((1L, "a"), (2L, "b")).toDF("k", "attr")
      .withColumn("valid_from", lit("2024-01-01").cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(1))
    val upd = Seq.empty[(Long, String)].toDF("k", "attr")
    val out = ops.Relational.scd2Merge(dim, upd, "k", "2024-06-01")
    assert(out.count() == 2)
    assert(out.filter(col("is_current") === 1).count() == 2)
  }

  test("single-row inputs survive the window/aggregate kernels") {
    val one = Seq(("en", 7L)).toDF("lang", "n_tokens")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"lang").orderBy($"n_tokens")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val packed = one
      .withColumn("cum", coalesce(sum($"n_tokens").over(w), lit(0L)))
    assert(packed.head.getAs[Long]("cum") == 0L)
  }

  test("CorpusPipeline with a filter-everything config yields empty " +
    "stats, not a crash") {
    val out = new api.CorpusPipeline(
      api.CorpusConfig(minTokens = Int.MaxValue)).run(spark, TestSpark.sf)
    assert(out.count() == 0)
    assert(out.columns.toSeq ==
      Seq("split", "lang", "n_docs", "total_tokens", "first_doc"))
  }

  test("pipeline stages compose on a DataFrame with no benchmark docs " +
    "(benchMod larger than every doc_id): nothing is decontaminated away") {
    val p = new api.CorpusPipeline(api.CorpusConfig(benchMod = Long.MaxValue))
    val kept = p.run(spark, TestSpark.sf).agg(sum("n_docs")).head.getLong(0)
    val default = new api.CorpusPipeline().run(spark, TestSpark.sf)
      .agg(sum("n_docs")).head.getLong(0)
    assert(kept >= default,
      "disabling decontamination can only keep more docs")
  }
}
