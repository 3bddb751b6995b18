package graft.ops

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Degenerate-shape behavior of the round-13 families, driven through
  * synthetic parquet fixtures so the guard paths the real fixtures never
  * reach (cohort extinction, all-censored, zero-drift, n < k sampling)
  * are pinned. */
class Round13EdgeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Write a minimal fixture dir holding only the named tables. */
  private def fixtureDir(tables: (String, org.apache.spark.sql.DataFrame)*)
      : String = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_edge_").toFile
    dir.deleteOnExit()
    tables.foreach { case (name, df) =>
      df.write.mode("overwrite").parquet(s"${dir.getAbsolutePath}/$name.parquet")
    }
    dir.getAbsolutePath
  }

  private def events(rows: Seq[(Long, String, Long, String, Double)]) =
    rows.toDF("event_id", "tss", "user_id", "event_type", "value")
      .withColumn("ts", col("tss").cast("timestamp"))
      .withColumn("props", lit("{}"))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")

  test("surv_km: instant universal conversion — the cohort dies at t=0, S(0)=0") {
    // Every user's first event IS the purchase: d = n at the only grid
    // point, exercising the extinction guard (ln(0) never evaluates).
    val d = fixtureDir("events" -> events(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "purchase", 1.0),
      (2L, "2024-01-01 00:00:00", 2L, "purchase", 1.0))))
    val r = Survival.km(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("t") == 0L)
    assert(r.head.getAs[Long]("n_risk") == 2L)
    assert(r.head.getAs[Long]("d") == 2L)
    assert(r.head.getAs[Double]("s_km") == 0.0)
  }

  test("surv_km: nobody converts — everyone censors at the window, S stays 1") {
    val d = fixtureDir("events" -> events(Seq(
      (1L, "2024-01-01 00:00:00", 1L, "view", 1.0),
      (2L, "2024-01-02 00:00:00", 1L, "click", 1.0),
      (3L, "2024-01-01 00:00:00", 2L, "view", 1.0))))
    val r = Survival.km(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("t") == 48L) // administrative horizon
    assert(r.head.getAs[Long]("d") == 0L)
    assert(r.head.getAs[Long]("c") == 2L)
    assert(r.head.getAs[Double]("s_km") == 1.0)
  }

  test("ev_cusum_drift: a perfectly flat stream never drifts — sentinel hour -1") {
    // One event per hour per type: x = k/1000 exactly, every step clamps
    // to 0, so cmax = 0 and the argmax sentinel survives.
    val rows = (0 until 24).map { h =>
      (h.toLong, f"2024-01-01 $h%02d:00:00", 1L, "view", 1.0) }
    val d = fixtureDir("events" -> events(rows))
    val r = Events.cusumDrift(spark, d).collect()
    assert(r.length == 1)
    assert(r.head.getAs[Long]("cusum_max") == 0L)
    assert(r.head.getAs[Long]("h_at_max") == -1L)
  }

  test("corpus_weighted_sample: fewer docs than k returns every doc") {
    val docs = Seq((1L, "aaa", "en", "web", 10L), (2L, "bbb", "en", "web", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val d = fixtureDir("documents" -> docs)
    val r = Corpus.weightedSample(spark, d).collect()
    assert(r.map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("ml_auc_exact: a single-class label degenerates to an explicit 0/0") {
    val orders = Seq((1L, 10L, "O", 100.0, "2024-01-01", "1-URGENT"),
        (2L, 11L, "O", 200.0, "2024-01-01", "5-LOW"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "od", "o_orderpriority")
      .withColumn("o_orderdate", col("od").cast("timestamp")).drop("od")
    val cust = Seq((10L, "Customer#10", 1, 50.0, "BUILDING"),
        (11L, "Customer#11", 2, 60.0, "MACHINERY"))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val d = fixtureDir("orders" -> orders, "customer" -> cust)
    val r = Ml.aucExact(spark, d).collect().head
    assert(r.getAs[Long]("n_pos") == 0L)
    assert(r.getAs[Long]("auc_den") == 0L)
    assert(r.isNullAt(r.fieldIndex("auc"))) // undefined → NULL, never a throw
  }
}
