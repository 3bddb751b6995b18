package graft.ops

import graft.{OracleSafe, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational core — scans, filters, aggregations, joins (SURVEY.md §2.3–2.7).
  *
  * Scale posture: all aggregations are plain `groupBy.agg` so Catalyst emits
  * partial (map-side) + final aggregates; dimension joins broadcast the small
  * side explicitly; fact-fact joins shuffle on their join key only. Every
  * query ends in a total-order `orderBy` for oracle hash stability.
  */
object Relational extends QueryModule {
  import OracleSafe._

  /** TPC-H Q1 shape: scan → pushed filter → hash agg → sort. */
  def pricingSummary(s: SparkSession, d: String): DataFrame = {
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp_ntz"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("sum_disc_price"),
        dsum3(col("l_extendedprice"), lit(1.0) - col("l_discount"), lit(1.0) + col("l_tax"))
          .as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) AS sum_base_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4)) * CAST(1.0 + l_tax AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS sum_charge,
      |  CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_extendedprice) AS avg_price,
      |  CAST(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem, top-10 revenue.
    * customer is small → broadcast; orders⋈lineitem shuffles on orderkey.
    * Top-k via orderBy+limit → TakeOrderedAndProject (no global sort). */
  def topRevenueOrders(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord  = Tables.orders(s, d)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp_ntz"))
    val li   = Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp_ntz"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum2(col("l_extendedprice"), lit(1.0) - col("l_discount")).as("revenue"))
      .select(col("l_orderkey"), col("o_orderdate").cast("date").as("orderdate"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val topRevenueOrdersSql: String =
    """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS orderdate,
      |  CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) * CAST(1.0 - l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** SCD-type-2 MERGE: close the current row of every updated key (set
    * valid_to/is_current) and open a new row effective `eff`. Unmatched
    * rows pass through untouched. This is the upsert-into-dimension plan:
    * one semi + one anti join against the update key set (broadcast — at
    * 100 TB the daily update batch is small relative to the dimension) and
    * a union; no full-table rewrite logic leaks into callers. */
  def scd2Merge(dim: DataFrame, upd: DataFrame, key: String, eff: String): DataFrame = {
    val updKeys = upd.select(col(key))
    val closed = dim.join(broadcast(updKeys), Seq(key), "left_semi")
      .withColumn("valid_to", lit(eff).cast("date"))
      .withColumn("is_current", lit(0))
    val untouched = dim.join(broadcast(updKeys), Seq(key), "left_anti")
    val opened = upd
      .withColumn("valid_from", lit(eff).cast("date"))
      .withColumn("valid_to", lit("2200-01-01").cast("date"))
      .withColumn("is_current", lit(1))
    untouched.unionByName(closed).unionByName(opened)
  }

  /** Registered SCD2 scenario: customer is the day-0 dimension snapshot;
    * every 10th key receives an upgraded segment + adjusted balance
    * effective 2024-06-01 (update batch derived deterministically from the
    * same table so the oracle can rebuild it). */
  def scd2Upsert(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.customer(s, d).select(
      col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
      lit("2024-01-01").cast("date").as("valid_from"),
      lit("2200-01-01").cast("date").as("valid_to"),
      lit(1).as("is_current"))
    val upd = Tables.customer(s, d).filter(col("c_custkey") % 10 === 0)
      .select(col("c_custkey"), lit("UPGRADED").as("c_mktsegment"),
        (col("c_acctbal") + 100.0).as("c_acctbal"))
    scd2Merge(dim, upd, "c_custkey", "2024-06-01")
      .orderBy(col("c_custkey"), col("valid_from"))
  }

  val scd2UpsertSql: String =
    """WITH dim AS (
      |  SELECT c_custkey, c_mktsegment, c_acctbal,
      |    DATE '2024-01-01' AS valid_from, DATE '2200-01-01' AS valid_to,
      |    1 AS is_current
      |  FROM customer),
      |upd AS (
      |  SELECT c_custkey, 'UPGRADED' AS c_mktsegment,
      |    c_acctbal + 100.0 AS c_acctbal
      |  FROM customer WHERE c_custkey % 10 = 0)
      |SELECT * FROM (
      |  SELECT d.* FROM dim d
      |  WHERE c_custkey NOT IN (SELECT c_custkey FROM upd)
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment, c_acctbal, valid_from,
      |    DATE '2024-06-01' AS valid_to, 0 AS is_current
      |  FROM dim WHERE c_custkey IN (SELECT c_custkey FROM upd)
      |  UNION ALL
      |  SELECT c_custkey, c_mktsegment, c_acctbal,
      |    DATE '2024-06-01', DATE '2200-01-01', 1
      |  FROM upd) t
      |ORDER BY c_custkey, valid_from""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (pricingSummary _),
    "q3_top_revenue"     -> (topRevenueOrders _),
    "rel_scd2_merge"     -> (scd2Upsert _),
  )

  override def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" -> pricingSummarySql,
    "q3_top_revenue"     -> topRevenueOrdersSql,
    "rel_scd2_merge"     -> scd2UpsertSql,
  )
}
