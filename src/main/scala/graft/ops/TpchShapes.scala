package graft.ops

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Classic OLAP query shapes (TPC-H Q4/Q7/Q8/Q10/Q14/Q17/Q19/Q22 adapted to
  * the fixture's trimmed schema — no partsupp, no commitdate/shipmode), all
  * through the SQL entry path so Catalyst's parser + decorrelation + join
  * reorder are exercised end-to-end (SURVEY.md §2.8 SQL shapes family).
  *
  * Scale posture per query is noted inline; the common pattern: fact-side
  * scans shuffle once on the join key, dimension sides broadcast, EXISTS /
  * NOT EXISTS decorrelate to semi/anti hash joins, and scalar subqueries
  * become one broadcast row — no per-row subquery execution anywhere.
  *
  * Float parity with the DuckDB oracle follows the repo recipe: money math
  * in exact DECIMAL (emitted via string→double) or integer cents
  * (`floor(x*100+0.5)`); ratios as one double division of exact integers —
  * IEEE division is correctly rounded, so both engines produce the same
  * bits. */
object TpchShapes extends QueryModule {

  private def views(s: SparkSession, d: String, ts: String*): Unit =
    ts.foreach(t => Tables.table(s, d, t).createOrReplaceTempView(t))

  /** Q4 shape — order-priority checking: EXISTS(late line) decorrelates to
    * a left-semi hash join on l_orderkey; the date filter prunes orders
    * before the join. One shuffle each side, tiny output. */
  def q4(s: SparkSession, d: String): DataFrame = {
    views(s, d, "orders", "lineitem")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL '30' DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Q7 shape — volume shipping between two nations: the nation pair
    * predicate lands on two broadcast copies of `nation`; lineitem joins
    * orders/supplier on their keys (shuffle), then aggregates by
    * (supp_nation, cust_nation, year) — a handful of groups. */
  def q7(s: SparkSession, d: String): DataFrame = {
    views(s, d, "supplier", "lineitem", "orders", "customer", "nation")
    s.sql(
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(CAST(SUM(vol) AS STRING) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l.l_shipdate) AS l_year,
        |    CAST(l.l_extendedprice AS DECIMAL(12,4))
        |      * CAST(1.0 - l.l_discount AS DECIMAL(8,4)) AS vol
        |  FROM supplier s
        |  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
        |     OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')) t
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
  }

  /** Q8 shape — market share of one supplier nation within a customer
    * region, per order year. Revenue in integer cents so the share is one
    * double division of exact BIGINTs (bit-identical across engines). */
  def q8(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "orders", "customer", "supplier", "nation", "region")
    s.sql(
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
        |    AS BIGINT) AS nation_cents,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(SUM(cents) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT year(o.o_orderdate) AS o_year, n1.n_name AS supp_nation,
        |    CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5)
        |      AS BIGINT) AS cents
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |  JOIN region r ON n2.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  WHERE r.r_name = 'ASIA') t
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin)
  }

  /** Q10 shape — returned-item reporting: top-20 customers by revenue lost
    * to returns in one quarter. The HAVING-free aggregate shrinks to one
    * row per customer before the global top-20 (TakeOrderedAndProject —
    * no full sort). Decimal-exact revenue makes the cutoff deterministic. */
  def q10(s: SparkSession, d: String): DataFrame = {
    views(s, d, "customer", "orders", "lineitem", "nation")
    s.sql(
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
        |    * CAST(1.0 - l.l_discount AS DECIMAL(8,4))) AS STRING) AS DOUBLE)
        |    AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, n.n_name
        |ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
        |    * CAST(1.0 - l.l_discount AS DECIMAL(8,4))) DESC, c.c_custkey
        |LIMIT 20""".stripMargin)
  }

  /** Q14 shape — promo revenue share in one month: single-row CASE-ratio
    * aggregate; cents + one double division as in Q8. The part join
    * broadcasts (dimension side). */
  def q14(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part")
    s.sql(
      """SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
        |    AS BIGINT) AS promo_cents,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents,
        |  100.0 * (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(SUM(cents) AS DOUBLE)) AS promo_pct
        |FROM (
        |  SELECT p.p_type,
        |    CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5)
        |      AS BIGINT) AS cents
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |    AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00') t""".stripMargin)
  }

  /** Q17 shape — small-quantity-order revenue: correlated scalar AVG
    * subquery per part, decorrelated by Catalyst into an aggregate + join
    * on l_partkey. Quantities are integral doubles, so SUM/COUNT and the
    * 0.2× threshold are add-order-free and bit-identical. */
  def q17(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part")
    s.sql(
      """SELECT p.p_brand,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))) AS STRING)
        |    AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND l.l_quantity < (
        |    SELECT 0.2 * (CAST(SUM(l2.l_quantity) AS DOUBLE) / COUNT(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin)
  }

  /** Q19 shape — disjunctive band predicates (brand × size × quantity):
    * Catalyst pushes the OR-of-ANDs below the join and prunes part columns;
    * the surviving predicate set is a bitmap-style multi-range scan. */
  def q19(s: SparkSession, d: String): DataFrame = {
    views(s, d, "lineitem", "part")
    s.sql(
      """SELECT
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
        |    * CAST(1.0 - l.l_discount AS DECIMAL(8,4))) AS STRING) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
        |        AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
        |        AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
        |        AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin)
  }

  /** Q22 shape — above-average balances with no high-value orders:
    * global-average scalar subquery (one broadcast row) + NOT EXISTS anti
    * join; the country-code stand-in is `c_custkey % 7`. (Classic Q22 uses
    * "no orders at all", which is empty on this fixture — every customer
    * orders — so the anti-join predicate is price-scoped instead, the same
    * 400k idiom as `sql_exists_shape`.) Balance math in integer cents; the
    * threshold is one double division of exact BIGINTs. */
  def q22(s: SparkSession, d: String): DataFrame = {
    views(s, d, "customer", "orders")
    s.sql(
      """WITH c AS (
        |  SELECT c_custkey, c_custkey % 7 AS cntrycode,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |t AS (SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS thr
        |      FROM c WHERE cents > 0)
        |SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM c CROSS JOIN t
        |WHERE CAST(cents AS DOUBLE) > thr
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin)
  }

  /** EXISTS used as a VALUE (not a filter): segment × has-big-order
    * counts. Catalyst plans the non-filtering EXISTS as an ExistenceJoin —
    * a semi join that emits a boolean instead of dropping rows — the third
    * decorrelation form after left-semi (Q4) and left-anti (Q22). One hash
    * join + one aggregate; no per-row subquery. */
  def existsFlag(s: SparkSession, d: String): DataFrame = {
    views(s, d, "customer", "orders")
    s.sql(
      """SELECT c_mktsegment,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |    THEN 1 ELSE 0 END AS has_big_order,
        |  COUNT(*) AS n_customers
        |FROM customer c
        |GROUP BY c_mktsegment,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |    THEN 1 ELSE 0 END
        |ORDER BY c_mktsegment, has_big_order""".stripMargin)
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "sql_exists_flag" -> (existsFlag _),
    "sql_q4_shape"  -> (q4 _),
    "sql_q7_shape"  -> (q7 _),
    "sql_q8_shape"  -> (q8 _),
    "sql_q10_shape" -> (q10 _),
    "sql_q14_shape" -> (q14 _),
    "sql_q17_shape" -> (q17 _),
    "sql_q19_shape" -> (q19 _),
    "sql_q22_shape" -> (q22 _),
  )

  override def oracleSql: Map[String, String] = Map(
    "sql_exists_flag" ->
      """SELECT c_mktsegment,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |    THEN 1 ELSE 0 END AS has_big_order,
        |  COUNT(*) AS n_customers
        |FROM customer c
        |GROUP BY c_mktsegment,
        |  CASE WHEN EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
        |    THEN 1 ELSE 0 END
        |ORDER BY c_mktsegment, has_big_order""".stripMargin,
    "sql_q4_shape" ->
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM orders o
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND EXISTS (SELECT 1 FROM lineitem l
        |    WHERE l.l_orderkey = o.o_orderkey
        |      AND l.l_shipdate > o.o_orderdate + INTERVAL '30' DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "sql_q7_shape" ->
      """SELECT supp_nation, cust_nation, l_year,
        |  CAST(CAST(SUM(vol) AS VARCHAR) AS DOUBLE) AS revenue,
        |  COUNT(*) AS n_lines
        |FROM (
        |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |    year(l.l_shipdate) AS l_year,
        |    CAST(l.l_extendedprice AS DECIMAL(12,4))
        |      * CAST(1.0 - l.l_discount AS DECIMAL(8,4)) AS vol
        |  FROM supplier s
        |  JOIN lineitem l ON s.s_suppkey = l.l_suppkey
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |  WHERE (n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
        |     OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20')) t
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,
    "sql_q8_shape" ->
      """SELECT o_year,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
        |    AS BIGINT) AS nation_cents,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents,
        |  CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN cents ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(SUM(cents) AS DOUBLE) AS mkt_share
        |FROM (
        |  SELECT year(o.o_orderdate) AS o_year, n1.n_name AS supp_nation,
        |    CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5)
        |      AS BIGINT) AS cents
        |  FROM lineitem l
        |  JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  JOIN customer c ON c.c_custkey = o.o_custkey
        |  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
        |  JOIN region r ON n2.n_regionkey = r.r_regionkey
        |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
        |  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
        |  WHERE r.r_name = 'ASIA') t
        |GROUP BY o_year
        |ORDER BY o_year""".stripMargin,
    "sql_q10_shape" ->
      """SELECT c.c_custkey, c.c_name, n.n_name,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
        |    * CAST(1.0 - l.l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE)
        |    AS revenue
        |FROM customer c
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN nation n ON n.n_nationkey = c.c_nationkey
        |WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND o.o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
        |  AND l.l_returnflag = 'R'
        |GROUP BY c.c_custkey, c.c_name, n.n_name
        |ORDER BY SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
        |    * CAST(1.0 - l.l_discount AS DECIMAL(8,4))) DESC, c.c_custkey
        |LIMIT 20""".stripMargin,
    "sql_q14_shape" ->
      """SELECT
        |  CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
        |    AS BIGINT) AS promo_cents,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents,
        |  100.0 * (CAST(SUM(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END)
        |      AS DOUBLE)
        |    / CAST(SUM(cents) AS DOUBLE)) AS promo_pct
        |FROM (
        |  SELECT p.p_type,
        |    CAST(floor(l.l_extendedprice * (1.0 - l.l_discount) * 100.0 + 0.5)
        |      AS BIGINT) AS cents
        |  FROM lineitem l
        |  JOIN part p ON p.p_partkey = l.l_partkey
        |  WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
        |    AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00') t""".stripMargin,
    "sql_q17_shape" ->
      """SELECT p.p_brand,
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))) AS VARCHAR)
        |    AS DOUBLE) / 7.0 AS avg_yearly,
        |  COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_brand IN ('Brand#1', 'Brand#2', 'Brand#3')
        |  AND l.l_quantity < (
        |    SELECT 0.2 * (CAST(SUM(l2.l_quantity) AS DOUBLE) / COUNT(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand
        |ORDER BY p.p_brand""".stripMargin,
    "sql_q19_shape" ->
      """SELECT
        |  CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,4))
        |    * CAST(1.0 - l.l_discount AS DECIMAL(8,4))) AS VARCHAR) AS DOUBLE)
        |    AS revenue,
        |  COUNT(*) AS n_lines
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 5
        |        AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 10
        |        AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
        |        AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "sql_q22_shape" ->
      """WITH c AS (
        |  SELECT c_custkey, c_custkey % 7 AS cntrycode,
        |    CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT) AS cents
        |  FROM customer),
        |t AS (SELECT CAST(SUM(cents) AS DOUBLE) / COUNT(*) AS thr
        |      FROM c WHERE cents > 0)
        |SELECT cntrycode, COUNT(*) AS numcust,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM c CROSS JOIN t
        |WHERE CAST(cents AS DOUBLE) > thr
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
        |GROUP BY cntrycode
        |ORDER BY cntrycode""".stripMargin,
  )
}
