package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-7 operators — invariants the DuckDB
  * oracle can't express (it only pins equality of one run). */
class Round7Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sql_q8_shape: market share is a valid fraction of the total") {
    val rows = SparkEntry.queries("sql_q8_shape")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nation = r.getLong(1); val total = r.getLong(2); val share = r.getDouble(3)
      assert(nation >= 0 && nation <= total)
      assert(share >= 0.0 && share <= 1.0)
      assert(math.abs(share - nation.toDouble / total.toDouble) == 0.0)
    }
  }

  test("sql_q4_shape: per-priority counts bounded by orders in the window") {
    val rows = SparkEntry.queries("sql_q4_shape")(spark, TestSpark.sf).collect()
    val windowTotal = Tables.orders(spark, TestSpark.sf)
      .filter(col("o_orderdate") >= lit("1996-01-01") &&
        col("o_orderdate") < lit("1996-07-01")).count()
    assert(rows.map(_.getLong(1)).sum <= windowTotal)
    assert(rows.map(_.getString(0)).distinct.length == rows.length)
  }

  test("sql_q22_shape: only customers with no orders are counted") {
    // numcust summed over codes == direct anti-join count above threshold
    val rows = SparkEntry.queries("sql_q22_shape")(spark, TestSpark.sf).collect()
    val c = Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"),
        floor(col("c_acctbal") * 100.0 + 0.5).cast("long").as("cents"))
    val thr = c.filter(col("cents") > 0)
      .agg((sum(col("cents")).cast("double") / count(lit(1))).as("thr"))
    val expected = c.crossJoin(thr)
      .filter(col("cents").cast("double") > col("thr"))
      .join(Tables.orders(spark, TestSpark.sf)
          .filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .count()
    assert(rows.map(_.getLong(1)).sum == expected)
  }

  test("sql_q10_shape: top-20 uses TakeOrderedAndProject, not a global sort") {
    val df = SparkEntry.queries("sql_q10_shape")(spark, TestSpark.sf)
    assert(df.count() <= 20)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in plan:\n$plan")
  }

  test("TpchShapes decorrelation plans: semi/anti/broadcast as designed") {
    def plan(q: String): String =
      SparkEntry.queries(q)(spark, TestSpark.sf)
        .queryExecution.executedPlan.toString
    // Q4's EXISTS must decorrelate to a semi join (no per-row subquery)
    assert(plan("sql_q4_shape").contains("LeftSemi"))
    // Q22's NOT EXISTS must decorrelate to an anti join
    assert(plan("sql_q22_shape").contains("LeftAnti"))
    // EXISTS-as-value must plan as an ExistenceJoin (boolean-emitting)
    assert(plan("sql_exists_flag").contains("ExistenceJoin"))
    // Q8/Q14 dimension sides must broadcast, and nothing may cartesian
    val p8 = plan("sql_q8_shape"); val p14 = plan("sql_q14_shape")
    assert(p8.contains("BroadcastHashJoin"))
    assert(p14.contains("BroadcastHashJoin"))
    Seq(p8, p14).foreach(p =>
      assert(!p.contains("CartesianProduct"), "no cartesian in Q8/Q14"))
  }

  test("TPC-H shape coverage is complete: all 22 query shapes registered") {
    val qs = SparkEntry.queries.keySet
    // Q1 and Q3 carry their original flagship names; the rest are sql_qN.
    assert(qs.contains("q1_pricing_summary") && qs.contains("q3_top_revenue"))
    val rest = Seq(2, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
      19, 20, 21, 22)
    rest.foreach(n => assert(qs.contains(s"sql_q${n}_shape"), s"missing Q$n"))
  }

  test("sql_q13_shape: zero-order customers survive the left join") {
    val rows = SparkEntry.queries("sql_q13_shape")(spark, TestSpark.sf).collect()
    // every customer lands in exactly one c_count bucket
    val nCustomers = Tables.customer(spark, TestSpark.sf).count()
    assert(rows.map(_.getLong(1)).sum == nCustomers)
  }

  test("sql_q15_shape: winners carry exactly the global max revenue") {
    val rows = SparkEntry.queries("sql_q15_shape")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val li = Tables.lineitem(spark, TestSpark.sf)
      .filter(col("l_shipdate") >= lit("1996-01-01") &&
        col("l_shipdate") < lit("1996-04-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        * 100.0 + 0.5).cast("long")).as("cents"))
    val maxCents = li.agg(max(col("cents"))).head().getLong(0)
    rows.foreach(r => assert(r.getLong(2) == maxCents))
  }

  test("sql_q20_shape: IN-with-correlated-HAVING decorrelates to joins") {
    val df = SparkEntry.queries("sql_q20_shape")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("LeftSemi"), s"expected LeftSemi in plan:\n$plan")
    // each selected supplier really dominates some small-part's volume
    val selected = df.collect().map(_.getLong(0)).toSet
    assert(selected.nonEmpty)
    val li = Tables.lineitem(spark, TestSpark.sf).join(
      Tables.part(spark, TestSpark.sf).filter(col("p_name").startsWith("small")),
      col("p_partkey") === col("l_partkey"))
    val perPair = li.groupBy(col("l_suppkey"), col("l_partkey"))
      .agg(sum(col("l_quantity")).as("q"))
    val perPart = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(col("l_quantity")).as("tot"))
    val dominant = perPair.join(perPart, col("l_partkey") === col("pk"))
      .filter(col("q") > col("tot") * 0.12)
      .select(col("l_suppkey")).distinct().collect().map(_.getLong(0)).toSet
    assert(selected == dominant)
  }

  test("sql_q6_shape: all three predicates reach the parquet scan") {
    val df = SparkEntry.queries("sql_q6_shape")(spark, TestSpark.sf)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters"))
    // the scan's pushed-filter list must mention every predicate column
    val scanLine = plan.linesIterator.filter(_.contains("PushedFilters"))
      .mkString("\n")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(scanLine.contains(c), s"$c not pushed: $scanLine"))
  }

  test("text_classifier_train: GD reduces in-sample MSE below the w=0 loss") {
    val w = SparkEntry.queries("text_classifier_train")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(w.nonEmpty && w.values.exists(_ != 0.0))
    // rebuild the feature table the same way and score both models
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("lang"),
        explode(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
          .as("tok"))
      .select(col("doc_id"), col("lang"),
        (conv(substring(md5(col("tok")), 1, 8), 16, 10).cast("long") % 16)
          .as("bucket"))
      .groupBy(col("doc_id"), col("lang"), col("bucket"))
      .agg(count(lit(1)).as("c"))
      .collect()
    val byDoc = docs.groupBy(_.getLong(0))
    var mse0 = 0.0; var mseT = 0.0; var n = 0
    byDoc.foreach { case (_, rows) =>
      val tot = rows.map(_.getLong(3)).sum.toDouble
      val y = if (rows.head.getString(1) == "en") 1.0 else 0.0
      val pred = rows.map(r =>
        r.getLong(3) / tot * w.getOrElse(r.getLong(2), 0.0)).sum
      mse0 += y * y; mseT += (pred - y) * (pred - y); n += 1
    }
    assert(mseT / n < mse0 / n,
      s"trained MSE ${mseT / n} not below baseline ${mse0 / n}")
  }

  test("text_char_entropy: bounds and degenerate cases") {
    val rows = SparkEntry.queries("text_char_entropy")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(1); val dist = r.getLong(2)
      val maxC = r.getLong(3); val h = r.getDouble(4)
      assert(dist >= 1 && dist <= 26)
      assert(maxC >= 1 && maxC <= n)
      assert(h >= 0.0 && h <= math.log(26.0) + 1e-12)
      if (dist == 1) assert(h == 0.0)
      else assert(h > 0.0)
      // entropy of a distribution over `dist` symbols is at most ln(dist)
      assert(h <= math.log(dist.toDouble) + 1e-12)
    }
  }

  test("sim_range_search: exactly the pairs above threshold, no extras") {
    val out = SparkEntry.queries("sim_range_search")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    out.values.foreach(s => assert(s >= 0.1))
    // brute-force recompute: every (q < 3, c) pair above threshold is present
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) { ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    for (q <- e.keys.filter(_ < 3); c <- e.keys if c != q) {
      val s = cos(e(q), e(c))
      if (s >= 0.1 + 1e-9) assert(out.contains((q, c)), s"missing pair ($q,$c) score=$s")
      if (s < 0.1 - 1e-9) assert(!out.contains((q, c)), s"extra pair ($q,$c) score=$s")
    }
  }

  test("text_lm_score: all log-probs negative, gibberish scores lower") {
    val rows = SparkEntry.queries("text_lm_score")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= 1, "every doc has at least one bigram")
      assert(r.getDouble(2) < 0.0, "smoothed bigram log-probs are < 0")
      // mean log-prob over a 27^2 alphabet can never drop below ln of the
      // floor probability 1/(n+v)
      assert(r.getDouble(2) >= -25.0)
    }
  }

  test("dd_dup_stats: rates consistent with dd_exact group sizes") {
    val rows = SparkEntry.queries("dd_dup_stats")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val totalDocs = Tables.documents(spark, TestSpark.sf).count()
    assert(rows.map(_._2).sum == totalDocs, "sources partition the corpus")
    val totalDups = totalDocs -
      SparkEntry.queries("dd_exact")(spark, TestSpark.sf).count()
    assert(rows.map(_._3).sum == totalDups,
      "per-source dups must sum to corpus dups (copies beyond group firsts)")
    rows.foreach { case (_, n, dups, rate) =>
      assert(dups <= n)
      assert(rate == dups.toDouble / n.toDouble)
    }
  }

  test("sim_knn_graph: ranks dense from 1, neighbors distinct, scores sorted") {
    val rows = SparkEntry.queries("sim_knn_graph")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (v, nbs) =>
      val sorted = nbs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1 to nbs.length),
        s"ranks of $v must be dense from 1")
      assert(nbs.length <= 3)
      assert(nbs.map(_._3).distinct.length == nbs.length,
        s"neighbors of $v must be distinct")
      assert(!nbs.map(_._3).contains(v), "no self-loops")
      // scores non-increasing in rank
      sorted.map(_._4).toSeq.sliding(2).foreach { w =>
        if (w.length == 2) assert(w(0) >= w(1))
      }
    }
  }

  test("pii_generalize: k-anonymity holds on every non-suppressed group") {
    val rows = SparkEntry.queries("pii_generalize")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2),
        r.getString(3), r.getString(4)))
    val total = Tables.customer(spark, TestSpark.sf).count()
    assert(rows.length == total, "exactly one row per customer")
    assert(rows.map(_._1).distinct.length == rows.length)
    // anonymity: every emitted level-1/2 quasi-identifier combo has >= k
    rows.filter(_._2 != 3).groupBy(t => (t._2, t._3, t._4, t._5))
      .foreach { case (key, members) =>
        assert(members.length >= 10, s"group $key has ${members.length} < k")
      }
    rows.filter(_._2 == 3).foreach { case (_, _, g, b, s) =>
      assert(g == "*" && b == "*" && s == "*", "level 3 must fully suppress")
    }
  }

  test("ev_ab_test: valid rates, z sign matches the rate difference") {
    val rows = SparkEntry.queries("ev_ab_test")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val users = Tables.events(spark, TestSpark.sf)
      .select(col("user_id")).distinct().count()
    rows.foreach { r =>
      val (na, nb) = (r.getLong(1), r.getLong(2))
      val (ca, cb) = (r.getLong(3), r.getLong(4))
      val (ra, rb, z) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
      assert(na + nb == users)
      assert(ca <= na && cb <= nb)
      assert(ra >= 0.0 && ra <= 1.0 && rb >= 0.0 && rb <= 1.0)
      assert(!z.isNaN && !z.isInfinite)
      assert(math.signum(z) == math.signum(rb - ra))
    }
  }

  test("vec_quantize_int8: codes in [-127,127], scale element hits ±127") {
    val rows = SparkEntry.queries("vec_quantize_int8")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val codes = r.getString(2).split('|').map(_.toInt)
      assert(codes.forall(c => c >= -127 && c <= 127))
      // the max-|x| element quantizes to exactly ±127
      assert(codes.exists(c => c == 127 || c == -127))
    }
  }
}
