package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Model-scoring family (ml_*): each query is oracle-gated vs DuckDB; these
  * tests pin the SEMANTICS against independent plain-Scala references —
  * tree routing, exact AUC, fold partitioning, gain-table monotonicity —
  * so a refactor that still hashes consistently but computes the wrong
  * statistic cannot slip through. */
class MlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, TestSpark.sf).collect()

  test("ml_tree_score: dataflow traversal equals a local recursive evaluator") {
    // Local reference: route every (price, bal, prioHigh) through the same
    // node table with plain recursion; compare per-leaf counts.
    val nodes = Map(
      0 -> ("price", 250000.0, 1, 2), 1 -> ("bal", 3000.0, 3, 4),
      2 -> ("bal", 5000.0, 5, 6), 3 -> ("prio", 0.5, 7, 8),
      4 -> ("price", 100000.0, 9, 10), 5 -> ("prio", 0.5, 11, 12),
      6 -> ("price", 400000.0, 13, 14))
    def route(price: Double, bal: Double, prio: Double): Int = {
      var n = 0
      while (n < 7) {
        val (f, thr, lt, rt) = nodes(n)
        val v = f match {
          case "price" => price; case "bal" => bal; case _ => prio }
        n = if (v < thr) lt else rt
      }
      n
    }
    val base = Tables.orders(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_totalprice"), col("c_acctbal"), col("o_orderpriority"))
      .collect()
    val want = base.map { r =>
      route(r.getDouble(0), r.getDouble(1),
        if (Set("1-URGENT", "2-HIGH")(r.getString(2))) 1.0 else 0.0)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = rows("ml_tree_score").map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(got == want)
    // Every leaf id is a depth-3 leaf (7..14) and counts cover all orders.
    assert(got.keySet.forall(l => l >= 7 && l <= 14))
    assert(got.values.sum == base.length.toLong)
  }

  test("ml_auc_exact: matches a brute-force pairwise AUC with midrank ties") {
    val base = Tables.orders(spark, TestSpark.sf)
      .select(floor(col("o_totalprice")).cast("long").as("s"),
        when(col("o_orderstatus") === "F", 1).otherwise(0).as("y"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val pos = base.filter(_._2 == 1).map(_._1)
    val neg = base.filter(_._2 == 0).map(_._1)
    // O(n₁·n₀) definition: P(score_pos > score_neg) + ½P(tie).
    var num2 = 0L // 2·Σ pairs, wins count 2 and ties count 1
    for (p <- pos; n <- neg)
      num2 += (if (p > n) 2L else if (p == n) 1L else 0L)
    val r = rows("ml_auc_exact").head
    assert(r.getAs[Long]("auc_num") == num2)
    assert(r.getAs[Long]("auc_den") == 2L * pos.length * neg.length)
    assert(r.getAs[Long]("n_pos") == pos.length.toLong)
    assert(r.getAs[Long]("n_neg") == neg.length.toLong)
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0.0 && auc <= 1.0)
  }

  test("ml_kfold: folds partition the orders — disjoint, exhaustive, stable") {
    val got = rows("ml_kfold").map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet.subsetOf((0L until 5L).toSet))
    val total = Tables.orders(spark, TestSpark.sf).count()
    assert(got.values.sum == total)
    // Determinism: a second run assigns identically.
    val again = rows("ml_kfold").map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == again)
  }

  test("ml_confusion: counts are consistent and recall is monotone in the threshold") {
    val rs = rows("ml_confusion").map(r => (r.getAs[Long]("threshold"),
      r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn")))
    val n = rs.head match { case (_, tp, fp, fn, tn) => tp + fp + fn + tn }
    rs.foreach { case (_, tp, fp, fn, tn) =>
      assert(tp + fp + fn + tn == n) } // every sweep row covers all orders
    // Raising the threshold can only shrink the predicted-positive set.
    val preds = rs.sortBy(_._1).map { case (_, tp, fp, _, _) => tp + fp }
    assert(preds.zip(preds.tail).forall { case (a, b) => a >= b })
    // tp+fn is the fixed positive count across thresholds.
    val posCounts = rs.map { case (_, tp, _, fn, _) => tp + fn }.distinct
    assert(posCounts.length == 1)
  }

  test("ml_ndcg: gain table is monotone, ndcg bounded by 1, ideal ranking dominates") {
    // The frozen integer gain table must strictly decrease in rank.
    val gains = (1 to 10).map(r =>
      math.floor(1000000.0 / (math.log(r + 1.0) / math.log(2.0))).toLong)
    assert(gains.zip(gains.tail).forall { case (a, b) => a > b })
    // Pin the exact frozen table: cross-engine parity holds because the
    // non-integer quotients sit ≥ 4e-3 from an integer (ulp-robust) and the
    // integer ones (r = 1, 3) come from exactly-representable log2 values.
    assert(gains == Seq(1000000L, 630929L, 500000L, 430676L, 386852L,
      356207L, 333333L, 315464L, 301029L, 289064L))
    rows("ml_ndcg").foreach { r =>
      val dcg = r.getAs[Long]("dcg_m"); val idcg = r.getAs[Long]("idcg_m")
      assert(dcg <= idcg, s"DCG must never exceed the ideal: $dcg > $idcg")
      val ndcg = r.getAs[Double]("ndcg")
      assert(ndcg >= 0.0 && ndcg <= 1.0)
    }
  }

  test("ml_precision_at_k: hits bounded by k and by the user's purchase count") {
    val purchases = Tables.events(spark, TestSpark.sf)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("np"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows("ml_precision_at_k").foreach { r =>
      val u = r.getAs[Long]("user_id"); val h = r.getAs[Long]("hits_5")
      assert(h >= 0L && h <= 5L)
      assert(h <= purchases.getOrElse(u, 0L))
    }
  }

  test("ml_target_encode: encoding shrinks each segment rate toward the prior") {
    val rs = rows("ml_target_encode")
    rs.foreach { r =>
      val n = r.getAs[Long]("n").toDouble
      val rate = r.getAs[Long]("sum_y").toDouble / n
      val prior = r.getAs[Double]("prior")
      val enc = r.getAs[Double]("enc")
      // enc is a convex combination of rate and prior → lies between them.
      val (lo, hi) = (math.min(rate, prior), math.max(rate, prior))
      assert(enc >= lo - 1e-12 && enc <= hi + 1e-12)
    }
  }

  test("ml_feature_hash: buckets stay inside D=64 and row mass is conserved") {
    val rs = rows("ml_feature_hash")
    assert(rs.forall { r =>
      val b = r.getAs[Long]("bucket"); b >= 0L && b < 64L })
    val total = rs.map(_.getAs[Long]("n")).sum
    val orders = Tables.orders(spark, TestSpark.sf).count()
    assert(total == 3L * orders) // 3 hashed features per order
    // |net| ≤ n per bucket (signs are ±1).
    assert(rs.forall(r => math.abs(r.getAs[Long]("net")) <= r.getAs[Long]("n")))
  }

  test("ml_logreg_score: probabilities are the sigmoid of the exact margin") {
    rows("ml_logreg_score").foreach { r =>
      val m = r.getAs[Long]("margin_milli").toDouble / 1000.0
      val p = r.getAs[Double]("prob")
      assert(math.abs(p - 1.0 / (1.0 + math.exp(-m))) < 5e-7) // round(6)
      assert(p > 0.0 && p < 1.0)
    }
  }

  test("ml_conformal: splits partition the data and coverage lands near 1-alpha") {
    val r = rows("ml_conformal").head
    val total = Tables.orders(spark, TestSpark.sf).count()
    assert(r.getAs[Long]("n_cal") + r.getAs[Long]("n_test") == total)
    val k = r.getAs[Long]("k")
    assert(k == math.ceil((r.getAs[Long]("n_cal") + 1L).toDouble * 0.9).toLong)
    assert(r.getAs[Long]("q_hat") > 0L)
    val cov = r.getAs[Double]("coverage")
    // Split-conformal guarantee: coverage ≥ 1-α in expectation; with
    // ~750 test rows the empirical value stays well inside this band.
    assert(cov > 0.82 && cov <= 1.0, s"coverage $cov out of band")
  }

  test("ml_pr_auc: matches the local grouped average precision") {
    val base = Tables.orders(spark, TestSpark.sf)
      .select(floor(col("o_totalprice")).cast("long").as("s"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val grid = base.groupBy(_._1).toSeq.sortBy(-_._1)
      .map { case (s, g) => (s, g.length.toLong, g.map(_._2).sum) }
    var cumN = 0L; var cumTp = 0L; var apNano = 0L
    grid.foreach { case (_, c, c1) =>
      cumN += c; cumTp += c1
      if (c1 > 0)
        apNano += math.floor(1.0e9 * c1.toDouble *
          (cumTp.toDouble / cumN.toDouble)).toLong
    }
    val r = rows("ml_pr_auc").head
    assert(r.getAs[Long]("ap_sum_nano") == apNano)
    val nPos = r.getAs[Long]("n_pos")
    assert(nPos == base.count(_._2 == 1L).toLong)
    assert(nPos + r.getAs[Long]("n_neg") == base.length.toLong)
    val ap = r.getAs[Double]("avg_precision")
    assert(ap > 0.0 && ap <= 1.0)
    // A random ranking's AP ≈ base rate; the sanity floor.
    assert(ap >= nPos.toDouble / base.length * 0.5)
  }

  test("ml_lift_gains: deciles partition the cohort, gains monotone to 1.0") {
    val rs = rows("ml_lift_gains").map(r => (r.getAs[Long]("decile"),
      r.getAs[Long]("n"), r.getAs[Long]("n_pos"), r.getAs[Long]("cum_pos"),
      r.getAs[Double]("gain"), r.getAs[Double]("lift")))
    val total = Tables.orders(spark, TestSpark.sf).count()
    assert(rs.map(_._2).sum == total)
    assert(rs.forall(t => t._1 >= 1L && t._1 <= 10L))
    val cums = rs.sortBy(_._1).map(_._4)
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    assert(math.abs(rs.sortBy(_._1).last._5 - 1.0) < 1e-12) // all positives captured
    val posTot = rs.map(_._3).sum
    rs.foreach { case (_, n, nPos, _, _, lift) =>
      val want = (nPos.toDouble * total) / (n.toDouble * posTot)
      assert(math.abs(lift - want) < 1e-12)
    }
  }

  test("ml_gbdt_margin: margins stay inside the ensemble's reachable sum range") {
    // Reachable per-tree leaf ranges: t0 ∈ [-2,3], t1 ∈ [-1,2], t2 ∈ [-1,2].
    rows("ml_gbdt_margin").foreach { r =>
      val m = r.getAs[Long]("margin")
      assert(m >= -4L && m <= 7L, s"unreachable ensemble margin $m")
    }
  }
}
