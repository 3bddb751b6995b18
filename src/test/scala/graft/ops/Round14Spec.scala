package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-14 additions — recommender family, time-series analytics, and
  * one-way ANOVA — each pinned against a brute-force plain-Scala
  * reference at sf0.001. */
class Round14Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Brute-force (basket, item) interactions. */
  private def baskets(): Map[Long, Set[Long]] =
    Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), expr("l_partkey div 10"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (ok, xs) => ok -> xs.map(_._2).toSet }

  private def bruteSims(bs: Map[Long, Set[Long]]): Map[(Long, Long), Long] = {
    val n = bs.values.flatten.groupBy(identity).map { case (i, xs) => i -> xs.size }
    bs.values.toSeq
      .flatMap(items => items.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case ((i, j), xs) =>
        (i, j) -> math.floor(
          1e6 * xs.size / math.sqrt(n(i).toDouble * n(j).toDouble)).toLong
      }
  }

  test("rec_item_cooccur: counts and frozen cosines match brute force") {
    val bs = baskets()
    val sims = bruteSims(bs)
    val got = SparkEntry.queries("rec_item_cooccur")(spark, TestSpark.sf)
      .collect()
    assert(got.length == math.min(100, sims.size))
    got.foreach { r =>
      val (i, j) = (r.getLong(0), r.getLong(1))
      assert(sims((i, j)) == r.getAs[Long]("sim_micro"))
      assert(bs.values.count(s => s(i) && s(j)).toLong == r.getAs[Long]("c"))
    }
    // Descending frozen-cosine order with the deterministic tie-break.
    val keys = got.map(r => (r.getAs[Long]("sim_micro"), r.getLong(0), r.getLong(1)))
    assert(keys.sliding(2).forall {
      case Array(a, b) =>
        a._1 > b._1 ||
          (a._1 == b._1 && (a._2 < b._2 || (a._2 == b._2 && a._3 < b._3)))
      case _ => true
    })
  }

  test("rec_user_topn: never recommends owned items, scores are model sums") {
    val owned = Tables.orders(spark, TestSpark.sf)
      .join(Tables.lineitem(spark, TestSpark.sf),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey"), expr("l_partkey div 10"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (u, xs) => u -> xs.map(_._2).toSet }
    val sims = bruteSims(baskets())
    // Brute-force top-10 neighbor model.
    val model = sims.toSeq
      .flatMap { case ((i, j), s) => Seq((i, j, s), (j, i, s)) }
      .groupBy(_._1).map { case (item, xs) =>
        item -> xs.sortBy(x => (-x._3, x._2)).take(10).map(x => (x._2, x._3))
      }
    val got = SparkEntry.queries("rec_user_topn")(spark, TestSpark.sf).collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (u, cand) = (r.getLong(0), r.getLong(2))
      assert(!owned(u)(cand), s"user $u recommended an owned item $cand")
      val want = owned(u).toSeq
        .flatMap(i => model.getOrElse(i, Seq.empty).filter(_._1 == cand))
        .map(_._2).sum
      assert(want == r.getAs[Long]("score_micro"))
    }
    // Per-user ranks are 1..≤3 and strictly ordered by (score desc, cand).
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length.toLong))
      assert(sorted.sliding(2).forall {
        case Array(a, b) =>
          val (sa, sb) = (a.getAs[Long]("score_micro"), b.getAs[Long]("score_micro"))
          sa > sb || (sa == sb && a.getLong(2) < b.getLong(2))
        case _ => true
      })
    }
  }

  test("rec_eval_mrr: rates are consistent and bounded") {
    val r = SparkEntry.queries("rec_eval_mrr")(spark, TestSpark.sf)
      .collect().head
    val (n, hits, sumRr) = (r.getAs[Long]("n_users"), r.getAs[Long]("n_hits"),
      r.getAs[Long]("sum_rr_micro"))
    assert(n > 0 && hits >= 0 && hits <= n)
    assert(r.getAs[Double]("hit_rate") == hits.toDouble / n.toDouble)
    assert(r.getAs[Double]("mrr") == sumRr.toDouble / (n * 1000000L).toDouble)
    // MRR ≤ hit-rate (each reciprocal rank ≤ 1) and both in [0,1].
    assert(r.getAs[Double]("mrr") <= r.getAs[Double]("hit_rate"))
    assert(r.getAs[Double]("hit_rate") <= 1.0)
  }

  /** Zero-filled hourly count series at sf0.001. */
  private def hourly(): Array[Long] = {
    val cs = Tables.events(spark, TestSpark.sf)
      .select(expr("unix_micros(date_trunc('hour', ts)) div 3600000000"))
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (h, xs) => h -> xs.length.toLong }
    (cs.keys.min to cs.keys.max).map(h => cs.getOrElse(h, 0L)).toArray
  }

  test("ts_acf: lag 0 is exactly 1, all lags match brute force") {
    val xs = hourly()
    val n = xs.length.toLong
    val s = xs.sum
    val ys = xs.map(x => n * x - s)
    val den = ys.map(y => y * y).sum
    val got = SparkEntry.queries("ts_acf")(spark, TestSpark.sf).collect()
    assert(got.length == 25)
    got.foreach { r =>
      val k = r.getLong(0).toInt
      val num = (0 until ys.length - k).map(t => ys(t) * ys(t + k)).sum
      assert(r.getAs[Long]("n_pairs") == (ys.length - k).toLong)
      assert(r.getAs[Double]("acf") == num.toDouble / den.toDouble,
        s"acf($k) mismatch")
    }
    assert(got.head.getAs[Double]("acf") == 1.0)
  }

  test("ts_stl_daily: decomposition identity and brute-force trend") {
    val cs = Tables.events(spark, TestSpark.sf)
      .select(expr("unix_micros(date_trunc('day', ts)) div 86400000000"))
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (dd, v) => dd -> v.length.toLong }
    val dmin = cs.keys.min
    val xs = (dmin to cs.keys.max).map(dd => cs.getOrElse(dd, 0L)).toArray
    val got = SparkEntry.queries("ts_stl_daily")(spark, TestSpark.sf).collect()
    assert(got.length == math.max(0, xs.length - 6))
    got.foreach { r =>
      val d = r.getLong(0)
      val i = (d - dmin).toInt
      val w7 = (i - 3 to i + 3).map(xs(_)).sum
      assert(r.getAs[Long]("trend_micro") == 1000000L * w7 / 7)
      assert(r.getAs[Long]("phase") == d % 7)
      // Exact additive identity: 10⁶·x = trend + seasonal + remainder.
      assert(1000000L * r.getAs[Long]("x") == r.getAs[Long]("trend_micro") +
        r.getAs[Long]("seas_micro") + r.getAs[Long]("rem_micro"))
    }
  }

  test("ts_bandit_replay: trajectory equals a plain-Scala policy replay") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(expr("unix_micros(date_trunc('day', ts)) div 86400000000"),
        pmod(col("user_id"), lit(3L)),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val days = ev.map(_._1).distinct.sorted
    val byDay = ev.groupBy(_._1).map { case (dd, xs) =>
      dd -> (0 to 2).map(a =>
        (xs.count(_._2 == a).toLong, xs.filter(_._2 == a).map(_._3).sum)).toArray
    }
    val s = Array(0L, 0L, 0L); val nn = Array(0L, 0L, 0L)
    val want = days.zipWithIndex.map { case (dd, i0) =>
      val t = i0 + 1L
      val arm: Int =
        if (t <= 3) (t - 1).toInt
        else if (t % 5 == 0) ((t / 5) % 3).toInt
        else {
          val b01 = if (s(1) * nn(0) > s(0) * nn(1)) 1 else 0
          if (s(2) * nn(b01) > s(b01) * nn(2)) 2 else b01
        }
      val (on, os) = byDay(dd)(arm)
      s(arm) += os; nn(arm) += on
      (t, dd, arm.toLong, os, on, s(arm), nn(arm))
    }
    val got = SparkEntry.queries("ts_bandit_replay")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(got.toSeq == want.toSeq)
    // The exploit policy must actually exploit: after init, non-explore
    // days pick an arm whose empirical rate is maximal (cross-mult check
    // is what we replayed; this asserts the replay saw ≥ 2 distinct arms).
    assert(got.map(_._3).distinct.length >= 2)
  }

  test("ts_periodogram: exact projections match brute force, f=1 dominates") {
    val xs = Tables.events(spark, TestSpark.sf)
      .select(expr("unix_micros(date_trunc('hour', ts)) div 3600000000"))
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (h, v) => h -> v.length.toLong }
    val got = SparkEntry.queries("ts_periodogram")(spark, TestSpark.sf)
      .collect()
    assert(got.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    got.foreach { r =>
      val f = r.getLong(0)
      val sc = xs.map { case (h, x) =>
        x * math.floor(1e6 * math.cos(2.0 * math.Pi * f * (h % 24) / 24.0)).toLong
      }.sum
      val ss = xs.map { case (h, x) =>
        x * math.floor(1e6 * math.sin(2.0 * math.Pi * f * (h % 24) / 24.0)).toLong
      }.sum
      assert(r.getAs[Long]("sc") == sc && r.getAs[Long]("ss") == ss)
      assert(r.getAs[Double]("magnitude") ==
        math.sqrt(sc.toDouble * sc.toDouble + ss.toDouble * ss.toDouble))
    }
  }

  test("graph_label_prop: equals brute-force synchronous min-label rounds") {
    val op = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = op.groupBy(_._1).values
      .flatMap(xs => xs.map(_._2).toSeq.sorted.combinations(2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    var lbl = verts.map(v => v -> v).toMap
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2) }
    for (_ <- 1 to 4)
      lbl = verts.map(v =>
        v -> (adj.getOrElse(v, Seq.empty).map(lbl) :+ lbl(v)).min).toMap
    val want = lbl.values.groupBy(identity)
      .map { case (l, vs) => l -> vs.size.toLong }
    val got = SparkEntry.queries("graph_label_prop")(spark, TestSpark.sf)
      .collect()
    assert(got.length == math.min(100, want.size))
    got.foreach { r =>
      assert(want(r.getLong(0)) == r.getAs[Long]("n_members"))
      val members = lbl.filter(_._2 == r.getLong(0)).keys
      assert(r.getAs[Long]("min_id") == members.min)
      assert(r.getAs[Long]("max_id") == members.max)
    }
  }

  /** Brute-force co-purchase edges + 4-round synchronous min-LPA. */
  private def lpaBrute(): (Seq[(Long, Long)], Map[Long, Long]) = {
    val op = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_partkey"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).distinct
    val edges = op.groupBy(_._1).values
      .flatMap(xs => xs.map(_._2).toSeq.sorted.combinations(2)
        .map(p => (p(0), p(1))))
      .groupBy(identity).filter(_._2.size >= 2).keys.toSeq
    val verts = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2) }
    var lbl = verts.map(v => v -> v).toMap
    for (_ <- 1 to 4)
      lbl = verts.map(v =>
        v -> (adj.getOrElse(v, Seq.empty).map(lbl) :+ lbl(v)).min).toMap
    (edges, lbl)
  }

  test("graph_modularity: exact ingredients and Q match brute force") {
    val (edges, lbl) = lpaBrute()
    val m = edges.length.toLong
    val eIn = edges.filter(e => lbl(e._1) == lbl(e._2))
      .groupBy(e => lbl(e._1)).map { case (c, es) => c -> es.length.toLong }
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity)
      .map { case (v, xs) => v -> xs.length.toLong }
    val dC = deg.toSeq.groupBy { case (v, _) => lbl(v) }
      .map { case (c, xs) => c -> xs.map(_._2).sum }
    val q = (4L * m * eIn.values.sum - dC.values.map(d => d * d).sum).toDouble /
      (4L * m * m).toDouble
    val got = SparkEntry.queries("graph_modularity")(spark, TestSpark.sf)
      .collect()
    assert(got.nonEmpty && got.length <= 20)
    got.foreach { r =>
      val c = r.getLong(0)
      assert(r.getAs[Long]("e_in") == eIn.getOrElse(c, 0L))
      assert(r.getAs[Long]("d_c") == dC(c))
      assert(r.getAs[Double]("q") == q)
    }
    assert(q > -0.5 && q <= 1.0)
  }

  test("ml_ridge_2d: matches a brute-force ridge solve") {
    val pu = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"),
        when(col("event_type") === "view", 1L).otherwise(0L),
        when(col("event_type") === "click", 1L).otherwise(0L),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1).values
      .map(xs => (xs.map(_._2).sum.toDouble, xs.map(_._3).sum.toDouble,
        xs.map(_._4).sum.toDouble)).toSeq
    val n = pu.length.toDouble
    val (mu, mv, my) =
      (pu.map(_._1).sum / n, pu.map(_._2).sum / n, pu.map(_._3).sum / n)
    def c(f: ((Double, Double, Double)) => Double,
          g: ((Double, Double, Double)) => Double,
          cf: Double, cg: Double): Double =
      pu.map(p => (f(p) - cf) * (g(p) - cg)).sum
    val (suu, svv, suv) = (c(_._1, _._1, mu, mu), c(_._2, _._2, mv, mv),
      c(_._1, _._2, mu, mv))
    val (suy, svy) = (c(_._1, _._3, mu, my), c(_._2, _._3, mv, my))
    // λ = 1 on the population normal equations.
    val det = (suu + 1.0) * (svv + 1.0) - suv * suv
    val b1 = (suy * (svv + 1.0) - suv * svy) / det
    val b2 = ((suu + 1.0) * svy - suv * suy) / det
    val b0 = my - b1 * mu - b2 * mv
    val r = SparkEntry.queries("ml_ridge_2d")(spark, TestSpark.sf)
      .collect().head
    assert(r.getAs[Long]("n") == pu.length.toLong)
    assert(math.abs(r.getAs[Double]("b_views") - b1) < 1e-9)
    assert(math.abs(r.getAs[Double]("b_clicks") - b2) < 1e-9)
    assert(math.abs(r.getAs[Double]("intercept") - b0) < 1e-9)
    val sse = pu.map { case (u, v, y) =>
      val e = y - (b0 + b1 * u + b2 * v); e * e }.sum
    assert(math.abs(r.getAs[Double]("rmse") - math.sqrt(sse / n)) < 1e-9)
  }

  test("graph_clustering_coeff: wedges and triangles match brute force") {
    val (edges, _) = lpaBrute()
    val adj = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.map(_._2).toSet }
    val deg = adj.map { case (v, ns) => v -> ns.size.toLong }
    val wedges = deg.values.map(dd => dd * (dd - 1) / 2).sum
    // Brute triangles: unordered vertex triples with all three edges.
    val verts = adj.keys.toSeq.sorted
    val nTri = (for {
      i <- verts.indices; j <- (i + 1) until verts.length
      if adj(verts(i))(verts(j))
      k <- (j + 1) until verts.length
      if adj(verts(i))(verts(k)) && adj(verts(j))(verts(k))
    } yield 1).sum.toLong
    val r = SparkEntry.queries("graph_clustering_coeff")(spark, TestSpark.sf)
      .collect().head
    assert(r.getAs[Long]("n_edges") == edges.length.toLong)
    assert(r.getAs[Long]("n_wedges") == wedges)
    assert(r.getAs[Long]("n_triangles") == nTri)
    assert(r.getAs[Double]("clustering_coeff") ==
      3.0 * nTri.toDouble / wedges.toDouble)
  }

  test("graph_assortativity: equals brute-force degree Pearson") {
    val (edges, _) = lpaBrute()
    val deg = (edges ++ edges.map(_.swap)).groupBy(_._1)
      .map { case (v, es) => v -> es.size.toDouble }
    val sym = edges ++ edges.map(_.swap)
    val n = sym.length.toDouble
    val js = sym.map(e => deg(e._1)); val ks = sym.map(e => deg(e._2))
    val (mj, mk) = (js.sum / n, ks.sum / n)
    val cov = sym.map(e => (deg(e._1) - mj) * (deg(e._2) - mk)).sum
    val vj = js.map(j => (j - mj) * (j - mj)).sum
    val r = SparkEntry.queries("graph_assortativity")(spark, TestSpark.sf)
      .collect().head
    assert(r.getAs[Long]("s2m") == sym.length.toLong)
    // By symmetry var(j) = var(k), so r = cov/var(j).
    assert(math.abs(r.getAs[Double]("assortativity") - cov / vj) < 1e-9)
    assert(math.abs(r.getAs[Double]("assortativity")) <= 1.0)
  }

  test("agg_hhi: per-nation concentration matches brute force") {
    val revs = Tables.lineitem(spark, TestSpark.sf)
      .join(Tables.supplier(spark, TestSpark.sf),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_nationkey"), col("s_suppkey"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2)))
      .groupBy(_._1).map { case (k, xs) => k -> xs.map(_._2).sum }
    val byNation = revs.groupBy(_._1._1)
    val got = SparkEntry.queries("agg_hhi")(spark, TestSpark.sf).collect()
    assert(got.length == byNation.size)
    got.foreach { r =>
      val sup = byNation(r.getInt(0)).values
      val tot = sup.sum
      assert(r.getAs[Long]("n_suppliers") == sup.size.toLong)
      assert(r.getAs[Long]("tot_cents") == tot)
      val want = sup.map(v => BigInt(v) * BigInt(v)).sum.toDouble /
        (tot.toDouble * tot.toDouble)
      assert(math.abs(r.getAs[Double]("hhi") - want) < 1e-12)
      // HHI bounds: 1/n ≤ HHI ≤ 1.
      assert(r.getAs[Double]("hhi") >= 1.0 / sup.size - 1e-12 &&
        r.getAs[Double]("hhi") <= 1.0)
    }
  }

  test("win_rsi: trailing sums and RSI match brute force") {
    val daily = Tables.orders(spark, TestSpark.sf)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * 100.0 + 0.5).cast("long")))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val deltas = daily.zip(daily.drop(1)).map { case ((_, a), (dy, b)) =>
      (dy, b, b - a) }
    val got = SparkEntry.queries("win_rsi")(spark, TestSpark.sf).collect()
    assert(got.length == math.max(0, deltas.length - 13))
    got.foreach { r =>
      val i = deltas.indexWhere(_._1 == r.getString(0))
      val frame = deltas.slice(i - 13, i + 1)
      assert(frame.length == 14)
      val sg = frame.map(x => math.max(x._3, 0L)).sum
      val sl = frame.map(x => math.max(-x._3, 0L)).sum
      assert(r.getAs[Long]("sum_gain") == sg && r.getAs[Long]("sum_loss") == sl)
      if (sg + sl > 0)
        assert(r.getAs[Double]("rsi") ==
          100.0 * sg.toDouble / (sg + sl).toDouble)
    }
  }

  test("rec_coverage: consistent with the served top-3 lists") {
    val recs = SparkEntry.queries("rec_user_topn")(spark, TestSpark.sf)
      .collect()
    val bs = baskets()
    val pop = bs.values.flatten.groupBy(identity)
      .map { case (i, xs) => i -> xs.size.toLong }
    val r = SparkEntry.queries("rec_coverage")(spark, TestSpark.sf)
      .collect().head
    assert(r.getAs[Long]("n_catalog") == pop.size.toLong)
    assert(r.getAs[Long]("total_recs") == recs.length.toLong)
    assert(r.getAs[Long]("n_recommended") ==
      recs.map(_.getLong(2)).distinct.length.toLong)
    val popRec = recs.map(row => pop(row.getLong(2))).sum
    assert(r.getAs[Double]("avg_pop_rec") ==
      popRec.toDouble / recs.length.toDouble)
    assert(r.getAs[Double]("coverage") > 0.0 && r.getAs[Double]("coverage") <= 1.0)
  }

  /** Per-user (pre-count, post-purchases) pairs, the CUPED/uplift input. */
  private def preX_postY(): Map[Long, (Long, Long)] =
    Tables.events(spark, TestSpark.sf)
      .select(col("user_id"),
        when(col("ts") < expr("TIMESTAMP '2024-01-16 00:00:00'"), 1L)
          .otherwise(0L),
        when(col("ts") >= expr("TIMESTAMP '2024-01-16 00:00:00'") &&
          col("event_type") === "purchase", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
      .map { case (u, xs) => u -> (xs.map(_._2).sum, xs.map(_._3).sum) }

  test("ev_did: 2x2 cells and estimate match brute force") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(pmod(col("user_id"), lit(2L)),
        when(col("ts") < expr("TIMESTAMP '2024-01-16 00:00:00'"),
          "pre").otherwise("post"),
        when(col("event_type") === "purchase", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    def rate(a: Long, p: String): Double = {
      val c = ev.filter(e => e._1 == a && e._2 == p)
      c.map(_._3).sum.toDouble / c.length.toDouble
    }
    val want = rate(1, "post") - rate(1, "pre") - (rate(0, "post") - rate(0, "pre"))
    val got = SparkEntry.queries("ev_did")(spark, TestSpark.sf).collect()
    assert(got.length == 4)
    got.foreach { r =>
      assert(r.getAs[Double]("did") == want)
      val cell = ev.filter(e =>
        e._1 == r.getLong(0) && e._2 == r.getString(1))
      assert(r.getAs[Long]("n_events") == cell.length.toLong)
      assert(r.getAs[Long]("n_conv") == cell.map(_._3).sum)
    }
  }

  test("ev_cuped: theta is cov/var and adjustment never inflates variance") {
    val pu = preX_postY().values.toSeq
    val n = pu.length.toDouble
    val (mx, my) = (pu.map(_._1).sum / n, pu.map(_._2).sum / n)
    val cov = pu.map { case (x, y) => (x - mx) * (y - my) }.sum / n
    val varX = pu.map { case (x, _) => (x - mx) * (x - mx) }.sum / n
    val varY = pu.map { case (_, y) => (y - my) * (y - my) }.sum / n
    val r = SparkEntry.queries("ev_cuped")(spark, TestSpark.sf)
      .collect().head
    assert(r.getAs[Long]("n") == pu.length.toLong)
    assert(math.abs(r.getAs[Double]("theta") - cov / varX) < 1e-9)
    assert(math.abs(r.getAs[Double]("var_y") - varY) < 1e-9)
    // var(Y_adj) = var(Y) − cov²/var(X) ≤ var(Y), and the reduction is
    // exactly the squared correlation.
    assert(r.getAs[Double]("var_y_adj") <= r.getAs[Double]("var_y"))
    val rho2 = cov * cov / (varX * varY)
    assert(math.abs(r.getAs[Double]("var_reduction") - rho2) < 1e-9)
  }

  test("ev_uplift_bucket: per-bucket gaps match brute force") {
    val pu = preX_postY()
    val cells = pu.toSeq.map { case (u, (x, y)) =>
      (math.min(x, 9L), u % 2, if (y > 0) 1L else 0L)
    }
    val got = SparkEntry.queries("ev_uplift_bucket")(spark, TestSpark.sf)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val b = r.getLong(0)
      val ctl = cells.filter(c => c._1 == b && c._2 == 0L)
      val trt = cells.filter(c => c._1 == b && c._2 == 1L)
      assert(r.getAs[Long]("n_control") == ctl.length.toLong)
      assert(r.getAs[Long]("n_treated") == trt.length.toLong)
      val want = trt.map(_._3).sum.toDouble / trt.length -
        ctl.map(_._3).sum.toDouble / ctl.length
      assert(r.getAs[Double]("uplift") == want)
    }
  }

  test("ml_training_set: features use strictly-prior history only (no leakage)") {
    val orders = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("string"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getLong(3)))
    val byCust = orders.groupBy(_._2)
      .map { case (c, xs) => c -> xs.sortBy(o => (o._3, o._1)) }
    val got = SparkEntry.queries("ml_training_set")(spark, TestSpark.sf)
      .collect()
    assert(got.length == orders.length)
    got.foreach { r =>
      val (ok, ck) = (r.getLong(0), r.getLong(1))
      val hist = byCust(ck)
      val idx = hist.indexWhere(_._1 == ok)
      val prior = hist.take(idx)
      assert(r.getAs[Long]("prior_n") == prior.length.toLong,
        s"order $ok must see exactly its $idx prior orders")
      assert(r.getAs[Long]("prior_cents") == prior.map(_._4).sum)
      assert(r.getAs[Long]("label") ==
        (if (hist(idx)._4 >= 20000000L) 1L else 0L))
      assert(r.getAs[Long]("fold") >= 0L && r.getAs[Long]("fold") <= 9L)
      // days_since_prev: -1 exactly when this is the first order.
      assert((r.getAs[Long]("days_since_prev") == -1L) == (idx == 0))
    }
  }

  test("ts_stl_anomaly: integer 2-sigma flags match brute force") {
    val stl = SparkEntry.queries("ts_stl_daily")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("rem_micro")))
    val m = stl.length.toLong
    val sr = stl.map(_._2).sum
    val q = stl.map(r => BigInt(r._2) * BigInt(r._2)).sum
    val got = SparkEntry.queries("ts_stl_anomaly")(spark, TestSpark.sf)
      .collect()
    assert(got.length == stl.length)
    got.foreach { r =>
      val rem = stl.find(_._1 == r.getLong(0)).get._2
      val lhs = BigInt(rem * m - sr).pow(2)
      val rhs = 4 * (m * q - BigInt(sr) * BigInt(sr))
      assert(r.getAs[Long]("is_anomaly") == (if (lhs > rhs) 1L else 0L))
    }
  }

  test("dd_er_score: scores and verdicts match brute-force Fellegi-Sunter") {
    val parts = Tables.part(spark, TestSpark.sf)
      .select(col("p_partkey"), col("p_name"), col("p_brand"), col("p_type"),
        col("p_size"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getInt(4)))
    def lev(x: String, y: String): Int = {
      val dp = Array.tabulate(x.length + 1)(i => i)
      for (j <- 1 to y.length) {
        var prev = dp(0); dp(0) = j
        for (i <- 1 to x.length) {
          val t = dp(i)
          dp(i) = math.min(math.min(dp(i) + 1, dp(i - 1) + 1),
            prev + (if (x(i - 1) == y(j - 1)) 0 else 1))
          prev = t
        }
      }
      dp(x.length)
    }
    val byBlock = parts.toSeq.groupBy(p => (p._2.split(" ").head, p._5))
    val want = byBlock.values.flatMap { ps =>
      for {
        a <- ps; b <- ps if a._1 < b._1
      } yield {
        val d0 = lev(a._2, b._2)
        val sc = (if (d0 <= 6) 800L else -300L) +
          (if (a._3 == b._3) 400L else -200L) +
          (if (a._4 == b._4) 500L else -250L)
        (a._1, b._1, d0, sc)
      }
    }.toSeq
    val got = SparkEntry.queries("dd_er_score")(spark, TestSpark.sf)
      .collect()
    assert(got.length == math.min(100, want.length))
    val wantMap = want.map(w => (w._1, w._2) -> w).toMap
    got.foreach { r =>
      val w = wantMap((r.getLong(0), r.getLong(1)))
      assert(r.getInt(2) == w._3 && r.getAs[Long]("score_milli") == w._4)
      val verdict = if (w._4 >= 1500) "match"
        else if (w._4 >= 500) "possible" else "non_match"
      assert(r.getString(4) == verdict)
    }
    // The cut is the true top-100 by (score desc, keys).
    val top = want.sortBy(w => (-w._4, w._1, w._2)).take(100)
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      top.map(w => (w._1, w._2)))
  }

  test("stlFromCounts: degenerate grids — empty, under 7 days, exactly 7") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Long)].toDF("d", "x")
    assert(TimeSeries.stlFromCounts(empty).collect().isEmpty)
    // 6 days: no full 7-row window exists → empty decomposition.
    val six = (1L to 6L).map(i => (i, 10L * i)).toDF("d", "x")
    assert(TimeSeries.stlFromCounts(six).collect().isEmpty)
    // Exactly 7 days: one full window; trend = mean; gap days zero-fill.
    val seven = Seq((1L, 7L), (3L, 14L), (7L, 7L)).toDF("d", "x")
    val r = TimeSeries.stlFromCounts(seven).collect()
    assert(r.length == 1 && r.head.getLong(0) == 4L) // the center day
    assert(r.head.getAs[Long]("x") == 0L) // day 4 itself was a gap
    assert(r.head.getAs[Long]("trend_micro") == 1000000L * 28L / 7L)
  }

  test("banditTrajectory: degenerate shapes — empty, single day, missing arms") {
    import spark.implicits._
    // Empty cell table → empty trajectory (fold over empty list).
    val empty = Seq.empty[(Long, Long, Long, Long)].toDF("d", "arm", "n", "sv")
    assert(TimeSeries.banditTrajectory(empty).collect().isEmpty)
    // One day, only arm 2 observed: t=1 plays arm 0 (init path) and
    // observes ZERO trials — the policy never peeks at unplayed arms.
    val oneDay = Seq((10L, 2L, 5L, 3L)).toDF("d", "arm", "n", "sv")
    val r1 = TimeSeries.banditTrajectory(oneDay).collect()
    assert(r1.length == 1 && r1.head.getAs[Long]("arm") == 0L &&
      r1.head.getAs[Long]("obs_n") == 0L && r1.head.getAs[Long]("cum_n") == 0L)
    // Four days, all arms always equal: exploit on t=4 ties to arm 0.
    val cells = (1L to 4L).flatMap(day =>
      (0L to 2L).map(a => (day, a, 10L, 1L)))
      .toDF("d", "arm", "n", "sv")
    val r4 = TimeSeries.banditTrajectory(cells).collect().sortBy(_.getLong(0))
    assert(r4.map(_.getAs[Long]("arm")).toSeq == Seq(0L, 1L, 2L, 0L))
  }

  test("ev_stream_stl_daily: streaming twin equals the batch decomposition") {
    val batch = SparkEntry.queries("ts_stl_daily")(spark, TestSpark.sf)
    val stream = SparkEntry.queries("ev_stream_stl_daily")(spark, TestSpark.sf)
    assert(stream.exceptAll(batch).isEmpty && batch.exceptAll(stream).isEmpty)
  }

  test("text_compress_ratio: deterministic, length-exact vs independent deflate, lossless") {
    val got = SparkEntry.queries("text_compress_ratio")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val again = SparkEntry.queries("text_compress_ratio")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.toSeq == again.toSeq) // fixed level, no state: restart-stable
    val texts = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def deflate(s: String): Array[Byte] = {
      val d = new java.util.zip.Deflater(6)
      d.setInput(s.getBytes("UTF-8")); d.finish()
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      out.toByteArray
    }
    got.take(50).foreach { case (id, rawLen, cLen, ratio) =>
      val z = deflate(texts(id))
      assert(rawLen == texts(id).getBytes("UTF-8").length.toLong)
      assert(cLen == z.length.toLong,
        s"doc $id: query deflate length must match an independent deflate")
      assert(ratio == 1000L * cLen / rawLen)
      // Lossless: inflate round-trips to the original bytes.
      val inf = new java.util.zip.Inflater()
      inf.setInput(z)
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](4096)
      while (!inf.finished()) out.write(buf, 0, inf.inflate(buf))
      assert(new String(out.toByteArray, "UTF-8") == texts(id))
    }
    // The signal separates: pure repetition compresses far below the
    // natural-text band.
    val rep = deflate("spam " * 2000)
    assert(1000L * rep.length / ("spam " * 2000).getBytes("UTF-8").length < 50)
  }

  test("ev_attribution_markov: equals a brute-force removal-effect replay") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    // Journeys truncated at the first purchase.
    val journeys = ev.groupBy(_._1).values.map { xs =>
      val types = xs.sortBy(e => (e._2, e._3)).map(_._4)
      val i = types.indexOf("purchase")
      if (i >= 0) types.take(i + 1) else types
    }.toSeq
    val trans = journeys.flatMap { j =>
      val path = "start" +: j.map(t => if (t == "purchase") "conv" else t)
      val term = if (j.lastOption.contains("purchase")) path
        else path :+ "null"
      term.zip(term.drop(1)).filter(_._1 != "conv")
    }
    val counts = trans.groupBy(identity)
      .map { case (p, xs) => p -> xs.size.toLong }
    val rTot = counts.groupBy(_._1._1).map { case (c, m) => c -> m.values.sum }
    val channels = Seq("click", "error", "signup", "view")
    def pConv(removed: Option[String]): Double = {
      val mat = counts.toSeq
        .filter { case ((c, _), _) => !removed.contains(c) }
        .map { case ((c, x), n) =>
          (c, if (removed.contains(x)) "null" else x, n) }
        .groupBy(t => (t._1, t._2))
        .map { case ((c, x), xs) => (c, x, xs.map(_._3).sum) }.toSeq
      val states = mat.map(_._1).distinct
      var p = states.map(_ -> 0.0).toMap
      for (_ <- 1 to 8)
        p = states.map { st =>
          val terms = mat.filter(_._1 == st).map { case (_, x, n) =>
            n.toDouble / rTot(st).toDouble *
              (if (x == "conv") 1.0 else if (x == "null") 0.0
               else p.getOrElse(x, 0.0))
          }.sorted
          st -> terms.foldLeft(0.0)(_ + _)
        }.toMap
      p("start")
    }
    val pFull = pConv(None)
    val effects = channels.map(c => c -> (1.0 - pConv(Some(c)) / pFull))
    val sumRe = effects.map(_._2).sorted.foldLeft(0.0)(_ + _)
    val got = SparkEntry.queries("ev_attribution_markov")(spark, TestSpark.sf)
      .collect()
    assert(got.map(_.getString(0)).toSeq == channels.sorted)
    got.foreach { r =>
      val want = effects.find(_._1 == r.getString(0)).get._2
      assert(math.abs(r.getAs[Double]("removal_effect") - want) < 1e-12)
      assert(r.getAs[Double]("p_full") == pFull ||
        math.abs(r.getAs[Double]("p_full") - pFull) < 1e-12)
      assert(math.abs(r.getAs[Double]("attribution") - want / sumRe) < 1e-12)
      // Severing a channel can only LOWER absorption probability.
      assert(r.getAs[Double]("p_conv") <= r.getAs[Double]("p_full"))
    }
    // Attributions are a proper distribution over channels.
    val s0 = got.map(_.getAs[Double]("attribution")).sum
    assert(math.abs(s0 - 1.0) < 1e-9)
  }

  test("ev_markov_stationary: equals brute-force integer power iteration") {
    val ev = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), unix_micros(col("ts")), col("event_id"),
        col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3)))
    val pairs = ev.groupBy(_._1).values.flatMap { xs =>
      val sorted = xs.sortBy(e => (e._2, e._3)).map(_._4)
      sorted.zip(sorted.drop(1))
    }.toSeq
    val c = pairs.groupBy(identity).map { case (p, v) => p -> v.size.toLong }
    val r = c.groupBy(_._1._1).map { case (s0, m) => s0 -> m.values.sum }
    val states = c.keys.map(_._1).toSeq.distinct.sorted
    var v = states.map(st => st -> 1000000000L / states.length).toMap
    for (_ <- 1 to 8)
      v = states.map { j =>
        j -> states.map(i => v(i) * c.getOrElse((i, j), 0L) / r(i)).sum
      }.toMap
    val tot = v.values.sum
    val got = SparkEntry.queries("ev_markov_stationary")(spark, TestSpark.sf)
      .collect()
    assert(got.map(_.getString(0)).toSeq == states)
    got.foreach { row =>
      assert(row.getAs[Long]("v_nano") == v(row.getString(0)))
      assert(row.getAs[Double]("pi") ==
        v(row.getString(0)).toDouble / tot.toDouble)
    }
    // Mass conservation up to the documented truncation leak.
    assert(tot <= 1000000000L && tot > 1000000000L - 8L * 5L * 5L)
  }

  test("agg_tukey_outliers: fences and counts match brute force") {
    val li = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_suppkey"),
        floor(col("l_extendedprice") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (sk, xs) => sk -> xs.map(_._2).sorted }
    def qDisc(ys: Seq[Long], p: Double): Long =
      ys(math.ceil(p * ys.length).toInt - 1) // first y with cume_dist ≥ p
    val want = li.map { case (sk, ys) =>
      val (q1, q3) = (qDisc(ys, 0.25), qDisc(ys, 0.75))
      sk -> (ys.length.toLong, q1, q3,
        ys.count(y => 2 * y < 5 * q1 - 3 * q3 || 2 * y > 5 * q3 - 3 * q1).toLong)
    }
    val got = SparkEntry.queries("agg_tukey_outliers")(spark, TestSpark.sf)
      .collect()
    assert(got.length == math.min(20, li.size))
    got.foreach { r =>
      val (n, q1, q3, out) = want(r.getLong(0))
      assert(r.getAs[Long]("n") == n && r.getAs[Long]("q1_c") == q1 &&
        r.getAs[Long]("q3_c") == q3 && r.getAs[Long]("n_outliers") == out)
    }
    // True top-20 by outlier count (ties by supplier key).
    val top = want.toSeq.sortBy { case (sk, (_, _, _, o)) => (-o, sk) }
      .take(20).map(_._1)
    assert(got.map(_.getLong(0)).toSeq == top)
  }

  test("set_neyman_alloc: allocation proportional to N_h*S_h, budget respected") {
    val got = SparkEntry.queries("set_neyman_alloc")(spark, TestSpark.sf)
      .collect()
    assert(got.nonEmpty)
    val sumAlloc = got.map(_.getAs[Long]("alloc")).sum
    assert(sumAlloc <= 1000L && sumAlloc > 1000L - got.length)
    got.foreach { r =>
      assert(r.getAs[Double]("var_h") >= 0.0)
      assert(r.getAs[Double]("nsh") ==
        r.getAs[Long]("n_h").toDouble * math.sqrt(r.getAs[Double]("var_h")))
    }
    // Monotone: larger N_h*S_h never gets a smaller allocation.
    val byNsh = got.sortBy(_.getAs[Double]("nsh"))
    assert(byNsh.sliding(2).forall {
      case Array(a, b) => a.getAs[Long]("alloc") <= b.getAs[Long]("alloc")
      case _ => true
    })
  }

  test("pii_t_closeness: TVD matches brute force; gate is the integer compare") {
    val rows = Tables.customer(spark, TestSpark.sf)
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / lit(1000.0)).cast("long"))
      .collect().map(r => ((r.getInt(0), r.getString(1)), r.getLong(2)))
    val n = rows.length.toLong
    val bandTot = rows.groupBy(_._2).map { case (b, xs) => b -> xs.length.toLong }
    val got = SparkEntry.queries("pii_t_closeness")(spark, TestSpark.sf)
      .collect()
    assert(got.length == rows.map(_._1).distinct.length)
    got.foreach { r =>
      val key = (r.getInt(0), r.getString(1))
      val grp = rows.filter(_._1 == key).map(_._2)
      val nG = grp.length.toLong
      val num = bandTot.toSeq.map { case (b, cb) =>
        math.abs(grp.count(_ == b).toLong * n - cb * nG)
      }.sum
      assert(r.getAs[Long]("n_g") == nG)
      assert(r.getAs[Long]("tvd_num") == num)
      assert(r.getAs[Double]("tvd") ==
        num.toDouble / (2L * nG * n).toDouble)
      assert(r.getAs[Long]("meets_t") ==
        (if (5L * num <= 2L * nG * n) 1L else 0L))
      assert(r.getAs[Double]("tvd") >= 0.0 && r.getAs[Double]("tvd") <= 1.0)
    }
  }

  test("text_pmi_collocations: lift matches brute-force counts, no sub-support pair") {
    val toksPerDoc = Tables.documents(spark, TestSpark.sf)
      .select(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
      .collect().map(_.getSeq[String](0))
    val uni = toksPerDoc.flatten.groupBy(identity)
      .map { case (w, xs) => w -> xs.size.toLong }
    val n = uni.values.sum
    val bgs = toksPerDoc.flatMap(ts => ts.zip(ts.drop(1)))
    val m = bgs.length.toLong
    val cAb = bgs.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
    val got = SparkEntry.queries("text_pmi_collocations")(spark, TestSpark.sf)
      .collect()
    assert(got.length == 30)
    got.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(cAb((a, b)) == r.getAs[Long]("c_ab") && r.getAs[Long]("c_ab") >= 5)
      assert(uni(a) == r.getAs[Long]("c_a") && uni(b) == r.getAs[Long]("c_b"))
      assert(r.getAs[Double]("lift") ==
        cAb((a, b)).toDouble * n.toDouble * n.toDouble /
          (m.toDouble * uni(a).toDouble * uni(b).toDouble))
    }
    // The served list is the true top-30 by lift (ties by pair).
    val all = cAb.filter(_._2 >= 5).toSeq.map { case ((a, b), c) =>
      (c.toDouble * n * n / (m.toDouble * uni(a) * uni(b)), a, b)
    }.sortBy(t => (-t._1, t._2, t._3)).take(30)
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ==
      all.map(t => (t._2, t._3)))
  }

  test("ml_shap_linear: mean|phi| matches brute force; phi is additive") {
    val weights = Map("bias" -> -500L,
      "prio=1-URGENT" -> 800L, "prio=2-HIGH" -> 400L, "prio=3-MEDIUM" -> 0L,
      "prio=4-NOT SPECIFIED" -> -200L, "prio=5-LOW" -> -600L,
      "seg=AUTOMOBILE" -> 150L, "seg=BUILDING" -> -100L,
      "seg=FURNITURE" -> 250L, "seg=HOUSEHOLD" -> -50L,
      "seg=MACHINERY" -> 50L, "price_10k" -> 30L, "bal_1k" -> -40L)
    val rows = Tables.orders(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("c_mktsegment"),
        floor(col("o_totalprice") / 10000.0).cast("long"),
        floor(col("c_acctbal") / 1000.0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4)))
    val n = rows.length.toLong
    def x(row: (Long, String, String, Long, Long), f: String): Long = f match {
      case "bias" => 1L
      case "price_10k" => row._4
      case "bal_1k" => row._5
      case p if p.startsWith("prio=") => if (s"prio=${row._2}" == p) 1L else 0L
      case sg => if (s"seg=${row._3}" == sg) 1L else 0L
    }
    val got = SparkEntry.queries("ml_shap_linear")(spark, TestSpark.sf)
      .collect()
    assert(got.length == weights.size)
    got.foreach { r =>
      val f = r.getString(0)
      val sx = rows.map(x(_, f)).sum
      assert(r.getAs[Long]("sx") == sx)
      val sumAbs = rows.map(row =>
        (BigInt(weights(f)) * (n * x(row, f) - sx)).abs).sum
      assert(r.getAs[Double]("mean_abs_phi") ==
        sumAbs.toDouble / (n.toDouble * n.toDouble * 1000.0))
    }
    // Additivity: Σ_f φ_f(row) = margin(row) − mean margin (in n-scaled
    // milli units, exactly — the linear-SHAP identity).
    val fs = weights.keys.toSeq
    val sxMap = fs.map(f => f -> rows.map(x(_, f)).sum).toMap
    rows.take(20).foreach { row =>
      val lhs = fs.map(f => BigInt(weights(f)) * (n * x(row, f) - sxMap(f))).sum
      val margin = fs.map(f => weights(f) * x(row, f)).sum
      val sumMargins = rows.map(rr => fs.map(f => weights(f) * x(rr, f)).sum).sum
      assert(lhs == BigInt(n) * margin - BigInt(sumMargins))
    }
  }

  test("ev_effect_size: Cohen's d and Welch CI match brute force") {
    val byArm = Tables.events(spark, TestSpark.sf)
      .select(pmod(col("user_id"), lit(2L)),
        floor(col("value") * 100.0 + 0.5).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (a, xs) => a -> xs.map(_._2.toDouble) }
    def stats(xs: Iterable[Double]) = {
      val n = xs.size.toDouble
      val m = xs.sum / n
      (n, m, xs.map(v => (v - m) * (v - m)).sum / (n - 1))
    }
    val (n0, m0, v0) = stats(byArm(0L)); val (n1, m1, v1) = stats(byArm(1L))
    val sp = math.sqrt(((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - 2))
    val se = math.sqrt(v0 / n0 + v1 / n1)
    val r = SparkEntry.queries("ev_effect_size")(spark, TestSpark.sf)
      .collect().head
    assert(r.getAs[Long]("n0") == n0.toLong && r.getAs[Long]("n1") == n1.toLong)
    assert(math.abs(r.getAs[Double]("cohens_d") - (m1 - m0) / sp) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_lo") - (m1 - m0 - 1.96 * se) / 100.0) < 1e-9)
    assert(math.abs(r.getAs[Double]("ci_hi") - (m1 - m0 + 1.96 * se) / 100.0) < 1e-9)
    assert(r.getAs[Double]("ci_lo") < r.getAs[Double]("ci_hi"))
  }

  test("ml_ridge_sweep: path is RMSE-monotone and contains the lambda=1 solve") {
    val sweep = SparkEntry.queries("ml_ridge_sweep")(spark, TestSpark.sf)
      .collect()
    assert(sweep.map(_.getAs[Double]("lambda")).toSeq ==
      Seq(0.1, 1.0, 10.0, 100.0))
    // Training RMSE is non-decreasing along the regularization path.
    val rmses = sweep.map(_.getAs[Double]("rmse"))
    assert(rmses.sliding(2).forall { case Array(a, b) => a <= b; case _ => true })
    // The λ=1 row IS the ml_ridge_2d solve.
    val one = sweep.find(_.getAs[Double]("lambda") == 1.0).get
    val r2d = SparkEntry.queries("ml_ridge_2d")(spark, TestSpark.sf)
      .collect().head
    assert(one.getAs[Double]("b_views") == r2d.getAs[Double]("b_views"))
    assert(one.getAs[Double]("b_clicks") == r2d.getAs[Double]("b_clicks"))
    assert(one.getAs[Double]("rmse") == r2d.getAs[Double]("rmse"))
  }

  test("ml_ks_score: equals brute-force max CDF gap") {
    val rows = Tables.orders(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf),
        col("o_custkey") === col("c_custkey"))
      .select(floor(col("o_totalprice")).cast("long"),
        when(col("o_orderstatus") === "F", 1L).otherwise(0L))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nPos = rows.count(_._2 == 1L).toLong
    val nNeg = rows.length.toLong - nPos
    val scores = rows.map(_._1).distinct.sorted
    val best = scores.map { t =>
      val cp = rows.count(r => r._1 <= t && r._2 == 1L).toLong
      val cn = rows.count(r => r._1 <= t && r._2 == 0L).toLong
      (math.abs(cp * nNeg - cn * nPos), t, cp, cn)
    }.maxBy(x => (x._1, -x._2))
    val r = SparkEntry.queries("ml_ks_score")(spark, TestSpark.sf)
      .collect().head
    assert(r.getAs[Long]("ks_num") == best._1)
    assert(r.getAs[Long]("score") == best._2)
    assert(r.getAs[Long]("cp") == best._3 && r.getAs[Long]("cn") == best._4)
    assert(r.getAs[Double]("ks") ==
      best._1.toDouble / (nPos * nNeg).toDouble)
  }

  test("agg_anova_f: matches brute-force sums of squares") {
    val rows = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_returnflag"),
        floor(col("l_extendedprice") * 100.0 + 0.5))
      .collect().map(r => (r.getString(0), r.getLong(1).toDouble))
    val byG = rows.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
    val n = rows.length.toDouble
    val grand = rows.map(_._2).sum / n
    val ssb = byG.values.map { ys =>
      val m = ys.sum / ys.length
      ys.length * (m - grand) * (m - grand)
    }.sum
    val ssw = byG.values.map { ys =>
      val m = ys.sum / ys.length
      ys.map(y => (y - m) * (y - m)).sum
    }.sum
    val r = SparkEntry.queries("agg_anova_f")(spark, TestSpark.sf)
      .collect().head
    assert(r.getAs[Long]("k") == byG.size.toLong)
    assert(r.getAs[Long]("n") == rows.length.toLong)
    assert(math.abs(r.getAs[Double]("ssb") - ssb) / ssb < 1e-6)
    assert(math.abs(r.getAs[Double]("ssw") - ssw) / ssw < 1e-6)
    val k = byG.size.toDouble
    val f = (ssb / (k - 1)) / (ssw / (n - k))
    assert(math.abs(r.getAs[Double]("f_stat") - f) / f < 1e-6)
    val eta = r.getAs[Double]("eta_sq")
    assert(eta > 0.0 && eta < 1.0)
  }
}
