package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-13 additions: skyline dominance and the exact-dyadic grid EWMA,
  * each pinned against a brute-force plain-Scala reference. */
class Round13Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("rel_skyline: equals brute-force pairwise dominance") {
    val pts = Tables.orders(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf),
        col("o_custkey") === col("c_custkey"))
      .select(floor(col("o_totalprice")).cast("long").as("x"),
        floor(col("c_acctbal") * 100.0).cast("long").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // Brute force: p survives iff no q with q ≥ p in both and > in one.
    val want = pts.distinct.filter { case (x, y) =>
      !pts.exists { case (qx, qy) =>
        qx >= x && qy >= y && (qx > x || qy > y) }
    }.sorted
    val got = SparkEntry.queries("rel_skyline")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(got.toSeq == want.toSeq)
    // Counts: n is the multiplicity of the surviving point.
    val counts = SparkEntry.queries("rel_skyline")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    counts.foreach { case (p, n) =>
      assert(n == pts.count(_ == p).toLong)
    }
  }

  test("agg_bootstrap_ci: CI brackets the exact mean and replicas behave like Poisson(1)") {
    val r = SparkEntry.queries("agg_bootstrap_ci")(spark, TestSpark.sf)
      .collect().head
    val cents = Tables.orders(spark, TestSpark.sf)
      .select(floor(col("o_totalprice") * 100.0 + 0.5).cast("long"))
      .collect().map(_.getLong(0))
    val exactMean = cents.sum.toDouble / (cents.length.toDouble * 100.0)
    assert(r.getAs[Double]("mean") == exactMean)
    val (lo, hi) = (r.getAs[Double]("ci_lo"), r.getAs[Double]("ci_hi"))
    assert(lo < hi)
    assert(lo <= exactMean && exactMean <= hi,
      s"the 2/31 order-stat CI [$lo,$hi] should bracket $exactMean")
    assert(r.getAs[Long]("n_replicas") == 32L)
  }

  test("corpus_weighted_sample: deterministic and biased toward heavy docs") {
    val got = SparkEntry.queries("corpus_weighted_sample")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.length == 50)
    val again = SparkEntry.queries("corpus_weighted_sample")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    assert(got.toSeq == again.toSeq) // md5 draws, not RNG: restart-stable
    val pop = Tables.documents(spark, TestSpark.sf)
      .filter(col("n_chars") > 0)
      .agg(avg(col("n_chars"))).collect().head.getDouble(0)
    val sampleMean = got.map(_._2).sum.toDouble / got.length
    assert(sampleMean > pop,
      s"A-Res with weight=n_chars must oversample long docs: $sampleMean vs $pop")
  }

  test("rel_basket_rules: rules match a brute-force miner and the measures are consistent") {
    val op = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nOrders = op.map(_._1).distinct.length.toLong
    val itemCnt = op.groupBy(_._2).map { case (p, g) => p -> g.length.toLong }
    val pairCnt = op.groupBy(_._1).toSeq.flatMap { case (_, items) =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, g) => k -> g.length.toLong }
      .filter(_._2 >= 3L)
    val got = SparkEntry.queries("rel_basket_rules")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    got.foreach { case (ante, cons, cuv, cA, cC, conf, lift) =>
      val key = if (ante < cons) (ante, cons) else (cons, ante)
      assert(pairCnt(key) == cuv)
      assert(itemCnt(ante) == cA && itemCnt(cons) == cC)
      assert(conf == cuv.toDouble / cA)
      assert(lift == (nOrders * cuv).toDouble / (cA * cC))
      assert(conf > 0.0 && conf <= 1.0 && lift > 0.0)
    }
    // Top-20 really is the lift maximum over ALL rules.
    if (got.nonEmpty) {
      val allLifts = pairCnt.toSeq.flatMap { case ((u, v), cuv) =>
        Seq((nOrders * cuv).toDouble / (itemCnt(u) * itemCnt(v)),
          (nOrders * cuv).toDouble / (itemCnt(v) * itemCnt(u))) }
      assert(got.head._7 == allLifts.max)
    }
  }

  test("ev_sprt: equals the local Wald recurrence; at most one first-decision day") {
    val daily = Tables.events(spark, TestSpark.sf)
      .filter(pmod(col("user_id"), lit(2L)) === 1L)
      .select(to_date(col("ts")).cast("string").as("day"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("conv"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    var llr = 0L
    val want = daily.map { case (day, n, x) =>
      llr += x * 405465L + (n - x) * -57159L
      (day, llr)
    }
    val got = SparkEntry.queries("ev_sprt")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getAs[Long]("llr_micro"),
        r.getAs[String]("verdict"), r.getAs[Long]("first_decision")))
    assert(got.map(t => (t._1, t._2)).toSeq == want.toSeq)
    got.foreach { case (_, l, v, _) =>
      val expect = if (l >= 2944438L) "accept_h1"
        else if (l <= -2944439L) "accept_h0" else "continue"
      assert(v == expect)
    }
    assert(got.count(_._4 == 1L) <= 1)
    // The flag, when present, marks the FIRST crossing.
    got.find(_._4 == 1L).foreach { first =>
      assert(got.takeWhile(_._1 < first._1).forall(_._3 == "continue"))
    }
  }

  test("graph_kcore: matches a local peeling reference, monotone trajectory") {
    val op = Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    var edges = op.groupBy(_._1).toSeq.flatMap { case (_, items) =>
      val ps = items.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).filter(_._2.length >= 2).keys.toSeq
    val want = (1 to 3).map { round =>
      val deg = (edges.map(_._1) ++ edges.map(_._2))
        .groupBy(identity).map { case (k, g) => k -> g.size }
      val keep = deg.filter(_._2 >= 3).keySet
      edges = edges.filter(e => keep(e._1) && keep(e._2))
      val verts = (edges.map(_._1) ++ edges.map(_._2)).distinct.length
      (round.toLong, verts.toLong, edges.length.toLong)
    }
    val got = SparkEntry.queries("graph_kcore")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == want)
    // Peeling only shrinks the graph.
    val es = got.map(_._3)
    assert(es.zip(es.tail).forall { case (a, b) => a >= b })
  }

  test("ev_cusum_drift: equals the sequential CUSUM recurrence computed locally") {
    val counts = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("x"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("ev_cusum_drift")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    counts.groupBy(_._1).foreach { case (ty, rows) =>
      val xs = rows.sortBy(_._2)
      val k = math.floor(1000.0 * xs.map(_._3).sum.toDouble / xs.length).toLong
      var c = 0L; var cmax = 0L; var hmax = -1L
      xs.foreach { case (_, h, x) =>
        c = math.max(0L, c + 1000L * x - k)
        if (c > cmax) { cmax = c; hmax = h }
      }
      val (gk, gn, gcmax, ghmax) = got(ty)
      assert(gk == k && gn == xs.length.toLong)
      assert(gcmax == cmax, s"$ty cusum_max")
      assert(ghmax == hmax, s"$ty h_at_max")
    }
  }

  test("ev_ewma_grid: equals the truncated recurrence computed locally") {
    val counts = Tables.events(spark, TestSpark.sf)
      .select(col("event_type"),
        expr("unix_micros(date_trunc('hour', ts)) div 3600000000").as("h"))
      .groupBy(col("event_type"), col("h")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val hmax = counts.keys.map(_._2).max
    val got = SparkEntry.queries("ev_ewma_grid")(spark, TestSpark.sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.keys.map(_._2).max == hmax) // grid capped at the last hour
    got.foreach { case ((ty, t), (x, s)) =>
      assert(x == counts.getOrElse((ty, t), 0L))
      // Local truncated EWMA: Σ_{k=0..29} x_{t−k} · 2^{−(k+1)} — exact
      // dyadic arithmetic, so equality is EXACT, not approximate.
      val want = (0 to 29).map { k =>
        counts.getOrElse((ty, t - k), 0L).toDouble * math.pow(0.5, k + 1)
      }.sum
      assert(s == want, s"($ty,$t): $s vs $want")
    }
  }
}
