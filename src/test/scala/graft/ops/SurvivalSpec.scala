package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Survival family: the oracle gate proves Spark≡DuckDB; these tests pin
  * the STATISTICS against a plain-Scala Kaplan-Meier / log-rank reference
  * so both engines can't be consistently wrong together. */
class SurvivalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** Local reference durations: (t, event) per user, censored at 48 h. */
  private lazy val durs: Seq[(Long, Long)] = {
    val rows = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("ts"), col("event_type")).collect()
    rows.groupBy(_.getLong(0)).toSeq.map { case (_, evs) =>
      val t0 = evs.map(_.getTimestamp(1).getTime).min
      val tp = evs.filter(_.getString(2) == "purchase")
        .map(_.getTimestamp(1).getTime).min // fixture: every user purchases
      val durH = (tp - t0) / 3600000L
      if (durH <= 48L) (durH, 1L) else (48L, 0L)
    }
  }

  test("surv_km: matches a plain-Scala Kaplan-Meier estimator") {
    val got = SparkEntry.queries("surv_km")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    // Reference: exact-product KM over the same grid.
    val byT = durs.groupBy(_._1).toSeq.sortBy(_._1)
    var atRisk = durs.size.toLong
    var s = 1.0
    val want = byT.map { case (t, g) =>
      val d = g.count(_._2 == 1L).toLong
      val c = g.count(_._2 == 0L).toLong
      val row = (t, atRisk, d, c)
      if (d > 0) s *= (atRisk - d).toDouble / atRisk.toDouble
      atRisk -= d + c
      (row, s)
    }
    assert(got.length == want.length)
    got.zip(want).foreach { case ((t, n, d, c, skm), ((wt, wn, wd, wc), ws)) =>
      assert((t, n, d, c) == (wt, wn, wd, wc))
      // frozen-log product ≡ exact product within 49 steps × 1e-6 micro-nats
      assert(math.abs(skm - ws) < 1e-3, s"t=$t: $skm vs $ws")
      assert(skm >= 0.0 && skm <= 1.0)
    }
    // Survival is monotone nonincreasing and starts from the full cohort.
    val ss = got.map(_._5)
    assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
    assert(got.head._2 == durs.size.toLong)
  }

  test("surv_km_arms: per-arm curves are each monotone and arms partition the cohort") {
    val got = SparkEntry.queries("surv_km_arms")(spark, TestSpark.sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    val arms = got.map(_._1).distinct.sorted
    assert(arms.forall(a => a >= 0L && a < 3L))
    arms.foreach { a =>
      val curve = got.filter(_._1 == a).sortBy(_._2)
      val ss = curve.map(_._6)
      assert(ss.zip(ss.tail).forall { case (x, y) => x >= y },
        s"arm $a survival not monotone")
      // First-row at-risk = the arm's cohort size; arms sum to all users.
      assert(curve.head._3 == curve.map(r => r._4 + r._5).sum)
    }
    val cohortSizes = arms.map(a => got.filter(_._1 == a).head._3).sum
    assert(cohortSizes == durs.size.toLong)
  }

  test("surv_logrank: matches a plain-Scala log-rank statistic") {
    val r = SparkEntry.queries("surv_logrank")(spark, TestSpark.sf)
      .collect().head
    // Reference over arms user_id%3 ∈ {0,1}.
    val rows = Tables.events(spark, TestSpark.sf)
      .select(col("user_id"), col("ts"), col("event_type")).collect()
    val byUser = rows.groupBy(_.getLong(0)).map { case (u, evs) =>
      val t0 = evs.map(_.getTimestamp(1).getTime).min
      val tp = evs.filter(_.getString(2) == "purchase")
        .map(_.getTimestamp(1).getTime).min
      val durH = (tp - t0) / 3600000L
      val (t, e) = if (durH <= 48L) (durH, 1L) else (48L, 0L)
      (u % 3, t, e)
    }.filter(_._1 < 2).toSeq
    var o = 0.0; var v = 0.0; var obs1 = 0L; var events = 0L
    val grid = byUser.groupBy(_._2).toSeq.sortBy(_._1)
    var n = byUser.size.toLong
    var n1 = byUser.count(_._1 == 1L).toLong
    grid.foreach { case (_, g) =>
      val d = g.count(_._3 == 1L).toLong
      val d1 = g.count(x => x._3 == 1L && x._1 == 1L).toLong
      if (d > 0) {
        o += d1.toDouble - d.toDouble * n1 / n
        if (n > 1)
          v += d.toDouble * (n1.toDouble / n) * ((n - n1).toDouble / n) *
            ((n - d).toDouble / (n - 1))
        obs1 += d1; events += d
      }
      n -= g.size
      n1 -= g.count(_._1 == 1L)
    }
    assert(r.getAs[Long]("obs1") == obs1)
    assert(r.getAs[Long]("events") == events)
    val chi2 = r.getAs[Double]("chi2")
    assert(chi2 >= 0.0)
    assert(math.abs(chi2 - o * o / v) < 1e-2, s"$chi2 vs ${o * o / v}")
  }
}
