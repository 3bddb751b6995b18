package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the event-analytics additions (the oracle gate proves
  * cross-engine parity; these pin the properties). */
class EventsOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ev_anomaly: every flagged event is beyond 2.5 sigma, and |z| agrees") {
    val rows = Events.anomaly(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getAs[Double]("z")
      assert(math.abs(z) > 2.5)
      val rebuilt = (r.getAs[Double]("value") - r.getAs[Double]("mu")) /
        r.getAs[Double]("sigma")
      assert(rebuilt == z, "z must be the pure IEEE recombination of its parts")
    }
  }

  test("ev_gapfill: complete grid, zero-filled gaps, monotone forward fill") {
    val out = Events.gapfill(spark, TestSpark.sf).collect()
    val types = out.map(_.getAs[String]("event_type")).distinct
    val hours = out.map(_.getAs[String]("hour")).distinct
    assert(out.length == types.length * hours.length,
      "grid must be the full cross product of types and hours")
    out.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[String]("hour"))
      var lastSeen = 0.0
      sorted.foreach { r =>
        if (r.getAs[Long]("n") == 0L) {
          assert(r.getAs[Double]("v") == 0.0, "empty hour must zero-fill v")
          assert(r.getAs[Double]("v_ffill") == lastSeen,
            "gap hour must carry the last observed sum")
        } else {
          lastSeen = r.getAs[Double]("v")
          assert(r.getAs[Double]("v_ffill") == lastSeen)
        }
      }
    }
  }

  test("ev_session_paths: path length matches n_events; session boundaries " +
    "agree with ev_sessions") {
    val paths = Events.sessionPaths(spark, TestSpark.sf)
    val rows = paths.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val path = r.getAs[String]("path")
      assert(path.split(">").length == r.getAs[Long]("n_events"),
        s"path '$path' disagrees with n_events")
    }
    // same sessionization as ev_sessions: session count per user matches
    val viaPaths = paths.groupBy("user_id")
      .agg(count(lit(1)).as("n")).orderBy("user_id").collect()
    val viaSessions = Events.sessions(spark, TestSpark.sf)
      .groupBy("user_id").agg(count(lit(1)).as("n")).orderBy("user_id")
      .collect()
    assert(viaPaths.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      viaSessions.map(r => (r.getLong(0), r.getLong(1))).toSeq)
  }

  test("rel_diff: statuses partition the key space correctly") {
    val out = Relational.snapshotDiff(spark, TestSpark.sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = r.getAs[Long]("o_orderkey")
      val status = r.getAs[String]("status")
      val mask = r.getAs[String]("changed_cols")
      status match {
        case "added"   => assert(k % 13 == 0 && k % 17 != 0 && mask.isEmpty)
        case "removed" => assert(k % 17 == 0 && k % 13 != 0 && mask.isEmpty)
        case "changed" =>
          assert(k % 13 != 0 && k % 17 != 0)
          assert(mask.nonEmpty && !mask.contains("o_custkey"),
            "o_custkey never changes by construction")
          assert((k % 11 == 0) == mask.contains("o_totalprice"))
          assert((k % 19 == 0) == mask.contains("o_orderstatus"))
      }
    }
  }
}
