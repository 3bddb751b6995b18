package graft.plans

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long)]) = {
    val l = left.toDF("id", "k", "t")
    val r = right.toDF("rk", "rt")
    AsOfJoin(spark, l, r, l("k"), r("rk"), l("t"), r("rt"))
      .select($"id", $"rt").as[(Long, Option[Long])]
      .collect().toMap
  }

  test("matches latest right at-or-before; null when none") {
    val got = run(
      left = Seq((1L, 10L, 100L), (2L, 10L, 250L), (3L, 20L, 50L)),
      right = Seq((10L, 90L), (10L, 200L), (10L, 300L), (30L, 10L)))
    assert(got(1L) == Some(90L))    // 200 is after 100
    assert(got(2L) == Some(200L))   // latest <= 250
    assert(got(3L) == None)         // key 20 has no right rows
  }

  test("equality counts as at-or-before; keys without left rows are skipped") {
    val got = run(
      left = Seq((1L, 5L, 100L), (2L, 7L, 100L)),
      right = Seq((5L, 100L), (6L, 50L), (7L, 101L)))
    assert(got(1L) == Some(100L))   // rt == t matches
    assert(got(2L) == None)         // only later right rows
  }

  test("many keys across partitions match the window-based formulation") {
    // random-ish but deterministic workload; compare against a window plan
    val left = (1L to 400L).map(i => (i, i % 13, (i * 37) % 1000))
    val right = (1L to 600L).map(i => ((i * 7) % 13, (i * 53) % 1000))
    val got = run(left, right)
    val expected = left.map { case (id, k, t) =>
      val cands = right.filter(r => r._1 == k && r._2 <= t)
      id -> (if (cands.isEmpty) None else Some(cands.map(_._2).max))
    }.toMap
    assert(got == expected)
  }
}
