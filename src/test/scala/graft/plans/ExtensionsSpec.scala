package graft.plans

import graft.TestSpark
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions installs the full library through the public
  * `SparkSessionExtensions` hook — functions resolve by name in SQL and
  * the as-of strategy plans without any per-query `register` call. */
class ExtensionsSpec extends AnyFunSuite {

  test("withExtensions session resolves graft functions and as-of strategy") {
    val base = TestSpark.spark   // ensures the shared SparkContext exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      assert(s ne base, "expected a fresh session with extensions applied")
      import s.implicits._

      // custom scalar expression via SQL name, no register() call
      val d = Seq((Array(1f, 2f), Array(3f, 4f))).toDF("a", "b")
        .selectExpr("graft_dot(a, b) AS d").head().getDouble(0)
      assert(d == 11.0)

      // custom UDTF via SQL LATERAL VIEW-style select
      val bands = Seq(Tuple1((1L to 32L).toArray))
        .toDF("mh")
        .selectExpr("graft_minhash_bands(mh) AS (band, sig)")
      assert(bands.count() == 16)

      // the as-of strategy is installed in this session's planner
      val strategies = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
        .sessionState.planner.strategies
      assert(strategies.contains(AsOfJoinStrategy))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
