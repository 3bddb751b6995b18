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

      // the optimizer rule rewrites dot(x, x) to the self-dot kernel —
      // plan shape AND value both pinned (parquet source so
      // ConvertToLocalRelation can't pre-fold the projection away)
      val emb = s.read.parquet(s"${TestSpark.sf}/embeddings.parquet")
      val selfDf = emb.selectExpr("vec_id", "graft_dot(embedding, embedding) AS n2")
      assert(selfDf.queryExecution.optimizedPlan.toString
        .contains("graft_self_dot"),
        s"SelfDotRewrite must fire on dot(x, x):\n" +
          selfDf.queryExecution.optimizedPlan)
      val twoArg = emb.selectExpr("vec_id",
        "graft_dot(embedding, embedding) AS n2").head()
      val manual = emb.selectExpr("vec_id",
        "aggregate(zip_with(embedding, embedding, (x, y) -> " +
          "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (a, v) -> a + v)" +
          " AS n2").head()
      assert(twoArg.getDouble(1) == manual.getDouble(1),
        "self-dot rewrite must be value-identical to the fold")
      // ...and must NOT fire on genuinely different children
      val crossDf = emb.as("x").join(emb.as("y"),
          col("x.vec_id") === col("y.vec_id"))
        .selectExpr("graft_dot(x.embedding, y.embedding) AS d")
      assert(!crossDf.queryExecution.optimizedPlan.toString
        .contains("graft_self_dot"))
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }
}
