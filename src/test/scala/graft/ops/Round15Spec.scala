package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.{SparkEntry, TestSpark}

/** Round-15 session: skew/bound hardening from the round-10 verdict —
  * the triangle self-join skew guard behind dd_er_score, the in-code
  * eval-sample cap on the brute-force embedding arms, and the single-pass
  * melted RFM quintiles. */
class Round15Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("trianglePairs: exact pair set on a skewed synthetic — identical to " +
    "the naive blocked self-join, for several sub-block widths") {
    // One hot block of 300 rows, one mid block of 40, several singletons —
    // the shape the guard exists for.
    val rows = (1L to 300L).map(i => ("hot", 1, i)) ++
      (301L to 340L).map(i => ("mid", 2, i)) ++
      Seq(("a", 3, 341L), ("b", 4, 342L), ("c", 5, 343L), ("c", 5, 344L))
    val df = rows.toDF("blk", "p_size", "p_partkey")
      .withColumn("p_name", concat(lit("n"), col("p_partkey")))
    val naive = {
      val a = df.select(col("blk"), col("p_size"),
        col("p_partkey").as("ak"), col("p_name").as("an"))
      val b = df.select(col("blk"), col("p_size"),
        col("p_partkey").as("bk"), col("p_name").as("bn"))
      a.join(b, Seq("blk", "p_size")).filter(col("ak") < col("bk"))
        .select(col("ak"), col("bk")).as[(Long, Long)].collect().toSet
    }
    for (sub <- Seq(8L, 32L, 1024L)) {
      val got = LlmDedup.trianglePairs(
          df, Seq("blk", "p_size"), "p_partkey", Seq("p_name"), sub)
        .select(col("a_p_partkey"), col("b_p_partkey"))
        .as[(Long, Long)].collect()
      assert(got.length == got.toSet.size,
        s"sub=$sub: a pair was emitted more than once")
      assert(got.toSet == naive, s"sub=$sub: pair set diverged from naive")
    }
  }

  test("trianglePairs: hot-block work is spread — no (block, sub-block) " +
    "cell side exceeds a small multiple of the sub-block knob") {
    val rows = (1L to 600L).map(i => ("hot", 1, i))
    val df = rows.toDF("blk", "p_size", "p_partkey")
      .withColumn("p_name", concat(lit("n"), col("p_partkey")))
    val sub = 32L
    // Reconstruct the per-cell side size the join actually sees: each
    // replicated record lands in gn cells; a cell's a-side rows are the
    // records with g == ci plus (for the diagonal) g == cj.
    val pairs = LlmDedup.trianglePairs(
      df, Seq("blk", "p_size"), "p_partkey", Seq("p_name"), sub)
    val maxCell = pairs.groupBy(col("blk"), col("p_size"),
        col("ci"), col("cj"))
      .agg(countDistinct(col("a_p_partkey")).as("na"),
        countDistinct(col("b_p_partkey")).as("nb"))
      .agg(max(greatest(col("na"), col("nb"))).as("mx"))
      .head.getLong(0)
    // An off-diagonal cell's join side is the UNION of its two sub-blocks
    // (records of both g=ci and g=cj emit the cell on each side), so the
    // expected side is 2·(600/⌈600/32⌉) ≈ 64; xxhash64 imbalance gets 2×
    // slack on top. A regression to one unsplit cell would show 600 here.
    assert(maxCell <= 4 * sub,
      s"hot block not spread: max cell side $maxCell > ${4 * sub}")
    // And nothing is lost: C(600,2) pairs exactly.
    assert(pairs.count() == 600L * 599L / 2L)
  }

  test("dd_er_score: the pair join keys on (blk, p_size, ci, cj) — " +
    "sub-block cells reach the shuffle, and no cartesian appears") {
    import org.apache.spark.sql.catalyst.plans.logical.Join
    val qe = SparkEntry.queries("dd_er_score")(spark, TestSpark.sf)
      .queryExecution
    val p = qe.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"blocked ER must stay an equi join:\n$p")
    val pairJoins = qe.optimizedPlan.collect {
      case j: Join if j.condition.exists(_.references.exists(_.name == "ci")) => j
    }
    assert(pairJoins.nonEmpty || p.contains("ci"),
      s"the sub-block cell keys must participate in the pair join:\n$p")
  }

  test("rel_rfm: ONE melted (dim, v) boundary grid — no per-dimension " +
    "value-grid aggregate survives (the pre-melt shape planned three)") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val lp = SparkEntry.queries("rel_rfm")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan
    def groupKeys(a: Aggregate): Set[String] =
      a.groupingExpressions.flatMap(_.references.map(_.name)).toSet
    val aggs = lp.collect { case a: Aggregate => a }
    // The old shape built three single-dim grids (grouping on bare v);
    // the melted shape only ever groups the value grid WITH its dim tag.
    assert(!aggs.exists(a => groupKeys(a) == Set("v")),
      s"a per-dimension bare-v grid crept back into RFM:\n$lp")
    assert(aggs.exists(a => groupKeys(a) == Set("dim", "v")),
      s"expected the melted (dim, v) grid aggregate:\n$lp")
  }

  test("sim eval arms: the brute-force pair joins read the ≤512-row " +
    "deterministic sample, never the raw corpus (limit under every side)") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Join}
    for (q <- Seq("sim_top_pairs", "dd_embed_neardup", "sim_ann_recall")) {
      val lp = SparkEntry.queries(q)(spark, TestSpark.sf)
        .queryExecution.optimizedPlan
      val pairJoins = lp.collect {
        case j: Join if j.condition.exists(c =>
          c.toString.contains("a_id") || c.toString.contains("vec_id")) => j
      }
      assert(pairJoins.nonEmpty, s"$q: expected the pair join")
      pairJoins.foreach { j =>
        Seq(j.left, j.right).foreach { side =>
          assert(side.collectFirst { case l: GlobalLimit => l }.nonEmpty,
            s"$q: a pair-join side is not limit-bounded:\n$lp")
        }
      }
    }
  }
}
