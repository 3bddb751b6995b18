package graft

import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions: the 100-TB claims made in Scaladoc are enforced
  * here, not just narrated — a refactor that silently adds a shuffle or
  * degrades an equi-join to a nested loop fails the build. */
class PlanAuditSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString

  test("pipeline_prep: two hash shuffles + only the final total-order sort") {
    val p = plan("pipeline_prep")
    val hashEx = "hashpartitioning".r.findAllMatchIn(p).size
    val rangeEx = "rangepartitioning".r.findAllMatchIn(p).size
    assert(hashEx == 2, s"expected 2 hash exchanges (dedup window, stats agg), got $hashEx:\n$p")
    assert(rangeEx == 1, s"expected only the final ORDER BY range exchange, got $rangeEx")
  }

  test("join_range_bucketed: equi-join, never a nested loop") {
    val p = plan("join_range_bucketed")
    assert(!p.contains("BroadcastNestedLoop"),
      s"bucketized range join degraded to a nested loop:\n$p")
  }

  test("pii_sweep: map-only — no exchange at all before the dump") {
    val p = plan("pii_sweep")
    assert(!p.contains("Exchange") || p.contains("rangepartitioning"),
      s"PII sweep should not shuffle data:\n$p")
    assert("hashpartitioning".r.findAllMatchIn(p).isEmpty,
      s"unexpected hash shuffle in a projection pipeline:\n$p")
  }

  test("q1_pricing_summary: partial-final aggregate, single shuffle") {
    val p = plan("q1_pricing_summary")
    assert("hashpartitioning".r.findAllMatchIn(p).size == 1,
      s"flagship agg should shuffle exactly once:\n$p")
  }

  test("text_decontaminate: benchmark side broadcasts — corpus side is never shuffled for the join") {
    val p = plan("text_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"decontamination must be a broadcast hash join:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"corpus side must not shuffle for the benchmark join:\n$p")
  }

  test("ev_anomaly: stats broadcast back over the facts — no sort-merge join") {
    val p = plan("ev_anomaly")
    assert(p.contains("BroadcastHashJoin"),
      s"per-type stats must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"fact side must not shuffle:\n$p")
  }

  test("corpus_split: map-side projection + one aggregate shuffle") {
    val p = plan("corpus_split")
    assert("hashpartitioning".r.findAllMatchIn(p).size == 1,
      s"hash split should shuffle exactly once (the split×lang agg):\n$p")
  }
}
