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

  test("join_bloom_reduce: bit-test filter prunes the fact side before a real shuffle join") {
    val p = plan("join_bloom_reduce")
    assert(p.contains("ShuffledHashJoin"),
      s"verify join must stay a shuffle join (broadcast would hide the point):\n$p")
    assert(p.contains("element_at"),
      s"bloom bit tests must appear as a filter on the probe side:\n$p")
    // The bloom probe must run BEFORE the verify join's exchange: in the
    // formatted plan the Filter holding the bit tests sits under the
    // probe-side Exchange, so the element_at must occur after (deeper
    // than) the last join in tree print order.
    val joinIdx = p.indexOf("ShuffledHashJoin")
    assert(p.indexOf("element_at", joinIdx) > joinIdx,
      s"bloom filter should be below the join in the plan tree:\n$p")
  }

  test("agg_median_2pass: the order-statistic window partitions on (grp, bucket), never grp alone") {
    val p = plan("agg_median_2pass")
    val winLines = p.linesIterator.filter(l =>
      l.contains("row_number") && l.contains("windowspecdefinition")).toSeq
    assert(winLines.nonEmpty, s"expected a row_number window:\n$p")
    assert(winLines.forall(_.contains("bucket")),
      s"the pass-2 sort must stay bucket-local (one bucket of state, not the group):\n$p")
  }

  test("text_bm25: df and avgdl broadcast — the postings stream is never sort-merge joined") {
    val p = plan("text_bm25")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      s"df/stats must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"postings must not shuffle for the stats join:\n$p")
  }

  test("sim_centroid_eval: assignment is map-only — corpus never shuffles for a join") {
    val p = plan("sim_centroid_eval")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"centroid assignment must be broadcast/map-only:\n$p")
  }

  test("ev_attribution_multi: exactly the as-of and conversion exchanges plus the final sort") {
    val p = plan("ev_attribution_multi")
    val hashEx = "hashpartitioning".r.findAllMatchIn(p).size
    assert(hashEx <= 3,
      s"expected at most user_id window + conv window + final agg exchanges, got $hashEx:\n$p")
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

  test("corpus_global_ids: no single-partition exchange on the fact path " +
    "(the naive global row_number plan it replaces)") {
    val p = plan("corpus_global_ids")
    // the |langs|-row offset table passes through one SinglePartition
    // window; the document stream itself must never collapse to one task
    val single = "Exchange SinglePartition".r.findAllMatchIn(p).size
    assert(single <= 1, s"fact stream collapsed to a single partition:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"offsets must broadcast back, not shuffle the facts:\n$p")
  }

  test("text_boilerplate: boiler set broadcasts — the corpus shingle " +
    "stream is never shuffled for the membership join") {
    val p = plan("text_boilerplate")
    assert(p.contains("BroadcastHashJoin"),
      s"boiler membership must be a broadcast join:\n$p")
  }

  test("corpus_source_quota: one shuffle on source for the rank window") {
    val p = plan("corpus_source_quota")
    assert("hashpartitioning\\(source".r.findAllMatchIn(p).nonEmpty,
      s"quota rank must partition by source:\n$p")
  }

  test("ev_session_paths: sessionize windows and the path aggregate all " +
    "share ONE user_id shuffle") {
    val p = plan("ev_session_paths")
    assert("hashpartitioning".r.findAllMatchIn(p).size == 1,
      s"sessionization must reuse a single user_id exchange:\n$p")
  }

  test("vec_centroids: every collect_list is chunk-bounded — no per-(label,pos) " +
    "collect of a whole label's vectors") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val q = SparkEntry.queries("vec_centroids")(spark, TestSpark.sf)
    // level 1 collects RAW exploded values (attribute `x`) and must be
    // chunk-keyed; level 2 collects the 256x-smaller per-chunk sums and is
    // allowed to group by (label, pos) alone
    val rawCollects = q.queryExecution.optimizedPlan.collect {
      case a: Aggregate
        if a.aggregateExpressions.exists(
          _.find(_.getClass.getSimpleName == "CollectList").isDefined) &&
          a.child.output.exists(_.name == "x") => a
    }
    assert(rawCollects.nonEmpty, "expected the chunk-level sorted-fold aggregate")
    rawCollects.foreach { a =>
      assert(a.groupingExpressions.exists(
        _.find { e =>
          e.isInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute] &&
            e.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Attribute]
              .name == "chunk"
        }.isDefined),
        s"raw-value collect_list group must include the bounding chunk key:\n${a.groupingExpressions}")
    }
  }

  test("corpus_pack: the corpus-side running-count window partitions on " +
    "(lang, shard), never lang alone") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val q = SparkEntry.queries("corpus_pack")(spark, TestSpark.sf)
    val corpusWindows = q.queryExecution.optimizedPlan.collect {
      // windows whose input still carries doc_id operate on the corpus
      // stream; the offset table's prefix window does not
      case w: LWindow if w.child.output.exists(_.name == "doc_id") => w
    }
    assert(corpusWindows.nonEmpty, "expected the shard-local cumsum window")
    corpusWindows.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
      })
      assert(keys.contains("shard"),
        s"corpus window must include shard in its partition spec, got $keys")
    }
  }

  test("vec_kmeans: centroid tables broadcast — the corpus is never " +
    "shuffled for an assignment join") {
    val p = plan("vec_kmeans")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"centroid assignment must broadcast the k-row table:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no assignment step may shuffle the corpus for its join:\n$p")
    assert(!p.contains("Window"),
      s"assignment argmin must be the map-only array_min fold, not a rank window:\n$p")
  }

  test("sim_ivf_topk: corpus cell assignment is map-only — every surviving " +
    "window partitions on the (small) query-id side") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val windows = SparkEntry.queries("sim_ivf_topk")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(windows.nonEmpty, "expected the probe/rank windows to remain")
    windows.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
      })
      assert(keys.forall(_ == "q_id"),
        s"corpus-side window crept back into IVF assignment, partition keys = $keys")
    }
  }

  test("dd_semdedup: assignment is map-only and the pair search is a cell " +
    "equi-join — no window, no cartesian pair stage") {
    val p = plan("dd_semdedup")
    assert(!p.contains("Window"),
      s"cell assignment must be the map-only array_min fold:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
      s"within-cell pair search must be an equi-join on cell:\n$p")
    // the only nested-loop join allowed is the 1-row broadcast codebook fold
    assert(!p.contains("CartesianProduct"),
      s"no all-pairs stage may appear anywhere:\n$p")
  }

  test("rel_cdc_apply: the changelog union shuffles ONCE on the key for " +
    "the latest-wins window") {
    val p = plan("rel_cdc_apply")
    assert("hashpartitioning\\(o_orderkey".r.findAllMatchIn(p).size == 1,
      s"apply-changes must be a single key shuffle:\n$p")
  }

  test("rel_diff: full-outer join shuffles both snapshots once on the key") {
    val p = plan("rel_diff")
    assert(p.contains("FullOuter"), s"diff must be a full-outer join:\n$p")
    assert(!p.contains("BroadcastNestedLoop"),
      s"diff must stay an equi join:\n$p")
  }

  test("join_interval_overlap: the quadratic pair join compiles to ZERO " +
    "join operators — sweep line is windows and aggregates only") {
    val p = plan("join_interval_overlap")
    assert(!p.contains("Join") && !p.contains("CartesianProduct"),
      s"pair counting must never form pairs:\n$p")
  }

  test("dd_bloom_incremental: the bloom is a 1-row broadcast; the exact " +
    "verify join stays an equi hash join") {
    val p = plan("dd_bloom_incremental")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the folded bloom row must broadcast to the probe side:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"no unbroadcast cross product may appear:\n$p")
  }

  test("dd_chunk_dedup: ownership check is a chunk-hash equi-join — " +
    "no nested loop, no cartesian") {
    val p = plan("dd_chunk_dedup")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      s"chunk ownership must join on the content hash:\n$p")
  }

  test("graph_pagerank: every iteration joins on a key — no cartesian, " +
    "and contributions fold without a rank window") {
    val p = plan("graph_pagerank")
    assert(!p.contains("CartesianProduct"),
      s"rank propagation must stay key-joined:\n$p")
    assert(!p.contains("Window"),
      s"in-neighbor folds must be aggregates, not windows:\n$p")
  }

  test("sql_recursive_series: UnionLoop spine joins the pre-aggregated daily " +
    "side as a broadcast — the fact table never shuffles for the join") {
    val p = plan("sql_recursive_series")
    assert(p.contains("UnionLoop"), s"recursive CTE must plan as UnionLoop:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"daily aggregate must broadcast against the spine:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join expected:\n$p")
  }

  test("join_asof_nearest: both directional frames share one user_id exchange") {
    val p = plan("join_asof_nearest")
    val hashEx = "hashpartitioning".r.findAllMatchIn(p).size
    assert(hashEx == 1,
      s"backward+forward frames must reuse a single hash exchange, got $hashEx:\n$p")
    assert(!p.contains("Join"), s"nearest as-of must not plan a join:\n$p")
  }

  test("agg_percentile_disc: two-pass — grids broadcast back, no collect, no cume_dist") {
    // Round 15 replaced the one-exchange cume_dist form (whose window
    // sorted corpus/|priorities| rows in ONE task per group) with the
    // median2Pass bucket plan: more exchanges, all of them grid-sized; the
    // only row-level sort is the target bucket's row_number (asserted
    // bucket-partitioned in the companion test below).
    val p = plan("agg_percentile_disc")
    assert(!p.contains("collect_list"), s"discrete percentile must not collect:\n$p")
    assert(!p.contains("cume_dist"),
      s"the raw-row cume_dist window must not come back:\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"the k-threshold and target-bucket tables must broadcast:\n$p")
  }

  test("text_quality_classifier: the collect_list fold is bounded by the " +
    "16-bucket key, and the weight table never materializes as a join") {
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val q = SparkEntry.queries("text_quality_classifier")(spark, TestSpark.sf)
    val aggs = q.queryExecution.optimizedPlan.collect {
      case a: Aggregate if a.aggregateExpressions.exists(
        _.toString.contains("collect_list")) => a
    }
    assert(aggs.nonEmpty, "expected the bucket-ordered fold aggregate")
    aggs.foreach { a =>
      assert(a.groupingExpressions.exists(_.toString.contains("doc_id")),
        s"fold must group per doc (bounded by 16 buckets):\n${a.groupingExpressions}")
    }
  }

  /** The global-window-on-reduced-table idiom: an unpartitioned Window is
    * fine ONLY because its input is an already-aggregated grid (months /
    * hours), never the fact table. Assert the Aggregate sits BELOW every
    * Window so a refactor can't silently move the window onto raw rows. */
  private def assertWindowReadsAggregated(name: String): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val lp = SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.optimizedPlan
    val wins = lp.collect { case w: LWindow => w }
    assert(wins.nonEmpty, s"$name: expected a Window in the plan:\n$lp")
    wins.foreach { w =>
      assert(w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"$name: unpartitioned Window consumes unreduced input:\n$lp")
    }
  }

  test("join_salted: shuffled hash join on the salted key, never broadcast") {
    val p = plan("join_salted")
    assert(!p.contains("BroadcastHashJoin"),
      s"broadcast would hide the salting:\n$p")
    assert(p.contains("ShuffledHashJoin") || p.contains("SortMergeJoin"),
      s"expected a shuffled join:\n$p")
    assert(p.toLowerCase.contains("salt"), s"salt key missing from plan:\n$p")
  }

  test("rel_mom_growth: the global lag window runs on the monthly aggregate, not orders") {
    assertWindowReadsAggregated("rel_mom_growth")
  }

  test("ev_interpolate: the fill windows run on the hourly grid, not raw events") {
    assertWindowReadsAggregated("ev_interpolate")
  }

  test("ev_gapfill: the fill windows run on the hourly grid, not raw events") {
    assertWindowReadsAggregated("ev_gapfill")
  }

  /** The bucket-localization contract (round 9): any window that still
    * sees the FINE-grain column (the distinct-value grid / the raw key)
    * must partition on its bucket column — the unpartitioned prefix-sum
    * windows may only read the knob-bounded per-bucket table, which by
    * construction no longer carries the fine column. */
  private def assertBucketLocalized(
      name: String, fine: String, bucket: String*): Unit = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = SparkEntry.queries(name)(spark, TestSpark.sf)
      .queryExecution.optimizedPlan
    val wins = lp.collect { case w: LWindow => w }
    assert(wins.nonEmpty, s"$name: expected windows in the plan:\n$lp")
    wins.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
      })
      if (w.child.output.exists(_.name == fine))
        assert(bucket.exists(keys.contains),
          s"$name: window over the '$fine' grid must partition on " +
            s"${bucket.mkString("/")}, got $keys:\n$lp")
    }
  }

  test("agg_mann_whitney: the value-grid cumsum partitions on the price bucket") {
    assertBucketLocalized("agg_mann_whitney", "v", "bucket")
  }

  test("agg_percentile_disc: the order-statistic window partitions on (grp, bucket)") {
    // Round 15: was a cume_dist window over corpus/|priorities| raw rows
    // per group — every row-level window must now stay bucket-local.
    assertBucketLocalized("agg_percentile_disc", "v", "bucket")
  }

  test("agg_weighted_median: the running-weight window partitions on (flag, bucket)") {
    // Round 15: was a RANGE-frame running sum over corpus/|flags| raw rows
    // per group — the cum window now reads only the target bucket's grid.
    assertBucketLocalized("agg_weighted_median", "l_extendedprice", "bucket")
  }

  test("layout_vacuum: snapshot replay semi-joins a broadcast live set — data never shuffles for metadata") {
    val p = plan("layout_vacuum")
    assert(p.contains("BroadcastHashJoin"),
      s"the live-path semi-join must broadcast the listing-scale side:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no data-scale shuffle join belongs in a metadata replay:\n$p")
  }

  test("layout_cdf: file sets broadcast; the only shuffle join is the pre/post key diff") {
    val p = plan("layout_cdf")
    assert(p.contains("BroadcastHashJoin"),
      s"removed/added path sets must broadcast into the semi-joins:\n$p")
    val smj = "SortMergeJoin".r.findAllMatchIn(p).size
    assert(smj <= 1,
      s"only the full-outer pre/post diff may shuffle (both sides are " +
        s"changed-file data), got $smj SortMergeJoins:\n$p")
  }

  test("layout_stats_skipping: candidates and bounds broadcast — the lake is scanned once per arm, never shuffled") {
    val p = plan("layout_stats_skipping")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate path sets must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"a stats-pruned scan must not shuffle the data side:\n$p")
  }

  test("layout_zorder_exec: all pruning joins broadcast the candidate sets") {
    val p = plan("layout_zorder_exec")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate path sets must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"layout audits must never shuffle the data side:\n$p")
  }

  test("layout_deletion_vectors: the vector applies as a broadcast anti-join — the lake never shuffles") {
    val p = plan("layout_deletion_vectors")
    assert(p.contains("BroadcastHashJoin LeftAnti") ||
      (p.contains("BroadcastHashJoin") && p.contains("LeftAnti")),
      s"the DV must broadcast into an anti-join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"merge-on-read must not shuffle the data side:\n$p")
  }

  test("layout_check_constraints: enforcement is a single-pass split — no joins anywhere") {
    val p = plan("layout_check_constraints")
    assert(!p.contains("Join"),
      s"constraint tagging + zone split + audit needs zero joins:\n$p")
  }

  test("src_custom_v2: range predicate pushes into the connector, projection prunes") {
    val p = plan("src_custom_v2")
    assert(p.contains("pushedRange=[4096,8191]"),
      s"the id bounds must narrow the GENERATED range at the source:\n$p")
    assert(!p.contains("tag"),
      s"the unused tag column must be pruned before it is computed:\n$p")
    // The untranslatable v % 3 predicate stays a residual Spark filter.
    assert(p.contains("Filter"),
      s"the arithmetic residual must remain a post-scan filter:\n$p")
  }

  test("geo_grid_join: cell blocking is an equi-join — never a cross product") {
    val p = plan("geo_grid_join")
    assert(p.contains("BroadcastHashJoin"),
      s"the 9-cell supplier side must broadcast into an equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"grid blocking must never degrade to a cross product:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the customer corpus must not shuffle for a dim-side radius join:\n$p")
  }

  test("geo_point_in_polygon: cell-blocked equi-join, the corpus never re-groups per edge") {
    val p = plan("geo_point_in_polygon")
    assert(p.contains("BroadcastHashJoin"),
      s"cell-exploded polygons must broadcast into an equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"bbox matching must ride the grid-cell equi-join, not a cross product:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"the point corpus must not shuffle for a dim-side containment join:\n$p")
    // The edge fold is per-row (higher-order aggregate): exactly ONE
    // aggregation pair (partial+final over the 25 polygon keys) — a
    // per-(point, edge) explode + re-group would add a corpus-scale one.
    val aggs = "HashAggregate".r.findAllIn(p).length
    assert(aggs <= 2, s"edge fold must not re-group the corpus:\n$p")
  }

  test("geo_knn: bounded-heap aggregate — no rank window re-sorts the candidate stream") {
    val p = plan("geo_knn")
    assert(!p.contains("Window"),
      s"kNN must keep top-k in a heap aggregate, not a rank window:\n$p")
    assert(p.contains("ObjectHashAggregate"),
      s"the TopK3 heap must run as partial+final ObjectHashAggregate:\n$p")
    assert(p.contains("BroadcastNestedLoop") || p.contains("CartesianProduct"),
      s"the exact brute-force arm broadcasts queries against the corpus:\n$p")
  }

  test("layout_mv_incremental: delta paths broadcast; the base table is never shuffle-joined") {
    val p = plan("layout_mv_incremental")
    assert(p.contains("BroadcastHashJoin"),
      s"the touched-bucket set must broadcast into the data join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"MV refresh must stay changed-file + |MV| scale — no data shuffle join:\n$p")
  }

  test("layout_bloom_skipping: probe bits and candidate sets broadcast — no shuffle join") {
    val p = plan("layout_bloom_skipping")
    assert(p.contains("BroadcastHashJoin"),
      s"probe bits and candidate file sets must broadcast into the scans:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"a point lookup must never shuffle-join the data side:\n$p")
  }

  test("layout_history: metadata replay joins broadcast — one data scan, no shuffle join") {
    val p = plan("layout_history")
    assert(p.contains("BroadcastHashJoin"),
      s"the per-version live set must broadcast into the single data scan:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"history is listing-scale — nothing may shuffle-join:\n$p")
  }

  test("layout_partition_evolution: both specs prune via broadcast candidates — no shuffle join") {
    val p = plan("layout_partition_evolution")
    assert(p.contains("BroadcastHashJoin"),
      s"candidate path sets must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"spec-evolution audits must not shuffle the data side:\n$p")
  }

  test("agg_ks_test: both CDF cumsums partition on the price bucket") {
    assertBucketLocalized("agg_ks_test", "v", "bucket")
  }

  test("agg_gini_wealth: the per-segment value-grid cumsum partitions on (seg, bucket)") {
    assertBucketLocalized("agg_gini_wealth", "v", "bucket")
  }

  test("ev_interarrival: the gap-grid cumsum partitions on the hourly gap bucket") {
    assertBucketLocalized("ev_interarrival", "gap_s", "bucket")
  }

  test("ev_time_to_convert: the survival cumsum partitions on the day bucket") {
    assertBucketLocalized("ev_time_to_convert", "delay_hours", "dday")
  }

  test("ev_pareto_share: the only user-level row_number partitions on the id-range bucket") {
    assertBucketLocalized("ev_pareto_share", "user_id", "ub")
  }

  test("agg_equidepth: the boundary order-statistic window partitions on the value bucket") {
    assertBucketLocalized("agg_equidepth", "p", "vb")
  }

  /** One optimized logical plan per registered query, built once and shared
    * by the catalog-wide audits below (planning all ~400 queries is the
    * expensive part; the audits themselves are tree walks). */
  private lazy val catalogPlans: Seq[(String, org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, TestSpark.sf).queryExecution.optimizedPlan
    }

  /** Round-12 bounded-subtree walk (r11 advice): a side counts as
    * structurally bounded ONLY when the bounding node is reached through
    * cardinality-non-increasing operators (project / filter / sort /
    * dedup / sample / repartition / window / alias / hint / local limit).
    * The previous collectFirst over the WHOLE subtree classified a
    * corpus-scale fact that merely CONTAINED a deep aggregate (e.g. fact
    * JOIN tiny-agg) as bounded; here any intervening Join / Union /
    * Generate — the cardinality-expanding nodes — makes the side
    * unbounded. `groupedAggBounds` selects the audit's semantics: the
    * theta audits accept any Aggregate as a bound (group count is
    * knob-bounded by documented grids), while the growth audit only
    * accepts the ungrouped (≤1-row) form and MEASURES grouped ones. */
  private def boundedWalk(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
      groupedAggBounds: Boolean): Boolean =
    boundKind(p).exists(k => groupedAggBounds || k != "grouped-agg")

  /** The KIND of bound the walk reached, if any: "grouped-agg" (group
    * count — corpus-dependent in general), "scalar-agg" (≤1 row),
    * "limit", or "literal" (LocalRelation / Range / OneRowRelation). */
  private def boundKind(
      p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Option[String] = {
    import org.apache.spark.sql.catalyst.plans.logical._
    p match {
      case a: Aggregate =>
        Some(if (a.groupingExpressions.isEmpty) "scalar-agg" else "grouped-agg")
      case _: GlobalLimit => Some("limit")
      case _: LocalRelation | _: Range | _: OneRowRelation => Some("literal")
      case _: Project | _: Filter | _: Sort | _: SubqueryAlias |
           _: ResolvedHint | _: Repartition | _: RepartitionByExpression |
           _: Deduplicate | _: Sample | _: Window | _: LocalLimit =>
        boundKind(p.children.head)
      case _ => None
    }
  }

  /** THE global scale invariant (round 10, scoped per query in round 11):
    * across the ENTIRE registered catalog, no unpartitioned window may read
    * an input that grows with the corpus. Mechanically: every logical
    * Window with an empty partitionSpec must either (a) read a
    * limit-bounded subtree (a TakeOrdered-cut top-k), or (b) belong to a
    * query registered below with EXACTLY the columns of its documented
    * bounded grid. The allowlist is scoped query → columns (round-10
    * advice: a single global column set let any future query smuggle an
    * unpartitioned window over a generic name like "x" past the audit);
    * a NEW query emitting an unpartitioned window fails here until its
    * grid is reviewed and registered. */
  test("catalog-wide: every unpartitioned window reads a bounded grid or a limit-cut input") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}
    // query → the columns of the knob-bounded grid its unpartitioned
    // window(s) legitimately read. Each grid's bound is documented at the
    // query's definition site (buckets, calendar days, deciles, …).
    val grids: Map[String, Set[String]] = Map(
      // value-bucket boundary / CDF grids (knob-bounded bucket counts)
      "agg_equidepth" -> Set("vb", "bn"),
      "agg_ks_test" -> Set("bucket", "b1", "b2"),
      "agg_mann_whitney" -> Set("bucket", "bc"),
      "ml_auc_exact" -> Set("bucket", "bc"),
      "ml_conformal" -> Set("bucket", "bc"),
      "ml_ks_score" -> Set("bucket", "bc", "bc1"),
      "ml_pr_auc" -> Set("bucket", "bc", "bc1"),
      "ml_lift_gains" -> Set("bucket", "bc", "decile", "n", "n_pos", "n_tot", "pos_tot"),
      "rel_skyline" -> Set("bucket", "bmax"),
      // per-source / per-language apportionment grids (|sources| rows)
      "corpus_apportion" -> Set("source", "toks", "base", "rem", "leftover"),
      "corpus_global_ids" -> Set("lang", "n"),
      "corpus_interleave" -> Set("rb", "bn"),
      "text_vocab_growth" -> Set("sb", "bt", "by"),
      // calendar grids — bounded by the fixture's observation window
      "ev_sprt" -> Set("day", "n_events", "n_conv", "llr_micro", "verdict", "_w0"),
      "rel_mom_growth" -> Set("month", "n_orders", "cents"),
      "win_rsi" -> Set("day", "cents", "gain", "loss"),
      "ts_stl_daily" -> Set("d", "x"),
      "ts_stl_anomaly" -> Set("d", "x"),
      "ev_stream_stl_daily" -> Set("d", "x"),
      "ts_bandit_replay" -> Set("d", "n0", "s0", "n1", "s1", "n2", "s2"),
      "ev_stream_bandit" -> Set("d", "n0", "s0", "n1", "s1", "n2", "s2"),
      // aggregated hourly grid (gap-fill interpolation spine)
      "ev_interpolate" -> Set("h", "v", "ph", "pv", "_w0"),
      // id-range bucket + decile readout grids
      "ev_pareto_share" -> Set("nb", "bc", "decile", "n_users", "n_events", "t_events", "share"),
      // survival duration grids — bounded by the 48 h censoring window
      "ev_time_to_convert" -> Set("dday", "bc"),
      "surv_km" -> Set("t", "d", "c", "n_risk", "term_mu", "dead", "_w0"),
      "surv_logrank" -> Set("t", "d", "d1", "x1", "_w0"))
    val offenders = catalogPlans.flatMap { case (name, lp) =>
      lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
        .flatMap { w =>
          val cols = w.child.output.map(_.name)
          val limitBounded =
            w.child.collectFirst { case l: GlobalLimit => l }.nonEmpty
          val allowed = grids.getOrElse(name, Set.empty)
          if (limitBounded || (cols.nonEmpty && cols.forall(allowed))) None
          else Some(s"$name: unpartitioned window over [${cols.mkString(",")}]")
        }
    }
    assert(offenders.isEmpty,
      s"unbounded unpartitioned windows found:\n${offenders.mkString("\n")}")
  }

  /** The OTHER global scale invariant (round 11, from the round-10
    * verdict): no registered plan may join two corpus-proportional inputs
    * on a condition with no equality conjunct — the all-pairs blow-up
    * class (the bug this round fixed in sim_top_pairs/dd_embed_neardup/
    * sim_ann_recall by capping the eval sample in code). For every logical
    * Join whose condition carries NO EqualTo/EqualNullSafe conjunct
    * (theta or cartesian), at least one side must be bounded:
    *  - a limit-cut subtree (GlobalLimit — the TakeOrdered sample cap),
    *  - an aggregate (grids / scalar moments — cardinality set by group
    *    count, which every such query documents as knob-bounded),
    *  - a LocalRelation / Range (literal grids),
    *  - an explicit broadcast() hint — the author's asserted-small claim,
    *    enforced at runtime by the broadcast memory ceiling, or
    *  - a scan of the fixed geography dims (region 5 / nation 25 rows).
    * Left-semi/anti are exempt (never cardinality-expanding; the null-aware
    * anti OR-condition is Spark's canonical NOT-IN shape, broadcast-planned).
    * ev_attribution_markov is exempted by name: its pair sides are
    * LogicalRDD checkpoints of the ≤6-row Markov state (bounded by the
    * channel alphabet, invisible to structural checks). */
  test("catalog-wide: every non-equi join has at least one bounded side") {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalRelation, LogicalPlan, Range => LRange}
    import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, LeftOuter, RightOuter}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def structurallyBounded(p: LogicalPlan): Boolean =
      boundedWalk(p, groupedAggBounds = true) ||
        p.collectLeaves().forall { leaf =>
          val out = leaf.output.map(_.name).toSet
          out.contains("r_regionkey") || out.contains("n_nationkey")
        }
    val exempt = Set("ev_attribution_markov")
    val offenders = catalogPlans.filterNot(p => exempt(p._1)).flatMap {
      case (name, lp) =>
        lp.collect {
          case j: Join if Seq(Inner, Cross, FullOuter, LeftOuter, RightOuter)
            .contains(j.joinType) => j
        }.flatMap { j =>
          val hasEqui = j.condition.exists(c => conjuncts(c).exists {
            case _: EqualTo | _: EqualNullSafe => true
            case _ => false
          })
          def hinted(h: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]) =
            h.exists(_.strategy.nonEmpty)
          val leftOk = structurallyBounded(j.left) || hinted(j.hint.leftHint)
          val rightOk = structurallyBounded(j.right) || hinted(j.hint.rightHint)
          if (hasEqui || leftOk || rightOk) None
          else Some(s"$name: ${j.joinType} join with no equi conjunct and no " +
            s"bounded side (cond=${j.condition.map(_.sql).getOrElse("<none>")})")
        }
    }
    assert(offenders.isEmpty,
      s"unbounded theta joins found:\n${offenders.mkString("\n")}")
  }

  /** Companion to the theta audit: where a non-equi join's ONLY bound is a
    * broadcast() hint (the author's asserted-small claim), EXECUTE that
    * side at the test sf and measure it — the query-set sides of the
    * brute-force sim arms must actually be tiny, not just hinted. A side
    * that grows past the cap here would OOM the broadcast at scale. */
  test("catalog-wide: every hint-only-bounded theta-join side is measured small") {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalRelation, LogicalPlan, Range => LRange}
    import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, LeftOuter, RightOuter}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def structurallyBounded(p: LogicalPlan): Boolean =
      boundedWalk(p, groupedAggBounds = true)
    val exempt = Set("ev_attribution_markov")
    val tooBig = catalogPlans.filterNot(p => exempt(p._1)).flatMap {
      case (name, lp) =>
        lp.collect {
          case j: Join if Seq(Inner, Cross, FullOuter, LeftOuter, RightOuter)
            .contains(j.joinType) => j
        }.flatMap { j =>
          val hasEqui = j.condition.exists(c => conjuncts(c).exists {
            case _: EqualTo | _: EqualNullSafe => true
            case _ => false
          })
          if (hasEqui) Nil
          else Seq(j.left -> j.hint.leftHint, j.right -> j.hint.rightHint)
            .filter { case (side, hint) =>
              hint.exists(_.strategy.nonEmpty) && !structurallyBounded(side)
            }
            .flatMap { case (side, _) =>
              val n = org.apache.spark.sql.GraftBridge.ofRows(spark, side).count()
              if (n <= 64L) None
              else Some(s"$name: hint-bounded theta side has $n rows (> 64)")
            }
        }
    }
    assert(tooBig.isEmpty,
      s"broadcast-hinted theta sides that are not actually small:\n${tooBig.mkString("\n")}")
  }

  /** Round 12 closed the growth audit's Aggregate loophole for HINTED
    * sides; this is the SYMMETRIC closure for the theta audit, which
    * accepts any Aggregate as a structural bound (the knob-bounded-grid
    * rationale). A grouped aggregate's cardinality is its group count —
    * corpus-dependent in general — so every non-equi join side whose ONLY
    * bound is a GROUPED aggregate is now EXECUTED at two scale factors:
    * within 2× means the grid really is knob/alphabet-bounded; growth
    * means the theta fan-out scales with the corpus and fails here. */
  test("catalog-wide: every grouped-aggregate-bounded theta-join side is corpus-independent") {
    import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
    import org.apache.spark.sql.catalyst.plans.{Cross, FullOuter, Inner, LeftOuter, RightOuter}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    // Only the LOAD-BEARING bound matters: a corpus-scale side streaming
    // against a scalar/literal/limit/hinted/geo-dim side is the intended
    // shape. A join lands here only when grouped aggregates are its SOLE
    // bounds — then at least one of them must be corpus-independent. A
    // broadcast() hint is a strong bound ONLY on a non-grouped-agg side
    // (those the ≤64 theta audit above executes); a hinted GROUPED
    // aggregate is structurally bounded there and so would escape every
    // absolute measurement — it must land in this test's measured branch
    // like an unhinted one (round-12 review finding).
    def strongBound(s: LogicalPlan,
        hint: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]): Boolean =
      boundKind(s).exists(_ != "grouped-agg") ||
        (hint.exists(_.strategy.nonEmpty) &&
          !boundKind(s).contains("grouped-agg")) ||
        s.collectLeaves().forall { leaf =>
          val out = leaf.output.map(_.name).toSet
          out.contains("r_regionkey") || out.contains("n_nationkey")
        }
    def groupedOnlyJoins(lp: LogicalPlan): Seq[Seq[LogicalPlan]] =
      lp.collect {
        case j: Join if Seq(Inner, Cross, FullOuter, LeftOuter, RightOuter)
          .contains(j.joinType) => j
      }.flatMap { j =>
        val hasEqui = j.condition.exists(c => conjuncts(c).exists {
          case _: EqualTo | _: EqualNullSafe => true
          case _ => false
        })
        val grouped = Seq(j.left, j.right)
          .filter(s => boundKind(s).contains("grouped-agg"))
        // joins with NO grouped-agg bound at all are the first theta
        // audit's finding, not this one's — don't double-report
        if (hasEqui || grouped.isEmpty ||
          strongBound(j.left, j.hint.leftHint) ||
          strongBound(j.right, j.hint.rightHint)) None
        else Some(grouped)
      }
    val exempt = Set("ev_attribution_markov")
    val memo = scala.collection.mutable.HashMap.empty[LogicalPlan, Long]
    def countRows(side: LogicalPlan): Long =
      memo.getOrElseUpdate(side.canonicalized,
        org.apache.spark.sql.GraftBridge.ofRows(spark, side).count())
    val sfB = "/root/testdata/sf0.01"
    val offenders = catalogPlans.filterNot(p => exempt(p._1)).flatMap {
      case (name, lpA) =>
        val joinsA = groupedOnlyJoins(lpA)
        if (joinsA.isEmpty) Nil
        else {
          val joinsB = groupedOnlyJoins(
            SparkEntry.queries(name)(spark, sfB).queryExecution.optimizedPlan)
          if (joinsA.size != joinsB.size ||
            joinsA.map(_.size) != joinsB.map(_.size))
            Seq(s"$name: grouped-agg-bounded theta joins differ across sf; " +
              "audit cannot align sides")
          else joinsA.zip(joinsB).zipWithIndex.flatMap {
            case ((sidesA, sidesB), ji) =>
              val growth = sidesA.zip(sidesB).map { case (sa, sb) =>
                (countRows(sa), countRows(sb))
              }
              // the load-bearing bound must be corpus-independent AND a
              // grid-sized broadcast candidate — a constant-but-huge
              // grouped dim (e.g. a hinted 1M-group table) is still a
              // forced-OOM theta side even though it never grows
              if (growth.exists { case (na, nb) =>
                nb <= 2 * math.max(na, 1L) && nb <= 65536L })
                None
              else Some(s"$name join#$ji: no corpus-independent grid-sized " +
                "grouped-agg bound; measured " +
                growth.map { case (a, b) => s"$a->$b" }.mkString(", "))
          }
        }
    }
    assert(offenders.isEmpty,
      s"theta joins whose only bounds all grow with the corpus:\n${offenders.mkString("\n")}")
  }

  /** The third broadcast discipline (round 15): an explicit broadcast()
    * hint on a side that GROWS with the corpus is a forced OOM at 100× —
    * the planner would have auto-broadcast it at fixture scale anyway, and
    * without the hint AQE falls back to a key shuffle once the side
    * outgrows the ceiling. The round-15 sweep (tools/BcastScan) removed
    * every such hint from corpus-data sides (Ml.base customer, agg_hhi
    * supplier, geo grid/knn site tables, the chain's supplier level,
    * q3/skyline/drawdown customer, rel_incr_join's dimension states);
    * this audit keeps them out: every remaining BROADCAST-hinted,
    * not-structurally-bounded side must have the same row count at
    * sf0.001 and sf0.01 (within 2×), i.e. be corpus-independent.
    * Allowlisted by design:
    *  - join_pit / rel_scd2_merge — scd2Merge broadcast-prunes by the
    *    UPDATE BATCH's keys (the Delta-MERGE design; production batches
    *    are ingest-bounded, the fixture derives them as a corpus fraction);
    *  - layout_cdf / layout_vacuum / layout_deletion_vectors — lakehouse
    *    log/manifest tables (listing-scale metadata, bounded by
    *    checkpointing and the fixed maintenance unit in production). */
  test("catalog-wide: no broadcast-hinted join side grows with the corpus") {
    import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, BROADCAST}
    // Each allowlisted query's hinted side is LISTING-SCALE METADATA (a
    // file list, commit log, or maintenance batch), not corpus data: in
    // production these are bounded by checkpointing and the fixed
    // maintenance unit per run, while the fixture necessarily derives
    // them as a corpus fraction — so the two-sf growth check would flag
    // a side that is corpus-independent in real deployments. Reasons:
    //  - join_pit / rel_scd2_merge: the MERGE update batch's key set
    //    (ingest-bounded per batch);
    //  - layout_cdf / layout_history: commit-log version rows;
    //  - layout_vacuum / layout_deletion_vectors / layout_stats_skipping /
    //    layout_bloom_skipping: per-file manifest/stats rows;
    //  - layout_merge_exec / layout_mv_incremental / layout_scd2_exec:
    //    the touched-file-bucket set of one maintenance batch;
    //  - layout_partition_evolution / layout_zorder_exec: the candidate
    //    file set of one rewrite unit.
    val allow = Set("join_pit", "rel_scd2_merge",
      "layout_cdf", "layout_vacuum", "layout_deletion_vectors",
      "layout_history", "layout_stats_skipping", "layout_bloom_skipping",
      "layout_merge_exec", "layout_mv_incremental", "layout_scd2_exec",
      "layout_partition_evolution", "layout_zorder_exec")
    // Round 12 closed the Aggregate loophole (r11 verdict top item): only
    // the UNGROUPED (≤1-row) aggregate and limit/literal subtrees are
    // structurally exempt now — a GROUPED aggregate's cardinality is its
    // group count, which can perfectly well grow with the corpus (vocab
    // dims, item-count dims), so hinted grouped-agg sides are MEASURED at
    // two sfs exactly like raw-data sides. The walk itself is the shallow
    // cardinality-preserving one (boundedWalk), per the same advice.
    def bounded(p: LogicalPlan): Boolean =
      boundedWalk(p, groupedAggBounds = false)
    def hintedSides(lp: LogicalPlan): Seq[LogicalPlan] =
      lp.collect { case j: Join => j }.flatMap { j =>
        def isB(h: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]) =
          h.flatMap(_.strategy).contains(BROADCAST)
        Seq(
          if (isB(j.hint.leftHint) && !bounded(j.left)) Some(j.left) else None,
          if (isB(j.hint.rightHint) && !bounded(j.right)) Some(j.right) else None
        ).flatten
      }
    val sfB = "/root/testdata/sf0.01"
    // Many queries hint the same dim subtree (the shared quantile bases,
    // stats scalars): count each distinct side once per sf, keyed by the
    // canonicalized plan.
    val memo = scala.collection.mutable.HashMap
      .empty[LogicalPlan, Long]
    def countRows(side: LogicalPlan): Long =
      memo.getOrElseUpdate(side.canonicalized,
        org.apache.spark.sql.GraftBridge.ofRows(spark, side).count())
    val offenders = catalogPlans.filterNot(p => allow(p._1)).flatMap {
      case (name, lpA) =>
        val sidesA = hintedSides(lpA)
        if (sidesA.isEmpty) Nil
        else {
          val sidesB = hintedSides(
            SparkEntry.queries(name)(spark, sfB).queryExecution.optimizedPlan)
          // r11 advice: a positional zip silently misaligns if the
          // optimizer shapes the two plans differently — that is itself a
          // finding, so fail loudly instead of comparing wrong subtrees.
          if (sidesA.size != sidesB.size)
            Seq(s"$name: hinted-side count differs across sf " +
              s"(${sidesA.size} at sf0.001 vs ${sidesB.size} at sf0.01) — " +
              "plans shaped differently; audit cannot align sides")
          else sidesA.zip(sidesB).zipWithIndex.flatMap { case ((sa, sb), i) =>
            val na = countRows(sa)
            val nb = countRows(sb)
            if (nb <= 2 * math.max(na, 1L)) None
            else Some(s"$name side#$i: broadcast-hinted side grew $na -> $nb across sf")
          }
        }
    }
    assert(offenders.isEmpty,
      s"corpus-proportional broadcast hints found:\n${offenders.mkString("\n")}")
  }

  test("corpus_interleave: the rank-grid offset cumsum partitions on the 1024-rank bucket") {
    // rk itself is also an allowed partition key: the r2 window partitions
    // BY rk, bounding each partition at |sources| rows.
    assertBucketLocalized("corpus_interleave", "rk", "rb", "rk")
  }

  test("text_vocab_growth: the bucket-grid cumsums partition on the super-bucket") {
    assertBucketLocalized("text_vocab_growth", "bucket", "sb")
  }

  test("text_bm25: the top-10 cut is a TakeOrdered merge, not a global rank window") {
    val p = plan("text_bm25")
    assert(p.contains("TakeOrderedAndProject"),
      s"orderBy+limit must compile to a distributed top-k:\n$p")
  }

  test("sim_hybrid_rrf: every arm cuts via TakeOrdered before any rank window") {
    import org.apache.spark.sql.catalyst.plans.logical.{GlobalLimit, Window => LWindow}
    val q = SparkEntry.queries("sim_hybrid_rrf")(spark, TestSpark.sf)
    val p = q.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"),
      s"arm cuts must be distributed top-k merges:\n$p")
    val wins = q.queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the rank-label windows")
    wins.foreach { w =>
      assert(w.child.collectFirst { case l: GlobalLimit => l }.nonEmpty,
        s"every rank window must read a limit-bounded input:\n" +
          q.queryExecution.optimizedPlan)
    }
  }

  test("text_bm25_multi: every rank window partitions on the query id") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = SparkEntry.queries("text_bm25_multi")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the per-query rank window")
    wins.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
      })
      assert(keys.contains("q_id"),
        s"multi-query rank must partition by q_id, got $keys")
    }
  }

  test("ml_logreg_score: the weight table broadcasts and the cut is a TakeOrdered") {
    val p = plan("ml_logreg_score")
    assert(p.contains("BroadcastHashJoin"),
      s"the model join must broadcast the weights:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"scoring must never shuffle the data for the model:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be a distributed top-k merge, not a global sort:\n$p")
  }

  test("ml_tree_score / ml_gbdt_margin: every model join broadcasts") {
    Seq("ml_tree_score", "ml_gbdt_margin").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"),
        s"$q: node-table joins must broadcast:\n$p")
      assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
        s"$q: tree traversal must never shuffle the scored rows:\n$p")
    }
  }

  test("ml_auc_exact: the score-grid cumsum partitions on the price bucket") {
    assertBucketLocalized("ml_auc_exact", "score", "bucket")
  }

  test("agg_bootstrap_ci / corpus_weighted_sample: map-only resampling — no shuffle joins, no windows") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Seq("agg_bootstrap_ci", "corpus_weighted_sample").foreach { q =>
      val qe = SparkEntry.queries(q)(spark, TestSpark.sf).queryExecution
      assert(qe.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
        s"$q: resampling must not sort anything globally")
      assert(!qe.executedPlan.toString.contains("SortMergeJoin"),
        s"$q: nothing here may shuffle-join")
    }
    assert(plan("corpus_weighted_sample").contains("TakeOrderedAndProject"),
      "the weighted top-k must be a distributed TakeOrdered merge")
  }

  test("rel_skyline: the per-x suffix max partitions on the price bucket") {
    assertBucketLocalized("rel_skyline", "x", "bucket")
  }

  test("rel_skyline / survival: no O(n²) unbounded-FOLLOWING frame over an unbounded partition") {
    // Spark recomputes unbounded-following frames per row; they are only
    // allowed where the partition is knob-bounded (the ≤49-point survival
    // grid). The skyline's 130k-point grid must use running-prefix frames.
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    import org.apache.spark.sql.catalyst.expressions.{SpecifiedWindowFrame, UnboundedFollowing}
    val wins = SparkEntry.queries("rel_skyline")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val suffixFrames = w.expressions.flatMap(_.collect {
        case f: SpecifiedWindowFrame if f.upper == UnboundedFollowing => f })
      assert(suffixFrames.isEmpty,
        s"skyline must phrase suffix maxes as descending running prefixes:\n$w")
    }
  }

  test("ev_cusum_drift: window-free — the recurrence is one bounded fold per type") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val qe = SparkEntry.queries("ev_cusum_drift")(spark, TestSpark.sf)
      .queryExecution
    assert(qe.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "CUSUM must fold per type, not window")
    assert(!qe.executedPlan.toString.contains("SortMergeJoin"),
      "the per-type reference rates must broadcast")
  }

  test("rel_basket_rules: the top-20 cut is a TakeOrdered merge") {
    val p = plan("rel_basket_rules")
    assert(p.contains("TakeOrderedAndProject"),
      s"rule ranking must be a distributed top-k merge:\n$p")
  }

  test("ev_ewma_grid: no windows at all — the recurrence is a bounded fan-out join") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val qe = SparkEntry.queries("ev_ewma_grid")(spark, TestSpark.sf)
      .queryExecution
    assert(qe.optimizedPlan.collect { case w: LWindow => w }.isEmpty,
      "EWMA must unroll into explode + aggregate, not a sequential window")
    val p = qe.executedPlan.toString
    assert(!p.contains("SortMergeJoin"),
      s"the hmax cap must broadcast:\n$p")
  }

  test("surv_km: grid windows read the aggregated duration grid, never raw events") {
    assertWindowReadsAggregated("surv_km")
  }

  test("surv_km_arms: every curve window partitions on the cohort arm") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = SparkEntry.queries("surv_km_arms")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty, "expected the per-arm curve windows")
    wins.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
      })
      assert(keys.contains("arm"),
        s"cohort curves must partition by arm, got $keys")
    }
  }

  test("rec_user_topn: model broadcasts, every window is partitioned, rank limits push down") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val qe = SparkEntry.queries("rec_user_topn")(spark, TestSpark.sf)
      .queryExecution
    val p = qe.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the catalog×M neighbor model must broadcast into scoring:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"the top-M / top-3 rank cuts must push down as WindowGroupLimit:\n$p")
    val wins = qe.optimizedPlan.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      assert(w.partitionSpec.nonEmpty,
        s"rec windows must partition (per item / per user), got unpartitioned:\n$p")
    }
  }

  test("ts_stl_daily: the 7-day window runs on the calendar day grid, not raw events") {
    assertWindowReadsAggregated("ts_stl_daily")
  }

  test("ts_bandit_replay: one sequential fold; trajectory windows partition by arm") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val lp = SparkEntry.queries("ts_bandit_replay")(spark, TestSpark.sf)
      .queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.Aggregate
    val wins = lp.collect { case w: LWindow => w }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val keys = w.partitionSpec.flatMap(_.collect {
        case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
      })
      // The t row_number is allowed unpartitioned because it reads the
      // calendar-bounded daily aggregate; everything else is per-arm.
      assert(keys.contains("arm") ||
        w.child.collectFirst { case a: Aggregate => a }.nonEmpty,
        s"cumulative reward windows must stay per-arm, got $keys")
    }
    assert(wins.exists(_.partitionSpec.nonEmpty),
      "expected the per-arm cumulative windows")
  }

  test("ev_cuped: one corpus shuffle (the per-user agg), statistic is scan-free") {
    val p = plan("ev_cuped")
    val hashEx = "hashpartitioning".r.findAllMatchIn(p).size
    assert(hashEx == 1,
      s"expected exactly the per-user hash exchange, got $hashEx:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"the moment readout must not join:\n$p")
  }

  test("ts_periodogram: basis joins broadcast — the hourly grid never shuffles for the basis") {
    val p = plan("ts_periodogram")
    assert(p.contains("BroadcastHashJoin"),
      s"the 96-row frozen basis must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"no sort-merge join against a 96-row table:\n$p")
  }

  test("ml_ks_score: the CDF cumsums partition on the score bucket") {
    assertBucketLocalized("ml_ks_score", "score", "bucket")
  }

  test("ml_ndcg / ml_precision_at_k: rank windows partition per user") {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    Seq("ml_ndcg", "ml_precision_at_k").foreach { q =>
      val wins = SparkEntry.queries(q)(spark, TestSpark.sf)
        .queryExecution.optimizedPlan.collect { case w: LWindow => w }
      assert(wins.nonEmpty, s"$q: expected per-user rank windows")
      wins.foreach { w =>
        val keys = w.partitionSpec.flatMap(_.collect {
          case a: org.apache.spark.sql.catalyst.expressions.Attribute => a.name
        })
        assert(keys.contains("user_id"),
          s"$q: ranking metrics must window per user, got $keys")
      }
    }
  }
}
