package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 lakehouse additions: incremental MV maintenance ≡ full
  * recompute, metadata-table (history) algebra, and partition-spec
  * evolution pruning invariants. */
class Round12Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val orders = Tables.orders(spark, TestSpark.sf)
    .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
    .cache()

  test("layout_mv_incremental: delta-merge refresh equals a full recompute of the post-change table") {
    val got = SparkEntry.queries("layout_mv_incremental")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // Independent recompute: apply the change rules to the bounded unit.
    val unit = orders.filter(col("k") < 65536)
    val post = unit.filter(col("k") % 1216 =!= 0)
      .select(col("st"),
        when(col("k") % 704 === 0, col("c") + 11).otherwise(col("c")).as("c"),
        expr("k div 256").as("fb"))
      .unionByName(unit.filter(col("k") % 896 === 0)
        .select(col("st"), (col("c") + 5).as("c"),
          expr("(k + 1048576) div 256").as("fb")))
    val groups = post.select(col("st"), col("fb")).distinct().count()
    val want = post.groupBy(col("st"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("cc"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), groups))
    assert(got.sortBy(_._1).toSeq == want.sortBy(_._1).toSeq)
    // The commit must actually move the MV: deletions and inserts exist.
    assert(unit.filter(col("k") % 1216 === 0).count() > 0)
    assert(unit.filter(col("k") % 896 === 0).count() > 0)
  }

  test("layout_bloom_skipping: no false negatives, miss finds nothing, bloom prunes") {
    val rows = SparkEntry.queries("layout_bloom_skipping")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (tHit, cHit, fHit, centsHit) = rows("hit")
    val (tMiss, cMiss, fMiss, centsMiss) = rows("miss")
    assert(tHit == tMiss && tHit > 0)
    // No false negatives: the hit probe finds EVERY row carrying the key —
    // recomputed from the raw table, independent of any file pruning.
    val unit = Tables.orders(spark, TestSpark.sf)
      .filter(col("o_orderkey") < 65536)
      .select(col("o_custkey").as("ck"),
        floor(col("o_totalprice") * 100.0 + 0.5).cast("long").as("c"))
    val mk = unit.agg(max(col("ck"))).collect().head.getLong(0)
    val want = unit.filter(col("ck") === mk)
      .agg(count(lit(1)), sum(col("c"))).collect().head
    assert(fHit == want.getLong(0) && fHit > 0)
    assert(centsHit == want.getLong(1))
    assert(cHit >= 1, "files containing the key must be candidates")
    // The absent key is never 'found'; only Bloom false positives scan.
    assert(fMiss == 0 && centsMiss == 0)
    assert(cMiss < tMiss,
      s"bloom must prune at least one file for the absent key ($cMiss/$tMiss)")
  }

  test("ev_stream_dedup: the premise holds — the doubled stream is 2x before dedup") {
    // The oracle proves the DEDUPED result equals each-event-once; this
    // pins the other half: the union really doubles, so the dedup had
    // real work to do (not a vacuous pass over an already-unique stream).
    import graft.streaming.StreamQueries
    val raw = Tables.events(spark, TestSpark.sf).count()
    val src = StreamQueries.streamEvents(spark, TestSpark.sf)
      .unionByName(StreamQueries.streamEvents(spark, TestSpark.sf))
      .groupBy().count()
    val q = src.writeStream.outputMode("complete")
      .format("memory").queryName("r12_dedup_premise").start()
    q.processAllAvailable(); q.stop()
    val doubled = spark.table("r12_dedup_premise").collect().head.getLong(0)
    assert(doubled == 2 * raw, s"union of two sources must double: $doubled")
    val out = SparkEntry.queries("ev_stream_dedup")(spark, TestSpark.sf)
      .agg(sum(col("n_events"))).collect().head.getLong(0)
    assert(out == raw, "deduped total must equal the raw table")
    assert(raw > 0)
  }

  test("src_custom_v2: connector pushdown is lossless vs an unfiltered read") {
    // Read the SAME range through the connector WITHOUT any pushable
    // predicate (filter applied after a barrier the translator cannot
    // cross) and compare: pushdown must change the plan, never the rows.
    val pushed = SparkEntry.queries("src_custom_v2")(spark, TestSpark.sf)
      .collect().toSeq
    val unpushed = spark.read
      .format("graft.sources.v2.SyntheticProvider")
      .option("rows", "65536").option("parts", "8").load()
      .select(col("id"), col("grp"), col("v")) // same pruning
      .withColumn("id2", col("id") + 0L) // breaks id-filter translation
      .filter(col("id2") >= 4096 && col("id2") <= 8191 && col("v") % 3 === 0)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("v")).cast("long").as("sum_v"),
        max(col("id")).as("max_id"))
      .orderBy(col("grp")).collect().toSeq
    assert(pushed == unpushed, "pushdown must not change results")
    assert(pushed.nonEmpty)
    // Partitioning sanity: the connector splits the range across tasks.
    val parts = spark.read.format("graft.sources.v2.SyntheticProvider")
      .option("rows", "1000").option("parts", "4").load()
      .rdd.getNumPartitions
    assert(parts == 4, s"expected 4 input partitions, got $parts")
  }

  test("graph_shortest_path: Bellman-Ford optimality conditions hold at the fixpoint") {
    val dist = SparkEntry.queries("graph_shortest_path")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(dist(0L) == 0L, "the source costs zero")
    assert(dist.size > 1, "fixture sanity: the trade graph reaches someone")
    // Rebuild the weighted edges independently and assert no edge can
    // still relax — the defining property of a shortest-path fixpoint
    // (valid because the trade graph's hop diameter is < the 8 bound).
    val e = Tables.lineitem(spark, TestSpark.sf)
      .join(Tables.orders(spark, TestSpark.sf),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(spark, TestSpark.sf),
        col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(spark, TestSpark.sf),
        col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .select(col("c_nationkey").cast("long").as("src"),
        col("s_nationkey").cast("long").as("dst"),
        expr("c_custkey * 16777216 + s_suppkey").as("pair"))
      .groupBy(col("src"), col("dst"))
      .agg((lit(1L) + countDistinct(col("pair")) % 20L).as("w"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    e.foreach { case (u, v, w) =>
      (dist.get(u), dist.get(v)) match {
        case (Some(du), Some(dv)) =>
          assert(dv <= du + w, s"edge ($u->$v, w=$w) can still relax")
        case (Some(_), None) =>
          fail(s"$v unreachable though $u is — relaxation incomplete")
        case _ => // u unreachable: nothing to assert
      }
    }
    // Costs are genuine multi-hop: someone's cheapest route beats every
    // direct edge into it, or equals one (never exceeds all).
    e.groupBy(_._2).foreach { case (v, in) =>
      dist.get(v).foreach { dv =>
        val best = in.flatMap { case (u, _, w) => dist.get(u).map(_ + w) }
        if (best.nonEmpty) assert(dv == best.min || dv == 0L)
      }
    }
  }

  test("layout_history: per-version file algebra and row conservation") {
    val rows = SparkEntry.queries("layout_history")(spark, TestSpark.sf)
      .collect().sortBy(_.getInt(0))
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 1, 2))
    val Array(v0, v1, v2) = rows
    // v0: pure ingest — no removes, everything live.
    assert(v0.getLong(2) == 0 && v0.getLong(1) == v0.getLong(3))
    // v1 is the delete commit: rows shrink; v2 is pure compaction: rows
    // and cents are IDENTICAL to v1 while the file count changes.
    assert(v1.getLong(4) < v0.getLong(4))
    assert(v2.getLong(4) == v1.getLong(4) && v2.getLong(5) == v1.getLong(5))
    assert(v2.getLong(3) < v1.getLong(3), "4:1 compaction must shrink files")
    // Commit chaining: v2 removes exactly what v1 added.
    assert(v2.getLong(2) == v1.getLong(1))
    // Live-set algebra per version.
    assert(v1.getLong(3) == v0.getLong(3) - v1.getLong(2) + v1.getLong(1))
    assert(v2.getLong(3) == v1.getLong(3) - v2.getLong(2) + v2.getLong(1))
  }

  test("layout_partition_evolution: both specs prune, union answers the raw predicate") {
    val rows = SparkEntry.queries("layout_partition_evolution")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (t0, s0, n0, c0) = rows("spec0_bucketed")
    val (t1, s1, n1, c1) = rows("spec1_status")
    // spec0 prunes by key stats (some bucket outside the band skipped);
    // spec1 prunes to the single matching status directory.
    assert(s0 < t0, "key-range stats must skip at least one spec0 file")
    assert(s1 == 1 && t1 == 3, "status partitioning must isolate one of three dirs")
    // The union of both pruned scans answers the raw predicate exactly.
    val maxk = orders.agg(max(col("k"))).collect().head.getLong(0)
    val (bb, lo, hi) = (maxk / 2, maxk / 2 / 2, maxk / 2 + maxk / 2 / 2)
    val want = orders.filter(col("st") === "F" && col("k").between(lo, hi))
      .agg(count(lit(1)), coalesce(sum(col("c")), lit(0L))).collect().head
    assert(n0 + n1 == want.getLong(0))
    assert(c0 + c1 == want.getLong(1))
    // Old-spec files were never rewritten at the spec change: the two
    // populations partition the keyspace at the boundary.
    val below = orders.filter(col("k") <= bb && col("st") === "F" &&
      col("k").between(lo, hi)).count()
    assert(n0 == below)
  }
}
