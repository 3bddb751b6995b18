package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-8 operators: recursive CTEs, LISTAGG, BPE
  * training, and MMR re-ranking — the invariants (and in the rows-only
  * cases, the full semantics vs an independent reference) the DuckDB
  * oracle can't express. */
class Round8Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("sql_recursive_series: one row per day of 1995 Q1, counts match a direct groupBy") {
    val rows = SparkEntry.queries("sql_recursive_series")(spark, TestSpark.sf).collect()
    assert(rows.length == 90) // Jan 31 + Feb 28 + Mar 31
    assert(rows.head.getDate(0).toString == "1995-01-01")
    assert(rows.last.getDate(0).toString == "1995-03-31")
    val direct = Tables.orders(spark, TestSpark.sf)
      .filter(col("o_orderdate") >= lit("1995-01-01") &&
        col("o_orderdate") < lit("1995-04-01"))
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getDate(0).toString -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == direct.getOrElse(r.getDate(0).toString, 0L))
    }
  }

  test("sql_recursive_chain: depth and path sum follow the div-10 chain") {
    val rows = SparkEntry.queries("sql_recursive_chain")(spark, TestSpark.sf).collect()
    val byKey = rows.map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    assert(byKey.size == Tables.customer(spark, TestSpark.sf).count())
    byKey.foreach { case (k, (depth, pathSum)) =>
      var node = k; var d = 0; var sum = k
      while (node > 0) { node /= 10; d += 1; sum += node }
      assert(depth == d, s"custkey $k")
      assert(pathSum == sum, s"custkey $k")
    }
  }

  test("agg_listagg: concatenation is sorted and consistent with the group count") {
    val rows = SparkEntry.queries("agg_listagg")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val names = r.getString(1).split(",").toSeq
      assert(names.length == r.getLong(2))
      assert(names == names.sorted)
    }
  }

  test("text_bpe_pairs: every pair is 2 chars, counts are non-increasing and exact for the top pair") {
    val rows = SparkEntry.queries("text_bpe_pairs")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    assert(rows.forall(_.getString(0).length == 2))
    val cnts = rows.map(_.getLong(1))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => a >= b })
    // exact count of the top pair, recomputed independently
    val (topPair, topCnt) = (rows.head.getString(0), rows.head.getLong(1))
    val words = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .collect().map(_.getString(0))
    val expected = words.iterator.map { w =>
      (0 until w.length - 1).count(i => w.substring(i, i + 2) == topPair).toLong
    }.sum
    assert(topCnt == expected)
  }

  /** Independent plain-Scala BPE reference (greedy left-to-right merge,
    * ties count desc then lexicographic) — the semantics the lazy-plan
    * trainer must reproduce. */
  private def refBpe(words: Seq[(String, Long)], rounds: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Seq[(Vector[String], Long)] =
      words.map { case (w, f) => (w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    for (r <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      vocab.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      val ((l, rr), cnt) = counts.minBy { case ((a, b), c) => (-c, a, b) }
      out += ((r, l, rr, cnt))
      vocab = vocab.map { case (syms, f) =>
        val merged = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rr) {
            merged += (l + rr); i += 2
          } else { merged += syms(i); i += 1 }
        }
        (merged.toVector, f)
      }
    }
    out.toSeq
  }

  test("text_bpe_merges: matches the independent reference BPE on the fixture corpus") {
    val got = SparkEntry.queries("text_bpe_merges")(spark, TestSpark.sf).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(4)))
    val words = Tables.documents(spark, TestSpark.sf)
      .select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(length(col("w")) >= 2)
      .groupBy("w").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expected = refBpe(words, 6)
    assert(got.toSeq == expected)
  }

  test("text_bpe_merges: lazy checkpoints keep the plan linear (no per-round tree doubling)") {
    val df = SparkEntry.queries("text_bpe_merges")(spark, TestSpark.sf)
    // without the per-round localCheckpoint the 6-round plan re-derives the
    // full lineage on every consumer: 126 parquet scans; with it the final
    // plan reads the round checkpoints (at most the initial scan survives)
    val plan = df.queryExecution.optimizedPlan.toString
    val scans = "Relation \\[".r.findAllIn(plan).length +
      "parquet".r.findAllIn(plan).length
    assert(scans <= 2, s"expected checkpoint-truncated plan, found $scans scan markers")
  }

  test("agg_topk_heap: equals the window form, and the plan has no Window operator") {
    val heap = SparkEntry.queries("agg_topk_heap")(spark, TestSpark.sf)
    val win = SparkEntry.queries("win_topk_per_group")(spark, TestSpark.sf)
    assert(heap.collect().toSeq.map(_.toSeq) == win.collect().toSeq.map(_.toSeq))
    val plan = heap.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), "typed aggregate expected")
    assert(!plan.contains("Window"), "top-k heap must not fall back to a window sort")
  }

  test("scalar_collation: case variants collapse into one UTF8_LCASE group") {
    val rows = SparkEntry.queries("scalar_collation")(spark, TestSpark.sf).collect()
    val direct = Tables.customer(spark, TestSpark.sf)
      .groupBy(lower(col("c_mktsegment")).as("k")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == direct.size)
    rows.foreach(r => assert(r.getLong(1) == direct(r.getString(0))))
    // the collation-equality counter saw every automobile row despite casing
    val auto = rows.find(_.getString(0) == "automobile").get
    assert(auto.getLong(2) == auto.getLong(1))
  }

  test("SQL-defined scalar UDF (CREATE FUNCTION ... RETURN) inlines into the plan") {
    // Spark 4 SQL UDFs resolve by substituting the body into the query
    // (Analyzer.ResolveSQLFunctions) — declarative reuse with ZERO runtime
    // cost: the plan below must contain no UDF call, just the folded
    // expression, so codegen and pushdown are identical to writing the
    // expression inline.
    Tables.lineitem(spark, TestSpark.sf).createOrReplaceTempView("lineitem")
    spark.sql(
      """CREATE OR REPLACE TEMPORARY FUNCTION disc_price(p DOUBLE, d DOUBLE)
        |RETURNS DOUBLE RETURN p * (1.0 - d)""".stripMargin)
    val viaUdf = spark.sql(
      """SELECT l_returnflag,
        |  CAST(CAST(SUM(CAST(disc_price(l_extendedprice, l_discount)
        |    AS DECIMAL(18,4))) AS STRING) AS DOUBLE) AS rev
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
    val direct = Tables.lineitem(spark, TestSpark.sf)
      .withColumn("x", (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(18,4)"))
      .groupBy(col("l_returnflag"))
      .agg(sum(col("x")).cast("string").cast("double").as("rev"))
      .orderBy(col("l_returnflag"))
    assert(viaUdf.collect().toSeq.map(_.toSeq) == direct.collect().toSeq.map(_.toSeq))
    assert(!viaUdf.queryExecution.executedPlan.toString.contains("UDF"),
      "SQL UDF must inline, not execute as an opaque call")
  }

  test("join_asof_nearest: nearest is whichever directional candidate is closer") {
    val rows = SparkEntry.queries("join_asof_nearest")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val us = r.getLong(1)
      val prev = if (r.isNullAt(2)) None else Some(r.getLong(2))
      val next = if (r.isNullAt(3)) None else Some(r.getLong(3))
      val nearest = if (r.isNullAt(4)) None else Some(r.getLong(4))
      val expected = (prev, next) match {
        case (None, n) => n
        case (p, None) => p
        case (Some(p), Some(n)) => Some(if (us - p <= n - us) p else n)
      }
      assert(nearest == expected)
      prev.foreach(p => assert(p <= us && us - p <= 86400000000L))
      next.foreach(n => assert(n >= us && n - us <= 86400000000L))
    }
  }

  test("agg_percentile_disc: every percentile is an actual group value at the right rank") {
    val rows = SparkEntry.queries("agg_percentile_disc")(spark, TestSpark.sf).collect()
    val groups = Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderpriority"), col("o_totalprice")).collect()
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    assert(rows.length == groups.size)
    rows.foreach { r =>
      val vs = groups(r.getString(0)); val n = vs.length
      assert(r.getLong(4) == n)
      for ((p, i) <- Seq(0.25 -> 1, 0.5 -> 2, 0.9 -> 3)) {
        val want = vs(math.ceil(p * n).toInt - 1) // smallest v with cume_dist >= p
        assert(r.getDouble(i) == want, s"${r.getString(0)} p=$p")
      }
    }
  }

  test("MmrAggregator / TopK3 edge cases: groups smaller than k, exact ties") {
    import graft.functions._
    // MMR: group smaller than k -> emits only what exists; rel tie -> id asc
    val tiny = Seq(MmrCand(7, 0.9, Seq(1f, 0f)), MmrCand(3, 0.9, Seq(0f, 1f)))
    val picks = MmrAggregator.finish(tiny)
    assert(picks.length == 2)
    assert(picks.head.cand_id == 3)
    // TopK: value tie -> id asc, regardless of merge order
    val a = TopK3.reduce(TopK3.zero, TopKEntry(5.0, 9))
    val b = TopK3.reduce(TopK3.zero, TopKEntry(5.0, 2))
    assert(TopK3.merge(a, b) == Seq(TopKEntry(5.0, 2), TopKEntry(5.0, 9)))
    assert(TopK3.merge(b, a) == Seq(TopKEntry(5.0, 2), TopKEntry(5.0, 9)))
    // k-cap holds under any arrival order
    val many = (1 to 5).map(i => TopKEntry(i.toDouble, i.toLong))
    val buf = many.foldLeft(TopK3.zero)(TopK3.reduce)
    assert(buf == Seq(TopKEntry(5.0, 5), TopKEntry(4.0, 4), TopKEntry(3.0, 3)))
  }

  test("sim_matryoshka_topk: stage-2 survivors all come from the stage-1 prefix top-20") {
    val rows = SparkEntry.queries("sim_matryoshka_topk")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getLong(0)).foreach { case (_, picks) =>
      assert(picks.length == 5)
      assert(picks.forall(_.getInt(3) <= 20)) // pre_rank within stage-1 cut
      val scores = picks.sortBy(_.getInt(1)).map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (x, y) => x >= y })
    }
  }

  test("sim_mmr_rerank: 5 distinct picks per query; rank 1 is the relevance argmax") {
    val rows = SparkEntry.queries("sim_mmr_rerank")(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getLong(0))
    // independent top-20 per query for cross-checks
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val vecs = e.toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        d += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    byQ.foreach { case (qid, picks) =>
      assert(picks.length == 5)
      assert(picks.map(_.getLong(2)).distinct.length == 5)
      val sorted = picks.sortBy(_.getInt(1))
      // rank 1 pick = highest cosine to the query (ties by id — unique here)
      val best = vecs.keys.filter(_ != qid)
        .maxBy(c => (cos(vecs(qid), vecs(c)), -c.toDouble))
      assert(sorted.head.getLong(2) == best)
      // rank-1 score is exactly lambda * rel (no diversity penalty yet).
      // NOTE: later ranks are NOT monotone — cosines here can be negative,
      // so the (1-λ)·maxSim term can be a bonus, not a penalty.
      val rel1 = cos(vecs(qid), vecs(best))
      assert(math.abs(sorted.head.getDouble(3) - 0.7 * rel1) < 1e-12)
    }
  }
}
