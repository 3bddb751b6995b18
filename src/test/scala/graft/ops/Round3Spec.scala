package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-3 additions: content-level PII scrubbing,
  * text normalization, SCD2 merge, cohort retention, PQ ANN. The oracle
  * gate proves cross-engine parity; these pin the *properties* the oracle
  * can't see (recall vs brute force, invariants, leak-freedom). */
class Round3Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pii_text_scrub: no email/phone survives; /24 of the IP survives") {
    val rows = graft.pii.PiiQueries.textScrub(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val scrubbed = r.getAs[String]("note_scrubbed")
      assert(!scrubbed.contains("@"), s"email leaked: $scrubbed")
      assert(!scrubbed.matches(".*\\+\\d[\\d-]{6,}\\d.*"), s"phone leaked: $scrubbed")
      assert(scrubbed.matches(".*10\\.\\d+\\.0\\.x.*"), s"IP not /24-masked: $scrubbed")
      assert(r.getAs[Long]("n_emails") == 1L)
      assert(r.getAs[Long]("n_phones") == 1L)
      assert(r.getAs[Long]("n_ips") == 1L)
    }
  }

  test("text_normalize: output is lowercase single-spaced alnum, trimmed") {
    val rows = LlmText.normalize(spark, TestSpark.sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("norm_text")
      assert(t.matches("[a-z0-9]+( [a-z0-9]+)*"), s"not normalized: '$t'")
      assert(r.getAs[Int]("n_chars_norm") == t.length)
      assert(r.getAs[Int]("n_chars_raw") > t.length, "dirty variant must shrink")
    }
  }

  test("rel_scd2_merge: row accounting and per-key validity invariants") {
    val out = Relational.scd2Upsert(spark, TestSpark.sf)
    val nCust = graft.Tables.customer(spark, TestSpark.sf).count()
    val nUpd = graft.Tables.customer(spark, TestSpark.sf)
      .filter(col("c_custkey") % 10 === 0).count()
    assert(out.count() == nCust + nUpd, "closed+opened rows must add one row per update")
    // exactly one current row per key; updated keys have exactly 2 rows
    val perKey = out.groupBy("c_custkey")
      .agg(sum("is_current").as("n_cur"), count(lit(1)).as("n"))
    assert(perKey.filter(col("n_cur") =!= 1).count() == 0)
    assert(perKey.filter(col("n") === 2).count() == nUpd)
    // closed rows end exactly where the new row starts
    val closed = out.filter(col("is_current") === 0)
    assert(closed.filter(col("valid_to") =!= lit("2024-06-01").cast("date")).count() == 0)
  }

  test("ev_retention: offset-0 cohort sizes sum to the distinct-user count") {
    val m = Events.retention(spark, TestSpark.sf)
    val day0 = m.filter(col("day_offset") === 0)
      .agg(sum("n_users")).head.getLong(0)
    val users = graft.Tables.events(spark, TestSpark.sf)
      .select("user_id").distinct().count()
    assert(day0 == users, s"day-0 total $day0 != distinct users $users")
    assert(m.filter(col("day_offset") < 0).count() == 0)
  }

  test("agg_heavy_hitters: MG guarantees hold vs exact frequencies") {
    val k = 32
    val hh = Aggs.heavyHitters(spark, TestSpark.sf).collect()
      .groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(r =>
        r.getAs[String]("token") -> r.getAs[Long]("est")).toMap).toMap
    val exact = graft.Tables.documents(spark, TestSpark.sf)
      .select(col("lang"),
        explode(filter(split(lower(col("text")), "\\s+"), t => t =!= ""))
          .as("token"))
      .groupBy("lang", "token").agg(count(lit(1)).as("n")).collect()
      .groupBy(_.getAs[String]("lang"))
      .view.mapValues(_.map(r =>
        r.getAs[String]("token") -> r.getAs[Long]("n")).toMap).toMap
    exact.foreach { case (lang, freqs) =>
      val n = freqs.values.sum
      val sketch = hh.getOrElse(lang, Map.empty)
      assert(sketch.size <= k, s"$lang: sketch exceeded k counters")
      // membership guarantee: true freq > n/(k+1) ⇒ present
      freqs.filter(_._2 > n / (k + 1)).keys.foreach { t =>
        assert(sketch.contains(t), s"$lang: heavy item '$t' missing")
      }
      // estimates never exceed the true frequency
      sketch.foreach { case (t, est) =>
        assert(est <= freqs.getOrElse(t, 0L), s"$lang: '$t' overestimated")
      }
    }
  }

  test("weighted Misra-Gries: guarantees hold on adversarial streams and merge trees") {
    // Direct unit-level pin for the WEIGHTED update path (the query-level
    // test above only exercises one corpus through one partitioning):
    // random weighted streams, arbitrary partition splits, random merge
    // orders — the sketch must keep ≤ k counters, retain every item above
    // n/(k+1), and never overestimate, regardless of order.
    val k = 8
    val rng = new scala.util.Random(20260816L)
    for (trial <- 1 to 50) {
      val nItems = 1 + rng.nextInt(40)
      val stream = Seq.fill(30 + rng.nextInt(200)) {
        (s"t${rng.nextInt(nItems)}", 1L + rng.nextInt(100).toLong)
      }
      // include a guaranteed-heavy item on some trials
      val heavy =
        if (trial % 3 == 0) Seq(("whale", stream.map(_._2).sum)) else Seq.empty
      val input = rng.shuffle(stream ++ heavy)
      val truth = input.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val n = truth.values.sum
      val agg = new graft.functions.HeavyHitters(k)
      // random partition split, then a random (left-leaning) merge order
      val parts = input.grouped(1 + rng.nextInt(7)).toSeq
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val sketch = rng.shuffle(parts).reduce(agg.merge)
      assert(sketch.size <= k, s"trial $trial: ${sketch.size} counters > k")
      truth.filter(_._2 > n / (k + 1)).keys.foreach { t =>
        assert(sketch.contains(t), s"trial $trial: heavy '$t' missing " +
          s"(true ${truth(t)}, n=$n, bound ${n / (k + 1)})")
      }
      sketch.foreach { case (t, est) =>
        assert(est <= truth.getOrElse(t, 0L), s"trial $trial: '$t' over")
        assert(est >= truth.getOrElse(t, 0L) - n / (k + 1),
          s"trial $trial: '$t' under by more than n/(k+1)")
      }
      // zero/negative weights are no-ops, not corruption
      val z = agg.reduce(agg.reduce(sketch, ("x", 0L)), ("y", -5L))
      assert(z == sketch, "non-positive weights must be identity")
    }
  }

  test("agg_heavy_hitters plan: codegen'd pre-count feeds the object aggregate") {
    // Plan-shape pin for the round-13 fix: the UDAF must consume a
    // (lang, token) HashAggregate pre-count (|vocab| calls), never the
    // raw exploded token stream (|tokens| calls — 26x slower measured).
    val plan = Aggs.heavyHitters(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      "typed Aggregator should plan as ObjectHashAggregate")
    val precount = "(?s)ObjectHashAggregate.*HashAggregate.*keys=\\[lang.*token".r
    assert(precount.findFirstIn(plan).nonEmpty,
      s"expected a HashAggregate(lang, token) pre-count below the " +
        s"ObjectHashAggregate; plan:\n$plan")
  }

  test("set_stratified_sample: deterministic, per-stratum fractions in band") {
    val a = SetOps.stratifiedSample(spark, TestSpark.sf).collect()
    val b = SetOps.stratifiedSample(spark, TestSpark.sf).collect()
    assert(a.toSeq == b.toSeq, "same seed must sample identically")
    val got = a.map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = graft.Tables.documents(spark, TestSpark.sf)
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // non-downsampled strata keep every row; 'en' lands near 25%
    Seq("de", "es", "fr", "zh").foreach(l => assert(got(l) == full(l)))
    val frac = got("en").toDouble / full("en")
    assert(frac > 0.12 && frac < 0.38, s"en fraction $frac out of band")
  }

  test("runtime bloom filter: Spark injects might_contain into the probe side") {
    val prev = spark.conf.getOption("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      val ord = graft.Tables.orders(spark, TestSpark.sf)
        .filter(col("o_orderpriority") === "1-URGENT")
      val li = graft.Tables.lineitem(spark, TestSpark.sf)
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"no runtime bloom filter injected:\n$plan")
      assert(joined.collect().nonEmpty)
    } finally {
      spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "10GB")
      prev match {
        case Some(v) => spark.conf.set("spark.sql.autoBroadcastJoinThreshold", v)
        case None => spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      }
    }
  }

  test("layout_zorder: fixed z-prefix confines both dimensions (pruning invariant)") {
    val z = graft.sources.Sources.zorderKey(spark, TestSpark.sf)
    // top-10 z bits = 5 bits of x + 5 of y interleaved ⇒ within a bucket of
    // z >> 10, x >> 5 and y >> 5 are single-valued. This is exactly why
    // sorting files by z makes min/max pruning work on BOTH columns.
    val bad = z.select((col("zval") / 1024).cast("long").as("zb"),
        (col("x") / 32).cast("long").as("xp"), (col("y") / 32).cast("long").as("yp"))
      .groupBy("zb")
      .agg(countDistinct(col("xp")).as("nx"), countDistinct(col("yp")).as("ny"))
      .filter(col("nx") > 1 || col("ny") > 1)
    assert(bad.count() == 0, "z-prefix bucket spans multiple x/y prefixes")
    // write-side layout: range-partition by z, local sort — the exchange is
    // a range partitioning, i.e. the clustered-write plan shape
    val clustered = z.repartitionByRange(4, col("zval"))
      .sortWithinPartitions(col("zval"))
    val plan = clustered.queryExecution.executedPlan.toString.toLowerCase
    assert(plan.contains("rangepartitioning"), s"no range exchange:\n$plan")
  }

  test("typed cogroup: per-key reconciliation equals the SQL join form") {
    // KeyValueGroupedDataset.cogroup is the typed escape hatch for per-group
    // imperative logic Catalyst can't express (both sides' rows visible at
    // once per key, one shuffle each side). Kept out of hot paths by policy
    // (deserialization cost); semantics pinned against the declarative twin.
    import spark.implicits._
    val orders = graft.Tables.orders(spark, TestSpark.sf)
      .select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
    val items = graft.Tables.lineitem(spark, TestSpark.sf)
      .select(col("l_orderkey"), col("l_extendedprice")).as[(Long, Double)]
    val recon = orders.groupByKey(_._1).cogroup(items.groupByKey(_._1)) {
      case (k, os, is) =>
        val o = os.toSeq
        if (o.isEmpty) Iterator.empty
        else Iterator.single((k, o.head._2, is.size.toLong))
    }.toDF("o_orderkey", "o_totalprice", "n_items")
    val declarative = graft.Tables.orders(spark, TestSpark.sf)
      .join(graft.Tables.lineitem(spark, TestSpark.sf),
        col("o_orderkey") === col("l_orderkey"), "left")
      .groupBy(col("o_orderkey"), col("o_totalprice"))
      .agg(count(col("l_orderkey")).as("n_items"))
    assert(recon.count() > 0)
    assert(recon.exceptAll(declarative).isEmpty &&
      declarative.exceptAll(recon).isEmpty)
  }

  test("sim_pq_topk: ADC ranking has real recall vs exact brute-force top-k") {
    val pq = LlmSimilarity.pqTopK(spark, TestSpark.sf)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    // exact top-10 by raw dot product (the metric PQ approximates)
    val e = graft.Tables.embeddings(spark, TestSpark.sf)
    import org.apache.spark.sql.expressions.Window
    val q = e.filter(col("vec_id").between(10, 14))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    graft.functions.GraftFunctions.register(spark)
    val w = Window.partitionBy(col("q_id")).orderBy(col("dot").desc, col("c_id"))
    val exact = e.select(col("vec_id").as("c_id"), col("embedding").as("c_emb"))
      .join(broadcast(q), col("c_id") =!= col("q_id"))
      .withColumn("dot", graft.functions.GraftFunctions.dot(col("q_emb"), col("c_emb")))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select("q_id", "c_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val hits = pq.map { case (qid, cand) => (cand intersect exact(qid)).size }.sum
    assert(hits >= 1, "PQ top-3 should intersect exact top-10 for at least one query")
    assert(pq.values.forall(_.size == 3))
  }
}
