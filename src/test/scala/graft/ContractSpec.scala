package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that must hold for every registered query. */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  /** All driver fixture tiers — the invariant tests scan every one so a
    * drift at ANY gated sf fails loudly here. Asserted non-empty at use:
    * a missing fixture root must fail the invariants, not vacuously pass
    * them. */
  private lazy val fixtureDirs: Seq[String] = {
    val dirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1").filter(d => new java.io.File(d).isDirectory)
    assert(dirs.nonEmpty, "no fixture directories found under /root/testdata")
    dirs
  }

  test("query names are globally unique across modules") {
    val all = SparkEntry.modules.flatMap(_.queries.keys)
    assert(all.size == all.distinct.size,
      s"duplicates: ${all.diff(all.distinct)}")
  }

  test("every oracleSql key has a matching query") {
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- q
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("fixture invariant: documents.text is 7-bit ASCII (ord-based oracles)") {
    // Several oracles index documents.text characterwise via ord/substr
    // (mm_jpeg_pixels, mm_phash_recall, ...). mm_jpeg_pixels is now
    // clamped on BOTH sides so it survives any fixture; the rest rely on
    // this invariant — if the driver ever regenerates fixtures with
    // non-ASCII text (langs include zh), fail HERE with a named cause
    // instead of as an opaque oracle hash mismatch. ALL fixture dirs are
    // scanned, not just the unit-test sf: the driver gates at sf0.01 and
    // benches at sf0.1, and fixtures regenerate per-sf.
    import org.apache.spark.sql.functions._
    fixtureDirs.foreach { d =>
      val nonAscii = Tables.documents(spark, d)
        .filter(col("text").rlike("[^\\x00-\\x7F]")).count()
      assert(nonAscii == 0,
        s"$nonAscii documents in $d contain non-ASCII text; ord-based " +
          "oracles (e.g. mm_phash_recall) assume codepoint==byte — re-audit")
    }
  }

  test("fixture invariant: documented dims and alphabets hold (FIXTURES.md)") {
    // Query families hard-assume these: SRP hyperplanes / PQ codebooks
    // assume 64-dim embeddings; stratified sampling and language scoring
    // assume the 5-lang set; retention/winsorize enumerate the 5 event
    // types; agg_collect's bounded-alphabet posture rests on ≤5 order
    // priorities. A regenerated fixture that drifts must fail HERE with
    // a named cause, not as a garbage similarity score or an opaque
    // oracle hash mismatch. All three sf dirs are scanned (cheap tables).
    import org.apache.spark.sql.functions._
    fixtureDirs.foreach { d =>
      val dims = Tables.embeddings(spark, d)
        .select(min(size(col("embedding"))).as("lo"),
          max(size(col("embedding"))).as("hi"),
          min(col("label")).as("lbLo"), max(col("label")).as("lbHi")).head
      assert(dims.getInt(0) == 64 && dims.getInt(1) == 64,
        s"$d: embedding dims ${dims.getInt(0)}..${dims.getInt(1)} != 64 — " +
          "SRP/PQ/Matryoshka operators assume 64")
      assert(dims.getInt(2) >= 0 && dims.getInt(3) <= 9,
        s"$d: embedding labels outside 0..9")
      val langs = Tables.documents(spark, d)
        .select(collect_set(col("lang"))).head.getSeq[String](0).toSet
      assert(langs == Set("en", "zh", "fr", "es", "de"),
        s"$d: documents.lang alphabet drifted: $langs")
      val ids = Tables.documents(spark, d)
        .select(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("u")).head
      assert(ids.getLong(0) == ids.getLong(1), s"$d: doc_id not unique")
      val types = Tables.events(spark, d)
        .select(collect_set(col("event_type"))).head.getSeq[String](0).toSet
      assert(types == Set("signup", "click", "error", "view", "purchase"),
        s"$d: events.event_type alphabet drifted: $types")
      val prios = Tables.orders(spark, d)
        .select(countDistinct(col("o_orderpriority"))).head.getLong(0)
      assert(prios <= 5,
        s"$d: $prios order priorities — agg_collect's bounded-alphabet " +
          "posture assumes ≤5")
    }
  }

  /** ONE catalog sweep per shuffle-partition setting, feeding BOTH
    * invariants below (row counts for every query, full collected rows for
    * the oracle-gated set). The determinism and partition-stability tests
    * previously each ran their own pair of full catalog sweeps (~4×398
    * query executions — the dominant term of the whole suite's wall-clock,
    * and the reason the driver's test gate timed out in round 14); sharing
    * two sweeps keeps every assertion and halves the catalog executions. */
  private def sweep(parts: String): (Map[String, Seq[String]], Map[String, Long]) = {
    val gated = SparkEntry.oracleSql.keySet
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try {
      val rows = Map.newBuilder[String, Seq[String]]
      val counts = Map.newBuilder[String, Long]
      SparkEntry.queries.foreach { case (name, fn) =>
        val df = fn(spark, TestSpark.sf)
        if (gated(name)) {
          val r = df.collect().map(_.toString).toSeq
          rows += name -> r
          counts += name -> r.size.toLong
        } else counts += name -> df.count()
      }
      (rows.result(), counts.result())
    } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
  }
  private lazy val sweepAt1 = sweep("1")
  private lazy val sweepAt7 = sweep("7")

  test("every query runs at sf0.001 and returns a deterministic row count") {
    val gated = SparkEntry.oracleSql.keySet
    SparkEntry.queries.foreach { case (name, fn) =>
      assert(sweepAt1._2(name) > 0, s"$name returned no rows at sf0.001")
      if (gated(name))
        // cross-partitioning count equality (strictly stronger than the
        // previous same-config double run for the gated set)
        assert(sweepAt1._2(name) == sweepAt7._2(name),
          s"$name nondeterministic count")
      else {
        // rows-only queries keep the original same-config double run:
        // their row counts are not asserted partition-count-invariant
        // (dd_minhash_pairs' top-100 cut is order-sensitive at the margin)
        val n1 = fn(spark, TestSpark.sf).count()
        val n2 = fn(spark, TestSpark.sf).count()
        assert(n1 == n2, s"$name nondeterministic count")
      }
    }
  }

  test("results are stable under shuffle.partitions ∈ {1, 7} (SURVEY §5.2)") {
    // rows-only queries excluded: dd_minhash_pairs emits candidate pairs
    // whose jaccard ties make the top-100 cut partition-order-sensitive
    // at the margin; the oracle-gated set must be bitwise stable.
    val a = sweepAt1._1
    val b = sweepAt7._1
    a.keys.foreach { k =>
      assert(a(k) == b(k), s"$k differs across shuffle partition counts")
    }
  }
}
