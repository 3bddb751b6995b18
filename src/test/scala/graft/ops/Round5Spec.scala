package graft.ops

import graft.{SparkEntry, Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the round-5 operators — invariants the DuckDB
  * oracle can't express (it only pins equality of one run). */
class Round5Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("pii_fpe_tokenize: format-preserving, deterministic, non-identity") {
    val out = SparkEntry.queries("pii_fpe_tokenize")(spark, TestSpark.sf)
      .join(Tables.customer(spark, TestSpark.sf), Seq("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("token"))
      .collect()
    assert(out.nonEmpty)
    var changed = 0
    out.foreach { r =>
      val name = r.getString(1); val tok = r.getString(2)
      assert(tok.length == name.length, s"length must be preserved: $name -> $tok")
      name.zip(tok).foreach { case (a, b) =>
        if (a.isDigit) assert(b.isDigit, s"digit must map to digit in $tok")
        else assert(a == b, s"non-digit must pass through: $name -> $tok")
      }
      if (name != tok) changed += 1
    }
    // md5-derived digits: overwhelmingly some name must actually change
    assert(changed > out.length / 2, "tokenization must not be the identity")
    // determinism: a second evaluation yields the identical mapping
    val again = SparkEntry.queries("pii_fpe_tokenize")(spark, TestSpark.sf)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out.foreach(r => assert(again(r.getLong(0)) == r.getString(2)))
  }

  test("dd_bloom_incremental: no false negatives, verify gated on bloom") {
    val out = SparkEntry.queries("dd_bloom_incremental")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val docs = Tables.documents(spark, TestSpark.sf)
      .select(col("doc_id"), md5(col("text")).as("h"))
    val trueDups = docs.filter(col("doc_id") % 5 === 0).as("i")
      .join(docs.filter(col("doc_id") % 5 =!= 0).as("e"), col("i.h") === col("e.h"), "left_semi")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    out.foreach { case (id, maybe, dup) =>
      // a Bloom filter can never miss: every true dup must probe positive
      if (trueDups(id)) assert(maybe == 1 && dup == 1, s"false negative on $id")
      // the exact verdict only fires behind a positive probe
      if (dup == 1) assert(maybe == 1, s"is_dup without maybe_seen on $id")
      if (!trueDups(id)) assert(dup == 0, s"false dup on $id")
    }
  }

  test("agg_equidepth: buckets are near-equal depth and cover all rows") {
    val out = SparkEntry.queries("agg_equidepth")(spark, TestSpark.sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val total = Tables.lineitem(spark, TestSpark.sf).count()
    assert(out.map(_._2).sum == total, "buckets must partition the rows")
    assert(out.length == 8)
    val ideal = total / 8.0
    out.foreach { case (b, n, lo, hi) =>
      assert(lo <= hi)
      assert(math.abs(n - ideal) <= ideal * 0.02 + 2,
        s"bucket $b depth $n too far from $ideal")
    }
    // bucket ranges are ordered and non-overlapping
    out.sortBy(_._1).sliding(2).foreach {
      case Array((_, _, _, hi1), (_, _, lo2, _)) => assert(hi1 <= lo2)
      case _ =>
    }
  }

  test("agg_skew_kurtosis: exact-decimal moments agree with Spark built-ins") {
    val exact = SparkEntry.queries("agg_skew_kurtosis")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val builtin = Tables.lineitem(spark, TestSpark.sf)
      .groupBy(col("l_returnflag"))
      .agg(avg(col("l_quantity")).as("m"), skewness(col("l_quantity")).as("sk"),
        kurtosis(col("l_quantity")).as("ku"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    exact.foreach { case (flag, (mean, sk, ku)) =>
      val (bm, bsk, bku) = builtin(flag)
      assert(math.abs(mean - bm) < 1e-9)
      // Spark's skewness/kurtosis are the same population estimators
      assert(math.abs(sk - bsk) < 1e-6, s"$flag skew $sk vs builtin $bsk")
      assert(math.abs(ku - bku) < 1e-6, s"$flag kurt $ku vs builtin $bku")
    }
  }

  test("graph_pagerank: floor rank for sources-only nodes, mass bounded") {
    val ranks = SparkEntry.queries("graph_pagerank")(spark, TestSpark.sf)
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(ranks.size == 25)
    val floorR = 0.15 / 25.0
    ranks.values.foreach(r => assert(r >= floorR - 1e-15))
    // simplified PR loses dangling mass, so total is in (floor·N, 1]
    val total = ranks.values.sum
    assert(total <= 1.0 + 1e-9 && total > floorR * 25)
    // at least one node receives real mass
    assert(ranks.values.max > floorR + 1e-6)
  }

  test("corpus_temperature_mix: targets follow the sqrt schedule exactly") {
    val sel = SparkEntry.queries("corpus_temperature_mix")(spark, TestSpark.sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n_sel"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val counts = Tables.documents(spark, TestSpark.sf)
      .groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalW = counts.toSeq.sortBy(_._1).map(c => math.sqrt(c._2.toDouble)).sum
    counts.foreach { case (lang, n) =>
      val expect = math.floor((200.0 * math.sqrt(n.toDouble)) / totalW).toLong
      assert(sel.getOrElse(lang, 0L) == expect, s"$lang selected ${sel.get(lang)} want $expect")
    }
    // flattening: the smallest lang's selected share must beat its raw share
    // (langs are genuinely skewed in the fixture, unlike the uniform sources)
    val (minLang, minN) = counts.minBy(_._2)
    val rawShare = minN.toDouble / counts.values.sum
    val selShare = sel(minLang).toDouble / sel.values.sum
    assert(selShare > rawShare, "temperature must upweight small languages")
  }

  test("ev_ewma: head of each series equals its value; geometric bound") {
    val out = SparkEntry.queries("ev_ewma")(spark, TestSpark.sf)
    val ev = Tables.events(spark, TestSpark.sf).filter(col("user_id") % 97 === 0)
    val firstPerUser = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
      ev.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .select(col("event_id"), col("value"))
    }
    val headRows = out.join(firstPerUser, Seq("event_id"))
      .select(col("ewsum"), col("value")).collect()
    assert(headRows.nonEmpty)
    headRows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      "first event's EW sum is exactly its own value"))
    val maxVal = ev.agg(max(abs(col("value")))).head.getDouble(0)
    out.agg(max(abs(col("ewsum")))).head.getDouble(0) match {
      case m => assert(m <= 2.0 * maxVal + 1e-9, "Σ 2^-k < 2 bounds the EW sum")
    }
  }

  test("win_rolling_median: median lies within the frame's min/max") {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_micros(col("ts")), col("event_id")).rowsBetween(-3, 3)
    val chk = Tables.events(spark, TestSpark.sf)
      .filter(col("user_id") % 97 === 0)
      .select(col("event_id"), min(col("value")).over(w).as("lo"),
        max(col("value")).over(w).as("hi"))
    val joined = SparkEntry.queries("win_rolling_median")(spark, TestSpark.sf)
      .join(chk, Seq("event_id"))
      .filter(col("med7") < col("lo") || col("med7") > col("hi"))
    assert(joined.count() == 0, "median must lie within its frame")
  }

  test("agg_mode: reported mode really is the most frequent value") {
    val modes = SparkEntry.queries("agg_mode")(spark, TestSpark.sf)
      .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
    val counts = Tables.orders(spark, TestSpark.sf)
      .groupBy(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    counts.foreach { case (st, pr, n) =>
      val (mpr, mn) = modes(st)
      assert(n < mn || (n == mn && pr >= mpr),
        s"$st: $pr has $n > mode $mpr=$mn (or wrong tie-break)")
    }
  }

  test("vec_pca_power: unit-norm loading, positive eigenvalue, and the " +
    "direction explains more variance than a coordinate axis") {
    val rows = SparkEntry.queries("vec_pca_power")(spark, TestSpark.sf)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    val norm2 = rows.map { case (_, l, _) => l * l }.sum
    assert(math.abs(norm2 - 1.0) < 1e-9, s"loading must be unit-norm, got $norm2")
    val lambda = rows.head._3
    assert(lambda > 0.0)
    // Rayleigh-quotient sanity: the power direction's second moment must be
    // at least the max coordinate axis's (power iteration only improves on
    // any starting direction, and axes are valid directions)
    val e = Tables.embeddings(spark, TestSpark.sf)
      .select(posexplode(transform(col("embedding"), x => x.cast("double"))))
    val axisMax = e.groupBy(col("pos"))
      .agg((sum(col("col") * col("col")) / count(lit(1))).as("m2"))
      .agg(max(col("m2"))).head.getDouble(0)
    assert(lambda >= axisMax - 1e-9,
      s"top eigenvalue $lambda must dominate the best axis $axisMax")
  }

  test("src_file_provenance: metadata-derived lineage matches the table") {
    val viaMeta = SparkEntry.queries("src_file_provenance")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = Tables.documents(spark, TestSpark.sf)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("tc"))
      .orderBy(col("lang"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(viaMeta.toSeq == direct.toSeq)
  }
}
