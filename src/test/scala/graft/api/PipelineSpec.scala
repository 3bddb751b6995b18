package graft.api

import graft.TestSpark
import graft.ops.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The public pipeline API must agree with the oracle-gated query forms —
  * the API is a re-composition, not a re-implementation. */
class PipelineSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("CorpusPipeline default config reproduces pipeline_corpus exactly") {
    val api = new CorpusPipeline().run(spark, TestSpark.sf)
    val query = Corpus.corpusBuild(spark, TestSpark.sf)
    assert(api.exceptAll(query).isEmpty && query.exceptAll(api).isEmpty,
      "API chain and registered query must produce identical stats")
  }

  test("config knobs change the output in the expected direction") {
    val strict = new CorpusPipeline(CorpusConfig(minTokens = 20))
      .run(spark, TestSpark.sf)
      .agg(sum("n_docs")).head.getLong(0)
    val loose = new CorpusPipeline(CorpusConfig(minTokens = 1))
      .run(spark, TestSpark.sf)
      .agg(sum("n_docs")).head.getLong(0)
    assert(strict < loose, "a stricter quality gate must keep fewer docs")
    val noDedup = new CorpusPipeline(CorpusConfig(dedupExact = false))
      .run(spark, TestSpark.sf)
      .agg(sum("n_docs")).head.getLong(0)
    val withDedup = new CorpusPipeline().run(spark, TestSpark.sf)
      .agg(sum("n_docs")).head.getLong(0)
    assert(noDedup >= withDedup, "dedup can only remove docs")
  }

  test("stages fuse lazily: the whole chain is one job, no intermediate " +
    "materialization (scan count via plan)") {
    val plan = new CorpusPipeline().run(spark, TestSpark.sf)
      .queryExecution.executedPlan.toString
    // the chain reads documents for the corpus and for the shingle table —
    // but never writes/caches in between, and the corpus side joins the
    // benchmark set by broadcast
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"),
      s"benchmark shingles must broadcast:\n$plan")
  }

  test("DedupPipeline equals the dd_lsh_clusters query; representatives " +
    "absorb every member") {
    val api = new DedupPipeline().run(spark, TestSpark.sf)
    val query = graft.ops.LlmDedup.lshClusters(spark, TestSpark.sf)
    assert(api.exceptAll(query).isEmpty && query.exceptAll(api).isEmpty)
    val reps = new DedupPipeline()
      .representatives(new DedupPipeline().clusters(
        new DedupPipeline().edges(spark, TestSpark.sf))).collect()
    assert(reps.nonEmpty)
    reps.foreach { r =>
      val members = r.getAs[String]("members").split(",").map(_.toLong)
      assert(members.length == r.getAs[Long]("n_members"))
      assert(members.min == r.getAs[Long]("keep_doc_id"),
        "representative must be the min member id")
    }
  }

  test("DedupPipeline threshold knob: a stricter threshold never yields " +
    "more clustered docs") {
    val loose = new DedupPipeline(DedupConfig(threshold = 0.3))
      .run(spark, TestSpark.sf).count()
    val strict = new DedupPipeline(DedupConfig(threshold = 0.9))
      .run(spark, TestSpark.sf).count()
    assert(strict <= loose)
  }

  test("RetrievalPipeline default config IS the sim_ivf_pq_topk gate; " +
    "wider nprobe never shrinks any query's candidate reach") {
    import org.apache.spark.sql.functions._
    // The registered query delegates to the API, so equality is by
    // construction — assert it anyway to pin the delegation.
    val viaQuery = graft.SparkEntry.queries("sim_ivf_pq_topk")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    def run(cfg: RetrievalConfig) = {
      val e = graft.Tables.embeddings(spark, TestSpark.sf).select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("emb"))
      val cells = e.filter(col("vec_id") < 4)
        .select(col("vec_id").cast("int").as("cell"), col("emb").as("cent"))
      val q = e.filter(col("vec_id").between(10, 14))
        .select(col("vec_id").as("q_id"), col("emb").as("q_emb"))
      new RetrievalPipeline(cfg)
        .searchTopK(e, cells, col("vec_id").between(4, 7), q)
    }
    val viaApi = run(RetrievalConfig())
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(viaApi == viaQuery)
    // nprobe=4 scans every cell: per-query top scores dominate nprobe=2's.
    val s2 = run(RetrievalConfig(nprobe = 2, topK = 1))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val s4 = run(RetrievalConfig(nprobe = 4, topK = 1))
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    s2.foreach { case (qid, sc2) => assert(s4(qid) >= sc2, s"query $qid") }
  }

  test("corpus_interleave: positions are a permutation and round-robin " +
    "across sources (rank r of every source precedes rank r+1 of any)") {
    val out = Corpus.interleave(spark, TestSpark.sf).collect()
    val n = out.length
    assert(out.map(_.getAs[Long]("pos")).toSet == (0L until n).toSet)
    val byPos = out.sortBy(_.getAs[Long]("pos"))
    val ranks = byPos.map(_.getAs[Int]("rk"))
    assert(ranks.sameElements(ranks.sorted),
      "interleave must emit all rank-r docs before any rank-(r+1) doc")
  }

  test("AuditPipeline stages reproduce their gated queries; summary rolls up") {
    val api = new AuditPipeline
    val ri = api.referentialIntegrity(spark, TestSpark.sf)
    val q = graft.ops.Relational.riAudit(spark, TestSpark.sf)
    assert(ri.exceptAll(q).isEmpty && q.exceptAll(ri).isEmpty,
      "API stage must BE the gated query, not a re-implementation")
    val sm = api.summary(spark, TestSpark.sf).collect()
    assert(sm.map(_.getString(0)).toSeq ==
      Seq("chi_square", "pii_scan", "psi_drift", "referential_integrity"))
    // fixture FKs are clean → that audit must pass; PII detectors fire on
    // the synthesized note column → that audit must flag findings
    val byName = sm.map(r => r.getString(0) -> r).toMap
    assert(byName("referential_integrity").getInt(3) == 1)
    assert(byName("pii_scan").getLong(1) > 0)
  }

  test("GeoPipeline stages reproduce their gated queries") {
    val api = new GeoPipeline
    Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
      "geo_grid_join" -> (api.radiusJoin _),
      "geo_knn" -> (api.knn _),
      "geo_density_grid" -> (api.densityGrid _),
      "geo_density_clusters" -> (api.densityClusters _),
      "geo_geohash_cells" -> (api.geohashCells _),
      "geo_point_in_polygon" -> (api.pointInPolygon _),
      "geo_haversine" -> (api.haversine _),
      "geo_trajectories" -> (api.trajectories _),
    ).foreach { case (name, stage) =>
      val a = stage(spark, TestSpark.sf)
      val q = graft.SparkEntry.queries(name)(spark, TestSpark.sf)
      assert(a.exceptAll(q).isEmpty && q.exceptAll(a).isEmpty,
        s"$name: API stage must BE the gated query")
    }
  }

  test("ExperimentPipeline stages reproduce their gated queries") {
    val api = new ExperimentPipeline
    Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
      "ev_ab_test" -> (api.abTest _),
      "ev_sprt" -> (api.sprt _),
      "ev_did" -> (api.did _),
      "ev_cuped" -> (api.cuped _),
      "ev_uplift_bucket" -> (api.uplift _),
      "ts_bandit_replay" -> (api.banditReplay _),
      "ev_effect_size" -> (api.effectSize _),
      "ev_attribution_markov" -> (api.attribution _),
    ).foreach { case (name, stage) =>
      val a = stage(spark, TestSpark.sf)
      val q = graft.SparkEntry.queries(name)(spark, TestSpark.sf)
      assert(a.exceptAll(q).isEmpty && q.exceptAll(a).isEmpty,
        s"$name: API stage must BE the gated query")
    }
  }

  test("ScoringPipeline stages reproduce their gated queries") {
    val api = new ScoringPipeline
    Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
        org.apache.spark.sql.DataFrame)](
      "ml_logreg_score" -> (api.score _),
      "ml_tree_score" -> (api.treeScore _),
      "ml_gbdt_margin" -> (api.ensembleMargin _),
      "ml_auc_exact" -> (api.auc _),
      "ml_confusion" -> (api.confusion _),
      "ml_calibration" -> (api.calibration _),
      "ml_kfold" -> (api.kfold _),
      "ml_target_encode" -> (api.targetEncode _),
      "ml_woe_iv" -> (api.woeIv _),
      "ml_feature_hash" -> (api.featureHash _),
      "ml_ndcg" -> (api.ndcg _),
      "ml_precision_at_k" -> (api.precisionAtK _),
      "ml_conformal" -> (api.conformal _),
      "ml_pr_auc" -> (api.prAuc _),
      "ml_lift_gains" -> (api.liftGains _),
      "ml_ks_score" -> (api.ksScore _),
      "ml_training_set" -> (api.trainingSet _),
      "ml_shap_linear" -> (api.shapLinear _),
    ).foreach { case (name, stage) =>
      val a = stage(spark, TestSpark.sf)
      val q = graft.SparkEntry.queries(name)(spark, TestSpark.sf)
      assert(a.exceptAll(q).isEmpty && q.exceptAll(a).isEmpty,
        s"$name: API stage must BE the gated query")
    }
  }

  test("MaintenancePipeline stages reproduce their gated queries; summary passes") {
    val api = new MaintenancePipeline
    val plan = api.compactionPlan(spark, TestSpark.sf)
    val q = graft.sources.Sources.compactionPlan(spark, TestSpark.sf)
    assert(plan.exceptAll(q).isEmpty && q.exceptAll(plan).isEmpty,
      "API stage must BE the gated query, not a re-implementation")
    val tt = api.timeTravel(spark, TestSpark.sf)
    val qtt = graft.sources.Sources.timeTravel(spark, TestSpark.sf)
    assert(tt.exceptAll(qtt).isEmpty && qtt.exceptAll(tt).isEmpty)
    val sm = api.summary(spark, TestSpark.sf).collect()
    assert(sm.map(_.getString(0)).toSeq ==
      Seq("cdc_merge", "compaction", "time_travel"))
    // every maintenance invariant must hold on the fixture: compaction
    // preserves rows+checksums, time travel shrinks live files at v1
    sm.foreach(r => assert(r.getInt(4) == 1,
      s"${r.getString(0)} maintenance invariant failed"))
    // round-11 stages: same contract — the API IS the gated query
    val dv = api.deleteWithVectors(spark, TestSpark.sf)
    val qdv = graft.SparkEntry.queries("layout_deletion_vectors")(
      spark, TestSpark.sf)
    assert(dv.exceptAll(qdv).isEmpty && qdv.exceptAll(dv).isEmpty)
    val cf = api.changeFeed(spark, TestSpark.sf)
    val qcf = graft.SparkEntry.queries("layout_cdf")(spark, TestSpark.sf)
    assert(cf.exceptAll(qcf).isEmpty && qcf.exceptAll(cf).isEmpty)
    val vc = api.vacuum(spark, TestSpark.sf).collect().head
    assert(vc.getLong(2) == vc.getLong(0) - vc.getLong(1),
      "vacuum conservation must hold through the API")
  }
}
