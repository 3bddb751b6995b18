package graft.api

import graft.ops.Ml
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Model scoring & evaluation as a public, staged API — the seventh
  * pipeline alongside [[DedupPipeline]]/[[CorpusPipeline]]/
  * [[RetrievalPipeline]]/[[AuditPipeline]]/[[MaintenancePipeline]]/
  * [[GeoPipeline]], bundling the inference-side primitives a model-driven
  * curation loop needs: broadcast-model scoring (linear, tree, ensemble),
  * the evaluation battery (exact AUC, threshold sweeps, calibration), the
  * encoders (target, WOE/IV, hashing trick), deterministic fold
  * assignment, and ranking metrics. Each stage returns the SAME DataFrame
  * the gated query produces (PipelineSpec pins this), so the API inherits
  * every oracle guarantee.
  *
  * Scale census: the MODEL is always the broadcast side (weights, tree
  * nodes, thresholds); the scored corpus streams through map + one
  * partial+final integer aggregate; rank metrics window per entity; the
  * one global prefix (AUC's grid cumsum) is bucket-localized. */
class ScoringPipeline {

  /** Sparse linear scoring: exact integer margins + sigmoid, top-scored. */
  def score(s: SparkSession, dir: String): DataFrame =
    Ml.logregScore(s, dir)

  /** Decision-tree inference with the per-leaf purity readout. */
  def treeScore(s: SparkSession, dir: String): DataFrame =
    Ml.treeScore(s, dir)

  /** Additive-ensemble margins (GBDT-style), histogrammed by class. */
  def ensembleMargin(s: SparkSession, dir: String): DataFrame =
    Ml.gbdtMargin(s, dir)

  /** Exact ROC-AUC from integer rank statistics. */
  def auc(s: SparkSession, dir: String): DataFrame =
    Ml.aucExact(s, dir)

  /** Confusion counts + precision/recall/F1 across thresholds. */
  def confusion(s: SparkSession, dir: String): DataFrame =
    Ml.confusionSweep(s, dir)

  /** Reliability-diagram table: observed rate vs mean margin per bin. */
  def calibration(s: SparkSession, dir: String): DataFrame =
    Ml.calibrationBins(s, dir)

  /** Deterministic md5 k-fold assignment with balance readout. */
  def kfold(s: SparkSession, dir: String): DataFrame =
    Ml.kfoldAssign(s, dir)

  /** Smoothed (m-estimate) target encoding per category. */
  def targetEncode(s: SparkSession, dir: String): DataFrame =
    Ml.targetEncode(s, dir)

  /** Weight-of-evidence + information value per bin. */
  def woeIv(s: SparkSession, dir: String): DataFrame =
    Ml.woeIv(s, dir)

  /** The hashing trick: signed md5 buckets, fixed feature space. */
  def featureHash(s: SparkSession, dir: String): DataFrame =
    Ml.featureHash(s, dir)

  /** NDCG@10 per user over integer gain tables. */
  def ndcg(s: SparkSession, dir: String): DataFrame =
    Ml.ndcgAtK(s, dir)

  /** Precision@5 per user. */
  def precisionAtK(s: SparkSession, dir: String): DataFrame =
    Ml.precisionAtK(s, dir)

  /** Split-conformal interval: residual quantile + empirical coverage. */
  def conformal(s: SparkSession, dir: String): DataFrame =
    Ml.conformal(s, dir)

  /** Average precision (PR-AUC) from frozen-integer contributions. */
  def prAuc(s: SparkSession, dir: String): DataFrame =
    Ml.prAuc(s, dir)

  /** Cumulative gains / lift table by score decile. */
  def liftGains(s: SparkSession, dir: String): DataFrame =
    Ml.liftGains(s, dir)

  /** Kolmogorov–Smirnov discrimination: the max CDF gap, exact-integer. */
  def ksScore(s: SparkSession, dir: String): DataFrame =
    Ml.ksScore(s, dir)

  /** Leakage-free point-in-time training-set assembly with md5 folds. */
  def trainingSet(s: SparkSession, dir: String): DataFrame =
    Ml.trainingSet(s, dir)

  /** Exact linear-SHAP global feature attribution. */
  def shapLinear(s: SparkSession, dir: String): DataFrame =
    Ml.shapLinear(s, dir)
}
