package graft.api

import graft.ops.{Events, Experiment, TimeSeries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Experimentation analytics as a public, staged API — the eighth
  * pipeline, bundling what an experiment platform runs per experiment:
  * the fixed-horizon readout (classic A/B), the sequential monitor
  * (Wald SPRT), the causal estimators (difference-in-differences),
  * variance reduction (CUPED), heterogeneous effects (uplift by
  * pre-exposure stratum), and the adaptive-allocation replay (ε-greedy
  * bandit, batch and streaming forms). Each stage returns the SAME
  * DataFrame its gated query produces (PipelineSpec pins this), so the
  * API inherits every oracle guarantee.
  *
  * Scale census: every stage collapses the event stream to exact-integer
  * cells/moments in one partial+final aggregate; statistics are single
  * float expressions over those frozen sums; the two sequential readouts
  * (SPRT trajectory, bandit fold) run on the calendar-bounded daily grid.
  */
class ExperimentPipeline {

  /** Fixed-horizon two-arm conversion readout with the z statistic. */
  def abTest(s: SparkSession, dir: String): DataFrame =
    Events.abTest(s, dir)

  /** Wald SPRT: sequential LLR trajectory with early-stopping verdicts. */
  def sprt(s: SparkSession, dir: String): DataFrame =
    Events.sprt(s, dir)

  /** Difference-in-differences over the pre/post × arm grid. */
  def did(s: SparkSession, dir: String): DataFrame =
    Experiment.did(s, dir)

  /** CUPED variance reduction from the pre-period covariate. */
  def cuped(s: SparkSession, dir: String): DataFrame =
    Experiment.cuped(s, dir)

  /** Treatment-effect heterogeneity by pre-exposure activity bucket. */
  def uplift(s: SparkSession, dir: String): DataFrame =
    Experiment.upliftBucket(s, dir)

  /** Deterministic ε-greedy bandit replay over the daily grid. */
  def banditReplay(s: SparkSession, dir: String): DataFrame =
    TimeSeries.banditReplay(s, dir)

  /** Cohen's d + Welch CI — magnitude, not just significance. */
  def effectSize(s: SparkSession, dir: String): DataFrame =
    Experiment.effectSize(s, dir)

  /** Markov data-driven attribution: per-channel removal effects. */
  def attribution(s: SparkSession, dir: String): DataFrame =
    TimeSeries.attributionMarkov(s, dir)
}
