package graft.api

import graft.ops.{Aggs, Relational}
import graft.pii.PiiQueries
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data GOVERNANCE audits as a public, staged API — the fourth pipeline
  * alongside [[DedupPipeline]]/[[CorpusPipeline]]/[[RetrievalPipeline]],
  * bundling the checks a lake owner runs before certifying a dataset:
  * referential integrity (`rel_ri_audit`), PII discovery
  * (`pii_scan_report`), first-digit plausibility (`rel_benford`),
  * distribution drift (`rel_psi_drift`), and categorical independence
  * (`agg_chi_square`). Each stage returns the SAME DataFrame the gated
  * query produces (PipelineSpec pins this), so the API inherits every
  * oracle guarantee; `summary` folds them into one release-note verdict
  * row per audit — the shape a CI gate consumes.
  *
  * Scale census: every stage is an independent aggregate/anti-join over
  * its own table — a scheduler fans them out; `summary` touches only the
  * already-reduced audit outputs. */
class AuditPipeline {

  /** FK orphan report over the star schema. */
  def referentialIntegrity(s: SparkSession, dir: String): DataFrame =
    Relational.riAudit(s, dir)

  /** Column-level PII detector hit rates. */
  def piiScan(s: SparkSession, dir: String): DataFrame =
    PiiQueries.scanReport(s, dir)

  /** Benford first-digit deviation of order totals. */
  def benford(s: SparkSession, dir: String): DataFrame =
    Relational.benford(s, dir)

  /** PSI drift of event values across half-month periods. */
  def drift(s: SparkSession, dir: String): DataFrame =
    Relational.psiDrift(s, dir)

  /** Event-type × day-of-week independence. */
  def independence(s: SparkSession, dir: String): DataFrame =
    Aggs.chiSquare(s, dir)

  /** One verdict row per audit: (audit, n_findings, worst, passed) —
    * the CI-gate rollup. Thresholds are the caller's policy; these
    * defaults flag any FK orphan, any ≥10%-hit PII detector, PSI ≥ 0.2
    * (the industry "significant shift" bar), and χ² per-cell
    * contributions ≥ 25. */
  def summary(s: SparkSession, dir: String): DataFrame = {
    def row(name: String, findings: DataFrame, bad: org.apache.spark.sql.Column,
        worst: org.apache.spark.sql.Column): DataFrame =
      findings.agg(
        // coalesce: an EMPTY audit table aggregates to NULL, which must
        // read as "0 findings, passed" (vacuously clean), not as a
        // failed audit with null counts
        coalesce(sum(when(bad, 1L).otherwise(0L)), lit(0L)).cast("long")
          .as("n_findings"),
        max(worst).as("worst"))
        .select(lit(name).as("audit"), col("n_findings"),
          col("worst").cast("double").as("worst"),
          when(col("n_findings") === 0, 1).otherwise(0).cast("int")
            .as("passed"))
    row("referential_integrity", referentialIntegrity(s, dir),
        col("ok") === 0, col("n_orphans"))
      .unionByName(row("pii_scan", piiScan(s, dir),
        col("flagged") === 1, col("hit_rate")))
      .unionByName(row("psi_drift", drift(s, dir),
        col("psi") >= 0.2, col("psi")))
      .unionByName(row("chi_square", independence(s, dir),
        col("contrib") >= 25.0, col("contrib")))
      .orderBy(col("audit"))
  }
}
