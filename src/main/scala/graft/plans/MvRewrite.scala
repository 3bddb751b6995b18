package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference,
  KnownNotNull, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, Complete, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan,
  Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation,
  LogicalRelation}

/** Transparent MATERIALIZED-VIEW REWRITE — the optimizer half of the MV
  * story ([[graft.ops.Relational]]'s rel_incr_agg maintains partial
  * states; this rule makes queries USE them without being rewritten by
  * hand): an `Aggregate` over the base `documents` table whose aggregate
  * list is derivable from the summary's partial states is redirected to
  * scan the summary instead, merging states (COUNT(*) → SUM(cnt),
  * SUM(n_chars) → SUM(sum_chars)) — the classic roll-up rewrite, since
  * the MV is grouped finer (lang × doc-bucket) than the query (lang). At
  * 100 TB this turns a corpus scan into a read of a few thousand summary
  * rows; the rewrite is sound because the merge of exact partial states
  * equals the full recompute (the same algebra rel_incr_agg proves).
  *
  * Scope is deliberately conservative, in the style of Spark's own
  * pattern-guarded rules: the rule fires ONLY when (a) the child is a
  * bare (possibly column-pruned) scan of THIS base path, (b) every
  * grouping expression maps onto an MV grouping attribute, and (c) every
  * aggregate is an undistinct, unfiltered COUNT(foldable) or
  * SUM(n_chars). Anything else — AVG, DISTINCT, filters the MV cannot
  * see, extra columns — falls through untouched, so installing the rule
  * session-wide can change plans but never answers. Output attribute ids
  * are preserved via aliasing, so parent operators (sorts, projections)
  * re-bind without a fixup pass; KnownNotNull pins the merged SUM's
  * nullability to the original COUNT's non-null contract (groups only
  * exist where rows do, so the merge can never actually produce null).
  *
  * Installed per-session through the PUBLIC
  * `spark.experimental.extraOptimizations` hook (the runtime twin of
  * [[GraftExtensions]]' injectOptimizerRule path, usable on a vanilla
  * session); [[graft.sources.Lakehouse.mvRewrite]] registers it
  * idempotently and the gated query + Round11Spec pin both the plan
  * (scans the MV, not the base) and the values (hash-equal to the
  * base-table oracle). */
class MvAggRewrite(spark: SparkSession, baseDir: String, mvPath: String)
    extends Rule[LogicalPlan] {

  private lazy val mvPlan: LogicalPlan =
    spark.read.parquet(mvPath).queryExecution.analyzed
  private lazy val mvLang: AttributeReference =
    mvPlan.output.find(_.name == "lang").get.asInstanceOf[AttributeReference]
  private lazy val mvCnt = mvPlan.output.find(_.name == "cnt").get
  private lazy val mvSumChars = mvPlan.output.find(_.name == "sum_chars").get

  /** The child must be nothing but a (possibly pruned) scan of the base
    * table this MV summarizes — any intervening filter or computation
    * would make the summary's states unusable. */
  private def isBaseScan(plan: LogicalPlan): Boolean = plan match {
    case Project(ps, child) if ps.forall(_.isInstanceOf[AttributeReference]) =>
      isBaseScan(child)
    case lr: LogicalRelation => lr.relation match {
      case fs: HadoopFsRelation => fs.location.rootPaths
        .exists(_.toString.endsWith(s"$baseDir/documents.parquet"))
      case _ => false
    }
    case _ => false
  }

  /** Map one output expression of the original aggregate onto the MV's
    * partial states, keeping the original exprId so parents re-bind. */
  private def derive(e: NamedExpression,
      group: AttributeReference): Option[NamedExpression] = e match {
    case a: AttributeReference if a.exprId == group.exprId =>
      Some(Alias(mvLang, a.name)(exprId = a.exprId))
    case al @ Alias(ae @ AggregateExpression(c: Count, Complete, false, None, _),
        name) if c.children.forall(_.foldable) =>
      Some(Alias(KnownNotNull(ae.copy(aggregateFunction = Sum(mvCnt))),
        name)(exprId = al.exprId))
    case al @ Alias(ae @ AggregateExpression(su: Sum, Complete, false, None, _),
        name) => su.child match {
      case a: AttributeReference if a.name == "n_chars" =>
        Some(Alias(KnownNotNull(ae.copy(aggregateFunction = Sum(mvSumChars))),
          name)(exprId = al.exprId))
      case _ => None
    }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg @ Aggregate(Seq(g: AttributeReference), aggExprs, child, _)
        if g.name == "lang" && isBaseScan(child) => {
      val derived = aggExprs.map(derive(_, g))
      if (derived.forall(_.isDefined))
        Aggregate(Seq(mvLang), derived.map(_.get), mvPlan, None)
      else agg
    }
  }
}
