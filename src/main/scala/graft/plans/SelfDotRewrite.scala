package graft.plans

import graft.functions.{FloatDotProduct, FloatSelfDot}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** The library's `Rule[LogicalPlan]` — an algebraic rewrite in the same
  * class as Spark's own ReplaceExpressions: `graft_dot(x, x)` over
  * semantically-equal deterministic children becomes the specialized
  * [[FloatSelfDot]], which reads each array element ONCE instead of
  * twice. Norms (`sqrt(dot(e, e))`) appear in every similarity pipeline
  * — ivf/kmeans/knn assignment all compute them per vector — so the
  * rewrite targets a genuinely hot kernel while provably preserving
  * results (identical fold order over identical values; ExtensionsSpec
  * pins both the plan shape and value equality).
  *
  * Installed session-wide by [[GraftExtensions]] via
  * `injectOptimizerRule`; sessions without the extensions simply keep
  * the two-argument form — the rewrite is an optimization, never a
  * semantic dependency. */
object SelfDotRewrite extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case FloatDotProduct(a, b) if a.deterministic && a.semanticEquals(b) =>
        FloatSelfDot(a)
    }
}
