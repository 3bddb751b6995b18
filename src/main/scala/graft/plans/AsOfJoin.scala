package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the full custom-operator stack (logical node →
  * planner strategy → physical sort-merge execution), SURVEY.md §4 /
  * guide §"Custom operator".
  *
  * Semantics: for each left row, attach the LAST right row with the same
  * key and `rightTime <= leftTime` (right side null when none) — a left
  * outer as-of join with "at or before" matching.
  *
  * Physical strategy: both sides hash-partitioned on the key (Catalyst's
  * EnsureRequirements inserts compatible exchanges from the declared
  * `requiredChildDistribution`) and sorted by (key, time); execution is a
  * single forward merge with O(1) state — one buffered right row — per
  * partition. That is the canonical distributed as-of plan: linear, no
  * pair explosion, no per-key buffering, identical shape at 100 TB.
  *
  * Keys and times are any expressions evaluating to Long (fixture use:
  * user_id, unix_micros(ts)). */
case class AsOfJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightWidth = right.output.size
    val schema = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val project = UnsafeProjection.create(schema, schema)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuffered = rIter.buffered
      // last right row (copied) whose (key, time) matched the current scan
      var heldKey = 0L
      var held: InternalRow = null

      lIter.map { lRow =>
        val k = lKey.eval(lRow).asInstanceOf[Long]
        val t = lTime.eval(lRow).asInstanceOf[Long]
        // advance the right side to the last row with key == k, time <= t;
        // rows with smaller keys are drained (left is also key-ascending)
        var advancing = true
        while (advancing && rBuffered.hasNext) {
          val head = rBuffered.head
          val hk = rKey.eval(head).asInstanceOf[Long]
          if (hk < k || (hk == k && rTime.eval(head).asInstanceOf[Long] <= t)) {
            if (hk == k) { held = head.copy(); heldKey = hk }
            rBuffered.next()
          } else advancing = false
        }
        val matched = held != null && heldKey == k
        project(joined(lRow, if (matched) held else nullRight))
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** Dataframe-level entry: `asof(left, right, ...)` — registers the
    * strategy (idempotent) and wraps the logical node. */
  def apply(spark: SparkSession, left: DataFrame, right: DataFrame,
      leftKey: Column, rightKey: Column,
      leftTime: Column, rightTime: Column): DataFrame = {
    GraftBridge.addStrategy(spark, AsOfJoinStrategy)
    GraftBridge.ofRows(spark,
      AsOfJoin(
        GraftBridge.analyzed(left), GraftBridge.analyzed(right),
        GraftBridge.expr(leftKey), GraftBridge.expr(rightKey),
        GraftBridge.expr(leftTime), GraftBridge.expr(rightTime)))
  }
}
