package graft.tools

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.catalyst.expressions.{EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalRelation, LogicalPlan}

/** Scratch scanner: dump every logical Join in the registered catalog whose
  * condition carries NO equality conjunct (pure theta / cross) together with
  * a bound classification of each side — the raw material for the
  * catalog-wide no-unbounded-theta-join invariant. */
object ThetaScan {
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def sideTag(p: LogicalPlan): String = {
    val tags = Seq(
      if (p.collectFirst { case l: GlobalLimit => l }.nonEmpty) Some("limit") else None,
      if (p.collectFirst { case a: Aggregate => a }.nonEmpty) Some("agg") else None,
      if (p.collectFirst { case l: LocalRelation => l }.nonEmpty) Some("local") else None
    ).flatten
    val leaves = p.collectLeaves().map(_.nodeName).distinct.mkString("+")
    s"[${tags.mkString(",")}|$leaves]"
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = if (args.nonEmpty) args(0) else TestSpark.sf
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val lp = fn(spark, sf).queryExecution.optimizedPlan
        lp.collect { case j: Join => j }.foreach { j =>
          val hasEqui = j.condition.exists(c => conjuncts(c).exists {
            case _: EqualTo | _: EqualNullSafe => true
            case _ => false
          })
          if (!hasEqui) {
            val cond = j.condition.map(_.sql.take(60)).getOrElse("<none>")
            val hint = s"${j.hint.leftHint.flatMap(_.strategy).getOrElse("-")}/" +
              s"${j.hint.rightHint.flatMap(_.strategy).getOrElse("-")}"
            val leaves = (j.left.collectLeaves() ++ j.right.collectLeaves())
              .map(_.toString.linesIterator.next().take(60)).distinct.mkString(" ;; ")
            println(s"THETA\t$name\t${j.joinType}\t${sideTag(j.left)}\t${sideTag(j.right)}\t$hint\t$cond\t$leaves")
          }
        }
      } catch {
        case e: Throwable =>
          println(s"ERR\t$name\t${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
    }
    println("DONE")
    spark.stop()
  }
}
