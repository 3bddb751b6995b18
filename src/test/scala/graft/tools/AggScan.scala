package graft.tools

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan}
import org.apache.spark.sql.functions.{col, count, lit, max}

/** Scratch scanner: every logical Aggregate that BUFFERS its group
  * (collect_list / collect_set) over a not-already-reduced input, with the
  * max group size at two scale factors — a buffered group that grows with
  * the corpus is executor-memory-proportional state at 100×. */
object AggScan {
  private def reduced(p: LogicalPlan): Boolean =
    p.collectFirst { case a: Aggregate => a; case l: GlobalLimit => l }.nonEmpty

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfA = "/root/testdata/sf0.001"
    val sfB = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        def aggs(sf: String): Seq[(Seq[String], LogicalPlan)] =
          fn(spark, sf).queryExecution.optimizedPlan.collect {
            case a: Aggregate if !reduced(a.child) &&
              a.aggregateExpressions.exists(_.collectFirst {
                case e: AggregateExpression
                  if e.aggregateFunction.isInstanceOf[CollectList] ||
                    e.aggregateFunction.isInstanceOf[CollectSet] => e
              }.nonEmpty) =>
              val keys = a.groupingExpressions.flatMap {
                case at: Attribute => Some(at.name)
                case _ => None
              }
              (keys, a.child)
          }
        val a = aggs(sfA)
        if (a.nonEmpty) {
          val b = aggs(sfB)
          def mx(keys: Seq[String], child: LogicalPlan): Long = {
            val df = GraftBridge.ofRows(spark, child)
            if (keys.isEmpty) df.count()
            else df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
              .agg(max(col("c"))).head.getLong(0)
          }
          // Pairwise only when the key SEQUENCES agree — a positional
          // zip after an inserted/removed aggregate shifts later pairs
          // and can compare wrong subtrees with coincidentally equal
          // keys (r12 review). Whole-query marker on any divergence.
          if (a.map(_._1) == b.map(_._1))
            a.zip(b).zipWithIndex.foreach { case (((ka, ca), (_, cb)), i) =>
              val ma = mx(ka, ca)
              val mb = mx(ka, cb)
              val grows = if (mb > 4 * math.max(ma, 1L)) "GROWS" else "const"
              println(s"AGG\t$name\t#$i\t[${ka.mkString(",")}]\t$ma\t$mb\t$grows")
            }
          else
            println(s"AGG\t$name\t-\tMISMATCH[" +
              s"${a.map(_._1.mkString(",")).mkString(";")}|" +
              s"${b.map(_._1.mkString(",")).mkString(";")}]\t-\t-\tCHECK")
        }
      } catch {
        case e: Throwable =>
          println(s"ERR\t$name\t${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    println("DONE")
    spark.stop()
  }
}
