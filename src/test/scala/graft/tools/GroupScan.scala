package graft.tools

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.Attribute
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, LogicalPlan, Window => LWindow}
import org.apache.spark.sql.functions.{col, count, lit, max}

/** Scratch scanner: per-partition row counts of every PARTITIONED logical
  * Window whose input is not already aggregate/limit-reduced, at two scale
  * factors — a window whose max rows-per-partition GROWS with sf sorts a
  * corpus-proportional slice inside ONE task at 100× (the straggler class
  * the unpartitioned-window audit cannot see). */
object GroupScan {
  private def reduced(p: LogicalPlan): Boolean =
    p.collectFirst { case a: Aggregate => a; case l: GlobalLimit => l }.nonEmpty

  private def maxPerGroup(keys: Seq[String], child: LogicalPlan): Long = {
    val df = GraftBridge.ofRows(TestSpark.spark, child)
    if (keys.isEmpty) df.count()
    else df.groupBy(keys.map(col): _*).agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).head.getLong(0)
  }

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfA = "/root/testdata/sf0.001"
    val sfB = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        def wins(sf: String): Seq[(Seq[String], LogicalPlan)] =
          fn(spark, sf).queryExecution.optimizedPlan.collect {
            case w: LWindow if w.partitionSpec.nonEmpty && !reduced(w.child) =>
              val keys = w.partitionSpec.flatMap {
                case a: Attribute => Some(a.name)
                case _ => None
              }
              (keys, w.child)
          }
        val a = wins(sfA)
        if (a.nonEmpty) {
          val b = wins(sfB)
          // Pairwise comparison is only sound when the two plans list the
          // SAME window keys in the SAME order — one inserted/removed
          // window at one sf shifts every later pair, and a shifted pair
          // with coincidentally equal keys would print a plausible wrong
          // row (r12 review). Whole-query marker on any divergence.
          if (a.map(_._1) == b.map(_._1))
            a.zip(b).zipWithIndex.foreach { case (((ka, ca), (_, cb)), i) =>
              val ma = maxPerGroup(ka, ca)
              val mb = maxPerGroup(ka, cb)
              val grows = if (mb > 4 * math.max(ma, 1L)) "GROWS" else "const"
              println(s"WIN\t$name\t#$i\t[${ka.mkString(",")}]\t$ma\t$mb\t$grows")
            }
          else
            println(s"WIN\t$name\t-\tMISMATCH[" +
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
