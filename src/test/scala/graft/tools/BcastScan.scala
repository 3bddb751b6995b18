package graft.tools

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, GlobalLimit, Join, LocalRelation, LogicalPlan, Range => LRange}

/** Scratch scanner: every broadcast-hinted join side in every registered
  * plan that is NOT structurally bounded (limit/agg/literal), with its row
  * count at two scale factors — a side whose count GROWS with sf is a
  * corpus-proportional broadcast, i.e. a latent OOM at 100×, even on an
  * equi join the theta audit exempts. */
object BcastScan {
  private def bounded(p: LogicalPlan): Boolean =
    p.collectFirst {
      case l: GlobalLimit => l; case a: Aggregate => a
      case l: LocalRelation => l; case r: LRange => r
    }.nonEmpty

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sfA = "/root/testdata/sf0.001"
    val sfB = "/root/testdata/sf0.01"
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        def sides(sf: String): Seq[(String, LogicalPlan)] = {
          val lp = fn(spark, sf).queryExecution.optimizedPlan
          lp.collect { case j: Join => j }.flatMap { j =>
            def isBcast(h: Option[org.apache.spark.sql.catalyst.plans.logical.HintInfo]) =
              h.flatMap(_.strategy).contains(
                org.apache.spark.sql.catalyst.plans.logical.BROADCAST)
            Seq(
              if (isBcast(j.hint.leftHint) && !bounded(j.left))
                Some("L" -> j.left) else None,
              if (isBcast(j.hint.rightHint) && !bounded(j.right))
                Some("R" -> j.right) else None).flatten
          }
        }
        val a = sides(sfA)
        if (a.nonEmpty) {
          val b = sides(sfB)
          a.zipAll(b, null, null).zipWithIndex.foreach { case ((sa, sb), i) =>
            if (sa != null && sb != null) {
              val na = GraftBridge.ofRows(spark, sa._2).count()
              val nb = GraftBridge.ofRows(spark, sb._2).count()
              val leaves = sa._2.collectLeaves().map(
                _.toString.linesIterator.next().take(50)).distinct.mkString(";")
              val grows = if (nb > 2 * na) "GROWS" else "const"
              println(s"BCAST\t$name\t#$i${sa._1}\t$na\t$nb\t$grows\t$leaves")
            }
          }
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
