package graft.tools

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}

/** Scratch scanner: dump every unpartitioned logical Window across the
  * registered catalog with its child's output columns — the raw material
  * for the global no-corpus-scale-unpartitioned-window invariant. */
object WinScan {
  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = if (args.nonEmpty) args(0) else TestSpark.sf
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val lp = fn(spark, sf).queryExecution.optimizedPlan
        lp.collect { case w: LWindow if w.partitionSpec.isEmpty => w }
          .foreach { w =>
            val cols = w.child.output.map(_.name).mkString(",")
            println(s"UNPART\t$name\t[$cols]")
          }
      } catch {
        case e: Throwable => println(s"ERR\t$name\t${e.getClass.getSimpleName}: ${e.getMessage.take(120)}")
      }
    }
    println("DONE")
    spark.stop()
  }
}
