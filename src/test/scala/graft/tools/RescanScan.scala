package graft.tools

import graft.{SparkEntry, TestSpark}

/** Scratch scanner: queries whose FINAL (post-execution, AQE-resolved)
  * plan scans the same fact table more than once — multi-consumed frames
  * whose subtree clones diverged (usually a pushed filter), defeating
  * exchange reuse: each extra scan is a full table read at 100×.
  * Deliberate self-joins also show up; classify by hand. */
object RescanScan {
  private val facts =
    Seq("lineitem", "orders", "events", "documents", "embeddings", "customer", "part")

  def main(args: Array[String]): Unit = {
    val spark = TestSpark.spark
    val sf = if (args.nonEmpty) args(0) else TestSpark.sf
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sf)
        df.collect()
        val p = df.queryExecution.executedPlan.toString
        // Count scans in the FINAL plan only (cut the AQE "Initial Plan"
        // section if present).
        val cut = p.indexOf("== Initial Plan ==")
        val finalP = if (cut >= 0) p.substring(0, cut) else p
        val counts = facts.map { t =>
          t -> s"$t\\.parquet".r.findAllMatchIn(finalP).size
        }.filter(_._2 > 1)
        if (counts.nonEmpty)
          println(s"RESCAN\t$name\t${counts.map { case (t, n) => s"$t=$n" }.mkString(",")}")
      } catch {
        case e: Throwable =>
          println(s"ERR\t$name\t${e.getClass.getSimpleName}")
      }
    }
    println("DONE")
    spark.stop()
  }
}
