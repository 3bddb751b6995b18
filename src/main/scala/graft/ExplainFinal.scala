package graft

import org.apache.spark.sql.SparkSession

/** Plan auditor for ADAPTIVE plans: executes the query first, then prints
  * the post-execution plan — the only view that shows AQE's runtime
  * decisions (exchange/stage reuse, skew splits, runtime join demotions),
  * which `Explain`'s static `isFinalPlan=false` print cannot.
  * Usage: runMain graft.ExplainFinal <queryName> [sfDir] */
object ExplainFinal {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sf)
    // collect() (not count()) — count() wraps the plan in a NEW query
    // execution, leaving THIS one unexecuted (isFinalPlan=false forever).
    df.collect()
    println(s"\n========== $name (post-execution) ==========")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
