package graft

import org.apache.spark.sql.SparkSession

/** Writes `explain("formatted")` output for selected queries to files —
  * the committed plan evidence for optimization rounds (plans/rNN).
  * Usage: runMain graft.PlanDump <outDir> <queryName ...>
  * Session config mirrors [[Bench]] (same master/shuffle partitions), so
  * the captured plan is the one the bench actually executes. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.head
    val names = args.tail.toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"$n.txt"),
        plan.getBytes("UTF-8"))
      println(s"PLANDUMP wrote $outDir/$n.txt")
      CacheHygiene.clear(spark)
    }
    spark.stop()
  }
}
