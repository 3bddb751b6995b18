package graft
import org.apache.spark.sql.SparkSession

/** Scratch timing harness: times one registered query N times.
  * Usage: runMain graft.TimeOne <queryName> <sfDir> <reps> */
object TimeOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, reps) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => () }
    val fn = SparkEntry.queries(name)
    (1 to reps.toInt).foreach { i =>
      val t0 = System.nanoTime()
      val n = fn(spark, sfDir).count()
      println(f"TIME $name rep$i ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
