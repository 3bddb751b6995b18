package graft
import org.apache.spark.sql.SparkSession

/** Scratch timing harness: times a list of registered queries N times each
  * in one JVM (Bench-like session config, per-query min reported).
  * Usage: runMain graft.TimeMany <sfDir> <reps> <queryName ...> */
object TimeMany {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0); val reps = args(1).toInt; val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.codegen.cache.maxEntries", "4096")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // NonFatal only (r14 advice): swallowing OOM/linkage errors here would
    // let timing proceed against a broken session and report garbage.
    try { SparkEntry.entry(spark).count() }
    catch {
      case scala.util.control.NonFatal(e) =>
        System.err.println(s"TIMEMANY warmup failed: $e")
    }
    var total = 0.0
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val times = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        val t = (System.nanoTime() - t0) / 1e9
        CacheHygiene.clear(spark)
        t
      }
      total += times.min
      println(f"TIMEMANY $name min=${times.min}%.2f all=[${times.map(t => f"$t%.2f").mkString(", ")}]")
    }
    println(f"TIMEMANY total_min=$total%.2f over ${names.length} queries")
    spark.stop()
  }
}
