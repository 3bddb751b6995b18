package graft

import org.apache.spark.sql.SparkSession

/** Debug runner: execute a single registered query.
  * Usage: runMain graft.RunOne <queryName> [sfDir] [show] */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val df = SparkEntry.queries(name)(spark, sf)
    val n = df.count()
    println(f"RUNONE $name rows=$n secs=${(System.nanoTime() - t0) / 1e9}%.2f")
    if (args.contains("show")) df.show(20, truncate = false)
    spark.stop()
  }
}
