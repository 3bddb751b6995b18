package graft.tools
import org.apache.spark.sql.SparkSession
object OneQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.SparkEntry.entry(spark).count() // warm
    for (name <- args.drop(1)) {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, args(0)).count()
      println(f"TIME $name ${(System.nanoTime()-t0)/1e9}%.2f")
      val t1 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, args(0)).count()
      println(f"TIME2 $name ${(System.nanoTime()-t1)/1e9}%.2f")
    }
    spark.stop()
  }
}
