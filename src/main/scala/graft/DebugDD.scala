package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch: stage-by-stage timing breakdown of dd_clusters. */
object DebugDD {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    graft.functions.TextFunctions.register(spark)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"STAGE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warm
    Tables.documents(spark, d).count()
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val docs = Tables.documents(spark, d)
        .select(col("doc_id"), col("lang"), col("source"),
          graft.functions.TextFunctions.shingles2(col("text")).as("bg"))
        .filter(size(col("bg")) >= 1)
      val sized = docs.select(col("doc_id"), col("lang"), col("source"),
        col("bg"), size(col("bg")).as("sz"))
      val t = 0.1
      val prefLen = (col("sz") - ceil(col("sz") * lit(t)).cast("int") + 1)
      val pref = sized.select(col("lang"), col("source"), col("doc_id"),
        col("sz"), explode(slice(col("bg"), lit(1), prefLen)).as("tok"))
      val nPref = time("prefix_explode_count")(pref.count())
      val cand = pref
        .select(col("lang"), col("source"), col("tok"),
          col("doc_id").as("a_id"), col("sz").as("a_sz"))
        .join(pref.select(col("lang"), col("source"), col("tok"),
          col("doc_id").as("b_id"), col("sz").as("b_sz")),
          Seq("lang", "source", "tok"))
        .filter(col("a_id") < col("b_id") &&
          least(col("a_sz"), col("b_sz")).cast("double") >=
            greatest(col("a_sz"), col("b_sz")) * lit(t))
        .select(col("a_id"), col("b_id")).distinct()
      val nCand = time("candidates")(cand.count())
      val inter = graft.functions.GraftFunctions
        .sortedIntersect(col("a_bg"), col("b_bg"))
      val edges = cand
        .join(docs.select(col("doc_id").as("a_id"), col("bg").as("a_bg")), "a_id")
        .join(docs.select(col("doc_id").as("b_id"), col("bg").as("b_bg")), "b_id")
        .filter(inter.cast("double") /
          (size(col("a_bg")) + size(col("b_bg")) - inter) >= t)
        .select(col("a_id"), col("b_id"))
      val nEdges = time("verified_edges")(edges.count())
      println(s"COUNTS pref=$nPref cand=$nCand edges=$nEdges")
      time("full_dd_clusters")(SparkEntry.queries("dd_clusters")(spark, d).count())
    }
    spark.stop()
  }
}
