package graft.sources

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** §2.1 long-lived-dataset concerns: schema evolution across file
  * generations and output file-count control — both are what actually
  * breaks multi-year 100-TB datasets (readers hitting mixed schemas;
  * writers drowning the namenode in small files). */
class EvolutionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("schema evolution: mergeSchema unions generations, old rows get nulls") {
    val dir = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    val v1 = Tables.nation(spark, TestSpark.sf)
      .select(col("n_nationkey"), col("n_name"))
    val v2 = Tables.nation(spark, TestSpark.sf)
      .select(col("n_nationkey"), col("n_name"),
        lit("2024-06-01").cast("date").as("ingest_date"))
    v1.write.parquet(s"$dir/gen=1")
    v2.write.parquet(s"$dir/gen=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet ==
      Set("n_nationkey", "n_name", "ingest_date", "gen"))
    val n = v1.count()
    assert(merged.count() == 2 * n)
    // generation-1 rows surface the evolved column as null, not an error
    assert(merged.filter(col("gen") === 1 && col("ingest_date").isNull)
      .count() == n)
    assert(merged.filter(col("gen") === 2 && col("ingest_date").isNotNull)
      .count() == n)
  }

  test("small-file control: maxRecordsPerFile bounds file sizes at write") {
    val dir = java.nio.file.Files.createTempDirectory("graft_files").toString
    Tables.orders(spark, TestSpark.sf)
      .repartition(1) // worst case: everything lands on one writer task
      .write.mode("overwrite").option("maxRecordsPerFile", 500).parquet(dir)
    val files = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val total = Tables.orders(spark, TestSpark.sf).count()
    assert(files.length >= (total / 500).toInt,
      s"expected ≥ ${total / 500} files, got ${files.length}")
    files.foreach { f =>
      val n = spark.read.parquet(f.getAbsolutePath).count()
      assert(n <= 500, s"${f.getName} has $n rows > maxRecordsPerFile")
    }
    // and the converse knob: coalesce to exactly one output file
    val dir2 = java.nio.file.Files.createTempDirectory("graft_onefile").toString
    Tables.region(spark, TestSpark.sf).coalesce(1)
      .write.mode("overwrite").parquet(dir2)
    assert(new java.io.File(dir2).listFiles()
      .count(_.getName.endsWith(".parquet")) == 1)
  }
}
