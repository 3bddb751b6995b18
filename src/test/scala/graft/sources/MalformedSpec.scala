package graft.sources

import graft.TestSpark
import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Malformed-input policy for file ingestion (§2.1): at 100 TB a handful
  * of corrupt rows MUST NOT kill the job, and must be quarantinable.
  * Covers the three Spark parse modes on CSV and corrupt-record capture
  * on JSON. */
class MalformedSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("price", DoubleType)))

  private def csvDir(): String = {
    val dir = Files.createTempDirectory("graft_bad").toString
    Files.write(java.nio.file.Paths.get(dir, "data.csv"),
      "1,10.5\n2,oops\n3,30.0\n".getBytes("UTF-8"))
    dir
  }

  test("PERMISSIVE keeps bad rows as nulls and captures the raw record") {
    val dir = csvDir()
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val df = spark.read.schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(dir)
      .cache()   // corrupt-record column requires a materialized read
    assert(df.count() == 3)
    val bad = df.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() == 1 && bad.head().getAs[String]("_corrupt_record") == "2,oops")
    df.unpersist()
  }

  test("DROPMALFORMED silently drops the bad row") {
    val df = spark.read.schema(schema)
      .option("mode", "DROPMALFORMED").csv(csvDir())
    assert(df.collect().map(_.getLong(0)).toSet == Set(1L, 3L))
  }

  test("FAILFAST raises on the bad row") {
    val ex = intercept[Exception] {
      spark.read.schema(schema)
        .option("mode", "FAILFAST").csv(csvDir()).collect()
    }
    assert(ex.toString.toLowerCase.contains("malformed") ||
      ex.getCause != null)
  }

  test("JSON corrupt-record capture quarantines unparseable lines") {
    val dir = Files.createTempDirectory("graft_badjson").toString
    Files.write(java.nio.file.Paths.get(dir, "data.json"),
      """{"id": 1, "price": 10.5}
        |not json at all
        |{"id": 3, "price": 30.0}
        |""".stripMargin.getBytes("UTF-8"))
    val withCorrupt = StructType(schema.fields :+
      StructField("_corrupt_record", StringType))
    val df = spark.read.schema(withCorrupt).json(dir).cache()
    assert(df.count() == 3)
    assert(df.filter(col("_corrupt_record").isNotNull).count() == 1)
    df.unpersist()
  }
}
