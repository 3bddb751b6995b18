package graft.pii

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

class RedactSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sample = Seq(
    (1L, "Alice Smith", 10.5, "A"),
    (2L, "Bob Jones", -3.0, "B"),
    (3L, null, 7.0, null),
  ).toDF("id", "name", "bal", "tag")

  test("Drop removes column and nothing else") {
    val out = Redact(sample, Seq(Redact.Drop("name")))
    assert(out.columns.toSeq == Seq("id", "bal", "tag"))
    assert(out.count() == 3)
  }

  test("Nullify keeps type, nulls values") {
    val out = Redact(sample, Seq(Redact.Nullify("bal")))
    assert(out.schema("bal").dataType == DoubleType)
    assert(out.filter(col("bal").isNotNull).count() == 0)
  }

  test("HashPseudonym is stable, salted, and null-preserving") {
    val out = Redact(sample, Seq(Redact.HashPseudonym("name", "s1")))
      .select("name").as[String].collect()
    val out2 = Redact(sample, Seq(Redact.HashPseudonym("name", "s1")))
      .select("name").as[String].collect()
    val diffSalt = Redact(sample, Seq(Redact.HashPseudonym("name", "s2")))
      .select("name").as[String].collect()
    assert(out.toSeq == out2.toSeq)                      // deterministic
    assert(out.toSeq != diffSalt.toSeq)                  // salt matters
    assert(out.forall(v => v == null || v.length == 64)) // hex sha-256
    // concat_ws skips null input → hash of salt alone; acceptable: stays masked
  }

  test("PartialMask keeps last k, masks rest, handles short and null") {
    val df = Seq("abcdef", "ab", null).toDF("v")
    val got = Redact(df, Seq(Redact.PartialMask("v", 4)))
      .as[String].collect().toSeq
    assert(got == Seq("**cdef", "ab", null))
  }

  test("PartialMask is idempotent for strings longer than keep") {
    val once = Redact.partialMaskColumn(col("v"), 4)
    val df = Seq("abcdefgh").toDF("v").select(once.as("v"))
    val twice = df.select(Redact.partialMaskColumn(col("v"), 4).as("v"))
    assert(df.as[String].head() == twice.as[String].head())
  }

  test("When masks only matching rows") {
    val out = Redact(sample,
        Seq(Redact.When("name", col("bal") < 0, lit("X"))))
      .select("name").as[String].collect().toSeq
    assert(out == Seq("Alice Smith", "X", null))
  }

  test("unknown path fails closed") {
    intercept[IllegalArgumentException] {
      Redact(sample, Seq(Redact.Drop("nope")))
    }
    intercept[IllegalArgumentException] {
      Redact(sample, Seq(Redact.Drop("name.inner")))
    }
  }

  test("redacts fields inside arrays of structs, preserving null elements") {
    val df = Seq(1L, 2L).toDF("id").select($"id",
      when($"id" === 1L, array(
        struct(lit("a@x.com").as("email"), lit(7).as("n")),
        struct(lit("b@y.org").as("email"), lit(9).as("n"))))
        .as("contacts"))
    val out = Redact(df, Seq(
      Redact.HashPseudonym("contacts.email", "s"),
      Redact.Drop("contacts.n")))
    val t = out.schema("contacts").dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType]
    assert(t.fieldNames.toSeq == Seq("email"))
    val rows = out.orderBy("id").collect()
    val first = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(first.length == 2 && first.forall(_.getString(0).length == 64))
    assert(rows(1).isNullAt(1))
  }

  test("nested drop + mask rebuilds struct, preserves null struct rows") {
    val df = sample.select($"id",
      when($"id" =!= 3L,
        struct($"name".as("n"), struct($"bal".as("b"), $"tag".as("t")).as("fin")))
        .as("p"))
    val out = Redact(df, Seq(
      Redact.Drop("p.n"), Redact.Nullify("p.fin.b")))
    val pType = out.schema("p").dataType.asInstanceOf[StructType]
    assert(pType.fieldNames.toSeq == Seq("fin"))
    val finType = pType("fin").dataType.asInstanceOf[StructType]
    assert(finType.fieldNames.toSeq == Seq("b", "t"))
    val rows = out.orderBy("id").collect()
    assert(rows(2).isNullAt(1))                       // null struct stayed null
    val fin = rows(0).getStruct(1).getStruct(0)
    assert(fin.isNullAt(0) && fin.getString(1) == "A") // b nulled, t kept
  }
}
