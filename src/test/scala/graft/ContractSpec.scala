package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants that must hold for every registered query. */
class ContractSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("query names are globally unique across modules") {
    val all = SparkEntry.modules.flatMap(_.queries.keys)
    assert(all.size == all.distinct.size,
      s"duplicates: ${all.diff(all.distinct)}")
  }

  test("every oracleSql key has a matching query") {
    val q = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- q
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry returns rows (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query runs at sf0.001 and returns a deterministic row count") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n1 = fn(spark, TestSpark.sf).count()
      val n2 = fn(spark, TestSpark.sf).count()
      assert(n1 == n2, s"$name nondeterministic count")
      assert(n1 > 0, s"$name returned no rows at sf0.001")
    }
  }
}
