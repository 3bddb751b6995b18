package graft.sources

import graft.{Tables, TestSpark}
import java.nio.file.{Files, Paths}
import java.util.concurrent.CountDownLatch
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Drives [[TxnProtocol]]'s optimistic commit loop with genuinely racing
  * writers on one lake: both prepare disjoint compactions from snapshot
  * v0, race for v1, the loser rebases; a third stale writer whose
  * write-set overlaps a committed removal must abort. This is the
  * commit-atomicity contract under CONTENTION — the single-writer path is
  * oracle-gated by layout_time_travel / layout_vacuum / layout_cdf. */
class ConcurrencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("two disjoint compactions race: one claim each, both land, stale overlap aborts") {
    val root = Files.createTempDirectory("graft_occ_").toString
    val base = s"$root/base"
    val logDir = s"$root/log"
    Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"),
        floor(col("c_acctbal") * 100.0 + 0.5).cast("long").as("cents"),
        (col("c_custkey") % 4).as("fb"))
      .repartition(col("fb"))
      .write.mode("overwrite").partitionBy("fb").parquet(base)
    def baseDf = spark.read.option("basePath", base).parquet(base)
      .select(col("c_custkey"), col("cents"), col("fb").cast("long").as("fb"),
        col("_metadata.file_path").as("path"))
    // Commit 0 through the protocol.
    assert(TxnProtocol.claim(logDir, 0))
    baseDf.select(col("path")).distinct()
      .select(col("path"), lit("add").as("action"))
      .write.mode("overwrite").parquet(s"$logDir/v=0")
    val expected = baseDf.agg(count(lit(1)), sum(col("cents")))
      .collect().head
    val (nRows, totCents) = (expected.getLong(0), expected.getLong(1))

    // Both writers PREPARE from snapshot v0 (data files land before any
    // claim — invisible until a log version references them).
    case class Prepared(removes: DataFrame, adds: DataFrame, readV: Int)
    def prepare(tag: String, buckets: Seq[Int]): Prepared = {
      val epoch = s"$root/epoch_$tag"
      val mine = baseDf.filter(col("fb").isin(buckets.map(_.toLong): _*))
      mine.select(col("c_custkey"), col("cents"))
        .repartition(1)
        .write.mode("overwrite").parquet(epoch)
      val adds = spark.read.parquet(epoch)
        .select(input_file_name().as("path")).distinct()
        .select(col("path"), lit("add").as("action"))
      val removes = mine.select(col("path")).distinct()
        .select(col("path"), lit("remove").as("action"))
      Prepared(removes, adds, readV = 0)
    }
    val pa = prepare("a", Seq(0, 1))
    val pb = prepare("b", Seq(2, 3))

    // RACE: each writer loops claim → conflict-check → publish.
    val latch = new CountDownLatch(2)
    val claimedAt = new java.util.concurrent.ConcurrentHashMap[String, Int]()
    def commitLoop(tag: String, p: Prepared): Unit = {
      latch.countDown(); latch.await()
      var done = false
      while (!done) {
        val v = TxnProtocol.latest(logDir) + 1
        if (TxnProtocol.claim(logDir, v)) {
          assert(!TxnProtocol.removeConflicts(spark, logDir, p.readV, v - 1,
            p.removes), s"$tag rewrites disjoint buckets; rebase is safe")
          p.removes.unionByName(p.adds)
            .write.mode("overwrite").parquet(s"$logDir/v=$v")
          claimedAt.put(tag, v)
          done = true
        } // lost the claim: loop re-reads latest and rebases
      }
    }
    // Thrown assertions inside a Thread do not fail the suite on their
    // own — capture and rethrow after the join.
    val failure = new java.util.concurrent.atomic.AtomicReference[Throwable]()
    def runner(tag: String, p: Prepared) = new Thread(() =>
      try commitLoop(tag, p)
      catch { case t: Throwable => failure.compareAndSet(null, t); () })
    val ta = runner("a", pa)
    val tb = runner("b", pb)
    ta.start(); tb.start(); ta.join(120000); tb.join(120000)
    if (failure.get() != null) throw failure.get()
    assert(Set(claimedAt.get("a"), claimedAt.get("b")) == Set(1, 2),
      "exactly one writer wins each version")

    // Snapshot(2): both rewrites visible, nothing lost, files = 2 epochs.
    val log = spark.read.option("basePath", logDir).parquet(logDir)
      .select(col("path"), col("action"), col("v").cast("int").as("v"))
    def snapshot(ver: Int): DataFrame = {
      val adds = log.filter(col("v") <= ver && col("action") === "add")
        .select(col("path"))
      val removes = log.filter(col("v") <= ver && col("action") === "remove")
        .select(col("path"))
      val live = adds.join(removes, Seq("path"), "left_anti")
      val all = baseDf.select(col("c_custkey"), col("cents"), col("path"))
        .unionByName(Seq("a", "b").map { t =>
          spark.read.parquet(s"$root/epoch_$t")
            .withColumn("path", input_file_name())
        }.reduce(_ unionByName _))
      all.join(live, Seq("path"), "left_semi")
    }
    val s2 = snapshot(2).agg(count(lit(1)), sum(col("cents")),
      countDistinct(col("path"))).collect().head
    assert(s2.getLong(0) == nRows, "no row lost across the racing commits")
    assert(s2.getLong(1) == totCents)
    assert(s2.getLong(2) == 2, "live files are exactly the two epochs")
    // Time travel to v0 still works (nothing vacuumed).
    val s0 = snapshot(0).agg(count(lit(1)), sum(col("cents")))
      .collect().head
    assert(s0.getLong(0) == nRows && s0.getLong(1) == totCents)

    // Stale writer C prepared from v0 wants bucket 0 again — its
    // write-set overlaps a removal it never saw: must abort.
    val cRemoves = snapshot(0)
      .filter(col("c_custkey") % 4 === 0).select(col("path")).distinct()
    val v3 = TxnProtocol.latest(logDir) + 1
    assert(v3 == 3)
    assert(TxnProtocol.claim(logDir, v3), "claims are first-come")
    assert(TxnProtocol.removeConflicts(spark, logDir, 0, v3 - 1, cRemoves),
      "bucket 0's base file was removed at v1/v2 — C must see the conflict")
    // Abort = roll back the empty claim; the log is unchanged for readers.
    Files.delete(Paths.get(logDir, s"v=$v3"))
    assert(TxnProtocol.latest(logDir) == 2)
  }
}
