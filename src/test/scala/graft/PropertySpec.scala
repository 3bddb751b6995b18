package graft

import graft.functions.TextHashing
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck properties (SURVEY.md §5.2): masking idempotence, hashing
  * determinism, shingle/minhash semantics. Driver-level determinism is
  * separately covered by the oracle gate; these pin the pure kernels. */
class PropertySpec extends AnyFunSuite {

  /** Manual deterministic forAll (scalatestplus bridge not on classpath —
    * offline cache only has scalatest + scalacheck). */
  private def forAll[A](g: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      f(g.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }
  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)
      (f: (A, B) => Unit): Unit =
    (0 until n).foreach { i =>
      f(ga.pureApply(Gen.Parameters.default, Seed(i.toLong)),
        gb.pureApply(Gen.Parameters.default, Seed(1000L + i)))
    }

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val doc = Gen.listOf(word).map(_.mkString(" "))

  test("partial-mask semantics: length preserved, only last k visible") {
    forAll2(Gen.asciiPrintableStr, Gen.choose(1, 8)) { (s: String, k: Int) =>
      val masked =
        if (s.length <= k) s
        else "*" * (s.length - k) + s.takeRight(k)
      // the column implementation mirrors this spec; RedactSpec drives the
      // DataFrame path — here we pin the contract itself
      assert(masked.length == s.length)
      assert(masked.takeRight(math.min(k, s.length)) ==
        s.takeRight(math.min(k, s.length)))
    }
  }

  test("shingle hash set: deterministic, order-sorted, distinct") {
    forAll(doc) { d =>
      val a = TextHashing.shingleHashSet(UTF8String.fromString(d), 3)
      val b = TextHashing.shingleHashSet(UTF8String.fromString(d), 3)
      assert(a.toSeq == b.toSeq)
      assert(a.toSeq == a.toSeq.sorted)
      assert(a.length == a.distinct.length)
    }
  }

  test("shingle sets: identical docs → Jaccard 1; disjoint vocab → 0") {
    forAll(Gen.listOfN(5, word).map(_.mkString(" "))) { d =>
      val a = TextHashing.shingleHashSet(UTF8String.fromString(d), 3)
      val upper = d.split("\\s+").filter(_.nonEmpty).map(_ + "zzz").mkString(" ")
      val b = TextHashing.shingleHashSet(UTF8String.fromString(upper), 3)
      assert(a.intersect(a).length == a.length)
      assert(a.intersect(b).isEmpty)
    }
  }

  test("mix64 is injective-ish and deterministic on a dense range") {
    val xs = (0L until 10000L).map(TextHashing.mix64)
    assert(xs.distinct.size == xs.size)
    assert(xs == (0L until 10000L).map(TextHashing.mix64))
  }

  test("minhash signature agreement estimates Jaccard (statistical)") {
    // two docs sharing a known fraction of shingles: signature agreement
    // should land near the true Jaccard for a 128-fn signature
    val shared = (1 to 60).map(i => s"shared$i word$i tail$i").mkString(" ")
    val extraA = (1 to 20).map(i => s"onlya$i worda$i taila$i").mkString(" ")
    val extraB = (1 to 20).map(i => s"onlyb$i wordb$i tailb$i").mkString(" ")
    val sa = TextHashing.shingleHashSet(UTF8String.fromString(s"$shared $extraA"), 3)
    val sb = TextHashing.shingleHashSet(UTF8String.fromString(s"$shared $extraB"), 3)
    val trueJ = sa.intersect(sb).length.toDouble /
      (sa.length + sb.length - sa.intersect(sb).length)
    val k = 128
    val seeds = Array.tabulate(k)(i => TextHashing.mix64(0x9e3779b97f4a7c15L * (i + 1)))
    def sig(set: Array[Long]): Array[Long] =
      seeds.map(s => set.map(h => TextHashing.mix64(h ^ s)).min)
    val agree = sig(sa).zip(sig(sb)).count { case (x, y) => x == y }.toDouble / k
    assert(math.abs(agree - trueJ) < 0.15, s"agree=$agree trueJ=$trueJ")
  }

  test("TopK64 is partition-invariant: any split + merge order = global sort cut") {
    // dd_lsh_recall's per-block sample determinism rests on this: the
    // bounded-heap aggregate must yield the identical 64 entries no
    // matter how Spark partitions the input or orders the partial
    // merges (ties included — value collisions resolve by id).
    import graft.functions.{TopK64, TopKEntry}
    val entries = Gen.listOf(for {
      v <- Gen.choose(-50, 50) // narrow range forces value ties
      id <- Gen.choose(0L, 5000L)
    } yield TopKEntry(v.toDouble, id)).map(_.distinct)
    forAll2(entries, Gen.choose(1, 7), n = 60) { (es, parts) =>
      val expected = es.sortWith((a, b) =>
        a.value > b.value || (a.value == b.value && a.id < b.id)).take(64)
      // deal round-robin into `parts` partitions, reduce each, then merge
      // in a rotated (non-left-to-right) order
      val bufs = (0 until parts).map(p =>
        es.zipWithIndex.collect { case (e, i) if i % parts == p => e }
          .foldLeft(TopK64.zero)(TopK64.reduce))
      val rotated = bufs.drop(parts / 2) ++ bufs.take(parts / 2)
      val merged = rotated.foldLeft(TopK64.zero)(TopK64.merge)
      assert(TopK64.finish(merged) == expected,
        s"split/merge diverged for n=${es.length}, parts=$parts")
    }
  }
}
