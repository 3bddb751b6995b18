package graft.ops

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic pins for the geo family: blocking completeness proven against
  * brute force, geohash encode against an independent interval-halving
  * reference, kNN ranking invariants, haversine against the closed formula.
  */
class GeoSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("geo_grid_join: grid blocking finds exactly the brute-force pair set") {
    import spark.implicits._
    val c = graft.Tables.customer(spark, TestSpark.sf)
      .select(col("c_nationkey"),
        expr("(c_custkey * 48271) % 1000000").as("x"),
        expr("(c_custkey * 69621) % 1000000").as("y"))
    val s = graft.Tables.supplier(spark, TestSpark.sf)
      .select(expr("(s_suppkey * 16807) % 1000000").as("sx"),
        expr("(s_suppkey * 39916801) % 1000000").as("sy"))
    // Brute force: the full cross product with the raw predicate.
    val brute = c.crossJoin(s)
      .filter((col("x") - col("sx")) * (col("x") - col("sx")) +
        (col("y") - col("sy")) * (col("y") - col("sy")) <= 2500000000L)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_pairs"))
      .as[(Int, Long)].collect().toMap
    val blocked = SparkEntry.queries("geo_grid_join")(spark, TestSpark.sf)
      .select(col("c_nationkey"), col("n_pairs"))
      .as[(Int, Long)].collect().toMap
    assert(blocked == brute, "cell blocking must lose no pair and add none")
    assert(blocked.values.sum > 0, "fixture sanity: some pairs in radius")
  }

  test("geo_geohash_cells: encode matches an independent interval-halving reference") {
    // Reference geohash (Niemeyer): successive bisection of the lon/lat
    // intervals, bits interleaved lon-first, 5 bits per base-32 char —
    // a different algorithm from the query's integer interleave.
    def refGeohash(lat: Double, lon: Double, chars: Int): String = {
      val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
      var (latLo, latHi, lonLo, lonHi) = (-90.0, 90.0, -180.0, 180.0)
      val bits = (0 until chars * 5).map { i =>
        if (i % 2 == 0) { // even bit index: longitude
          val mid = (lonLo + lonHi) / 2
          if (lon >= mid) { lonLo = mid; 1 } else { lonHi = mid; 0 }
        } else {
          val mid = (latLo + latHi) / 2
          if (lat >= mid) { latLo = mid; 1 } else { latHi = mid; 0 }
        }
      }
      bits.grouped(5).map(g => alpha(g.foldLeft(0)((a, b) => a * 2 + b)))
        .mkString
    }
    // Re-derive the query's encode for a handful of synthetic points and
    // compare against the reference on the same (lat, lon).
    val pts = Seq(1L, 37L, 999L, 123456L).map { k =>
      ((k * 48271) % 1000000, (k * 69621) % 1000000)
    }
    val enc = pts.map { case (x, y) =>
      spark.range(1).select(
        expr(s"${x}L").as("x"), expr(s"${y}L").as("y"))
        .selectExpr(
          "concat(" + (0 to 5).map { j =>
            val code = (0 to 14).map { i =>
              s"(shiftleft(shiftright((x * 32768) div 1000000, $i) & 1, ${2 * i + 1})" +
                s" + shiftleft(shiftright((y * 32768) div 1000000, $i) & 1, ${2 * i}))"
            }.mkString(" + ")
            s"substr('0123456789bcdefghjkmnpqrstuvwxyz', cast((shiftright($code, ${25 - 5 * j}) & 31) as int) + 1, 1)"
          }.mkString(", ") + ") as gh")
        .collect().head.getString(0)
    }
    pts.zip(enc).foreach { case ((x, y), gh) =>
      // Cell-interior lat/lon (quantization floors, so probe the cell's
      // own representative point: the quantized corner nudged inward).
      val lat = (y * 32768 / 1000000).toDouble / 32768 * 180 - 90 + 1e-9
      val lon = (x * 32768 / 1000000).toDouble / 32768 * 360 - 180 + 1e-9
      assert(refGeohash(lat, lon, 6) == gh,
        s"point ($x,$y) → ref ${refGeohash(lat, lon, 6)} vs query $gh")
    }
  }

  test("geo_knn: exactly 3 per supplier, distances nondecreasing in rank") {
    val rows = SparkEntry.queries("geo_knn")(spark, TestSpark.sf).collect()
    val bySup = rows.groupBy(_.getLong(0))
    assert(bySup.values.forall(_.length == 3))
    bySup.values.foreach { rs =>
      val byRank = rs.sortBy(_.getInt(1)).map(_.getLong(3))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a <= b },
        "d2 must be nondecreasing in rank")
    }
  }

  test("geo_density_clusters: labeling matches a local union-find over core cells") {
    val pts = graft.Tables.customer(spark, TestSpark.sf)
      .select(expr("(c_custkey * 48271) % 1000000").as("x"),
        expr("(c_custkey * 69621) % 1000000").as("y"))
      .collect().map(r => (r.getLong(0) / 125000, r.getLong(1) / 125000))
    val cells = pts.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = cells.values.sum
    val core = cells.filter { case (_, n) => n * 64 > total }
    // Union-find — a different algorithm from both the query's min-label
    // loop and the oracle's transitive closure.
    val ids = core.keys.toSeq.sortBy(c => c._1 * 256 + c._2)
    val parent = scala.collection.mutable.Map(ids.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) = {
      var r = c; while (parent(r) != r) r = parent(r); r
    }
    for (a <- ids; b <- ids
         if (a._1 - b._1).abs <= 1 && (a._2 - b._2).abs <= 1) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val expected = ids.groupBy(find).map { case (_, members) =>
      val mids = members.map(c => c._1 * 256 + c._2)
      (mids.min, members.length.toLong, members.map(core).sum,
        members.map(_._1).min, members.map(_._1).max,
        members.map(_._2).min, members.map(_._2).max)
    }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("geo_density_clusters")(spark, TestSpark.sf)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(core.nonEmpty, "fixture sanity: some cells must be core")
    assert(got == expected)
  }

  test("geo_trajectories: L1 metric invariants hold for every entity") {
    val rows = SparkEntry.queries("geo_trajectories")(spark, TestSpark.sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, path, maxHop, disp, straight) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(n >= 2)
      // Triangle inequality: net displacement never exceeds path length.
      assert(disp <= path, s"user ${r.getLong(0)}: disp $disp > path $path")
      assert(maxHop <= path)
      assert(straight >= 0 && straight <= 100)
      assert(path == 0 || straight == disp * 100 / path)
    }
    // Fixture sanity: someone actually wanders (straightness < 100).
    assert(rows.exists(_.getLong(5) < 100))
  }

  test("geo_point_in_polygon: ray-cast parity matches the convex half-plane test") {
    // Independent containment: the quads are convex and CCW by
    // construction, so a point is strictly inside iff it is strictly left
    // of EVERY edge — a different algorithm from the query's ray cast
    // (no parity, no straddle). Boundary lattice hits would make the two
    // definitions diverge, so first assert none exist at this sf.
    def polys: Seq[(Long, Seq[(Long, Long)])] = (0L to 24L).map { k =>
      val cx = (k * 93001 + 137) % 800000 + 100000
      val cy = (k * 71993 + 251) % 800000 + 100000
      val w = 30000 + (k % 5) * 10000
      val h = 25000 + (k % 7) * 8000
      k -> Seq((cx - w, cy - h / 2), (cx + w / 3, cy - h),
        (cx + w, cy + h / 3), (cx - w / 4, cy + h))
    }
    val pts = graft.Tables.customer(spark, TestSpark.sf)
      .select(col("c_custkey"),
        expr("(c_custkey * 48271) % 1000000").as("x"),
        expr("(c_custkey * 69621) % 1000000").as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    def cross(e1: (Long, Long), e2: (Long, Long), px: Long, py: Long): Long =
      (e2._1 - e1._1) * (py - e1._2) - (px - e1._1) * (e2._2 - e1._2)
    val expected = polys.map { case (pid, vs) =>
      val edges = vs.zip(vs.tail :+ vs.head)
      val sides = pts.map { case (k, px, py) =>
        k -> edges.map { case (a, b) => cross(a, b, px, py) }
      }
      assert(!sides.exists { case (_, cs) =>
        cs.contains(0L) && cs.forall(_ >= 0L) },
        s"polygon $pid: boundary lattice hit — the parity pin is ambiguous")
      val inside = sides.filter(_._2.forall(_ > 0L)).map(_._1)
      val area2 = math.abs(edges.map { case (a, b) =>
        a._1 * b._2 - b._1 * a._2 }.sum)
      (pid, inside.length.toLong, inside.sum, area2)
    }.filter(_._2 > 0)
    val got = SparkEntry.queries("geo_point_in_polygon")(spark, TestSpark.sf)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected.sortBy(_._1))
  }

  test("geo_haversine: matches the closed formula and the triangle inequality on a sample") {
    val rows = SparkEntry.queries("geo_haversine")(spark, TestSpark.sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2))
      .toMap
    def ref(k1: Int, k2: Int): Double = {
      def rad(x: Double) = math.toRadians(x)
      val (la1, lo1) = (k1 * 7.0 - 84.0, k1 * 14.0 - 168.0)
      val (la2, lo2) = (k2 * 7.0 - 84.0, k2 * 14.0 - 168.0)
      val sLat = math.sin((rad(la2) - rad(la1)) / 2)
      val sLon = math.sin((rad(lo2) - rad(lo1)) / 2)
      2 * 6371.0 * math.asin(math.sqrt(
        sLat * sLat + math.cos(rad(la1)) * math.cos(rad(la2)) * sLon * sLon))
    }
    val names = graft.Tables.nation(spark, TestSpark.sf)
      .select(col("n_nationkey"), col("n_name")).collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    for (a <- Seq(0, 5, 12); b <- Seq(13, 20, 24)) {
      val d = rows((names(a), names(b)))
      assert(math.abs(d - ref(a, b)) < 1e-5, s"($a,$b): $d vs ${ref(a, b)}")
    }
    // Triangle inequality through nation 12 (lat 0, lon 0).
    val d0_24 = rows((names(0), names(24)))
    assert(d0_24 <= rows((names(0), names(12))) + rows((names(12), names(24))) + 1e-6)
  }
}
