package graft.ops

import graft.{SparkEntry, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Interop + robustness for the baseline JPEG rung of the codec ladder:
  * the oracle proves our decoder against the closed-form synthesis; these
  * tests prove the WRITER against ImageIO's stock JPEG reader and our
  * DECODER against ImageIO-written streams (which pick their own quant
  * tables and emit nonzero AC coefficients — the general run-length path
  * our own encoder never exercises). */
class JpegSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("mm_jpeg_pixels: jpegAssets payloads decode identically under javax.imageio") {
    val payloads = Multimodal.jpegAssetsForTest(spark, TestSpark.sf)
      .orderBy("doc_id").limit(12).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]]("payload")).toMap
    val got = SparkEntry.queries("mm_jpeg_pixels")(spark, TestSpark.sf)
      .filter(col("doc_id") < 12).collect()
    assert(got.nonEmpty, "expected stats rows for the first docs")
    got.foreach { r =>
      val id = r.getLong(0)
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payloads(id)))
      assert(img != null, s"ImageIO must read doc $id as a JPEG")
      val w = img.getWidth; val h = img.getHeight
      var sum = 0L; var wsum = 0L
      var mn = Long.MaxValue; var mx = Long.MinValue
      for (y <- 0 until h; x <- 0 until w) {
        // raw raster sample — getRGB would route the gray value through
        // the linear-gray→sRGB colorspace conversion and gamma-shift it
        val v = img.getRaster.getSample(x, y, 0).toLong
        sum += v; wsum += (y.toLong * w + x) * v
        if (v < mn) mn = v; if (v > mx) mx = v
      }
      assert(r.getLong(2) == w.toLong * h, s"doc $id n_px")
      assert(r.getLong(3) == sum, s"doc $id sum_v vs ImageIO")
      assert(r.getLong(4) == wsum, s"doc $id wsum_v vs ImageIO")
      assert(r.getLong(5) == mn && r.getLong(6) == mx, s"doc $id min/max")
    }
  }

  test("decodeJpegImage reads JPEGs written by ImageIO (foreign tables, real ACs)") {
    // A non-flat gradient forces nonzero AC coefficients through the
    // general (run,size) loop and ImageIO's own quant/Huffman tables.
    // JPEG is lossy and T.81 does not mandate a bit-exact IDCT, so the
    // cross-decoder check is ±1 per pixel — still fatal for any block
    // ordering, zigzag, dequant or transform-orientation slip (those
    // diverge by tens of levels).
    val w = 32; val h = 24
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until h; x <- 0 until w) {
      val v = (x * 5 + y * 3) % 256
      img.getRaster.setSample(x, y, 0, v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", bos))
    val bytes = bos.toByteArray
    val dec = Multimodal.decodeJpegForTest(bytes)
    assert(dec.isDefined, "our decoder must accept the ImageIO stream")
    val (dw, dh, px) = dec.get
    assert(dw == w && dh == h)
    val ref = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    var maxDiff = 0
    for (y <- 0 until h; x <- 0 until w) {
      val theirs = ref.getRaster.getSample(x, y, 0)
      val ours = px(y * w + x)
      maxDiff = math.max(maxDiff, math.abs(theirs - ours))
    }
    assert(maxDiff <= 1,
      s"cross-decoder pixel drift $maxDiff > 1 (IDCT/zigzag/dequant slip)")
  }

  test("decodeJpegImage rejects malformed streams instead of crashing") {
    val good = Multimodal.jpegAssetsForTest(spark, TestSpark.sf)
      .orderBy("doc_id").limit(1).collect()(0).getAs[Array[Byte]]("payload")
    assert(Multimodal.decodeJpegForTest(good).isDefined)
    assert(Multimodal.decodeJpegForTest(Array[Byte]()).isEmpty, "empty")
    assert(Multimodal.decodeJpegForTest(good.slice(0, 2)).isEmpty, "SOI only")
    assert(Multimodal.decodeJpegForTest(good.slice(0, good.length / 2)).isEmpty,
      "truncated mid-header")
    val noSoi = good.clone(); noSoi(1) = 0x00
    assert(Multimodal.decodeJpegForTest(noSoi).isEmpty, "bad SOI")
    // PNG bytes through the JPEG decoder must reject cleanly.
    val png = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    assert(Multimodal.decodeJpegForTest(png).isEmpty, "foreign container")
  }
}
