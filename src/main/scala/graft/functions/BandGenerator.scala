package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom table-generating function (UDTF, SURVEY.md §2.12): explodes a
  * MinHash signature array into its `nBands` LSH band rows
  * `(band: int, sig: bigint)` in one per-row loop.
  *
  * This replaces the `posexplode(transform(sequence(...), b ->
  * xxhash64(element_at(mh, 2b+1), element_at(mh, 2b+2))))` pipeline: four
  * nested interpreted constructs and two array materializations per row
  * become a single Generator emitting rows directly. Like the other graft
  * kernels it is CodegenFallback — the win is the plain JVM loop per ROW,
  * not per element (see TextExpressions Scaladoc for the measured cost of
  * interpreted HOF lambdas).
  *
  * The band signature is a splitmix64-chained hash of the band's rows
  * seeded with the band index. Bucket semantics depend only on EQUALITY of
  * (band, sig) — two docs collide iff their band rows are equal (modulo a
  * ~2⁻⁶⁴ hash collision) — so any well-mixed chain hash yields the same
  * candidate set as the previous xxhash64 form.
  *
  * Rows per band = |signature| / nBands; a trailing remainder (signature
  * not divisible by nBands) is rejected at analysis time. NULL or
  * too-short signatures generate zero rows (standard Generator contract,
  * matching `explode` of NULL).
  */
case class MinHashBands(child: Expression, nBands: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("band", IntegerType, nullable = false),
    StructField("sig", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) if nBands > 0 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_bands expects array<bigint> and nBands > 0, got " +
        s"${child.dataType.simpleString} / $nBands")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < nBands) return Nil
    val per = arr.numElements() / nBands
    val out = new Array[InternalRow](nBands)
    var b = 0
    while (b < nBands) {
      var h = TextHashing.mix64(b.toLong)
      var r = 0
      while (r < per) {
        h = TextHashing.mix64(h ^ arr.getLong(b * per + r))
        r += 1
      }
      out(b) = InternalRow(b, h)
      b += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
