package graft.sources.v2

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** A complete custom DataSource V2 connector (SURVEY.md §2.12 — the last
  * Spark extension surface after Expression / Aggregator / Generator /
  * LogicalPlan+Strategy / Rule): `TableProvider` → `Table` →
  * `ScanBuilder` implementing BOTH `SupportsPushDownFilters` (range
  * predicates on `id` narrow the GENERATED range — the source never
  * produces a row the filter would drop; untranslatable or non-`id`
  * filters are returned as residuals for Spark to evaluate) and
  * `SupportsPushDownRequiredColumns` (only requested columns are
  * computed) → partitioned `Batch` whose readers stream `InternalRow`s.
  *
  * The table is a pure function of its options (`rows`, `parts`):
  * row i = (id=i, grp=i%97, v=(i·2654435761)%1000003, tag="t"+(i%5)) —
  * so a DuckDB `range()` oracle reproduces it exactly and the gate
  * hash-proves the whole connector stack, pushdown included (a pushdown
  * bug that dropped or duplicated boundary rows would change the hash).
  * `Scan.description` exposes the effective pushed range and pruned
  * columns, which PlanAuditSpec asserts from the physical plan. At scale
  * this is the connector contract that matters: predicates prune AT THE
  * SOURCE (never materialize-then-filter) and projection prunes columns
  * before they exist. */
class SyntheticProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticProvider.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SyntheticTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(65536L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(8))
}

object SyntheticProvider {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("grp", LongType, nullable = false),
    StructField("v", LongType, nullable = false),
    StructField("tag", StringType, nullable = false)))
}

class SyntheticTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_synthetic($rows)"
  override def schema(): StructType = SyntheticProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new SyntheticScanBuilder(rows, parts)
}

class SyntheticScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows - 1
  private var accepted: Array[Filter] = Array.empty
  private var required: StructType = SyntheticProvider.schema

  private def asLong(v: Any): Option[Long] = v match {
    case n: java.lang.Number => Some(n.longValue())
    case _ => None
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val residual = Array.newBuilder[Filter]
    val ok = Array.newBuilder[Filter]
    filters.foreach { f =>
      val handled = f match {
        case GreaterThan("id", v) => asLong(v).map(l => lo = math.max(lo, l + 1))
        case GreaterThanOrEqual("id", v) => asLong(v).map(l => lo = math.max(lo, l))
        case LessThan("id", v) => asLong(v).map(l => hi = math.min(hi, l - 1))
        case LessThanOrEqual("id", v) => asLong(v).map(l => hi = math.min(hi, l))
        case EqualTo("id", v) =>
          asLong(v).map(l => { lo = math.max(lo, l); hi = math.min(hi, l) })
        case _ => None
      }
      if (handled.isDefined) ok += f else residual += f
    }
    accepted = ok.result()
    residual.result()
  }
  override def pushedFilters(): Array[Filter] = accepted
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new SyntheticScan(lo, hi, parts, required)
}

/** end-inclusive generated range [lo, hi], split into `parts` slices. */
class SyntheticScan(lo: Long, hi: Long, parts: Int, required: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft_synthetic pushedRange=[$lo,$hi] " +
      s"cols=[${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(0L, hi - lo + 1)
    if (n == 0) Array.empty
    else {
      val p = math.min(parts.toLong, n).toInt
      (0 until p).map { i =>
        val s = lo + n * i / p
        val e = lo + n * (i + 1) / p // exclusive
        SyntheticRange(s, e): InputPartition
      }.toArray
    }
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new SyntheticReaderFactory(required.fieldNames)
}

case class SyntheticRange(start: Long, end: Long) extends InputPartition

class SyntheticReaderFactory(cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val r = p.asInstanceOf[SyntheticRange]
      private var i = r.start - 1
      override def next(): Boolean = { i += 1; i < r.end }
      override def get(): InternalRow = InternalRow.fromSeq(
        cols.toSeq.map {
          case "id" => i
          case "grp" => i % 97
          case "v" => (i * 2654435761L) % 1000003L
          case "tag" => UTF8String.fromString("t" + (i % 5))
        })
      override def close(): Unit = ()
    }
}
