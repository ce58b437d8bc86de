package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownFilters,
  SupportsPushDownRequiredColumns}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual,
  IsNotNull, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 connector (SURVEY §2.1's "source" axis taken to the
  * connector API): a deterministic synthetic documents table, generated
  * partition-parallel with REAL scan-level optimizations —
  *
  *  - `SupportsPushDownFilters`: doc_id range predicates tighten the
  *    generated [lo, hi) interval BEFORE any row exists, the connector-level
  *    equivalent of parquet row-group skipping (a filtered read plans
  *    strictly fewer rows, spec-asserted);
  *  - `SupportsPushDownRequiredColumns`: the reader materializes only the
  *    projected fields (ReadSchema pruning, spec-asserted);
  *  - `planInputPartitions`: the surviving range splits into `slices`
  *    independent readers — executor-parallel generation, no driver data.
  *
  * Usage: `spark.read.format("graft.sources.SyntheticDocs")
  *   .option("rows", "100000").option("slices", "8").load()`.
  * The row formulas are trivially SQL-replicable, so catalog queries over
  * this source are DuckDB-oracle-checked like every other operator.
  */
class SyntheticDocs extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticDocs.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new DocsTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("slices")).map(_.toInt).getOrElse(4))
}

object SyntheticDocs {
  val schema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("score", LongType, nullable = false)))

  def textOf(id: Long): String = s"doc $id body ${id * 7 % 97}"
  def scoreOf(id: Long): Long = id * 31 % 1000
}

private[sources] class DocsTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"synthetic_docs($rows)"
  override def schema(): StructType = SyntheticDocs.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new DocsScanBuilder(rows, slices)
}

private[sources] class DocsScanBuilder(rows: Long, slices: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = SyntheticDocs.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("doc_id", _: Number) | GreaterThanOrEqual("doc_id", _: Number) |
           LessThan("doc_id", _: Number) | LessThanOrEqual("doc_id", _: Number) |
           EqualTo("doc_id", _: Number) | IsNotNull("doc_id") => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: Number)        => lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("doc_id", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("doc_id", v: Number)           => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("doc_id", v: Number)    => hi = math.min(hi, v.longValue + 1)
      case EqualTo("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case IsNotNull("doc_id") => // non-nullable: always true, fully absorbed
      case f => throw new IllegalStateException(s"unreachable filter $f")
    }
    pushed = accepted
    residual // Spark re-evaluates only what the source could not absorb
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan = new DocsScan(lo, math.max(lo, hi), slices, required)
}

private[sources] class DocsScan(lo: Long, hi: Long, slices: Int, schema: StructType)
    extends Scan with Batch {
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = s"SyntheticDocs range [$lo, $hi) cols=${schema.fieldNames.mkString(",")}"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty
    else {
      val k = math.min(slices.toLong, n).toInt
      Array.tabulate(k) { i =>
        DocsRange(lo + n * i / k, lo + n * (i + 1) / k)
      }
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = new DocsReaderFactory(schema)
}

private[sources] case class DocsRange(lo: Long, hi: Long) extends InputPartition

private[sources] class DocsReaderFactory(schema: StructType) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new DocsReader(p.asInstanceOf[DocsRange], schema)
}

private[sources] class DocsReader(p: DocsRange, schema: StructType)
    extends PartitionReader[InternalRow] {
  private var cur = p.lo - 1
  override def next(): Boolean = { cur += 1; cur < p.hi }
  override def get(): InternalRow = InternalRow.fromSeq(schema.fieldNames.toSeq.map {
    case "doc_id" => cur
    case "text"   => UTF8String.fromString(SyntheticDocs.textOf(cur))
    case "score"  => SyntheticDocs.scoreOf(cur)
  })
  override def close(): Unit = ()
}
