package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max, Min}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader,
  PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownAggregates,
  SupportsPushDownFilters, SupportsPushDownLimit, SupportsPushDownOffset,
  SupportsPushDownRequiredColumns, SupportsReportStatistics, SupportsRuntimeFiltering}
import org.apache.spark.sql.sources.{EqualTo, Filter, GreaterThan, GreaterThanOrEqual,
  In, IsNotNull, LessThan, LessThanOrEqual}
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
  *  - `SupportsPushDownAggregates` (partial): ungrouped count(*) /
  *    min(doc_id) / max(doc_id) collapse to one arithmetic row per range
  *    partition — no row generation at all (spec-asserted);
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
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates with SupportsPushDownLimit
    with SupportsPushDownOffset {
  private var lo = 0L
  private var hi = rows // exclusive
  private var pushed = Array.empty[Filter]
  private var required: StructType = SyntheticDocs.schema
  private var aggKinds: Seq[String] = Nil
  private var pushedLimit: Option[Int] = None
  private var pushedOffset: Int = 0

  // ---- saturation guards: a bound of Long.MaxValue must not wrap on the
  // half-open +1 conversion (ADVICE r4 — the wrapped lo made an
  // absorbed-but-unapplied `doc_id > MAX` return every row, and the
  // wrapped hi made `doc_id <= MAX` return none).
  /** doc_id > x: x = MAX is vacuously false → force an empty range. */
  private def boundGt(x: Long): Unit =
    if (x == Long.MaxValue) { lo = math.max(lo, hi) }
    else lo = math.max(lo, x + 1)
  /** doc_id <= x: x = MAX is vacuously true → no upper bound to tighten. */
  private def boundLe(x: Long): Unit =
    if (x != Long.MaxValue) hi = math.min(hi, x + 1)

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, residual) = filters.partition {
      case GreaterThan("doc_id", _: Number) | GreaterThanOrEqual("doc_id", _: Number) |
           LessThan("doc_id", _: Number) | LessThanOrEqual("doc_id", _: Number) |
           EqualTo("doc_id", _: Number) | IsNotNull("doc_id") => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("doc_id", v: Number)        => boundGt(v.longValue)
      case GreaterThanOrEqual("doc_id", v: Number) => lo = math.max(lo, v.longValue)
      case LessThan("doc_id", v: Number)           => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("doc_id", v: Number)    => boundLe(v.longValue)
      case EqualTo("doc_id", v: Number) =>
        lo = math.max(lo, v.longValue); boundLe(v.longValue)
      case IsNotNull("doc_id") => // non-nullable: always true, fully absorbed
      case f => throw new IllegalStateException(s"unreachable filter $f")
    }
    pushed = accepted
    residual // Spark re-evaluates only what the source could not absorb
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  // ---- aggregate pushdown (PARTIAL: supportCompletePushDown stays false,
  // so each generated partition emits ONE pre-aggregated row — count of its
  // range, min/max of its doc_id slice — and Spark's final aggregate merges
  // them; grouped or non-doc_id aggregates fall back to the row scan).
  private def docIdRef(e: org.apache.spark.sql.connector.expressions.Expression): Boolean =
    e match {
      case r: NamedReference => r.fieldNames.sameElements(Array("doc_id"))
      case _ => false
    }
  override def pushAggregation(agg: Aggregation): Boolean = {
    if (agg.groupByExpressions.nonEmpty) return false
    val kinds = agg.aggregateExpressions.toSeq.map {
      case _: CountStar => Some("count")
      case m: Min if docIdRef(m.column) => Some("min")
      case m: Max if docIdRef(m.column) => Some("max")
      case _ => None
    }
    if (kinds.contains(None)) return false
    aggKinds = kinds.flatten
    true
  }

  // ---- LIMIT / OFFSET pushdown: a deterministic range source can apply
  // both EXACTLY by shrinking [lo, hi) — skip `offset` rows from the front,
  // keep at most `limit` after that — so `isPartiallyPushed` is false and
  // Spark drops its own Limit/Offset operators entirely: a LIMIT-n
  // exploration query over a billion-row synthetic table plans n rows.
  // (Spark only attempts limit/offset pushdown on a bare scan, never above
  // a pushed aggregate, so no aggKinds interaction exists; the guard is
  // belt-and-braces.)
  override def pushLimit(limit: Int): Boolean =
    aggKinds.isEmpty && { pushedLimit = Some(limit); true }
  override def isPartiallyPushed(): Boolean = false
  override def pushOffset(offset: Int): Boolean =
    aggKinds.isEmpty && { pushedOffset = offset; true }

  override def build(): Scan = {
    val boundedHi = math.max(lo, hi)
    if (aggKinds.nonEmpty) new DocsAggScan(lo, boundedHi, slices, aggKinds)
    else {
      // Spark's combined contract (V2ScanRelationPushDown): for
      // `df.offset(n).limit(m)` it pushes limit = n + m and offset = n, so
      // the scan must apply the LIMIT against the range start and then skip
      // OFFSET rows inside that prefix: [lo + offset, lo + limit). Both
      // saturate so a past-the-end offset or oversize limit cannot wrap.
      val hi2 = pushedLimit.fold(boundedHi)(l => math.min(boundedHi, lo + math.max(0, l)))
      val lo2 = math.min(lo + math.max(0, pushedOffset), hi2)
      new DocsScan(lo2, hi2, slices, required, pushedLimit, pushedOffset)
    }
  }
}

private[sources] class DocsScan(lo0: Long, hi0: Long, slices: Int, schema: StructType,
                                pushedLimit: Option[Int] = None, pushedOffset: Int = 0)
    extends Scan with Batch with SupportsReportStatistics with SupportsRuntimeFiltering {
  // Runtime filtering (SPARK-35779) mutates the surviving range AFTER the
  // plan is fixed but BEFORE partitions are planned, so the bounds are vars.
  private var lo = lo0
  private var hi = hi0
  override def readSchema(): StructType = schema
  override def toBatch: Batch = this
  override def description(): String = {
    val lim = pushedLimit.map(l => s" PushedLimit=$l").getOrElse("")
    val off = if (pushedOffset > 0) s" PushedOffset=$pushedOffset" else ""
    s"SyntheticDocs range [$lo, $hi) cols=${schema.fieldNames.mkString(",")}$lim$off"
  }

  /** EXACT statistics from the surviving [lo, hi) range — a deterministic
    * source knows its cardinality precisely. Without this a DSv2 relation
    * reports `spark.sql.defaultSizeInBytes` (Long.MaxValue) and is never
    * broadcast-eligible; with it, a filtered synthetic slice under the
    * autoBroadcastJoinThreshold plans a BroadcastHashJoin like any
    * well-statted parquet table (spec-asserted both directions). Row width:
    * 8 bytes per projected long + ~24 per text payload ("doc N body M"). */
  override def estimateStatistics(): Statistics = {
    val n = math.max(0L, hi - lo)
    val rowBytes = schema.fields.map(f =>
      if (f.dataType == LongType) 8L else 24L).sum
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(n * math.max(rowBytes, 1L))
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(n)
    }
  }

  // ---- runtime filtering: when this scan sits on the probe side of a
  // broadcast join on doc_id, Spark ships the build side's doc_id set back
  // to the scan (DynamicPruningSubquery → In filter) before partition
  // planning. The range source applies it as a bounds intersection —
  // min/max of the In-list — so a selective dim join generates only the
  // slice that can possibly match, the connector analogue of dynamic
  // partition pruning. Dropping only rows OUTSIDE [min, max] is always
  // sound: they cannot equal any In-list value; Spark still re-applies the
  // join itself. Unknown runtime-filter shapes are ignored (best-effort by
  // contract).
  override def filterAttributes(): Array[NamedReference] =
    Array(org.apache.spark.sql.connector.expressions.Expressions.column("doc_id"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case In("doc_id", values) =>
      val vs = values.collect { case n: Number => n.longValue }
      if (vs.isEmpty) { hi = lo } // non-numeric or empty build side: no match
      else {
        lo = math.max(lo, vs.min)
        hi = math.min(hi, if (vs.max == Long.MaxValue) Long.MaxValue else vs.max + 1)
      }
    case EqualTo("doc_id", v: Number) =>
      lo = math.max(lo, v.longValue)
      hi = math.min(hi, if (v.longValue == Long.MaxValue) Long.MaxValue else v.longValue + 1)
    case _ => // best-effort: unhandled shapes prune nothing
  }

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

/** Pushed-aggregate scan: each range partition collapses to ONE
  * pre-aggregated row computed arithmetically from its [lo, hi) bounds —
  * no row is ever generated. Spark plans the final merge on top (partial
  * pushdown), so `SELECT count(*), min(doc_id), max(doc_id)` over a
  * billion-row synthetic table reads `slices` rows total. */
private[sources] class DocsAggScan(lo: Long, hi: Long, slices: Int, kinds: Seq[String])
    extends Scan with Batch with SupportsReportStatistics {
  /** One pre-aggregated row per surviving partition. */
  override def estimateStatistics(): Statistics = {
    val k = if (hi - lo <= 0) 0L else math.min(slices.toLong, hi - lo)
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(k * kinds.size * 8L)
      override def numRows(): java.util.OptionalLong = java.util.OptionalLong.of(k)
    }
  }
  override def readSchema(): StructType = StructType(kinds.map {
    case "count" => StructField("count_star", LongType, nullable = false)
    case k       => StructField(s"${k}_doc_id", LongType, nullable = true)
  })
  override def toBatch: Batch = this
  override def description(): String =
    s"SyntheticDocs range [$lo, $hi) pushedAggregates=[${kinds.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = hi - lo
    if (n <= 0) Array.empty // final agg over zero partials: count→0, min/max→null
    else {
      val k = math.min(slices.toLong, n).toInt
      Array.tabulate(k)(i => DocsRange(lo + n * i / k, lo + n * (i + 1) / k))
    }
  }
  override def createReaderFactory(): PartitionReaderFactory = new DocsAggReaderFactory(kinds)
}

private[sources] class DocsAggReaderFactory(kinds: Seq[String]) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[DocsRange]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val go = !emitted && r.hi > r.lo; emitted = true; go }
      override def get(): InternalRow = InternalRow.fromSeq(kinds.map {
        case "count" => r.hi - r.lo
        case "min"   => r.lo
        case "max"   => r.hi - 1
      })
      override def close(): Unit = ()
    }
  }
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
