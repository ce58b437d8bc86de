package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.SyntheticDocs

/** DataSource V2 connector behavior: filter pushdown shrinks what is
  * GENERATED (not just what is returned), column pruning reaches the
  * reader, and the range splits into parallel partitions. */
class SourcesSpec extends AnyFunSuite with SharedSparkSpec {

  private def docs(rows: Long, slices: Int = 4) =
    spark.read.format("graft.sources.SyntheticDocs")
      .option("rows", rows.toString).option("slices", slices.toString).load()

  test("full scan produces the declared row count with deterministic values") {
    val df = docs(1000)
    assert(df.count() == 1000)
    val r = df.filter(col("doc_id") === 42).collect()(0)
    assert(r.getString(r.fieldIndex("text")) == SyntheticDocs.textOf(42))
    assert(r.getLong(r.fieldIndex("score")) == SyntheticDocs.scoreOf(42))
  }

  test("doc_id range predicates are absorbed into the generated interval") {
    val df = docs(100000).filter(col("doc_id") >= 90000 && col("doc_id") < 90100)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("[90000, 90100)"),
      s"the scan must generate only the surviving range:\n$p")
    assert(df.count() == 100)
    // the absorbed range never materializes rows outside it: a 1-row equality
    // plans exactly one 1-row partition
    val one = docs(100000).filter(col("doc_id") === 77777)
    assert(one.rdd.getNumPartitions == 1, "equality must collapse to one slice")
    assert(one.collect().map(_.getLong(0)).toSeq == Seq(77777L))
  }

  test("non-doc_id predicates stay residual (returned rows still correct)") {
    val df = docs(1000).filter(col("doc_id") < 100 && col("score") > 500)
    val expected = (0L until 100L).filter(SyntheticDocs.scoreOf(_) > 500)
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == expected)
  }

  test("column pruning reaches the reader (text never materialized)") {
    val df = docs(1000).select("doc_id", "score")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("cols=doc_id,score"),
      s"reader schema must exclude the unprojected text column:\n$p")
  }

  test("the surviving range splits into parallel input partitions") {
    val df = docs(1000, slices = 8)
    assert(df.rdd.getNumPartitions == 8)
    // partitions cover the range exactly once (no dup/gap at split points)
    assert(df.select(sum("doc_id")).collect()(0).getLong(0) == (0L until 1000L).sum)
  }

  test("Long.MaxValue bounds saturate instead of wrapping (ADVICE r4)") {
    // doc_id > MAX is vacuously false: the wrapped lo used to absorb the
    // filter yet return EVERY row
    assert(docs(1000).filter(col("doc_id") > Long.MaxValue).count() == 0)
    // doc_id <= MAX is vacuously true: the wrapped hi used to return none
    assert(docs(1000).filter(col("doc_id") <= Long.MaxValue).count() == 1000)
    assert(docs(1000).filter(col("doc_id") >= Long.MaxValue).count() == 0)
    assert(docs(1000).filter(col("doc_id") === Long.MaxValue).count() == 0)
  }

  test("ungrouped count/min/max push into the scan (no row generation)") {
    val df = docs(1000000, slices = 8)
      .filter(col("doc_id") >= 100 && col("doc_id") < 900000)
      .agg(count(lit(1)), min("doc_id"), max("doc_id"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("pushedAggregates=[count,min,max]"),
      s"the scan node must answer the aggregate arithmetically:\n$p")
    val r = df.collect()(0)
    assert(r.getLong(0) == 900000 - 100 && r.getLong(1) == 100 && r.getLong(2) == 899999)
  }

  test("limit pushes into the scan exactly (Spark's own Limit is dropped)") {
    val df = docs(100000, slices = 8).filter(col("doc_id") >= 90000).limit(10)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("PushedLimit=10"), s"scan must carry the pushed limit:\n$p")
    // EXACT pushdown (isPartiallyPushed=false): the scan emits precisely the
    // first 10 rows of the surviving range — no CollectLimit needed above
    assert(p.contains("[90000, 90010)"),
      s"the limit must shrink the generated interval itself:\n$p")
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (90000L until 90010L))
  }

  test("offset composes with limit (skip m, keep n; saturating)") {
    val df = docs(100000, slices = 8).filter(col("doc_id") >= 90000)
      .offset(20).limit(10)
    val p = df.queryExecution.executedPlan.toString
    assert(df.collect().map(_.getLong(0)).sorted.toSeq == (90020L until 90030L),
      s"offset 20 + limit 10 over [90000,100000) must yield [90020,90030):\n$p")
    // past-the-end offset yields an empty range, not a wrap
    assert(docs(1000).offset(5000).count() == 0)
    // limit larger than the range is the whole range
    assert(docs(1000).limit(5000).count() == 1000)
  }

  test("limit does not interfere with a pushed aggregate") {
    val df = docs(1000).agg(count(lit(1))).limit(1)
    assert(df.collect()(0).getLong(0) == 1000)
  }

  test("exact statistics reach the planner (rows and bytes from the range)") {
    // 1000 rows × (8 + 24 + 8) bytes — the v2 relation's stats, not the
    // Long.MaxValue default that makes a source broadcast-ineligible
    val stats = docs(1000).queryExecution.optimizedPlan.stats
    assert(stats.rowCount.contains(BigInt(1000)), s"rowCount: ${stats.rowCount}")
    assert(stats.sizeInBytes == BigInt(1000L * 40),
      s"sizeInBytes: ${stats.sizeInBytes}")
    // pushdown shrinks the stats with the range: a filtered slice reports
    // the surviving cardinality, so the broadcast decision sees the truth
    val sliced = docs(1000000).filter(col("doc_id") >= 100 && col("doc_id") < 600)
    assert(sliced.queryExecution.optimizedPlan.stats.rowCount.contains(BigInt(500)))
  }

  test("a small filtered slice broadcasts; two big scans sort-merge") {
    import spark.implicits._
    val big = docs(2000000, slices = 8)
    val small = docs(2000000).filter(col("doc_id") >= 500000 && col("doc_id") < 500500)
      .select(col("doc_id").as("k"), col("score").as("s2"))
    val bhj = big.join(small, col("doc_id") === col("k")).queryExecution.executedPlan.toString
    assert(bhj.contains("BroadcastHashJoin"),
      s"a 500-row slice under the threshold must broadcast:\n$bhj")
    val other = docs(2000000).select(col("doc_id").as("k"), col("score").as("s2"))
    val smj = big.join(other, col("doc_id") === col("k")).queryExecution.executedPlan.toString
    assert(smj.contains("SortMergeJoin"),
      s"two 80 MB scans must NOT both broadcast:\n$smj")
    val _ = $""  // keep implicits import referenced
  }

  test("join-key constraints are inferred onto the probe scan statically") {
    // build side filtered on doc_id directly: Catalyst's constraint
    // propagation (doc_id = k ∧ k ∈ [lo, hi)) pushes the SAME range into
    // the unfiltered probe side — no runtime machinery needed, both scans
    // generate only the joinable slice
    val joined = docs(1000000, slices = 8).join(
      docs(1000000).filter(col("doc_id") >= 700000 && col("doc_id") < 700050)
        .select(col("doc_id").as("k")),
      col("doc_id") === col("k"))
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("[0, 1000000)"),
      s"the probe scan must inherit the inferred doc_id range:\n$p")
    assert(joined.count() == 50)
  }

  test("runtime filtering prunes the generated range on the probe side") {
    // build-side predicate on score is NOT statically inferable onto
    // doc_id, so only SPARK-35779 runtime filtering can prune the probe:
    // the broadcast's doc_id set comes back as a dynamic In-filter, and the
    // scan applies it as a bounds intersection BEFORE planning partitions.
    // score = id*31 % 1000, gcd(31,1000)=1 → exactly one hit per 1000
    // consecutive ids; in [700000, 701000) that is id 700500.
    val probe = docs(1000000, slices = 8)
    val build = docs(1000000)
      .filter(col("doc_id") >= 700000 && col("doc_id") < 701000 && col("score") === 500)
      .select(col("doc_id").as("k"))
    val joined = probe.join(build, col("doc_id") === col("k"))
    val planned = joined.queryExecution.executedPlan.toString
    assert(planned.contains("RuntimeFilters: [dynamicpruningexpression"),
      s"the probe scan must accept a dynamic-pruning runtime filter:\n$planned")
    assert(joined.collect().map(_.getLong(0)).toSeq == Seq(700500L))
    // the scan's description reads its live bounds: after execution the
    // dynamic In-list {700500} must have collapsed the probe range to the
    // single joinable row — generated rows, not post-scan filtering
    val executed = joined.queryExecution.executedPlan.toString
    assert(executed.contains("[700500, 700501)"),
      s"the runtime In-filter must shrink the generated interval itself:\n$executed")
  }

  test("grouped or non-doc_id aggregates fall back to the row scan") {
    val df = docs(1000).groupBy((col("doc_id") % 2).as("b")).agg(min("score"))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("pushedAggregates"), s"grouped agg must not push:\n$p")
    assert(df.count() == 2)
    // empty pushed-agg range: final agg over zero partials
    val empty = docs(1000).filter(col("doc_id") > Long.MaxValue)
      .agg(count(lit(1)), min("doc_id"))
    val e = empty.collect()(0)
    assert(e.getLong(0) == 0 && e.isNullAt(1))
  }
}
