package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-level decompositions of per-group rank / prefix-sum windows
  * (OPTIMIZATION r14, guide §2.5): `Window.partitionBy(k)` over a
  * LOW-cardinality key hash-clusters the whole frame into |k| tasks — the
  * unsplittable-key straggler AQE cannot fix (skew splitting applies to
  * joins, never windows). Both helpers replace that with a range layout
  * on (group, ord...) — each group spans MANY ordered partitions — plus a
  * broadcast (physical partition × group)-sized census that stitches the
  * per-partition local results into exact global ones. Every derived
  * value is exact integer arithmetic, so results are bit-identical to the
  * built-in window functions (WindowDecompositionSpec pins this).
  *
  * Used by w7_ntile_nth / w8_percent_rank / w10_dist_frames (ranks) and
  * w9_running_distinct / ts_max_concurrency (running sums). */
private[queries] object TwoLevel {

  /** Range layout + local row numbers decoded from
    * monotonically_increasing_id (partition id in the high bits, record
    * index in the low 33 — the withGlobalRowNumbers trick, per-group). */
  private def layout(df: DataFrame, group: Column, ord: Seq[Column]): DataFrame =
    df.repartitionByRange((group +: ord): _*)
      .sortWithinPartitions((group +: ord): _*)
      .withColumn("__mid", monotonically_increasing_id())
      .withColumn("__pid", shiftright(col("__mid"), 33))
      .withColumn("__lrn", col("__mid") - shiftleft(col("__pid"), 33) + 1)
      .withColumn("__g", group)

  /** PER-GROUP row numbers without a per-group Window. Rows of one group
    * are contiguous within a partition (the sort leads with the group), so
    * rank-in-group = lrn − min_lrn(pid, g) + 1 + Σ cnt(pid' < pid, g).
    * Appends `rn_g` (1-based rank within group under ord) and `n_g`
    * (group size). */
  def groupRowNumbers(df: DataFrame, group: Column, ord: Column*): DataFrame = {
    val local = layout(df, group, ord)
    val cnts = local.groupBy(col("__pid"), col("__g"))
      .agg(count(lit(1)).as("__cnt"), min(col("__lrn")).as("__minl"))
    // ONE broadcast census frame carrying both the per-(pid, g) prefix
    // offset and the group total: both derive from the tiny cnts table
    // driver-side of the join, so `local` is touched exactly once after
    // the range exchange.
    val census = cnts
      .join(cnts.select(col("__pid").as("__qpid"), col("__g").as("__qg"),
          col("__cnt").as("__qcnt")),
        col("__qg") === col("__g"), "left")
      .groupBy(col("__pid"), col("__g"), col("__minl"))
      .agg(coalesce(sum(when(col("__qpid") < col("__pid"), col("__qcnt"))), lit(0L)).as("__goff"),
           sum(col("__qcnt")).as("n_g"))
    local
      .join(broadcast(census), Seq("__pid", "__g"))
      .withColumn("rn_g", col("__lrn") - col("__minl") + 1 + col("__goff"))
      .drop("__mid", "__pid", "__g", "__lrn", "__minl", "__goff")
  }

  /** PER-GROUP running sum (rows between unbounded preceding and current
    * row under ord) without a low-cardinality Window. Local running sums
    * come from a (pid, group)-keyed window — splittable: its partition
    * grain is (physical partitions × groups) — and the cross-partition
    * carry is a broadcast per-(pid, g) prefix offset. Appends `run_g`.
    * Ties in ord must either be total (unique tie-break) or the caller
    * must only consume tie-order-invariant reductions of run_g (e.g. its
    * max — the multiset of prefix values over equal-ord runs of equal
    * deltas is order-independent). */
  def groupRunningSum(df: DataFrame, group: Column, value: Column,
                      ord: Column*): DataFrame = {
    val local = layout(df, group, ord).withColumn("__v", value)
    val winLoc = Window.partitionBy(col("__pid"), col("__g"))
      .orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sums = local.groupBy(col("__pid"), col("__g"))
      .agg(sum(col("__v")).as("__s"))
    val census = sums
      .join(sums.select(col("__pid").as("__qpid"), col("__g").as("__qg"),
          col("__s").as("__qs")),
        col("__qg") === col("__g") && col("__qpid") < col("__pid"), "left")
      .groupBy(col("__pid"), col("__g"))
      .agg(coalesce(sum(col("__qs")), lit(0L)).as("__soff"))
    local
      .withColumn("__runloc", sum(col("__v")).over(winLoc))
      .join(broadcast(census), Seq("__pid", "__g"), "left")
      .withColumn("run_g", col("__runloc") + coalesce(col("__soff"), lit(0L)))
      .drop("__mid", "__pid", "__g", "__lrn", "__v", "__runloc", "__soff")
  }
}
