package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPTIMIZATION r14: w7_ntile_nth / w8_percent_rank replaced their
  * low-cardinality `Window.partitionBy(o_orderstatus)` (an unsplittable
  * 3-task straggler at scale — guide §2.5) with rank arithmetic over the
  * two-level per-group row numbers. This spec pins the replacement's
  * VALUES equal to the built-in window functions row-for-row at two sfs,
  * so the decomposition can never drift from ntile/percent_rank/
  * cume_dist/nth_value semantics. */
class WindowDecompositionSpec extends AnyFunSuite with SharedSparkSpec {

  private def builtinW7(d: String) = {
    val order = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    graft.engine.Tables.load(spark, d, "orders")
      .withColumn("quartile", ntile(4).over(order).cast("bigint"))
      .withColumn("second_best", nth_value(col("o_orderkey"), 2).over(full))
      .select("o_orderkey", "o_orderstatus", "quartile", "second_best")
      .orderBy("o_orderkey")
  }

  private def builtinW8(d: String) = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    graft.engine.Tables.load(spark, d, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"))
      .orderBy("o_orderkey")
  }

  private def builtinW9(d: String) = {
    val firstSeen = Window.partitionBy("event_type", "user_id")
      .orderBy(col("ts").asc, col("event_id").asc)
    val running = Window.partitionBy("event_type")
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.engine.Tables.load(spark, d, "events")
      .withColumn("is_first", (row_number().over(firstSeen) === 1).cast("long"))
      .withColumn("distinct_users_so_far", sum("is_first").over(running))
      .select("event_type", "event_id", "ts", "distinct_users_so_far")
      .orderBy("event_type", "event_id")
  }

  private def builtinW10(d: String) = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val whole = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val growing = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    graft.engine.Tables.load(spark, d, "orders")
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("cum_frac", round(cume_dist().over(w), 6))
      .withColumn("third_key", nth_value(col("o_orderkey"), 3).over(growing))
      .withColumn("top_key", first(col("o_orderkey")).over(whole))
      .withColumn("bottom_key", last(col("o_orderkey")).over(whole))
      .filter(col("rn") <= 5)
      .select("o_orderpriority", "rn", "o_orderkey", "cum_frac",
        "third_key", "top_key", "bottom_key")
      .orderBy("o_orderpriority", "rn")
  }

  private def builtinTsMaxConcurrency(d: String) = {
    val ev = graft.engine.Tables.load(spark, d, "events")
    val pts = ev.select(col("event_type"), col("ts").as("t"), lit(1L).as("delta"))
      .unionByName(ev.select(col("event_type"),
        (col("ts") + expr("interval 5 minutes")).as("t"), lit(-1L).as("delta")))
    val w = Window.partitionBy("event_type").orderBy(col("t").asc, col("delta").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pts.withColumn("running", sum("delta").over(w))
      .groupBy("event_type")
      .agg(max("running").as("max_concurrent"))
      .orderBy("event_type")
  }

  /** The ORIGINAL agg_weighted_median formulation (pre-r15): per-distinct-
    * price rollup + one cumulative window per flag over the whole rollup —
    * the reference the two-phase weighted selection must match bit-for-bit. */
  private def builtinWeightedMedian(d: String) = {
    val pw = graft.engine.Tables.load(spark, d, "lineitem")
      .groupBy(col("l_returnflag").as("flag"), col("l_extendedprice").as("price"))
      .agg(sum(col("l_quantity").cast("long")).as("w"))
    val tots = pw.groupBy("flag")
      .agg(sum("w").as("totw"), count(lit(1)).as("n_prices"))
    val win = Window.partitionBy("flag").orderBy("price")
    pw.withColumn("cumw", sum("w").over(win))
      .join(broadcast(tots), "flag")
      .filter(col("cumw") * 2 >= col("totw"))
      .groupBy("flag")
      .agg(min("price").as("wmed_price"),
           max("totw").as("totw"), max("n_prices").as("n_prices"))
      .select("flag", "n_prices", "totw", "wmed_price")
      .orderBy("flag")
  }

  private val builtins: Map[String, String => org.apache.spark.sql.DataFrame] = Map(
    "w7_ntile_nth" -> builtinW7 _,
    "w8_percent_rank" -> builtinW8 _,
    "w9_running_distinct" -> builtinW9 _,
    "w10_dist_frames" -> builtinW10 _,
    "ts_max_concurrency" -> builtinTsMaxConcurrency _,
    "agg_weighted_median" -> builtinWeightedMedian _)

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01");
       (name, ref) <- builtins.toSeq.sortBy(_._1)) {
    test(s"$name: two-level decomposition ≡ built-in window ($d)") {
      val got = SparkEntry.queries(name)(spark, d).collect().toSeq
      val want = ref(d).collect().toSeq
      assert(got == want)
    }
  }

  test("w7/w8 plans contain no Window operator (the unsplittable-key straggler); w9/w10/ts_max_concurrency windows run only on splittable or bounded grains") {
    for (n <- Seq("w7_ntile_nth", "w8_percent_rank")) {
      val p = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("RunningWindowFunction") && !p.contains("Window ["),
        s"$n still plans a Window operator:\n$p")
    }
    // the running-sum faces legitimately keep windows, but every window
    // partition key must include a high-cardinality component: (event_type,
    // user_id) for the first-seen flag, (__pid, group) for the local
    // prefix sums — never the bare low-cardinality group
    for (n <- Seq("w9_running_distinct", "ts_max_concurrency")) {
      val p = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      // a windowspecdefinition whose partition list is the bare type key
      // reads "windowspecdefinition(event_type#N, <orderCol># ASC ..." —
      // the first-seen flag's (event_type, user_id) key and the helper's
      // (__pid, __g) key both put a second partition column there instead
      assert(!"""windowspecdefinition\(event_type#\d+, \w+#\d+ (ASC|DESC)""".r
          .findFirstIn(p).isDefined,
        s"$n still runs a window keyed on bare event_type:\n$p")
    }
    // w10 keeps priority-keyed windows, but only over the per-partition
    // candidate frame (≤ 6 rows per scan partition per group — the census
    // filter sits below every Window operator in the plan)
    val p10 = SparkEntry.queries("w10_dist_frames")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    val firstWindow = p10.indexOf("Window")
    val candFilter = p10.indexOf("__maxl")
    assert(firstWindow >= 0 && candFilter > firstWindow,
      s"w10's windows must consume the bounded candidate frame (census filter below them):\n$p10")
    // w8 has no aggregate, so nothing in its plan may hash-cluster the
    // full frame on the 3-value status key. (w7's second_best aggregates
    // DO hash-exchange on status — but only after partial aggregation,
    // so the exchange carries |groups|×|map partitions| rows, not the
    // table; that exchange is the aggregate discipline, not a straggler.)
    val p8 = SparkEntry.queries("w8_percent_rank")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p8.contains("hashpartitioning(o_orderstatus"),
      s"w8 still hash-clusters on the 3-value status key:\n$p8")
    // agg_weighted_median (r15): its two flag-keyed windows may consume
    // only the metadata-sized decomposition frames — the bucket histogram
    // (__bw) and the crossing-bucket gather (__pw). If either marker
    // vanishes, the face has reverted to the full-rollup window.
    val pwm = SparkEntry.queries("agg_weighted_median")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(pwm.contains("__bw") && pwm.contains("__pw") && !pwm.contains("cumw"),
      s"agg_weighted_median lost its two-phase selection markers:\n$pwm")
  }
}
