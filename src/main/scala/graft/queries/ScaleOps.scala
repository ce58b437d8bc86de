package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** Scale-path operators beyond the reference's surface: skew-salted joins,
  * as-of joins, and sketch aggregates — the moves a 100 TB pipeline actually
  * needs when the stock plan degrades.
  */
object ScaleOps {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  val queries: Map[String, Q] = Map(
    // ---- skew-salted aggregation+join. Scenario: one hot key dominates
    // (here: synthetic hot_key = user_id % 3 == 0 collapsed to key 0 — at
    // 100 TB think "null user" or "bot account"). The salted plan:
    // (1) spread the hot key across SALT sub-keys for the heavy aggregation,
    // (2) re-aggregate the partials. Result is identical to the naive
    // groupBy (the oracle computes the naive form); only the shuffle layout
    // differs. AQE's skewedJoin handles the JOIN case at runtime; explicit
    // salting is the portable fix for aggregations.
    "skew_salted_agg" -> ((s, d) => {
      val salt = 8
      val ev = t(s, d, "events")
        .withColumn("skey", when(col("user_id") % 3 === 0, 0L).otherwise(col("user_id")))
      ev
        .withColumn("salt", (col("event_id") % salt).cast("int"))
        .groupBy("skey", "salt")                       // stage 1: salted partials
        .agg(count(lit(1)).as("pn"), sum("value").as("pv"))
        .groupBy("skey")                               // stage 2: merge partials
        .agg(sum("pn").as("n"), round(sum("pv"), 4).as("sum_value"))
        .orderBy("skey")
    }),

    // ---- as-of join (the canonical telemetry⋈weather alignment): for every
    // 'purchase' event, the most recent prior 'signup' event of the same
    // user. Spark-first shape: union the two streams with a tag, one window
    // pass with last(..., ignoreNulls) over (user, time) — ONE shuffle on
    // user_id, no range-join explosion, linear in input. DuckDB oracle uses
    // its native ASOF JOIN semantics via the same window formulation.
    "asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val tagged = ev.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"), col("value"),
        when(col("event_type") === "signup", col("ts")).as("signup_ts_raw"))
      val w = Window.partitionBy("user_id").orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tagged
        .withColumn("last_signup_ts", last("signup_ts_raw", ignoreNulls = true).over(w))
        .filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts", "last_signup_ts")
        .orderBy("event_id")
    }),

    // ---- as-of join via the CUSTOM OPERATOR (graft.plans.AsOfJoinPlan →
    // AsOfJoinStrategy → AsOfJoinExec): same semantics and same oracle as
    // "asof_join" above, but executed by the sort-merge as-of SparkPlan —
    // two key exchanges, per-partition O(n+m) merge walk, no unioned window
    // pass. Proves the full custom LogicalPlan/Strategy/Exec path end-to-end
    // against an independent engine.
    "asof_join_custom" -> ((s, d) => {
      graft.plans.GraftExtensions.install(s)
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), unix_micros(col("ts")).as("tl"))
      val signups = ev.filter(col("event_type") === "signup")
        .select(col("user_id").as("s_user"), col("ts").as("s_ts"),
          unix_micros(col("ts")).as("s_tl"), col("event_id").as("s_event_id"))
      graft.plans.GraftExtensions
        .asofJoin(purchases, "user_id", "tl", signups, "s_user", "s_tl")
        .select(col("event_id"), col("user_id"), col("ts"), col("s_ts").as("last_signup_ts"))
        .orderBy("event_id")
    }),

    // ---- MERGE/upsert semantics over plain parquet (no Delta in this
    // container): target ⟗ source with per-row action — matched rows update,
    // unmatched source rows insert, unmatched target rows carry over. At
    // scale this is the full-outer-join formulation every table-format MERGE
    // lowers to; with a lakehouse format the same plan runs under the
    // transaction log.
    "etl_upsert" -> ((s, d) => {
      val target = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      // source: balance deltas derived from urgent orders (+1% of totalprice)
      val source = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .groupBy(col("o_custkey").as("s_custkey"))
        .agg(round(sum(col("o_totalprice")) * 0.01, 4).as("delta"))
      target.join(source, col("c_custkey") === col("s_custkey"), "full_outer")
        .select(
          coalesce(col("c_custkey"), col("s_custkey")).as("custkey"),
          coalesce(col("c_name"), lit("NEW CUSTOMER")).as("name"),
          round(coalesce(col("c_acctbal"), lit(0.0)) + coalesce(col("delta"), lit(0.0)), 4).as("new_acctbal"),
          when(col("s_custkey").isNull, "carried")
            .when(col("c_custkey").isNull, "inserted")
            .otherwise("updated").as("action"))
        .orderBy("custkey")
    }),

    // ---- bucketed co-located join: both sides bucketBy(8) on the join key
    // at WRITE time, so the join needs no exchange at READ time — the layout
    // that amortizes a repeated 100 TB fact⋈fact shuffle once. The bucketed
    // tables are created on first use per (table, sf) into /tmp (external
    // path, in-memory catalog); the merge hint keeps the demonstration a
    // sort-merge join instead of a broadcast. PlanQualitySpec asserts the
    // bucketed scan and the absence of join-key exchanges; BucketingSpec
    // covers the layout in depth.
    "bj_colocated_join" -> ((s, d) => {
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      def ensure(base: String, df: => DataFrame, key: String): String = {
        val tbl = s"${base}_$tag"
        if (!s.catalog.tableExists(tbl))
          df.write.mode("overwrite")
            .bucketBy(8, key).sortBy(key)
            .option("path", s"/tmp/graft_bucketed/$tbl")
            .format("parquet").saveAsTable(tbl)
        tbl
      }
      val bo = ensure("bj_orders",
        t(s, d, "orders").select(col("o_orderkey"), col("o_orderstatus")), "o_orderkey")
      val bl = ensure("bj_lineitem",
        t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice")), "l_orderkey")
      s.table(bl).hint("merge")
        .join(s.table(bo), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 4).as("rev"))
        .orderBy("o_orderstatus")
    }),

    // ---- sketch aggregates (no DuckDB oracle — HLL/KLL internals differ
    // across engines, so the driver records a rows-only check). At 100 TB
    // these replace exact distinct/quantiles wherever 2% error is acceptable:
    // mergeable state, no giant shuffle.
    "sketch_approx_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy("l_returnflag")
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
             count(lit(1)).as("n"))
        .orderBy("l_returnflag")),

    // Output is SCALAR rows (one per (status, q)) — array-valued result
    // columns crash rows-only harness checks and stringify differently
    // across engines (same hygiene as arr_ops).
    "sketch_quantiles" -> ((s, d) => {
      val qs = Seq(0.5, 0.95, 0.99)
      t(s, d, "orders")
        .groupBy("o_orderstatus")
        .agg(percentile_approx(col("o_totalprice"), array(qs.map(lit): _*),
               lit(10000)).as("pq"),
             count(lit(1)).as("n"))
        .select(col("o_orderstatus"), col("n"), posexplode(col("pq")))
        .select(col("o_orderstatus"),
          element_at(typedLit(qs), col("pos") + 1).as("q"),
          col("col").as("quantile_value"), col("n"))
        .orderBy("o_orderstatus", "q")
    })
  )

  val oracles: Map[String, String] = Map(
    // the salted plan must produce exactly the naive aggregation's result
    "skew_salted_agg" ->
      """SELECT skey, count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM (SELECT CASE WHEN user_id % 3 = 0 THEN 0 ELSE user_id END AS skey, value
        |      FROM events)
        |GROUP BY skey ORDER BY skey""".stripMargin,

    "asof_join" ->
      """SELECT event_id, user_id, ts, last_signup_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "asof_join_custom" ->
      """SELECT event_id, user_id, ts, last_signup_ts FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |    last_value(CASE WHEN event_type = 'signup' THEN ts END IGNORE NULLS)
        |      OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_signup_ts
        |  FROM events)
        |WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin,

    "bj_colocated_join" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_extendedprice), 4) AS rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,

    "etl_upsert" ->
      """WITH source AS (
        |  SELECT o_custkey AS s_custkey, round(sum(o_totalprice) * 0.01, 4) AS delta
        |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
        |SELECT coalesce(c_custkey, s_custkey) AS custkey,
        |  coalesce(c_name, 'NEW CUSTOMER') AS name,
        |  round(coalesce(c_acctbal, 0.0) + coalesce(delta, 0.0), 4) AS new_acctbal,
        |  CASE WHEN s_custkey IS NULL THEN 'carried'
        |       WHEN c_custkey IS NULL THEN 'inserted'
        |       ELSE 'updated' END AS action
        |FROM customer FULL OUTER JOIN source ON c_custkey = s_custkey
        |ORDER BY custkey""".stripMargin
    // sketch_* intentionally omitted: engine-specific sketch internals
  )
}
