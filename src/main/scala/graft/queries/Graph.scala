package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.engine.{FixedPoint => FP, Tables}

/** Graph-shaped analytics over the star schema: the customer→supplier
  * bipartite graph induced by orders⋈lineitem (an edge per distinct
  * customer/supplier trading pair). Complements the iterative
  * connected-components machinery in [[Dedup]] (dd_clusters) with the two
  * other staples of distributed graph work: degree profiling and one damped
  * power-iteration of a random-walk rank.
  *
  * Scale design: the edge list is born from a fact⋈fact equi-join (shuffle
  * on orderkey), then `distinct` — one more shuffle on the edge pair, after
  * which everything is per-node aggregation (partial→final, no joins wider
  * than edge⋈degree on the SOURCE key, which co-partitions with the edge
  * shuffle). A full PageRank loop is this step iterated with
  * localCheckpoint() per round, exactly like dd_clusters' pointer jumping —
  * each round is one co-partitioned join + one aggregation, O(log) rounds
  * for rank convergence at fixed damping.
  */
object Graph {
  type Q = (SparkSession, String) => DataFrame
  private def t(s: SparkSession, d: String, n: String) = Tables.load(s, d, n)

  /** distinct customer→supplier trading edges. */
  private def edges(s: SparkSession, d: String): DataFrame =
    t(s, d, "orders")
      .join(t(s, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"), col("l_suppkey").as("dst"))
      .distinct()

  val queries: Map[String, Q] = Map(
    // ---- degree histogram: how many customers trade with exactly k
    // suppliers. Two cheap aggregations (node count ≪ edge count); the
    // histogram itself is at most |suppliers| buckets — driver-safe output
    // at any scale.
    "graph_degree_hist" -> ((s, d) =>
      edges(s, d)
        .groupBy("src").agg(count(lit(1)).as("outdeg"))
        .groupBy("outdeg").agg(count(lit(1)).as("n_nodes"))
        .orderBy("outdeg")),

    // ---- one damped power-iteration of supplier rank from uniform mass:
    // rank(s) = 0.15 + 0.85 · Σ_{c→s} 1/outdeg(c). The edge⋈outdeg join is
    // on src — the same key the edge distinct just shuffled on, so AQE
    // reuses the partitioning; the per-supplier aggregation is the only new
    // exchange. The Σ 1/outdeg mass sum folds through the fixed-point
    // qsum (order-independent BIGINT partials) so the rounded rank cannot
    // flake with shuffle-merge order.
    "graph_rank_step" -> ((s, d) => {
      val e = edges(s, d)
      val out = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
      e.join(out, "src")
        .groupBy(col("dst").as("s_suppkey"))
        .agg(count(lit(1)).as("in_deg"),
             round(lit(0.15) + lit(0.85) * FP.qsum(lit(1.0) / col("outdeg")), 4).as("rank"))
        .orderBy("s_suppkey")
    })
  )

  private val S = SqlText

  val oracles: Map[String, String] = Map(
    "graph_degree_hist" ->
      """WITH edges AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |outd AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)
        |SELECT outdeg, count(*) AS n_nodes FROM outd
        |GROUP BY outdeg ORDER BY outdeg""".stripMargin,

    "graph_rank_step" ->
      s"""WITH edges AS (SELECT DISTINCT o_custkey AS src, l_suppkey AS dst
         |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
         |outd AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src)
         |SELECT dst AS s_suppkey, count(*) AS in_deg,
         |  round(CAST(0.15 AS DOUBLE) + CAST(0.85 AS DOUBLE) *
         |    ${S.qsum("CAST(1.0 AS DOUBLE) / outdeg")}, 4) AS rank
         |FROM edges JOIN outd USING (src)
         |GROUP BY dst ORDER BY s_suppkey""".stripMargin
  )
}
