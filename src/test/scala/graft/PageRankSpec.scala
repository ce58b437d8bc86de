package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{PageRank, Tables}

/** Pins the multi-round PageRank loop: agreement of round 1 with the
  * oracle-checked catalog step, the damping floor, mass monotonicity, and
  * strict contraction of the per-round delta. */
class PageRankSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"

  /** The customer→supplier bipartite edges with the two id spaces encoded
    * disjoint (customers even, suppliers odd) — the caller contract from
    * the PageRank scaladoc; outdegrees are unaffected by the encoding. */
  private def edges = Tables.load(spark, d, "orders")
    .join(Tables.load(spark, d, "lineitem"), col("o_orderkey") === col("l_orderkey"))
    .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    .distinct()

  test("round 1 reproduces the oracle-checked graph_rank_step supplier ranks") {
    val (ranks, _) = PageRank.run(edges, rounds = 1)
    val loop = ranks.filter(col("node") % 2 === 1)
      .select(((col("node") - 1) / 2).cast("bigint").as("s_suppkey"),
        round(col("rank"), 4).as("rank"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val catalog = SparkEntry.queries("graph_rank_step")(spark, d)
      .select("s_suppkey", "rank")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(loop.keySet == catalog.keySet)
    for ((k, v) <- catalog)
      assert(loop(k) == v, s"rank mismatch at supplier $k: loop=${loop(k)} catalog=$v")
  }

  test("every rank keeps the (1-damping) floor; leaked mass never grows") {
    val (r3, _) = PageRank.run(edges, rounds = 3)
    assert(r3.agg(min("rank")).head.getDouble(0) >= 0.15 - 1e-12)
    val n = r3.count().toDouble
    val (r1, _) = PageRank.run(edges, rounds = 1)
    val m1 = r1.agg(sum("rank")).head.getDouble(0)
    val m3 = r3.agg(sum("rank")).head.getDouble(0)
    // suppliers are sinks here: mass leaks monotonically, bounded below by
    // the damping floor — never conserved, never growing
    assert(m3 <= m1 + 1e-9, s"mass grew: round1=$m1 round3=$m3")
    assert(m3 >= 0.15 * n - 1e-9)
  }

  test("per-round max rank change contracts (convergence)") {
    val (_, deltas) = PageRank.run(edges, rounds = 4)
    assert(deltas.length == 4)
    // geometric contraction at rate <= damping once the loop is past the
    // uniform-start transient; assert strict decrease after round 2
    deltas.drop(1).sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-12, s"delta must contract: $deltas")
    }
    assert(deltas.last < deltas.head, s"no contraction at all: $deltas")
  }
}
