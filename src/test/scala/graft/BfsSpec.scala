package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins engine.Bfs on planted graphs: layer-by-layer distances, multi-source
  * min-distance semantics, the hop-cap truncation contract shared with the
  * bounded recursive-CTE oracle, unreachable-node absence, and early exit. */
class BfsSpec extends AnyFunSuite with SharedSparkSpec {

  private def edgeDf(es: (Long, Long)*) = {
    import spark.implicits._
    es.toDF("src", "dst")
  }
  private def seedDf(ns: Long*) = {
    import spark.implicits._
    ns.toDF("node")
  }
  private def dists(res: org.apache.spark.sql.DataFrame): Map[Long, Long] =
    res.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  // directed path 0→1→2→3 plus an isolated island 9→10
  private val path = edgeDf(0L -> 1L, 1L -> 2L, 2L -> 3L, 9L -> 10L)

  test("single-source layers on a path; unreachable nodes are absent") {
    val r = dists(graft.engine.Bfs.run(path, seedDf(0L), maxRounds = 6))
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }

  test("multi-source BFS settles each node at the MIN seed distance") {
    // seeds at both ends of the path: node 1 is 1 hop from seed 0,
    // node 2 would be 2 hops from seed 0 but 0 hops from seed 2
    val r = dists(graft.engine.Bfs.run(path, seedDf(0L, 2L), maxRounds = 6))
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 0L, 3L -> 1L))
  }

  test("maxRounds truncates exactly like the oracle's bounded recursive CTE") {
    val r = dists(graft.engine.Bfs.run(path, seedDf(0L), maxRounds = 2))
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 2L), "node 3 (dist 3) must be cut")
  }

  test("cycles terminate via the settled anti-join (early empty frontier)") {
    val cyc = edgeDf(0L -> 1L, 1L -> 2L, 2L -> 0L)
    val r = dists(graft.engine.Bfs.run(cyc, seedDf(0L), maxRounds = 50))
    assert(r == Map(0L -> 0L, 1L -> 1L, 2L -> 2L))
  }

  test("duplicate seeds and duplicate edges do not duplicate rows") {
    val dup = edgeDf(0L -> 1L, 0L -> 1L)
    val res = graft.engine.Bfs.run(dup, seedDf(0L, 0L), maxRounds = 3)
    assert(res.count() == 2)
    assert(dists(res) == Map(0L -> 0L, 1L -> 1L))
  }

  test("catalog face graph_bfs_layers: layer counts are a partition of reached nodes") {
    val rows = SparkEntry.queries("graph_bfs_layers")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.nonEmpty)
    val d0 = rows.filter(_.getLong(0) == 0L)
    assert(d0.length == 1 && d0.head.getLong(1) == 0L,
      "layer 0 is the seed suppliers only — no customers at distance 0")
    // suppliers sit at odd distances' even layers… layers alternate sides in
    // a bipartite graph: customers at odd dist, suppliers at even dist
    for (r <- rows) {
      val (dist, nc, ns) = (r.getLong(0), r.getLong(1), r.getLong(2))
      if (dist % 2 == 0) assert(nc == 0L, s"bipartite: no customers at even dist $dist")
      else assert(ns == 0L, s"bipartite: no suppliers at odd dist $dist")
    }
  }
}
