package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with the degree-ordered orientation
  * (Schank–Wagner / Latapy "forward" algorithm, the standard MapReduce/
  * Spark formulation; see also Suri & Vassilvitskii, WWW'11).
  *
  * Input: an undirected simple graph as a distinct edge list with `u < v`.
  * Every edge is oriented from its (degree, id)-smaller endpoint to the
  * larger; a triangle a→b, a→c, b→c (ranks a<b<c) is then found exactly
  * once, at its lowest-rank EDGE (a,b), as a common out-neighbor of a and
  * b. Counting is Σ over oriented edges of |adjOut(src) ∩ adjOut(dst)| —
  * the adjacency-intersection form, which never materializes the wedge
  * set: the r6 rewrite of the wedge-self-join form, which shuffled
  * Σ C(outdeg,2) candidate rows (~6M at sf0.1, measured 2× slower) only
  * to discard most at the closing join.
  *
  * Scale shape: out-adjacency lists are bounded by the ORIENTED out-degree
  * — O(√|E|) per node regardless of hub degree (the orientation's whole
  * point; a raw adjacency list of a hub node would be O(|V|)). Shuffles:
  * degree agg, adjacency agg, and the edge⋈adjacency joins on src/dst —
  * all O(|E|) rows; the per-row sorted-array intersection is
  * O(outdeg(src) + outdeg(dst)). AQE broadcasts the adjacency side when
  * it is small; at 100 TB it shuffle-joins co-partitioned on the edge key.
  */
object Triangles {

  /** The census over a PREPARED orientation: `or` = the degree-oriented
    * edge frame (src, dst), `adj` = its sorted out-adjacency (n, nbrs) —
    * for callers that maintain the orientation as a committed per-snapshot
    * artifact (the graph_triangles/graph_truss_support layouts), so each
    * run pays only the intersection walk, never the degree agg + rank
    * compare + collect_list rebuild. Same counting as [[census]]. */
  def censusPrepared(e0: DataFrame, or: DataFrame, adj: DataFrame): DataFrame = {
    val e = e0.select(col("u"), col("v"))
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg"))
    val tri = or
      .join(adj.select(col("n").as("src"), col("nbrs").as("srcN")), Seq("src"))
      .join(adj.select(col("n").as("dst"), col("nbrs").as("dstN")), Seq("dst"), "left")
      .select(when(col("dstN").isNull, lit(0L))
        .otherwise(size(array_intersect(col("srcN"), col("dstN"))).cast("bigint")).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
    val shape = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("dg") * (col("dg") - 1)) / 2).cast("bigint").as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    shape.crossJoin(broadcast(nEdges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"))
  }

  /** One-row frame: n_nodes, n_edges, n_wedges (unordered paths of length
    * 2, the clustering denominator), n_triangles. */
  def census(e0: DataFrame): DataFrame = {
    val e = e0.select(col("u"), col("v")).cache()
    val deg = e.select(col("u").as("n")).unionAll(e.select(col("v").as("n")))
      .groupBy("n").agg(count(lit(1)).as("dg")).cache()
    val ed = e
      .join(deg.select(col("n").as("u"), col("dg").as("du")), "u")
      .join(deg.select(col("n").as("v"), col("dg").as("dv")), "v")
    val lowFirst = col("du") < col("dv") ||
      (col("du") === col("dv") && col("u") < col("v"))
    // NOT cached despite two consumers: measured at sf0.1, forcing a
    // broadcast of deg + caching this frame regressed census 6.6 s → 42 s
    // (the cache barrier hides stats from AQE and serializes the two
    // consumers behind one materialization); the planner's shared-exchange
    // reuse handles the duplication better than we can by hand
    val or = ed.select(
      when(lowFirst, col("u")).otherwise(col("v")).as("src"),
      when(lowFirst, col("v")).otherwise(col("u")).as("dst"))
    // oriented out-adjacency, sorted so the intersection is a merge walk
    val adj = or.groupBy(col("src").as("n"))
      .agg(sort_array(collect_list(col("dst"))).as("nbrs"))
    val tri = or
      .join(adj.select(col("n").as("src"), col("nbrs").as("srcN")), Seq("src"))
      // left: a dst may have no out-edges (highest-rank nodes never do)
      .join(adj.select(col("n").as("dst"), col("nbrs").as("dstN")), Seq("dst"), "left")
      .select(when(col("dstN").isNull, lit(0L))
        .otherwise(size(array_intersect(col("srcN"), col("dstN"))).cast("bigint")).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
    val shape = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("dg") * (col("dg") - 1)) / 2).cast("bigint").as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    shape.crossJoin(broadcast(nEdges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"))
  }
}
