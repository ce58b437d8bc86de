package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting with the degree-ordered orientation
  * (Schank–Wagner / Latapy "forward" algorithm, the standard MapReduce/
  * Spark formulation; see also Suri & Vassilvitskii, WWW'11).
  *
  * Input: an undirected simple graph as a distinct edge list with `u < v`.
  * Every edge is oriented from its (degree, id)-smaller endpoint to the
  * larger; each triangle then survives as exactly ONE wedge at its
  * smallest-rank apex, and per-node wedge fan-out is capped by the
  * ORIENTED out-degree — Σ C(outdeg, 2) = O(|E|^1.5) total wedge
  * candidates instead of Σ C(deg, 2), which is what keeps one hub node
  * (every real corpus has one) from generating deg² candidates. Three
  * shuffles: degree agg, wedge self-join on the apex, closing-edge
  * equi-join.
  */
object Triangles {

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
    val or = ed.select(
      when(lowFirst, col("u")).otherwise(col("v")).as("src"),
      when(lowFirst, col("v")).otherwise(col("u")).as("dst"),
      when(lowFirst, col("dv")).otherwise(col("du")).as("ddst"))
    // wedges at the apex, dst pair ordered by (degree, id) rank so each
    // candidate triangle is generated once; close with one equi-join
    // against the undirected edge set
    val wedges = or.as("x").join(or.as("y"),
        col("x.src") === col("y.src") &&
          (col("x.ddst") < col("y.ddst") ||
            (col("x.ddst") === col("y.ddst") && col("x.dst") < col("y.dst"))))
      .select(col("x.dst").as("b"), col("y.dst").as("c"))
    val undirected = e.select(col("u"), col("v"))
      .unionAll(e.select(col("v").as("u"), col("u").as("v")))
    val tri = wedges.join(undirected,
        col("b") === col("u") && col("c") === col("v"))
      .agg(count(lit(1)).as("n_triangles"))
    val shape = deg.agg(count(lit(1)).as("n_nodes"),
      (sum(col("dg") * (col("dg") - 1)) / 2).cast("bigint").as("n_wedges"))
    val nEdges = e.agg(count(lit(1)).as("n_edges"))
    shape.crossJoin(broadcast(nEdges)).crossJoin(broadcast(tri))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"), col("n_triangles"))
  }
}
