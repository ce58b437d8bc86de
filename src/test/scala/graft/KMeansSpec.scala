package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{KMeans, Tables, Vectors => V}

/** Pins the multi-round Lloyd loop: monotone descent, agreement with the
  * oracle-checked single-round catalog query, and assignment optimality. */
class KMeansSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"
  private def emb = Tables.load(spark, d, "embeddings")
    .select(col("vec_id"), V.vd(col("embedding")).as("v"))

  test("lloyd: inertia is non-increasing across rounds (descent property)") {
    val (cents, inertia) = KMeans.lloyd(emb, k = 8, rounds = 5)
    assert(inertia.length == 5)
    inertia.sliding(2).foreach { case Seq(a, b) =>
      assert(b <= a + 1e-9, s"inertia must not increase: $inertia")
    }
    // genuine progress from the raw seeds, not a fixed point from round 1
    assert(inertia.last < inertia.head, s"no descent at all: $inertia")
    assert(cents.count() == 8, "no cluster should starve on this data")
  }

  test("lloyd round 1 reproduces the oracle-checked emb_kmeans_step centroids") {
    val (cents, _) = KMeans.lloyd(emb, k = 8, rounds = 1)
    val loop = cents.select(col("seed_id"), posexplode(col("c")))
      .select(col("seed_id"), (col("pos") + 1).cast("bigint").as("dim"),
        round(col("col"), 4).as("cv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val catalog = SparkEntry.queries("emb_kmeans_step")(spark, d)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(loop.keySet == catalog.keySet)
    for ((k, v) <- catalog)
      assert(loop(k) == v, s"centroid mismatch at (cluster,dim)=$k: loop=${loop(k)} catalog=$v")
  }

  test("assignment is optimal: every vector sits with its true nearest centroid") {
    val (cents, _) = KMeans.lloyd(emb, k = 4, rounds = 2)
    val assigned = KMeans.assign(emb, cents)
      .select("vec_id", "cluster", "dist2").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getDouble(2)))).toMap
    val centArr = cents.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    val vecs = emb.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    for ((id, v) <- vecs.take(200)) {
      val best = centArr.map { case (sid, c) =>
        (sid, v.zip(c).map { case (x, y) => (x - y) * (x - y) }.sum)
      }.minBy { case (sid, d2) => (d2, sid) }
      val (gotC, gotD) = assigned(id)
      assert(gotC == best._1 && math.abs(gotD - best._2) < 1e-9,
        s"vec $id: assigned ($gotC, $gotD) vs brute-force $best")
    }
  }
}
