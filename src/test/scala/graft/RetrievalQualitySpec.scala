package graft

import org.scalatest.funsuite.AnyFunSuite

/** End-goal quality checks for the approximate pipelines: LSH dedup must
  * actually FIND the planted duplicates, and the ANN probe must agree with
  * exact brute force where they overlap. Hash-matching the oracle proves
  * determinism; these prove the algorithms do their job. */
class RetrievalQualitySpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("LSH dedup recall: every planted exact duplicate is found with est_jaccard = 1") {
    val pairs = SparkEntry.queries("dd_lsh_pairs")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // planted exact copies: doc_id % 40 == 0 → doc_id + 2_000_000
    val docs = graft.engine.Tables.load(spark, d, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val expectedExact = docs.filter(_ % 40 == 0).map(id => (id, id + 2000000L)).toSet
    val foundExact = pairs.filter(_._3 == 1.0).map(p => (p._1, p._2)).toSet
    val missed = expectedExact -- foundExact
    assert(missed.isEmpty, s"LSH missed exact duplicates: $missed")

    // planted near-copies (2 appended tokens): most must surface with high est
    val expectedNear = docs.filter(_ % 25 == 0).map(id => (id, id + 1000000L)).toSet
    val foundNearCount = expectedNear.count(p => pairs.exists(q => (q._1, q._2) == p))
    assert(foundNearCount >= expectedNear.size * 0.8,
      s"LSH found only $foundNearCount of ${expectedNear.size} planted near-dups")
  }

  test("dd_clusters keep-list: planted copies share their original's cluster") {
    val labels = SparkEntry.queries("dd_clusters")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs = graft.engine.Tables.load(spark, d, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    // every planted exact copy (id+2M) must land in the same component as
    // its original — transitivity through any shared near-dup is fine, so
    // compare canonical labels, not raw ids
    val exactMissed = docs.filter(_ % 40 == 0)
      .filter(id => labels(id + 2000000L) != labels(id))
    assert(exactMissed.isEmpty, s"exact copies not clustered with originals: $exactMissed")
    // near-copies follow the LSH pair recall bar (≥80%)
    val nearIds = docs.filter(_ % 25 == 0)
    val nearHit = nearIds.count(id => labels(id + 1000000L) == labels(id))
    assert(nearHit >= nearIds.length * 0.8,
      s"only $nearHit of ${nearIds.length} near-copies clustered with originals")
    // keep-list sanity: each cluster's canonical is its own canonical, and
    // untouched docs are singletons kept as themselves
    labels.values.foreach(c => assert(labels(c) == c, s"canonical $c not a fixpoint"))
  }

  test("SimHash near-dup recall: planted exact copies at Hamming distance 0") {
    val near = SparkEntry.queries("dd_simhash_near")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val docs = graft.engine.Tables.load(spark, d, "documents")
      .select("doc_id").collect().map(_.getLong(0))
    val expectedExact = docs.filter(_ % 40 == 0).map(id => (id, id + 2000000L)).toSet
    val zeroHam = near.filter(_._3 == 0L).map(p => (p._1, p._2)).toSet
    val missed = expectedExact -- zeroHam
    assert(missed.isEmpty, s"SimHash missed exact duplicates: $missed")
  }

  test("embedding near-dup pairs recover the planted perturbed vectors") {
    val pairs = SparkEntry.queries("sim_neardup_pairs")(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val vecs = graft.engine.Tables.load(spark, d, "embeddings")
      .select("vec_id").collect().map(_.getLong(0))
    val planted = vecs.filter(_ % 20 == 0).map(id => (id, id + 1000000L)).toSet
    val found = planted.intersect(pairs.toSet)
    // LSH bucketing on 64-dim vectors with a 1-coordinate perturbation: the
    // pair collides unless the perturbation flips a hyperplane sign
    assert(found.size >= planted.size * 0.8,
      s"recovered only ${found.size} of ${planted.size} planted embedding near-dups")
    // and nothing except planted pairs passes the 0.9 cosine bar (original
    // corpus max within-label cosine is ~0.48)
    assert(pairs.toSet.subsetOf(planted),
      s"unexpected non-planted pairs: ${pairs.toSet -- planted}")
  }

  test("ANN probe agrees with exact top-k inside the probed bucket") {
    val exact = SparkEntry.queries("sim_topk_exact")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    val ann = SparkEntry.queries("sim_ann_topk")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(2)))
    // every ANN hit must carry the same cosine the exact pass computed
    ann.foreach { case (id, cos) =>
      assert(exact.get(id).forall(_ == cos),
        s"ANN cosine for $id disagrees with exact scan")
    }
    assert(ann.nonEmpty)
  }
}
