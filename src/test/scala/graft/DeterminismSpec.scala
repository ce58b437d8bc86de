package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r4 item 1's "done" bar: the queries migrated to fixed-point
  * (order-independent) aggregates must produce BIT-identical rows when the
  * same plan runs under a different partitioning — a different shuffle
  * fan-out and different scan splits change partial-aggregate merge order,
  * which is exactly what flipped `emb_kmeans_step`'s rounded digit in r4. */
class DeterminismSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"

  private val targets = Seq(
    "emb_kmeans_step", "emb_centroids", "emb_whitening", "emb_mrl_retention",
    "emb_pq_error", "emb_quantize_error", "tx_token_entropy", "tx_bigram_lm",
    "graph_rank_step", "agg_winsorize",
    // the iterative closures: bit-identity must survive N rounds of
    // checkpoint-truncated loop, not just one aggregation
    "graph_rank_converged", "emb_kmeans_k3", "tx_bpe_merges",
    // MV maintenance: base+delta merge must stay exact under re-partitioning
    "etl_incremental_rollup",
    // windowed fixed-point moments: rolling z-scores over ordered frames
    "ts_anomaly")

  /** Run under an explicit (shuffle partitions, scan split) regime; Row
    * .toString prints doubles via Double.toString (shortest round-trip
    * form), so string equality is bit equality. */
  private def runAt(name: String, parts: Int, maxBytes: String): Seq[String] = {
    val prior = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", parts.toString)
      spark.conf.set("spark.sql.files.maxPartitionBytes", maxBytes)
      SparkEntry.queries(name)(spark, d).collect().map(_.toString).toSeq
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prior)
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
      // staged .cache() frames must not leak one regime's partitioning
      // into the next run
      spark.sharedState.cacheManager.clearCache()
    }
  }

  for (name <- targets)
    test(s"$name: bit-identical under 2-partition vs 13-partition execution") {
      val a = runAt(name, 2, "128m")
      val b = runAt(name, 13, "64k")
      assert(a.nonEmpty, s"$name returned no rows at sf0.001")
      assert(a == b, s"$name output depends on partitioning:\n" +
        a.zip(b).collect { case (x, y) if x != y => s"  $x\n  $y" }.take(3).mkString("\n"))
    }
}
