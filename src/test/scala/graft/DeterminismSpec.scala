package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r4 item 1's "done" bar: the queries migrated to fixed-point
  * (order-independent) aggregates must produce BIT-identical rows when the
  * same plan runs under a different partitioning — a different shuffle
  * fan-out and different scan splits change partial-aggregate merge order,
  * which is exactly what flipped `emb_kmeans_step`'s rounded digit in r4. */
class DeterminismSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"

  /** VERDICT r5 item 6: enumerate the fixed-point set DYNAMICALLY from
    * MarginAudit (the single classification source), so a query added there
    * cannot skip this gate. tx_bpe_merges rides along explicitly — its
    * outputs are integers (not rounded doubles), so it has no MarginAudit
    * row, but its N-round checkpoint-truncated loop is exactly the shape
    * this spec exists to pin. */
  private val targets =
    (MarginAudit.fixedPointQueries + "tx_bpe_merges")
      .filter(SparkEntry.queries.contains).toSeq.sorted

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

  /** AQE regime parity: adaptive execution re-plans joins, coalesces
    * shuffle partitions, and splits skewed ones at RUNTIME — a different
    * physical execution than the static plan. Representative queries from
    * the join/agg/window/iterative families must produce bit-identical
    * rows either way; a mismatch means a result depends on the runtime
    * partition geometry, which AQE changes freely at 100 TB. */
  private def runAqe(name: String, enabled: Boolean): Seq[String] = {
    val prior = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", enabled.toString)
      SparkEntry.queries(name)(spark, d).collect().map(_.toString).toSeq
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prior)
      spark.sharedState.cacheManager.clearCache()
    }
  }

  for (name <- Seq("q1_agg", "j5_join_multiway", "q2_min_cost_supp",
                   "st_sessionize", "dd_clusters", "w10_dist_frames"))
    test(s"$name: bit-identical with AQE on vs off") {
      val on = runAqe(name, enabled = true)
      val off = runAqe(name, enabled = false)
      assert(on.nonEmpty && on == off,
        s"$name output depends on the AQE runtime re-plan")
    }
}
