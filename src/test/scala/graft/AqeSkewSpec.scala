package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The platform-side twin of `skew_salted_join`: when you DON'T hand-salt,
  * AQE's OptimizeSkewedJoin detects an oversized shuffle partition at
  * runtime and splits it across reducers. This spec builds a genuinely
  * skewed shuffle join (one key holds half the rows), lowers the skew
  * thresholds to test scale, executes, and asserts the FINAL adaptive plan
  * marked the join `skew=true` — documenting when the engine does the
  * salting for you (shuffle joins under AQE) vs when the explicit salt in
  * ScaleOps is required (aggregations, engines without runtime re-plan).
  */
class AqeSkewSpec extends AnyFunSuite with SharedSparkSpec {

  test("AQE OptimizeSkewedJoin fires on a skewed shuffle join (no manual salt)") {
    val s = spark
    import s.implicits._
    val keys = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.adaptive.enabled", "true")
      s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      // test-scale thresholds: detect "hot partition" at tens of KB instead
      // of the production 256 MB default — the RULE under test is identical
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32768")
      s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16384")
      s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep it a shuffle join

      // fact: half the rows collapse onto key 0 (the "null user" shape);
      // padding makes partition byte sizes meaningful to the detector
      val fact = s.range(0, 200000)
        .select(when($"id" % 2 === 0, 0L).otherwise($"id").as("k"),
          concat(lit("pad_pad_pad_pad_"), $"id").as("pad"))
      val dim = s.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = fact.join(dim, "k")

      // execute THIS QueryExecution (toRdd.count materializes without
      // collecting rows) so executedPlan is the final adaptive plan
      val qe = joined.queryExecution
      qe.toRdd.count()
      val p = qe.executedPlan.toString
      assert(p.contains("isFinalPlan=true"), s"expected a finalized adaptive plan:\n$p")
      assert(p.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire (no skew=true join in final plan):\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
