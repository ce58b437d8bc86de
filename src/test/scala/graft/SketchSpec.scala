package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Sketch aggregates have no DuckDB oracle (engine-specific internals), so
  * their accuracy contract is pinned here instead: approximate answers must
  * sit within the algorithms' published error bounds of the exact answers
  * computed on the same data. */
class SketchSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("sketch_quantiles: every approximate quantile is within the GK rank bound of exact") {
    // percentile_approx(accuracy = a) guarantees rank error ≤ n/a
    val rows = SparkEntry.queries("sketch_quantiles")(spark, d).collect()
    assert(rows.nonEmpty)
    val orders = Tables.load(spark, d, "orders")
      .select(col("o_orderstatus"), col("o_totalprice")).cache()
    rows.foreach { r =>
      val (status, q, approx, n) =
        (r.getString(0), r.getDouble(1), r.getDouble(2), r.getLong(3))
      val group = orders.filter(col("o_orderstatus") === status)
        .orderBy("o_totalprice").collect().map(_.getDouble(1))
      assert(group.length == n, s"group size mismatch for $status")
      val targetRank = math.ceil(q * n).toLong.max(1)
      val maxRankErr = math.max(1L, n / 10000L + 1)
      // the returned value must be an actual element whose rank is within bound
      val lo = group(((targetRank - maxRankErr).max(1) - 1).toInt)
      val hi = group(((targetRank + maxRankErr).min(n) - 1).toInt)
      assert(approx >= lo && approx <= hi,
        s"$status q=$q: approx=$approx outside rank-bound window [$lo, $hi]")
    }
  }

  test("sketch_approx_distinct: within the 2% HLL relative error of exact counts") {
    val approx = SparkEntry.queries("sketch_approx_distinct")(spark, d).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, d, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      // rsd 0.02 → allow 5 sigma (=10%) to keep the test non-flaky while
      // still catching a broken sketch (which is off by orders of magnitude)
      assert(math.abs(a - e).toDouble / e <= 0.10,
        s"approx distinct for $k: $a vs exact $e")
    }
  }
}
