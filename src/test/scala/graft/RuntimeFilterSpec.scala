package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Runtime bloom-filter join pruning (Spark's InjectRuntimeFilter): when a
  * shuffle join's build side carries a selective predicate, the optimizer
  * plants `bloom_filter_agg` on that side and a `might_contain` probe on
  * the fact side's scan — fact rows that can't join are dropped BEFORE the
  * shuffle. At 100 TB this is the difference between shuffling the whole
  * fact table and shuffling the ~1% that survives the dim filter; it
  * composes with (and precedes) the partition pruning and AQE specs. The
  * thresholds here are lowered to test scale — the RULE under test is the
  * production one.
  */
class RuntimeFilterSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("selective dim filter injects a bloom filter onto the fact scan side") {
    val s = spark
    val keys = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
    val saved = keys.map(k => k -> s.conf.getOption(k))
    try {
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      // production default demands a 10 GB fact scan before it bothers;
      // drop to 0 so the sf0.001 fact qualifies — the injection logic
      // (selective creation side, equi-join keys) is unchanged
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      s.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
      s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // keep it a shuffle join

      val li = Tables.load(s, d, "lineitem").select("l_orderkey", "l_quantity")
      val ord = Tables.load(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val q = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("qty"))
      val opt = q.queryExecution.optimizedPlan.toString
      assert(opt.contains("might_contain") && opt.contains("bloom_filter_agg"),
        s"expected a runtime bloom filter in the optimized plan:\n$opt")
      // and the result must equal the unfiltered-join answer
      val expected = Tables.load(s, d, "lineitem")
        .join(Tables.load(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT"),
          col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 4).as("qty"))
        .head()
      assert(q.head() == expected)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }
}
