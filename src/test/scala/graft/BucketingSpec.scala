package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Bucketing: pre-shuffled storage layout → co-located joins with ZERO
  * exchanges. At 100 TB this is how repeated fact⋈fact joins on the same key
  * amortize their shuffle once at write time. */
class BucketingSpec extends AnyFunSuite with SharedSparkSpec {

  test("join of two tables bucketed on the key plans without exchanges") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    val d = "/root/testdata/sf0.001"
    Tables.load(spark, d, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .format("parquet").saveAsTable("b_orders")
    Tables.load(spark, d, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .format("parquet").saveAsTable("b_lineitem")

    val joined = spark.table("b_lineitem")
      .join(spark.table("b_orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 4).as("rev"))

    // disable broadcast so the join itself must pick a strategy; bucketed
    // layout must satisfy the distribution with no shuffle before the join
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      // the final groupBy may exchange on o_orderstatus; the JOIN KEYS must not
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey") &&
             !plan.contains("Exchange hashpartitioning(o_orderkey"),
        s"bucketed join must not shuffle its inputs:\n$plan")
      assert(plan.contains("Bucketed: true"), s"scan must report bucketed read:\n$plan")
      // and the result matches the unbucketed computation
      val expect = Tables.load(spark, d, "lineitem")
        .join(Tables.load(spark, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 4).as("rev"))
        .orderBy("o_orderstatus").collect().toSeq
      assert(joined.orderBy("o_orderstatus").collect().toSeq == expect)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
