package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** OPTIMIZATION r14: w7_ntile_nth / w8_percent_rank replaced their
  * low-cardinality `Window.partitionBy(o_orderstatus)` (an unsplittable
  * 3-task straggler at scale — guide §2.5) with rank arithmetic over the
  * two-level per-group row numbers. This spec pins the replacement's
  * VALUES equal to the built-in window functions row-for-row at two sfs,
  * so the decomposition can never drift from ntile/percent_rank/
  * cume_dist/nth_value semantics. */
class WindowDecompositionSpec extends AnyFunSuite with SharedSparkSpec {

  private def builtinW7(d: String) = {
    val order = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val full = order.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    graft.engine.Tables.load(spark, d, "orders")
      .withColumn("quartile", ntile(4).over(order).cast("bigint"))
      .withColumn("second_best", nth_value(col("o_orderkey"), 2).over(full))
      .select("o_orderkey", "o_orderstatus", "quartile", "second_best")
      .orderBy("o_orderkey")
  }

  private def builtinW8(d: String) = {
    val w = Window.partitionBy("o_orderstatus")
      .orderBy(col("o_totalprice").asc, col("o_orderkey").asc)
    graft.engine.Tables.load(spark, d, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"),
        round(percent_rank().over(w), 4).as("pr"),
        round(cume_dist().over(w), 4).as("cd"))
      .orderBy("o_orderkey")
  }

  for (d <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
    test(s"w7_ntile_nth: two-level rank arithmetic ≡ built-in ntile/nth_value ($d)") {
      val got = SparkEntry.queries("w7_ntile_nth")(spark, d).collect().toSeq
      val want = builtinW7(d).collect().toSeq
      assert(got == want)
    }
    test(s"w8_percent_rank: two-level rank arithmetic ≡ built-in percent_rank/cume_dist ($d)") {
      val got = SparkEntry.queries("w8_percent_rank")(spark, d).collect().toSeq
      val want = builtinW8(d).collect().toSeq
      assert(got == want)
    }
  }

  test("w7/w8 plans contain no Window operator (the unsplittable-key straggler)") {
    for (n <- Seq("w7_ntile_nth", "w8_percent_rank")) {
      val p = SparkEntry.queries(n)(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan.toString
      assert(!p.contains("RunningWindowFunction") && !p.contains("Window ["),
        s"$n still plans a Window operator:\n$p")
    }
    // w8 has no aggregate, so nothing in its plan may hash-cluster the
    // full frame on the 3-value status key. (w7's second_best aggregates
    // DO hash-exchange on status — but only after partial aggregation,
    // so the exchange carries |groups|×|map partitions| rows, not the
    // table; that exchange is the aggregate discipline, not a straggler.)
    val p8 = SparkEntry.queries("w8_percent_rank")(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString
    assert(!p8.contains("hashpartitioning(o_orderstatus"),
      s"w8 still hash-clusters on the 3-value status key:\n$p8")
  }
}
