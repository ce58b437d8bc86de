package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.GraftExtensions

/** The custom as-of operator (LogicalPlan → Strategy → SparkPlan):
  * correctness on hand-built frames, null extension, multi-partition runs. */
class AsOfJoinSpec extends AnyFunSuite with SharedSparkSpec {

  private def frames = {
    import spark.implicits._
    val left = Seq(
      (1L, 100L, "p1"), (1L, 200L, "p2"), (1L, 50L, "p0"),
      (2L, 100L, "p3"), (3L, 500L, "p4"))
      .toDF("k", "t", "name")
    val right = Seq(
      (1L, 90L, "s1"), (1L, 150L, "s2"), (1L, 250L, "s3"),
      (2L, 100L, "s4"), (4L, 1L, "s5"))
      .toDF("rk", "rt", "rname")
    (left.repartition(5, col("k")), right.repartition(3, col("rk")))
  }

  test("backward as-of: latest right ≤ left time per key; no match → null") {
    GraftExtensions.install(spark)
    val (left, right) = frames
    val out = GraftExtensions.asofJoin(left, "k", "t", right, "rk", "rt")
      .select("name", "rname").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("p0") == null)  // before any signup for key 1
    assert(out("p1") == "s1")  // 90 ≤ 100 < 150
    assert(out("p2") == "s2")  // 150 ≤ 200 < 250
    assert(out("p3") == "s4")  // exact-time match included (≤)
    assert(out("p4") == null)  // key 3 has no right rows at all
  }

  test("null keys/times: left nulls emit null-extended rows, right nulls never join") {
    import spark.implicits._
    GraftExtensions.install(spark)
    // a NULL key must NOT unbox to 0L and join against key 0's rows
    val left = Seq(
      (Some(0L), Some(100L), "z1"), (None: Option[Long], Some(100L), "nk"),
      (Some(1L), None: Option[Long], "nt"), (Some(1L), Some(100L), "p1"))
      .toDF("k", "t", "name")
    val right = Seq(
      (Some(0L), Some(50L), "s0"), (None: Option[Long], Some(10L), "sn"),
      (Some(1L), None: Option[Long], "st"), (Some(1L), Some(90L), "s1"))
      .toDF("rk", "rt", "rname")
    val out = GraftExtensions
      .asofJoin(left.repartition(2, col("k")), "k", "t", right.repartition(2, col("rk")), "rk", "rt")
      .select("name", "rname").collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out("nk") == null)  // null key joins nothing (not key 0)
    assert(out("nt") == null)  // null time joins nothing
    assert(out("z1") == "s0")  // key 0 unaffected by the null-key row
    assert(out("p1") == "s1")  // null-keyed/timed right rows skipped, s1 found
  }

  test("physical plan is the custom exec with two key exchanges") {
    GraftExtensions.install(spark)
    val (left, right) = frames
    val df = GraftExtensions.asofJoin(left, "k", "t", right, "rk", "rt")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"expected custom exec:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).length <= 2, s"plan:\n$plan")
  }

  test("agrees with the window-based composition on the events table") {
    GraftExtensions.install(spark)
    val d = "/root/testdata/sf0.001"
    val custom = SparkEntry.queries("asof_join_custom")(spark, d).collect().toSeq
    val windowed = SparkEntry.queries("asof_join")(spark, d)
      .select("event_id", "user_id", "ts", "last_signup_ts").collect().toSeq
    assert(custom.nonEmpty)
    assert(custom == windowed)
  }
}
