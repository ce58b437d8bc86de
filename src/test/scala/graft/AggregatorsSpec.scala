package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.{Aggregators, Tables}

/** Typed Aggregator semantics vs built-ins (partial→final merge included —
  * data is spread over multiple partitions). */
class AggregatorsSpec extends AnyFunSuite with SharedSparkSpec {

  test("WelfordMoments matches avg/var_samp on lineitem quantities") {
    import spark.implicits._
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val typedResult = li.select(col("l_quantity")).as[Double]
      .repartition(7)
      .select(new Aggregators.WelfordMoments().toColumn).head()
    val builtin = li.agg(count(lit(1)), avg("l_quantity"), var_samp(col("l_quantity"))).head
    assert(typedResult._1 == builtin.getLong(0))
    assert(math.abs(typedResult._2 - builtin.getDouble(1)) < 1e-9)
    assert(math.abs(typedResult._3 - builtin.getDouble(2)) < 1e-9)
  }

  test("TopK matches orderBy+limit per group") {
    import spark.implicits._
    val o = Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val typedTop = o.select(col("o_orderkey"), col("o_totalprice")).as[(Long, Double)]
      .repartition(5)
      .groupByKey(_ => 0)
      .agg(new Aggregators.TopK(5).toColumn)
      .head()._2
    val expected = o.orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(5).select("o_orderkey").collect().map(_.getLong(0)).toSeq
    assert(typedTop == expected)
  }
}
