package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Tables

/** Sketch accuracy contracts. Since round 3 the catalog queries themselves
  * emit the bound check (approx-vs-exact boolean, DuckDB-oracle-able as a
  * literal TRUE); this spec pins the SEMANTICS behind those booleans — the
  * raw sketch values must sit within the algorithms' published error bounds
  * of exact answers recomputed independently here — so a query that
  * accidentally weakened its in-query bound would still fail. */
class SketchSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.001"

  test("sketch_quantiles: rank_ok booleans all true; raw approx quantiles within GK rank bound") {
    val rows = SparkEntry.queries("sketch_quantiles")(spark, d).collect()
    assert(rows.nonEmpty)
    // catalog face: (o_orderstatus, q, n, rank_ok) — every bound check green
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("rank_ok")),
        s"rank bound violated for ${r.getString(0)} q=${r.getDouble(1)}")
    }
    // independent re-derivation: the raw percentile_approx values must be
    // actual elements whose rank is within n/accuracy of the target rank
    val qs = Seq(0.5, 0.95, 0.99)
    val approx = Tables.load(spark, d, "orders")
      .groupBy("o_orderstatus")
      .agg(percentile_approx(col("o_totalprice"), array(qs.map(lit): _*), lit(10000)).as("pq"),
           count(lit(1)).as("n"))
      .collect()
    val orders = Tables.load(spark, d, "orders")
      .select(col("o_orderstatus"), col("o_totalprice")).cache()
    approx.foreach { r =>
      val status = r.getString(0)
      val pq = r.getSeq[Double](1)
      val n = r.getLong(2)
      val group = orders.filter(col("o_orderstatus") === status)
        .orderBy("o_totalprice").collect().map(_.getDouble(1))
      assert(group.length == n, s"group size mismatch for $status")
      qs.zip(pq).foreach { case (q, a) =>
        val targetRank = math.ceil(q * n).toLong.max(1)
        val maxRankErr = math.max(1L, n / 10000L + 1)
        val lo = group(((targetRank - maxRankErr).max(1) - 1).toInt)
        val hi = group(((targetRank + maxRankErr).min(n) - 1).toInt)
        assert(a >= lo && a <= hi,
          s"$status q=$q: approx=$a outside rank-bound window [$lo, $hi]")
      }
    }
  }

  test("sketch_approx_distinct: within_bound booleans all true; raw HLL within error of exact") {
    val rows = SparkEntry.queries("sketch_approx_distinct")(spark, d).collect()
    assert(rows.nonEmpty)
    // catalog face: (l_returnflag, n, exact_parts, within_bound) — all green
    // (the catalog bound is 5 sigma = 10%; the tight observed-error check
    // lives below, where a flaky-by-design assert can't fail the oracle)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("within_bound")),
        s"HLL 5-sigma bound violated for ${r.getString(0)}")
    }
    // independent re-derivation with a looser 5-sigma window (a broken
    // sketch is off by orders of magnitude, not percent)
    val approx = Tables.load(spark, d, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("ad"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.load(spark, d, "lineitem")
      .groupBy("l_returnflag").agg(countDistinct("l_partkey").as("nd"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      val a = approx(k)
      assert(math.abs(a - e).toDouble / e <= 0.10,
        s"approx distinct for $k: $a vs exact $e")
    }
  }

  test("sketch_hll_union: bound booleans all true; union of partial sketches ≈ global distinct") {
    val rows = SparkEntry.queries("sketch_hll_union")(spark, d).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(r.fieldIndex("group_ok")) && r.getBoolean(r.fieldIndex("union_ok")),
        s"HLL bound violated for ${r.getString(0)}")
    }
    // the mergeability contract itself: estimate(union(per-group sketches))
    // must approximate the DIRECT global sketch of the same column — the
    // whole point of persisting sketch partials instead of raw keys
    val o = Tables.load(spark, d, "orders")
    val viaUnion = o.groupBy("o_orderpriority")
      .agg(hll_sketch_agg(col("o_custkey"), lit(12)).as("sk"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
      .collect()(0).getLong(0)
    val direct = o.agg(hll_sketch_estimate(hll_sketch_agg(col("o_custkey"), lit(12))))
      .collect()(0).getLong(0)
    // identical value sets hitting identical register layouts: the union of
    // per-group sketches over a PARTITION of the rows is the same sketch
    // state as one pass — exact equality, not just within-error
    assert(viaUnion == direct,
      s"union-of-partials $viaUnion != direct sketch $direct")
  }

  test("misra-gries: planted heavy hitter survives with a bounded undercount") {
    import spark.implicits._
    // 30% of the stream is one token, the tail is 200 near-unique tokens —
    // the regime the 16-counter summary exists for (hot > n/17 ≈ 5.9%)
    val stream = (Seq.fill(3000)("hot") ++
      (0 until 7000).map(i => s"tail_${i % 200}")).toDF("tok")
      .repartition(8) // force multi-partition partial→final merges
    val mg = udaf(new graft.engine.Aggregators.MisraGries(16),
      org.apache.spark.sql.Encoders.STRING)
    val m = stream.agg(mg(col("tok"))).head.getMap[String, Long](0)
    val n = 10000L
    assert(m.contains("hot"), s"heavy hitter must survive, summary: $m")
    assert(m.size <= 16, s"summary must stay bounded, got ${m.size}")
    assert(m("hot") <= 3000L, "estimates never overcount")
    assert(m("hot") >= 3000L - n / 17, s"undercount beyond n/(w+1): ${m("hot")}")
    // every surviving estimate obeys the same two-sided bound
    val exact = Map("hot" -> 3000L).withDefault(k => 7000L / 200)
    for ((k, est) <- m) {
      assert(est <= exact(k) + 0, s"$k overcounts: $est > ${exact(k)}")
      assert(est >= exact(k) - n / 17)
    }
  }

  test("sketch_hll_intersect: inclusion-exclusion consistent, bound holds") {
    val r = SparkEntry.queries("sketch_hll_intersect")(spark, "/root/testdata/sf0.001")
      .collect().head
    val (a, b, u, inter) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(u <= a + b && u >= math.max(a, b), "union bracketed by the parts")
    assert(inter == a + b - u, "exact intersection is exact inclusion-exclusion")
    assert(inter >= 0 && inter <= math.min(a, b), "intersection bracketed")
    assert(r.getBoolean(4), "sketch I-E estimate within the union-scaled bound")
  }
}
