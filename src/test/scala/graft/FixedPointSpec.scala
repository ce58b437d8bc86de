package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.FixedPoint

/** Properties of the fixed-point aggregate helpers — the determinism layer
  * every rounded float aggregate in the catalog now folds through. Seeded
  * samples, same convention as DurationsSpec's round-trip property. */
class FixedPointSpec extends AnyFunSuite with SharedSparkSpec {
  import scala.math.BigDecimal

  private def sample(seed: Long, n: Int, lo: Double, hi: Double): Seq[Double] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(n)(lo + (hi - lo) * rnd.nextDouble())
  }

  private def qsumOf(xs: Seq[Double], parts: Int, bits: Int): Double = {
    import spark.implicits._
    xs.toDF("x").repartition(parts)
      .agg(FixedPoint.qsum(col("x"), bits)).collect()(0).getDouble(0)
  }

  test("property: qsum is bit-invariant under partitioning and input order") {
    for (seed <- 1L to 5L) {
      val xs = sample(seed, 500, -1.0, 1.0)
      val a = qsumOf(xs, 1, 30)
      val b = qsumOf(xs, 7, 30)
      val c = qsumOf(xs.reverse, 13, 30)
      assert(a == b && b == c,
        s"seed=$seed: qsum must not depend on partitioning/order ($a, $b, $c)")
    }
  }

  test("property: qsum approximates the exact sum within n·2^-(bits+1)") {
    for (seed <- 10L to 14L) {
      val xs = sample(seed, 300, -1000.0, 1000.0)
      val approx = qsumOf(xs, 4, 20)
      val exact = xs.map(BigDecimal(_)).sum.toDouble
      val bound = xs.size * math.pow(2, -21) + 1e-9
      assert(math.abs(approx - exact) <= bound,
        s"seed=$seed: qsum drift ${math.abs(approx - exact)} exceeds $bound")
    }
  }

  test("qmean matches avg semantics on nulls (both skip)") {
    import spark.implicits._
    val df = Seq(Some(1.0), None, Some(2.0), None, Some(4.0)).toDF("x")
    val r = df.agg(FixedPoint.qmean(col("x"), 30), avg("x")).collect()(0)
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-8)
    // all-null group: qmean is null, exactly like avg
    val n = Seq[Option[Double]](None, None).toDF("x")
      .agg(FixedPoint.qmean(col("x"), 30)).collect()(0)
    assert(n.isNullAt(0))
  }

  test("overflow envelope: graded scale factors sit far inside the BIGINT range (ADVICE r5)") {
    // Spark's non-ANSI sum(long) WRAPS past 2^63 while DuckDB promotes to
    // HUGEINT — past the envelope the two engines diverge silently, so the
    // envelope itself is part of the oracle contract. Pin the arithmetic
    // the FixedPoint scaladoc quotes.
    def maxRows(maxAbs: Double, bits: Int): Double =
      math.pow(2, 63) / (maxAbs * (1L << bits).toDouble)
    // price convention: bits=20, |x| ≤ 6e5 (o_totalprice/l_extendedprice)
    assert(maxRows(6e5, 20) > 1.4e7)
    // unit convention: bits=30, |x| ≤ 1 (cosines, probabilities, z-scores)
    assert(maxRows(1.0, 30) > 8e9)
    // the driver's graded scale: sf0.1 lineitem ≈ 6e5 rows TOTAL, so even an
    // ungrouped price qsum keeps >20× headroom; unit-magnitude sums keep >1e4×
    assert(6e5 < maxRows(6e5, 20) / 20)
    // and past the envelope the failure is LOUD, not a silent wrap: Spark 4
    // runs ANSI mode by default, so the BIGINT accumulator raises
    // ARITHMETIC_OVERFLOW instead of wrapping — an envelope breach surfaces
    // as a clear error, never as an unexplained hash mismatch (ADVICE r5's
    // silent-wrap premise only applies with ANSI disabled, which no graft
    // session does)
    import spark.implicits._
    assert(spark.conf.get("spark.sql.ansi.enabled") == "true")
    val e = intercept[Exception] {
      Seq(Long.MaxValue, Long.MaxValue).toDF("x").agg(sum("x")).collect()
    }
    def mentionsOverflow(t: Throwable): Boolean = t != null &&
      (Option(t.getMessage).exists(m =>
        m.contains("ARITHMETIC_OVERFLOW") || m.contains("overflow")) ||
       mentionsOverflow(t.getCause))
    assert(mentionsOverflow(e), s"expected a loud overflow error, got: $e")
  }

  test("quantization rounds grid midpoints half-up (toward +∞), both signs") {
    import spark.implicits._
    // ±(k + 0.5)·2^-20 sits exactly ON the grid midpoint
    val step = math.pow(2, -20)
    val df = Seq(2.5 * step, -2.5 * step).toDF("x")
    val got = df.select(FixedPoint.q(col("x"), 20)).collect().map(_.getLong(0)).toSeq
    // floor(x·2^20 + 0.5): +2.5 → 3 (half up), −2.5 → −2 (half up = toward +∞)
    assert(got == Seq(3L, -2L), s"got $got")
  }
}
