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
