package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Quantiles

/** engine/Quantiles (two-phase bucketed exact selection) must be
  * BIT-IDENTICAL to the built-in exact percentile() — the whole point is
  * replacing percentile()'s per-group value buffer (executor memory grows
  * with the value domain) without moving a single output bit, so the
  * DuckDB-oracle faces that migrated onto it (agg_mad, agg_winsorize)
  * keep their hash matches. Seeded samples, same convention as
  * FixedPointSpec. */
class QuantilesSpec extends AnyFunSuite with SharedSparkSpec {

  private def sample(seed: Long, n: Int): Seq[(String, Double)] = {
    val rnd = new java.util.Random(seed)
    Seq.fill(n) {
      val g = s"g${rnd.nextInt(3)}"
      // mix of scales, negatives, and deliberate exact duplicates
      val v = rnd.nextInt(4) match {
        case 0 => rnd.nextDouble() * 1e5
        case 1 => -rnd.nextDouble() * 1e3
        case 2 => rnd.nextInt(50).toDouble // heavy duplication
        case _ => rnd.nextGaussian() * 7.25
      }
      (g, v)
    }
  }

  private val ps = Seq(0.0, 0.05, 0.5, 0.95, 1.0)

  test("property: exact() is bit-identical to percentile() across seeds, widths, partitionings") {
    import spark.implicits._
    for (seed <- 1L to 5L; width <- Seq(0.7, 64.0, 1e4); parts <- Seq(1, 7)) {
      val base = sample(seed, 501).toDF("g", "v").repartition(parts).cache()
      val got = Quantiles.exact(base, "g", "v", ps, width)
        .collect().map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
      val want = base.groupBy("g")
        .agg(percentile(col("v"), typedLit(ps)).as("qs"))
        .collect().flatMap { r =>
          val qs = r.getSeq[Double](1)
          ps.zipWithIndex.map { case (p, i) => (r.getString(0), p) -> qs(i) }
        }.toMap
      base.unpersist()
      assert(got.keySet == want.keySet, s"seed=$seed width=$width parts=$parts")
      for ((k, w) <- want)
        assert(java.lang.Double.doubleToLongBits(got(k)) ==
          java.lang.Double.doubleToLongBits(w),
          s"seed=$seed width=$width parts=$parts key=$k: got ${got(k)} want $w")
    }
  }

  test("edges: single-row group, two-row interpolation, all-equal values") {
    import spark.implicits._
    val base = (Seq(("a", 42.0)) ++ Seq(("b", 1.0), ("b", 2.0)) ++
      Seq.fill(9)(("c", 7.0))).toDF("g", "v").cache()
    val got = Quantiles.exact(base, "g", "v", Seq(0.5), 10.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("a" -> 42.0, "b" -> 1.5, "c" -> 7.0))
  }

  test("nulls are IGNORED, matching percentile() (ADVICE r12)") {
    import spark.implicits._
    // nulls interleave with real values: percentile() skips them; exact()
    // must too (pre-fix they entered the histogram and shifted ranks)
    val base = Seq(("a", Some(1.0)), ("a", None), ("a", Some(2.0)),
        ("a", None), ("a", Some(3.0)), ("b", None), ("b", Some(5.0)))
      .toDF("g", "v").cache()
    val got = Quantiles.exact(base, "g", "v", Seq(0.5), 10.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("a" -> 2.0, "b" -> 5.0))
    val want = base.groupBy("g")
      .agg(percentile(col("v"), lit(0.5)).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got == want, "null semantics must match the built-in")
  }

  test("ALL-null groups are dropped — the documented divergence from percentile() (ADVICE r13)") {
    import spark.implicits._
    // group "z" holds ONLY nulls: the built-in returns (z, null); exact()
    // documents that the group emits no row (it never reaches the
    // histogram) — pin both behaviors so the divergence stays exactly
    // this wide and a silent semantics change in either direction is loud
    val base = Seq(("a", Some(1.0)), ("a", Some(3.0)),
        ("z", None: Option[Double]), ("z", None))
      .toDF("g", "v").cache()
    val got = Quantiles.exact(base, "g", "v", Seq(0.5), 10.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(got == Map("a" -> 2.0), "all-null group must be absent, survivors exact")
    val builtin = base.groupBy("g")
      .agg(percentile(col("v"), lit(0.5)).as("q"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(builtin == Map("a" -> Some(2.0), "z" -> None),
      "the built-in keeps the all-null group as a null row — the contract exact() documents diverging from")
  }

  test("width must be positive; oversized bucket trips the gather guard (ADVICE r12)") {
    import spark.implicits._
    val base = Seq.fill(50)(("a", 7.0)).toDF("g", "v").cache()
    intercept[IllegalArgumentException] {
      Quantiles.exact(base, "g", "v", Seq(0.5), 0.0)
    }
    // 50 identical values land in ONE bucket — a gather budget of 10
    // must fail loudly (runtime skew guard), not silently gather 50
    val ex = intercept[Exception] {
      Quantiles.exact(base, "g", "v", Seq(0.5), 1.0, gatherLimit = 10L).collect()
    }
    // the guard message may sit on a nested cause (task-failure wrapping)
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("gather budget"),
      s"expected the skew-guard message, got: $msgs")
    // at the default budget the same frame still answers exactly
    val ok = Quantiles.exact(base, "g", "v", Seq(0.5), 1.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(ok == Map("a" -> 7.0))
  }
}
