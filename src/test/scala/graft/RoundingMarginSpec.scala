package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.plans.RoundStrip

/** VERDICT r4 item 2: every catalog query that still rounds an
  * ORDER-SENSITIVE float aggregate (moment-based corr/regr/stddev/covar,
  * avg/sum of doubles not yet migrated to fixed-point) must keep every
  * output cell far from a 10^-k/2 rounding boundary at the driver's graded
  * scale — otherwise shuffle-merge ulp noise can flip the rounded digit
  * between runs and poison a future round's hash compare.
  *
  * The bar is distance > max(1e-9, 64·ulp(value)): the VERDICT's absolute
  * floor, scaled up for large-magnitude sums whose merge noise is
  * proportionally larger. The fixed-point queries (DeterminismSpec) are
  * audited too — for them any margin is safe, but the audit documents it. */
class RoundingMarginSpec extends AnyFunSuite with SharedSparkSpec {
  private val d = "/root/testdata/sf0.01"

  /** Queries whose final rounded doubles still fold order-sensitively:
    * moment-based corr/regr/stddev/covar merges can't be fixed-pointed
    * without changing their semantics, so they live or die by margin. (The
    * magnitudes here are ≤ ~1e4, so 64·ulp is far below the 5e-5 grid.) */
  private val orderSensitive = Seq(
    "agg_corr_regr", "agg_mad", "emb_pca_power", "tx_zipf_fit", "tx_tfidf")

  /** Migrated to fixed-point aggregates — deterministic by construction;
    * audited anyway to document the margins (set lives with MarginAudit so
    * the standalone full-catalog audit applies the same bars). */
  private val fixedPoint =
    MarginAudit.fixedPointQueries.toSeq.sorted.filter(SparkEntry.queries.contains)
      // ts_gapfill's rounds live BELOW the forward-fill join (inside the
      // hourly CTE), outside RoundStrip's top-chain scope — the audit main
      // simply skips it; the spec would false-fail on "nothing to audit".
      .filterNot(_ == "ts_gapfill")

  for ((name, ulpScaled) <- orderSensitive.map((_, true)) ++ fixedPoint.map((_, false)))
    test(s"$name: no output cell within ulp-noise of a rounding boundary (sf0.01)") {
      val worst = RoundStrip.audit(SparkEntry.queries(name)(spark, d))
      assert(worst.nonEmpty, s"$name has no rounded double output to audit")
      for ((colName, (dist, v, u)) <- worst) {
        // the bar and the dist==0 semantics live with MarginAudit so the
        // spec and the standalone audit cannot drift: deterministic
        // queries get the absolute floor (an exact tie is reproducible
        // and both engines round it identically); order-sensitive folds
        // get the 64·ulp merge-noise band, where dist == 0 is the WORST
        // margin, not a safe tie.
        val det = !ulpScaled
        val bar = MarginAudit.bar(det, u)
        assert((dist == 0.0 && det) || dist >= bar,
          f"$name.$colName: value $v%.12g sits $dist%.3e from a rounding boundary " +
            f"(bar $bar%.3e) — migrate this aggregate to FixedPoint.qsum/qmean")
      }
      spark.sharedState.cacheManager.clearCache()
    }
}
