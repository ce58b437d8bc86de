package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Add, Alias, Expression, Literal, NamedExpression, Round}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.plans.logical.{Window => WindowOp}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.DoubleType

/** Rounding-margin audit support (VERDICT r4 follow-up): rewrites a catalog
  * query's FINAL projection to emit the PRE-round value of every
  * `round(x, k)` double column, so callers can measure how far each output
  * cell sits from a half-grid rounding boundary ((m + 0.5)·10^-k). A cell
  * whose unrounded value is within ulp-noise of a boundary is a latent
  * hash flake: merge-order jitter in an order-sensitive float aggregate can
  * flip the rounded digit between runs (the r4 `emb_kmeans_step` failure).
  *
  * Only the top chain (Sort/Limit/Filter/Window over Project/Aggregate) is
  * rewritten — interior rounds below a join or aggregation boundary (e.g. a
  * rounded centroid inside a CTE) are real values the rest of the query
  * consumes and must stay rounded.
  *
  * HEURISTIC CAVEATS (this is an audit probe, not a semantics-preserving
  * transform): a Sort/Limit/Filter above a stripped alias now orders or
  * filters on the UNROUNDED value, so for top-k queries the audited row set
  * can differ from production by rows that tie at the rounded value — for
  * the fixed-point (deterministic) queries this is harmless, and the
  * remaining order-sensitive queries in the audit have no rounded-value
  * sorts. A Window above a stripped alias likewise sees unrounded input;
  * the catalog's window specs never partition or order by a rounded
  * column. */
object RoundStrip {

  /** Per-rounded-column metadata: `k` is the round scale; `canonicalized`
    * records whether the column rounds through the signed-zero-safe
    * `qround` shape — `round(x, k) + 0.0` ([[graft.engine.FixedPoint.qround]])
    * — which maps the `-0.0` that DuckDB's sign-preserving `round()` emits
    * for tiny negatives onto the `+0.0` Spark's BigDecimal-backed `round()`
    * already produces. An UN-canonicalized rounded column with negative
    * cells is the r5 `emb_kmeans_step` bug class: value-equal, bit-unequal
    * zeros that fail the driver's bit hash on every run. */
  final case class RoundInfo(k: Int, canonicalized: Boolean)

  /** Worst-margin audit result for one rounded output column. `negExposed`:
    * some cell's pre-round value is negative (or -0.0), so at SOME scale
    * factor a cell can round to a signed zero; `negZeroLive`: a cell at
    * THIS sf actually rounds to zero magnitude from a negative value — a
    * live cross-engine bit divergence unless canonicalized.
    * `engineRoundMismatch`: some cell at THIS sf rounds DIFFERENTLY under
    * the two engines' round() algorithms — Spark's BigDecimal.valueOf
    * rounds the double's SHORTEST decimal representation while DuckDB
    * rounds the EXACT binary value, and the two disagree when a value's
    * shortest repr terminates exactly on a 10^-(k+1) half boundary that
    * the binary value sits just below (r7 live failure: 0.31475 → Spark
    * 0.3148, DuckDB 0.3147). Being integer-exact does NOT protect against
    * this class — only dyadic boundary values (exactly representable, e.g.
    * 23/32) are safe ties. */
  final case class Cell(dist: Double, value: Double, ulp: Double,
                        canonicalized: Boolean, negExposed: Boolean,
                        negZeroLive: Boolean, engineRoundMismatch: Boolean)

  /** True when Spark's round-of-shortest-repr and DuckDB's
    * round-of-exact-binary disagree at scale k for this double — a
    * deterministic cross-engine red row, independent of merge order. */
  def enginesDisagree(v: Double, k: Int): Boolean = {
    if (v.isNaN || v.isInfinite) return false
    import java.math.{BigDecimal => JBD, RoundingMode}
    // Spark: BigDecimal.valueOf(v) == shortest decimal repr; HALF_UP.
    // DuckDB: exact binary expansion; half-away-from-zero == HALF_UP on
    // the absolute value (both engines round halves away from zero).
    val spark = JBD.valueOf(v).setScale(k, RoundingMode.HALF_UP)
    val duck = new JBD(v).setScale(k, RoundingMode.HALF_UP)
    spark.compareTo(duck) != 0
  }

  /** The stripped frame plus per-column [[RoundInfo]] for every
    * final-projection double column that had a `round`. Alias exprIds are
    * preserved so parent Sort/Limit references stay valid. */
  def strip(df: DataFrame): (DataFrame, Map[String, RoundInfo]) = {
    val ks = scala.collection.mutable.LinkedHashMap[String, RoundInfo]()
    def isZeroLit(e: Expression): Boolean = e match {
      case Literal(v: Double, DoubleType) => v == 0.0
      case _ => false
    }
    def stripNamed(ne: NamedExpression): NamedExpression = ne match {
      case a @ Alias(child, name) =>
        var k0: Option[Int] = None
        val canon = child.exists {
          case Add(_: Round, z, _) if isZeroLit(z) => true
          case Add(z, _: Round, _) if isZeroLit(z) => true
          case _ => false
        }
        val stripped = child.transform {
          case r: Round if r.dataType == DoubleType =>
            r.scale match {
              case Literal(k: Int, _) =>
                k0 = Some(k0.fold(k)(math.min(_, k))); r.child
              case _ => r
            }
        }
        k0 match {
          case Some(k) =>
            ks(name) = RoundInfo(k, canon)
            Alias(stripped, name)(exprId = a.exprId, qualifier = a.qualifier,
              explicitMetadata = a.explicitMetadata)
          case None => a
        }
      case other => other
    }
    // Descend through the row-wise top chain (Sort/Limit/Filter/Project —
    // a stripped alias keeps its exprId, so upstream references stay valid
    // and simply observe the unrounded value); STOP at an Aggregate after
    // stripping its own expressions: below it, a rounded value is an input
    // the rest of the pipeline genuinely consumes.
    def top(p: LogicalPlan): LogicalPlan = p match {
      case s: Sort        => s.copy(child = top(s.child))
      case l: GlobalLimit => l.copy(child = top(l.child))
      case l: LocalLimit  => l.copy(child = top(l.child))
      case f: Filter      => f.copy(child = top(f.child))
      // descend through Window: an SCD2-shaped plan (Project over Window
      // over Aggregate) keeps its rounded aggregate BELOW the window node,
      // and skipping it left etl_scd2's day_rev invisible to the audit
      case w: WindowOp    => w.copy(child = top(w.child))
      case pr: Project    => pr.copy(projectList = pr.projectList.map(stripNamed),
                                     child = top(pr.child))
      case ag: Aggregate  => ag.copy(aggregateExpressions = ag.aggregateExpressions.map(stripNamed))
      case other          => other
    }
    val plan = top(ColumnBridge.logicalPlan(df))
    (ColumnBridge.ofRows(df.sparkSession, plan), ks.toMap)
  }

  /** Per-cell distance from the nearest rounding boundary of the 10^-k grid
    * (absolute, in value units). 0 means the unrounded value sits exactly ON
    * a boundary double. */
  def boundaryDistance(v: Double, k: Int): Double = {
    val p = math.pow(10, k)
    val d = math.abs(v) * p
    val frac = d - math.floor(d)
    math.abs(frac - 0.5) / p
  }

  /** A value that rounds to ZERO MAGNITUDE at the 10^-k grid from the
    * negative side — Spark (BigDecimal) emits +0.0 for it, DuckDB (IEEE)
    * emits -0.0. Round-half-away-from-zero: |v|·10^k < 0.5 rounds to zero;
    * an exact 0.5 tie rounds AWAY, i.e. non-zero. */
  def roundsToNegZero(v: Double, k: Int): Boolean =
    isNegativeOrNegZero(v) && math.abs(v) * math.pow(10, k) < 0.5

  private def isNegativeOrNegZero(v: Double): Boolean =
    v < 0.0 || (v == 0.0 && java.lang.Double.doubleToRawLongBits(v) != 0L)

  /** Executes the stripped plan and returns, per rounded column, the worst
    * boundary-margin cell plus signed-zero exposure ([[Cell]]). Non-finite
    * cells are skipped for the margin — they round deterministically — but
    * still feed the negative-exposure scan. */
  def audit(df: DataFrame): Map[String, Cell] = {
    val (stripped, ks) = strip(df)
    if (ks.isEmpty) return Map.empty
    val names = ks.keys.toSeq
    val rows = stripped.select(names.map(org.apache.spark.sql.functions.col): _*).collect()
    names.zipWithIndex.flatMap { case (name, i) =>
      val RoundInfo(k, canon) = ks(name)
      val all = rows.iterator.filterNot(_.isNullAt(i)).map(_.getDouble(i)).toSeq
      val negExposed = all.exists(v => !v.isNaN && isNegativeOrNegZero(v))
      val negLive = all.exists(v => !v.isNaN && roundsToNegZero(v, k))
      val cells = all.filter(v => !v.isNaN && !v.isInfinite)
      if (cells.isEmpty) None
      else {
        val (dist, v, u) = cells.iterator
          .map(v => (boundaryDistance(v, k), v, math.ulp(v))).minBy(_._1)
        // the disagreement test is only non-trivial within a hair of a
        // boundary — restrict the BigDecimal work to that sliver
        val mismatch = cells.iterator
          .filter(c => boundaryDistance(c, k) < 1e-9)
          .exists(c => enginesDisagree(c, k))
        Some(name -> Cell(dist, v, u, canon, negExposed, negLive, mismatch))
      }
    }.toMap
  }
}
