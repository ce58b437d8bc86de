package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.classic.Strategy

/** A whole-operator custom plan (SURVEY.md §2.10 path (c), spark_guide
  * "Custom operator"): per-key backward as-of join — for every left row,
  * append the single latest right row whose time ≤ the left row's time
  * (same key), or nulls if none.
  *
  * Physical algorithm: both sides hash-distributed on the key
  * (requiredChildDistribution) and sorted by (key, time)
  * (requiredChildOrdering), then a zipPartitions merge walk — O(n+m) per
  * partition, zero extra shuffle beyond the two key exchanges, no range
  * explosion. This is the plan shape a 100 TB telemetry⋈weather alignment
  * needs; the window-based composition (queries.ScaleOps."asof_join") is the
  * built-in-first alternative with one shuffle on a pre-unioned input.
  *
  * The operator is deliberately narrow (Long key, Long time on both sides) —
  * the point is the complete LogicalPlan → Strategy → SparkPlan → extension
  * path, result-checked against the same DuckDB oracle as the composed form.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(leftTime, org.apache.spark.sql.catalyst.expressions.Ascending)),
    Seq(SortOrder(rightKey, org.apache.spark.sql.catalyst.expressions.Ascending),
      SortOrder(rightTime, org.apache.spark.sql.catalyst.expressions.Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKey = BindReferences.bindReference(leftKey, left.output)
    val lTime = BindReferences.bindReference(leftTime, left.output)
    val rKey = BindReferences.bindReference(rightKey, right.output)
    val rTime = BindReferences.bindReference(rightTime, right.output)
    val rightSchema = right.output
    val outputAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
      val joined = new JoinedRow
      val nullRight = InternalRow.fromSeq(Seq.fill(rightSchema.length)(null))
      // buffered walk over the sorted right side; remember the latest right
      // row ≤ current left (same key)
      // Tie-break semantics: a right row with time EQUAL to the left row's
      // time matches (backward-inclusive, `ht <= t`) regardless of any
      // secondary ordering. The window-based formulation (ScaleOps
      // "asof_join") additionally tie-breaks equal timestamps by event_id,
      // so the two diverge only when a key has a left and right row at the
      // SAME time instant with the right row's event_id larger — callers
      // needing the window's exact tie-break should encode it into the time
      // column (e.g. time*K + seq); callers needing strictly-before should
      // pre-shift the right side's time by one tick.
      // NULL handling: SQL-style. NULL-keyed/timed right rows match nothing
      // and are skipped; NULL-keyed/timed left rows emit null-extended
      // output (a null key equals nothing, it must NOT unbox to key 0).
      val rBuf = rIt.buffered
      var curKey: Long = Long.MinValue
      var lastRight: InternalRow = null
      lIt.map { lRow =>
        val kAny = lKey.eval(lRow)
        val tAny = lTime.eval(lRow)
        if (kAny == null || tAny == null) {
          proj(joined(lRow, nullRight))
        } else {
          val k = kAny.asInstanceOf[Long]
          val t = tAny.asInstanceOf[Long]
          if (k != curKey) { curKey = k; lastRight = null }
          // advance right cursor through all rows with (key < k) or
          // (key == k && time <= t); retain the last matching row
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val head = rBuf.head
            val hkAny = rKey.eval(head)
            val htAny = rTime.eval(head)
            if (hkAny == null || htAny == null) { rBuf.next() } // null never joins
            else {
              val hk = hkAny.asInstanceOf[Long]
              val ht = htAny.asInstanceOf[Long]
              if (hk < k) { rBuf.next() } // other key's rows before ours: skip
              else if (hk == k && ht <= t) { lastRight = rBuf.next().copy() }
              else advancing = false
            }
          }
          val r = if (lastRight != null) lastRight else nullRight
          proj(joined(lRow, r))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends Strategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt) :: Nil
    case _ => Nil
  }
}
