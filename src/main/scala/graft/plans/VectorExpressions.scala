package graft.plans

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Native fused cosine similarity: dot product and BOTH norms in one pass
  * over the element pairs, inside whole-stage codegen.
  *
  * The composed form `dot(a,b) / (norm(a) * norm(b))` evaluates three
  * interpreted higher-order folds (zip_with + aggregate each) per pair — on
  * the k-NN join that is 3 lambda-tree walks × |candidates|, and on an
  * all-pairs-within-bucket near-dup check it dominates the stage. This
  * expression is one tight loop per pair.
  *
  * Semantics are BIT-IDENTICAL to the composed form on every well-formed
  * input (property-checked in PlansSpec): the three accumulators are
  * independent left folds over the same element order, so each equals its
  * separate-pass value exactly; a length mismatch or a null element gives
  * null in both (zip_with null-pads the shorter side, and a null poisons
  * the fold). The ONE deliberate difference is the degenerate zero-norm /
  * empty-vector case: Spark's Divide THROWS there under ANSI (the session
  * default) and returns null otherwise — this expression always returns
  * null (try_divide semantics), because at 100 TB one all-zero embedding
  * should yield a null similarity, not kill the stage.
  */
case class CosineSim(left: Expression, right: Expression) extends BinaryExpression
    with ImplicitCastInputTypes {
  // implicit casting: a raw array<float> embedding column (the module's
  // documented domain) gets a Cast node injected by the analyzer instead of
  // an AnalysisException; array<double> inputs stay cast-free
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def checkInputDataTypes() = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim needs two array<double> inputs, got $other")
    }
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any =
    CosineSim.cos(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Double ${ev.value}_r = graft.plans.CosineSim.cos($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.doubleValue(); }
    """)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  /** Boxed return so codegen can express the null-on-mismatch case. Exposed
    * as a static for codegen. */
  def cos(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (b.numElements() != n) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null // degenerate vector: null, never a thrown error
    else java.lang.Double.valueOf(dot / (math.sqrt(na) * math.sqrt(nb)))
  }
}
