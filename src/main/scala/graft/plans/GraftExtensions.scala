package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{And, Expression, ExpressionInfo,
  GreaterThanOrEqual, If, LessThanOrEqual, Literal}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: eliminate duration-codec round-trips —
  * parse(format(x)) → x ONLY where parse∘format is provably the identity,
  * and format(parse(x)) is left alone (format is not injective on its
  * domain: '61:09:999' re-emits as '01:01:09:999').
  *
  * parse∘format == id holds for |x| ≤ 9999999:59:59:999 in millis
  * (35_999_999_999_999): beyond that, format emits an 8+-digit leading hour
  * group that parse (by its golden-fixture contract, f6_parse_edges)
  * rejects to NULL — and abs(Long.MinValue) overflows before format even
  * runs. So the rewrite guards with an explicit BETWEEN (a blanket
  * parse(format(x)) → x would change results at the extremes): in range →
  * x, out of range → NULL, null → null (If's false branch). Still removes
  * the whole parse cost from the canonicalizer's
  * validate-re-emit-re-validate chains.
  */
object EliminateDurationRoundTrip extends Rule[LogicalPlan] {
  /** largest millis whose formatted leading hour group stays ≤ 7 digits. */
  val MaxRoundTrip: Long = 9999999L * 3600000L + 59L * 60000L + 59L * 1000L + 999L

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case ParseF1Duration(FormatF1Duration(inner)) =>
        If(And(GreaterThanOrEqual(inner, Literal(-MaxRoundTrip, LongType)),
               LessThanOrEqual(inner, Literal(MaxRoundTrip, LongType))),
          inner, Literal(null, LongType))
    }
}

/** SparkSessionExtensions entry point — for cluster use:
  *   spark.sql.extensions=graft.plans.GraftExtensions
  * Injects the native codec functions and the round-trip eliminator. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.parseFn)
    ext.injectFunction(GraftExtensions.formatFn)
    ext.injectFunction(GraftExtensions.tokenHashesFn)
    ext.injectFunction(GraftExtensions.minhashSigFn)
    ext.injectFunction(GraftExtensions.shingleHashesFn)
    ext.injectFunction(GraftExtensions.simhash24Fn)
    ext.injectFunction(GraftExtensions.cdcChunksFn)
    ext.injectFunction(GraftExtensions.cosineSimFn)
    ext.injectFunction(GraftExtensions.jaroWinklerFn)
    ext.injectFunction(GraftExtensions.nfcNormalizeFn)
    ext.injectOptimizerRule(_ => EliminateDurationRoundTrip)
    ext.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}

object GraftExtensions {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column-API entry points for the native codec expressions (Spark 4's
    * Column no longer exposes .expr; the bridge converts). */
  def parseF1Duration(c: Column): Column =
    ColumnBridge.toColumn(ParseF1Duration(ColumnBridge.toExpression(c)))
  def formatF1Duration(c: Column): Column =
    ColumnBridge.toColumn(FormatF1Duration(ColumnBridge.toExpression(c)))
  def tokenHashes(c: Column): Column =
    ColumnBridge.toColumn(TokenHashes(ColumnBridge.toExpression(c)))
  def minhashSig(c: Column): Column =
    ColumnBridge.toColumn(MinHashSig(ColumnBridge.toExpression(c)))
  def shingleHashes(c: Column): Column =
    ColumnBridge.toColumn(ShingleHashes(ColumnBridge.toExpression(c)))
  def simhash24(c: Column): Column =
    ColumnBridge.toColumn(SimHash24(ColumnBridge.toExpression(c)))
  def cdcChunks(c: Column): Column =
    ColumnBridge.toColumn(CdcChunks(ColumnBridge.toExpression(c)))
  def cosineSim(a: Column, b: Column): Column =
    ColumnBridge.toColumn(CosineSim(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))

  def jaroWinkler(a: Column, b: Column): Column =
    ColumnBridge.toColumn(JaroWinkler(ColumnBridge.toExpression(a), ColumnBridge.toExpression(b)))

  def nfcNormalize(c: Column): Column =
    ColumnBridge.toColumn(NfcNormalize(ColumnBridge.toExpression(c)))

  private type FnDef = (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val parseFn: FnDef = (
    FunctionIdentifier("parse_f1_duration"),
    new ExpressionInfo(classOf[ParseF1Duration].getName, "parse_f1_duration"),
    (args: Seq[Expression]) => ParseF1Duration(args.head))

  val formatFn: FnDef = (
    FunctionIdentifier("format_f1_duration"),
    new ExpressionInfo(classOf[FormatF1Duration].getName, "format_f1_duration"),
    (args: Seq[Expression]) => FormatF1Duration(args.head))

  val tokenHashesFn: FnDef = (
    FunctionIdentifier("token_hashes"),
    new ExpressionInfo(classOf[TokenHashes].getName, "token_hashes"),
    (args: Seq[Expression]) => TokenHashes(args.head))

  val minhashSigFn: FnDef = (
    FunctionIdentifier("minhash_sig"),
    new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
    (args: Seq[Expression]) => MinHashSig(args.head))

  val shingleHashesFn: FnDef = (
    FunctionIdentifier("shingle_hashes"),
    new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
    (args: Seq[Expression]) => ShingleHashes(args.head))

  val simhash24Fn: FnDef = (
    FunctionIdentifier("simhash24"),
    new ExpressionInfo(classOf[SimHash24].getName, "simhash24"),
    (args: Seq[Expression]) => SimHash24(args.head))

  val cdcChunksFn: FnDef = (
    FunctionIdentifier("cdc_chunks"),
    new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
    (args: Seq[Expression]) => CdcChunks(args.head))

  val cosineSimFn: FnDef = (
    FunctionIdentifier("cosine_sim"),
    new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
    (args: Seq[Expression]) => CosineSim(args(0), args(1)))

  val jaroWinklerFn: FnDef = (
    FunctionIdentifier("jaro_winkler"),
    new ExpressionInfo(classOf[JaroWinkler].getName, "jaro_winkler"),
    (args: Seq[Expression]) => JaroWinkler(args(0), args(1)))

  val nfcNormalizeFn: FnDef = (
    FunctionIdentifier("nfc_normalize"),
    new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
    (args: Seq[Expression]) => NfcNormalize(args.head))

  /** Install into an already-running session (tests / notebooks): registers
    * the SQL functions, the optimizer rule, and the as-of join strategy. */
  def install(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("parse_f1_duration", args => ParseF1Duration(args.head), "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("format_f1_duration", args => FormatF1Duration(args.head), "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("token_hashes", args => TokenHashes(args.head), "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("minhash_sig", args => MinHashSig(args.head), "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("shingle_hashes", args => ShingleHashes(args.head), "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("simhash24", args => SimHash24(args.head), "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("cdc_chunks", args => CdcChunks(args.head), "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("cosine_sim", args => CosineSim(args(0), args(1)), "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("jaro_winkler", args => JaroWinkler(args(0), args(1)), "scala_udf")
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("nfc_normalize", args => NfcNormalize(args.head), "scala_udf")
    if (!spark.experimental.extraOptimizations.contains(EliminateDurationRoundTrip))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ EliminateDurationRoundTrip
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
  }

  /** Custom-operator as-of join (graft.plans.AsOfJoinPlan): for each left
    * row, the latest right row with rightTime ≤ leftTime in the same key
    * group; right columns null when none. Key and time columns (by name)
    * must be LONG. The expressions are resolved here against the analyzed
    * child plans — a Column would carry a lazy ColumnNodeExpression the
    * analyzer only resolves for built-in operators.
    * Requires install(spark) / the extensions conf. */
  def asofJoin(left: org.apache.spark.sql.DataFrame, leftKey: String, leftTime: String,
               right: org.apache.spark.sql.DataFrame, rightKey: String, rightTime: String): org.apache.spark.sql.DataFrame = {
    val lp = ColumnBridge.logicalPlan(left)
    val rp = ColumnBridge.logicalPlan(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not in ${p.output.map(_.name)}"))
    val plan = AsOfJoinPlan(lp, rp,
      attr(lp, leftKey), attr(lp, leftTime), attr(rp, rightKey), attr(rp, rightTime))
    ColumnBridge.ofRows(left.sparkSession, plan)
  }
}
