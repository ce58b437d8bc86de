package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Unicode NFC normalization — Spark has no builtin (SPARK-based
  * pipelines usually pay a Python UDF for this), yet canonical composition
  * is the FIRST transform every web-scale text pipeline applies: "café"
  * typed as `e`+U+0301 and as U+00E9 must hash, dedup, shingle, and join
  * identically or every downstream signature silently splits.
  *
  * Correctness contract: delegates to `java.text.Normalizer` (ICU-aligned
  * JDK implementation of UAX #15); the DuckDB oracle side is utf8proc's
  * `nfc_normalize`, so the `dd_nfc_normalize` hash gate is a per-row
  * cross-implementation equivalence proof between two independent Unicode
  * libraries — same framing as `jaro_winkler` vs DuckDB's builtin.
  *
  * Why native matters at 100 TB: the dominant case in any real corpus is
  * already-NFC ASCII. The fast path below detects pure-ASCII from the
  * UTF8String byte/char counts and returns the INPUT — zero String
  * materialization, zero copies — inside whole-stage codegen. Only rows
  * that actually contain multi-byte sequences pay the JDK normalizer
  * (and of those, already-composed text exits via `isNormalized` without
  * allocating the normalized copy).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression
    with ImplicitCastInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "nfc_normalize"

  override def nullSafeEval(input: Any): Any =
    NfcNormalize.normalize(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.NfcNormalize.normalize($c);")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

object NfcNormalize {
  def normalize(s: UTF8String): UTF8String = {
    // pure ASCII ⇔ every code point is one byte ⇔ numBytes == numChars;
    // ASCII is closed under NFC, so return the input untouched (no copy)
    if (s.numBytes() == s.numChars()) return s
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, java.text.Normalizer.Form.NFC)) s
    else UTF8String.fromString(
      java.text.Normalizer.normalize(str, java.text.Normalizer.Form.NFC))
  }
}
