package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization — the canonicalization pass that must run
  * BEFORE any content fingerprint/dedup at web scale: the same visible
  * text arrives both composed ("é", U+00E9) and decomposed ("e" + U+0301)
  * from different extraction pipelines, and without normalization the two
  * forms hash apart, so exact dedup silently misses them.
  *
  * Implemented as a native unary expression so the normalization stays
  * inside whole-stage codegen (no Row boxing, no UDF wall between the
  * scan and the fingerprint that consumes it). The per-value work calls
  * `java.text.Normalizer` — the JDK's Unicode implementation, which
  * matches DuckDB's `nfc_normalize` (both implement UAX #15 NFC). */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects string, got ${child.dataType}")

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)

  override def prettyName: String = "nfc_normalize"
}
