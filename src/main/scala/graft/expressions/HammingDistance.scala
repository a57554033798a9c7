package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hamming distance between two equal-length ASCII strings (the SimHash
  * fingerprint comparison): number of differing byte positions. Null on
  * length mismatch. Codegen'd byte loop — the hot inner operation of
  * simhash candidate verification. Matches DuckDB's `hamming(a, b)` on
  * ASCII inputs (both count per-position mismatches). */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hamming expects (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String]
    val y = b.asInstanceOf[UTF8String]
    if (x.numBytes() != y.numBytes()) null
    else {
      var d = 0L
      var i = 0
      val n = x.numBytes()
      while (i < n) {
        if (x.getByte(i) != y.getByte(i)) d += 1
        i += 1
      }
      d
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val d = ctx.freshName("d")
      s"""
         |if ($a.numBytes() != $b.numBytes()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numBytes();
         |  long $d = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.getByte($i) != $b.getByte($i)) $d++;
         |  }
         |  ${ev.value} = $d;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HammingDistance =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hamming"
}
