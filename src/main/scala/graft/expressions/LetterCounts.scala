package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Case-folded counts of the 26 ASCII Latin letters in ONE byte pass —
  * the single-scan kernel behind [[graft.operators.TextAnalysis.charEntropy]]
  * (the 26-×-`replace` column twin traverses the string 26 times and
  * allocates a copy per letter; this reads each byte once and allocates
  * nothing but the 26-slot result). Counting raw bytes is exact for any
  * valid UTF-8 input: ASCII byte values never occur inside a multi-byte
  * sequence, so byte hits equal codepoint hits. Returns a 26-element
  * long array indexed a→z. */
case class LetterCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"letter_counts expects a string column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    LetterCountKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.LetterCountKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): LetterCounts =
    copy(child = newChild)

  override def prettyName: String = "letter_counts"
}

object LetterCountKernel {
  /** Static kernel invoked from generated code (and interpreted eval). */
  def compute(text: UTF8String): ArrayData = {
    val counts = new Array[Long](26)
    val n = text.numBytes()
    var i = 0
    while (i < n) {
      val b = text.getByte(i)
      if (b >= 'a' && b <= 'z') counts(b - 'a') += 1
      else if (b >= 'A' && b <= 'Z') counts(b - 'A') += 1
      i += 1
    }
    new GenericArrayData(counts)
  }
}
