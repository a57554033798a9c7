package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram shingles of a text column: tokenize on single spaces
  * (dropping empties), emit space-joined n-grams; texts with ≤ n tokens
  * yield one shingle of the whole token list (so no document drops out of
  * dedup).
  *
  * Why a custom expression: the composable form
  * `transform(sequence(...), i -> concat_ws(' ', element_at(toks,i), ...))`
  * stacks four interpreted higher-order functions and knocks the stage out
  * of whole-stage codegen (~23 µs/shingle measured). Generated code here
  * calls one static kernel — the stage stays fused and the kernel is a
  * plain JVM loop.
  *
  * Semantics are pinned by the DuckDB oracle twin:
  * `list_transform(generate_series(1, len(tk)-n+1), i ->
  *   array_to_string(tk[i:i+n-1], ' '))` over
  * `list_filter(string_split(text,' '), x -> x <> '')`.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean = false)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects a string column, got ${child.dataType}")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleKernel.compute(input.asInstanceOf[UTF8String], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.ShingleKernel.compute($c, $n, $distinct)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)

  override def prettyName: String = "word_shingles"
}

object ShingleKernel {
  /** Static kernel invoked from generated code (and from interpreted eval).
    * `distinct = true` dedups shingles at the source (first-occurrence
    * order) — set-semantics consumers (MinHash, Jaccard) then skip a whole
    * corpus-wide distinct shuffle. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = text.toString.split(" ").filter(_.nonEmpty)
    val out: Array[UTF8String] =
      if (toks.length <= n) Array(UTF8String.fromString(toks.mkString(" ")))
      else {
        val sb = new java.lang.StringBuilder(32)
        val raw = Array.tabulate(toks.length - n + 1) { i =>
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          sb.toString
        }
        val strings = if (distinct) raw.distinct else raw
        strings.map(UTF8String.fromString)
      }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  def compute(text: UTF8String, n: Int): ArrayData = compute(text, n, distinct = false)
}
