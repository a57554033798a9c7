package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-term occurrence counts of a FIXED literal term panel over a token
  * array, in ONE pass: returns a `terms.length`-element long array where
  * slot i is the number of tokens equal to `terms(i)`.
  *
  * Why a custom expression: the composable per-term form
  * `size(filter(toks, x => x === term))` is a higher-order function —
  * Catalyst evaluates those interpretively (lambda dispatch per element,
  * boxed rows, no whole-stage codegen for the enclosing stage) and scans
  * the token array once PER TERM. This was the suite's largest remaining
  * interpreted hot path (the `q_bm25_stored` scoring scan: ~79 s of the
  * sf10 probe was |panel| interpreted array traversals per document —
  * BASELINE.md round-12). Here the panel compiles once into a driver-built
  * UTF8String→index hash map that ships as a codegen reference object, and
  * the generated code is a single primitive loop per row — the
  * [[LetterCounts]] shape with a map probe instead of a byte range check.
  *
  * Exactness: a slot equals `size(filter(toks, _ === term))` bit-for-bit
  * (integer count; null tokens match nothing), so swapping it under the
  * BM25 arithmetic leaves every downstream score unchanged — the
  * `q_bm25_stored` oracle pins the round-trip.
  *
  * Role: this array-input form is the PROPERTY-TEST LADDER for the fused
  * [[PanelTermStats]] — `ExpressionPropertiesSpec` first pins it against
  * the interpreted `size(filter(...))` twin, then pins the fused kernel
  * against it + `size(tokens)` — and the array-input entry point for any
  * caller whose tokens are already materialized (custom tokenization).
  * The production scoring path always uses the fused form.
  */
case class TermFrequencies(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"term_frequencies expects array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val kernel = new TermFreqKernel(terms.toArray)

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termFreqKernel", kernel,
      classOf[TermFreqKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): TermFrequencies =
    copy(child = newChild)

  override def prettyName: String = "term_frequencies"
}

/** The FUSED form of [[TermFrequencies]] for the BM25 scoring hot path:
  * takes the raw text column, tokenizes INSIDE the kernel (one byte pass;
  * a token is a maximal run of non-0x20 bytes — exactly
  * `filter(split(text, " "), _ =!= "")`, since 0x20 never occurs inside a
  * multi-byte UTF-8 sequence), and returns a `terms.length + 1`-element
  * long array: slots 0..n-1 are the panel counts, slot n is the TOKEN
  * COUNT (the `size(tokens(text))` the BM25 length norm needs). Removes
  * the last interpreted piece of the scoring scan — the tokenize
  * ArrayFilter lambda — and never materializes the token array at all:
  * token probes are zero-copy byte views into the input string. */
case class PanelTermStats(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"panel_term_stats expects string, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val kernel = new PanelTermStatsKernel(terms.toArray)

  override def nullSafeEval(input: Any): Any =
    kernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("panelTermStatsKernel", kernel,
      classOf[PanelTermStatsKernel].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): PanelTermStats =
    copy(child = newChild)

  override def prettyName: String = "panel_term_stats"
}

/** The ONE copy of the term→slot map build both kernels share: UTF8String
  * keys compare by bytes (probes never decode the token); first
  * occurrence wins — mirrors the de-duplicated panels callers pass, a
  * duplicate term would otherwise split its counts. */
private object TermSlotMap {
  def build(terms: Array[String]): java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer](terms.length * 2)
    var i = 0
    while (i < terms.length) {
      if (!m.containsKey(UTF8String.fromString(terms(i))))
        m.put(UTF8String.fromString(terms(i)), i)
      i += 1
    }
    m
  }
}

class PanelTermStatsKernel(terms: Array[String]) extends Serializable {
  @transient private lazy val idx = TermSlotMap.build(terms)

  def compute(text: UTF8String): ArrayData = {
    val out = new Array[Long](terms.length + 1)
    val base = text.getBaseObject
    val off = text.getBaseOffset
    val n = text.numBytes()
    var i = 0
    var start = 0
    while (i <= n) {
      if (i == n || text.getByte(i) == 0x20) {
        if (i > start) {
          out(terms.length) += 1L
          val slot = idx.get(UTF8String.fromAddress(base, off + start, i - start))
          if (slot != null) out(slot.intValue()) += 1L
        }
        start = i + 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Static-shaped kernel shared by interpreted eval and generated code.
  * The term→slot map is built lazily per deserialized instance
  * ([[TermSlotMap]]). */
class TermFreqKernel(terms: Array[String]) extends Serializable {
  @transient private lazy val idx = TermSlotMap.build(terms)

  def compute(toks: ArrayData): ArrayData = {
    val counts = new Array[Long](terms.length)
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val slot = idx.get(toks.getUTF8String(i))
        if (slot != null) counts(slot) += 1L
      }
      i += 1
    }
    new GenericArrayData(counts)
  }
}
