package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared Jaro–Winkler kernel, callable from both the interpreted eval and
  * the generated code (one implementation, the `UTF8String.levenshteinDistance`
  * pattern). Byte-grain (exact on ASCII — pre-normalize wider text with
  * [[NfcNormalize]]/lower like the other string kernels), semantics pinned
  * to DuckDB's `jaro_winkler_similarity` so the oracle lane hash-matches:
  *
  *  - either side empty → 0.0 (DuckDB returns 0 even for two empties);
  *  - match window = max(len)/2 − 1 (floored, min 0), greedy left-to-right
  *    first-unmatched pairing;
  *  - transpositions t = ⌊k/2⌋ where k counts order mismatches between the
  *    two matched sequences (INTEGER halving — probed empirically: DuckDB
  *    scores ("abcdef","bcadef") as t=1 from k=3, not t=1.5);
  *  - jaro = (m/l1 + m/l2 + (m−t)/m) / 3;
  *  - Winkler boost only when jaro > 0.7: +prefix·0.1·(1−jaro), common
  *    prefix capped at 4.
  */
object JaroWinklerSim {
  def compute(x: UTF8String, y: UTF8String): Double = {
    val n1 = x.numBytes()
    val n2 = y.numBytes()
    if (n1 == 0 || n2 == 0) return 0.0
    val window = {
      val w = math.max(n1, n2) / 2 - 1
      if (w < 0) 0 else w
    }
    val flags2 = new Array[Boolean](n2)
    val matched1 = new Array[Byte](if (n1 < n2) n1 else n2)
    var m = 0
    var i = 0
    while (i < n1) {
      val lo = math.max(0, i - window)
      val hi = math.min(n2 - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!flags2(j) && x.getByte(i) == y.getByte(j)) {
          flags2(j) = true
          matched1(m) = x.getByte(i)
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var k = 0
    var idx = 0
    var j = 0
    while (j < n2) {
      if (flags2(j)) {
        if (y.getByte(j) != matched1(idx)) k += 1
        idx += 1
      }
      j += 1
    }
    val t = k / 2
    val jaro = (m.toDouble / n1 + m.toDouble / n2 + (m - t).toDouble / m) / 3.0
    var p = 0
    val maxP = math.min(4, math.min(n1, n2))
    while (p < maxP && x.getByte(p) == y.getByte(p)) p += 1
    if (jaro > 0.7) jaro + p * 0.1 * (1.0 - jaro) else jaro
  }
}

/** Exact common-byte-multiset size Σ_b min(cnt_x(b), cnt_y(b)) — the sound
  * upper bound on Jaro's match count m (the window can only REDUCE
  * matches), shared by eval and codegen as one static kernel. O(|x|+|y|)
  * with a thread-local 256-slot counter (no per-pair allocation): count
  * x's bytes up, walk y decrementing. */
object JaroCommonBytesKernel {
  private val tl = new ThreadLocal[Array[Int]] {
    override def initialValue(): Array[Int] = new Array[Int](256)
  }
  def commonBytes(x: UTF8String, y: UTF8String): Long = {
    val cnt = tl.get()
    java.util.Arrays.fill(cnt, 0)
    var i = 0
    val nx = x.numBytes()
    while (i < nx) { cnt(x.getByte(i) & 0xff) += 1; i += 1 }
    var m = 0L
    var j = 0
    val ny = y.numBytes()
    while (j < ny) {
      val b = y.getByte(j) & 0xff
      if (cnt(b) > 0) { cnt(b) -= 1; m += 1 }
      j += 1
    }
    m
  }
}

/** Common-byte-multiset count as a codegen'd expression (one static call —
  * the generated code stays far below the JVM method limit, unlike an
  * unrolled 26-class Column tree, whose ~150-node boolean collapsed the
  * join condition out of whole-stage codegen and ran 27× slower
  * interpreted). The candidate-bound primitive under
  * [[graft.operators.Linkage.jaroBound]]. */
case class JaroCommonBytes(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_common_bytes expects (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = LongType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroCommonBytesKernel.commonBytes(
      a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.JaroCommonBytesKernel.commonBytes($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroCommonBytes =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_common_bytes"
}

/** Jaro–Winkler similarity in [0, 1] between two strings — the classic
  * record-linkage field comparator (typo-tolerant, prefix-weighted; the
  * measure Winkler built for Census name matching). Complements the exact
  * agreement weights in [[graft.operators.Linkage.scorePairs]] and the
  * edit-distance lane in Dedup: JW is O(len·window) per pair and rewards
  * shared prefixes, which is what human-keyed identifiers actually share.
  * Runs per CANDIDATE pair only — always behind blocking, never a cross
  * product. Null if either input is null; codegen'd via a static call so
  * the whole-stage span stays intact. */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler expects (string, string), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerSim.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.expressions.JaroWinklerSim.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaro_winkler"
}
