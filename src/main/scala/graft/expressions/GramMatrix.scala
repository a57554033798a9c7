package graft.expressions

import java.math.BigInteger
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Mutable accumulator for [[GramMatrixAgg]]: per-dimension counts/sums and
  * the upper-triangle Σxᵢxⱼ cross-moments in 128-bit (hi, lo) pairs.
  *
  * Layout: dimensions are 0-based here (1-based in the output); the
  * upper-triangle cell (i, j), i ≤ j < d, lives at
  * `k = i·d − i(i−1)/2 + (j − i)` — row-major over rows of shrinking
  * length, re-laid-out on the rare dimension growth (vectors of differing
  * lengths). 128-bit accumulation because a single product reaches 1e14
  * (1e6-unit quantization of |x| ≤ 10 components) and a long sum of those
  * wraps silently after ~9e4 worst-case rows — far below corpus scale; the
  * (hi, lo) pair is exact to ±1.7e38, the same headroom as the
  * decimal(38,0) lane it feeds. */
final class GramBuffer(var d: Int) {
  var n: Array[Long] = new Array[Long](d)       // vectors with length > i
  var s: Array[Long] = new Array[Long](d)       // Σ xu_i over non-null cells
  var sCnt: Array[Long] = new Array[Long](d)    // non-null cells per dim
  var hi: Array[Long] = new Array[Long](cells(d))
  var lo: Array[Long] = new Array[Long](cells(d))
  var pCnt: Array[Long] = new Array[Long](cells(d)) // non-null products per cell

  @inline private def cells(dd: Int): Int = dd * (dd + 1) / 2
  @inline def idx(i: Int, j: Int): Int = i * d - i * (i - 1) / 2 + (j - i)

  /** Add a signed 64-bit product into cell k's 128-bit accumulator. */
  @inline def add128(k: Int, v: Long): Unit = {
    val l = lo(k)
    val nl = l + v
    // carry out of the unsigned low-word addition (standard bit identity)
    val carry = ((l & v) | ((l | v) & ~nl)) >>> 63
    lo(k) = nl
    hi(k) += (v >> 63) + carry // sign-extend v's high word, plus the carry
  }

  /** Grow to `nd` dimensions, re-laying-out the triangle arrays. */
  def grow(nd: Int): Unit = {
    if (nd <= d) return
    val (on, os, osc, ohi, olo, opc, od) = (n, s, sCnt, hi, lo, pCnt, d)
    d = nd
    n = java.util.Arrays.copyOf(on, nd)
    s = java.util.Arrays.copyOf(os, nd)
    sCnt = java.util.Arrays.copyOf(osc, nd)
    hi = new Array[Long](cells(nd))
    lo = new Array[Long](cells(nd))
    pCnt = new Array[Long](cells(nd))
    var i = 0
    while (i < od) {
      val oBase = i * od - i * (i - 1) / 2 - i
      val nBase = i * nd - i * (i - 1) / 2 - i
      var j = i
      while (j < od) {
        hi(nBase + j) = ohi(oBase + j)
        lo(nBase + j) = olo(oBase + j)
        pCnt(nBase + j) = opc(oBase + j)
        j += 1
      }
      i += 1
    }
  }

  def mergeIn(o: GramBuffer): Unit = {
    grow(o.d)
    var i = 0
    while (i < o.d) {
      n(i) += o.n(i); s(i) += o.s(i); sCnt(i) += o.sCnt(i)
      var j = i
      while (j < o.d) {
        val k = idx(i, j)
        val ok = o.idx(i, j)
        val l = lo(k); val v = o.lo(ok)
        val nl = l + v
        val carry = ((l & v) | ((l | v) & ~nl)) >>> 63
        lo(k) = nl
        hi(k) += o.hi(ok) + carry
        pCnt(k) += o.pCnt(ok)
        j += 1
      }
      i += 1
    }
  }
}

/** One-pass exact Gram/raw-moment aggregate over quantized embedding
  * vectors (`array<long>` of 1e6-unit components) — the d²-bounded train
  * kernel behind [[graft.operators.Similarity.covarianceMatrix]].
  *
  * Replaces the i ≤ j nested-posexplode + hash-aggregate formulation,
  * which multiplied every corpus row ×d(d+1)/2 through an exchange-fed
  * aggregate (optimization guide §2.3 "aggregate before you shuffle" /
  * §5): this aggregate does the d(d+1)/2 multiply-adds per row inside one
  * partial-aggregate pass, so the only thing that ever moves is the
  * ~50 KB buffer per partition. Exactness contract unchanged: products
  * are exact in long (|xu| ≤ ~1e7 ⇒ |x·y| ≤ 1e14), cross-row sums in
  * 128-bit, surfaced as decimal(38,0) — bit-for-bit the values the
  * decimal(38,0)/HUGEINT lane produced.
  *
  * Null semantics mirror the explode form: a per-dim count `n` counts
  * vector cells (null or not — posexplode emitted them), `s`/`sxy`
  * sum only non-null cells/products and surface NULL when no non-null
  * contribution exists (SQL `sum` over an all-NULL group).
  *
  * Output: struct(n: array<long>, s: array<long>,
  * cells: array<struct(i: long, j: long, sxy: decimal(38,0))>) with
  * 1-based i ≤ j over the maximum observed vector length. */
case class GramMatrixAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[GramBuffer] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"gram_matrix expects array<bigint>, got $t")
  }

  override def nullable: Boolean = false

  private val cellType = StructType(Seq(
    StructField("i", LongType, nullable = false),
    StructField("j", LongType, nullable = false),
    StructField("sxy", DecimalType(38, 0), nullable = true)))

  override def dataType: DataType = StructType(Seq(
    StructField("n", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("s", ArrayType(LongType, containsNull = true), nullable = false),
    StructField("cells", ArrayType(cellType, containsNull = false), nullable = false)))

  override def createAggregationBuffer(): GramBuffer = new GramBuffer(0)

  override def update(b: GramBuffer, input: InternalRow): GramBuffer = {
    val v = child.eval(input)
    if (v == null) return b
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val len = arr.numElements()
    if (len > b.d) b.grow(len)
    var i = 0
    while (i < len) {
      b.n(i) += 1
      if (!arr.isNullAt(i)) {
        val xi = arr.getLong(i)
        b.s(i) += xi
        b.sCnt(i) += 1
        var j = i
        var k = b.idx(i, i)
        while (j < len) {
          if (!arr.isNullAt(j)) {
            b.add128(k, xi * arr.getLong(j))
            b.pCnt(k) += 1
          }
          j += 1
          k += 1
        }
      }
      i += 1
    }
    b
  }

  override def merge(b: GramBuffer, o: GramBuffer): GramBuffer = {
    b.mergeIn(o); b
  }

  override def eval(b: GramBuffer): Any = {
    val d = b.d
    val nArr = new GenericArrayData(b.n.map(x => x: Any))
    val sArr = new GenericArrayData(Array.tabulate[Any](d)(i =>
      if (b.sCnt(i) == 0) null else b.s(i)))
    val cells = new Array[Any](d * (d + 1) / 2)
    var i = 0
    var c = 0
    while (i < d) {
      var j = i
      while (j < d) {
        val k = b.idx(i, j)
        val sxy: Any =
          if (b.pCnt(k) == 0) null
          else {
            // 128-bit (hi, lo) → BigInteger → decimal(38,0)
            val bi = BigInteger.valueOf(b.hi(k)).shiftLeft(64)
              .add(new BigInteger(java.lang.Long.toUnsignedString(b.lo(k))))
            Decimal(new java.math.BigDecimal(bi), 38, 0)
          }
        cells(c) = InternalRow((i + 1).toLong, (j + 1).toLong, sxy)
        c += 1
        j += 1
      }
      i += 1
    }
    InternalRow(nArr, sArr, new GenericArrayData(cells))
  }

  override def serialize(b: GramBuffer): Array[Byte] = {
    val d = b.d
    val nc = d * (d + 1) / 2
    val buf = ByteBuffer.allocate(4 + 8 * (3 * d + 3 * nc))
    buf.putInt(d)
    var i = 0
    while (i < d) { buf.putLong(b.n(i)); buf.putLong(b.s(i)); buf.putLong(b.sCnt(i)); i += 1 }
    var k = 0
    while (k < nc) { buf.putLong(b.hi(k)); buf.putLong(b.lo(k)); buf.putLong(b.pCnt(k)); k += 1 }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): GramBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val d = buf.getInt
    val b = new GramBuffer(d)
    var i = 0
    while (i < d) { b.n(i) = buf.getLong; b.s(i) = buf.getLong; b.sCnt(i) = buf.getLong; i += 1 }
    val nc = d * (d + 1) / 2
    var k = 0
    while (k < nc) { b.hi(k) = buf.getLong; b.lo(k) = buf.getLong; b.pCnt(k) = buf.getLong; k += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): GramMatrixAgg =
    copy(child = newChild)
  override def prettyName: String = "gram_matrix"
}
