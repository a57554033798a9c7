package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded k-minimum-values state: the `k` smallest DISTINCT hash values
  * seen, ascending. This is the classic KMV cardinality sketch (Bar-Yossef
  * et al. 2002 / Beyer et al. 2007): the k-th smallest of n distinct
  * uniform hashes sits near k/n of the hash space, so n ≈ (k-1)·SPACE/h(k).
  *
  * Why this instead of `approx_count_distinct`: HyperLogLog++ is the right
  * production sketch, but its estimate depends on register layout and
  * bias-correction tables — no other engine reproduces it bit-for-bit, so
  * it can never face the DuckDB oracle. KMV's state is just "the k smallest
  * distinct hashes", a pure function of the value set and the hash — any
  * engine that can hash and sort reproduces it exactly. The estimate is
  * deterministic, merge-associative, and partitioning-invariant.
  *
  * Scale shape: the partial state is ≤ k longs per map task per group —
  * the shuffle carries (map tasks × groups × k) longs no matter how many
  * rows were scanned, the same bounded-aggregate contract as [[TopKHits]].
  * `reduce` is O(k) per row with an early exit once the buffer is full
  * (a hash ≥ the current k-th smallest can never enter the state, so the
  * steady-state cost per row is one comparison).
  *
  * Like TopKHits this aggregates through Spark's object-hash aggregate
  * (typed buffer, no codegen) — acceptable because the state is k
  * elements, not the corpus, and the input column is already a codegen'd
  * hash projection. */
class KmvSketch(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  require(k > 0, s"k must be positive: $k")

  override def zero: Seq[Long] = Nil
  override def reduce(buf: Seq[Long], h: Long): Seq[Long] =
    if (buf.size >= k && h >= buf.last) buf // can't displace the k-th min
    else if (buf.contains(h)) buf // distinct-only state: duplicates are one observation
    else ((buf :+ h).sorted).take(k)
  override def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
    (x ++ y).distinct.sorted.take(k)
  override def finish(r: Seq[Long]): Seq[Long] = r
  override def bufferEncoder: Encoder[Seq[Long]] = KmvSketch.seqLongEncoder
  override def outputEncoder: Encoder[Seq[Long]] = KmvSketch.seqLongEncoder
}

object KmvSketch {
  private[functions] val seqLongEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}
