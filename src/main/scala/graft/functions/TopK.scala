package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One scored candidate inside the bounded top-k aggregate. Field names are
  * domain-neutral: `score` is a cosine for ANN callers and a negated id
  * hash for the samplers; `id` is whatever row identity the caller ranks. */
case class Hit(score: Double, id: Long)

/** Bounded top-k aggregate: keeps the `k` best hits by (score DESC,
  * id ASC). This is what makes BATCHED per-group ranking scale: a window
  * `row_number() <= k` must shuffle and sort every scored row, while this
  * aggregate is map-side combinable with a ≤ k-element partial state — the
  * shuffle carries only (map tasks × groups × k) rows regardless of input
  * size.
  *
  * Determinism: callers pass scores that are exact ties when
  * mathematically tied (ANN rounds the cosine to 4 dp; the samplers use an
  * integer hash), broken by the smaller id — the same contract as the
  * DuckDB twins' window ordering.
  *
  * `reduce` re-sorts a ≤ (k+1)-element buffer per input row — O(k log k)
  * with tiny constants (k is 10-100 in practice); the aggregate stays
  * object-hash-aggregated, which is the expected physical form for a
  * typed buffer (no codegen, but state is k elements, not the corpus). */
class TopKHits(k: Int, distinct: Boolean = false)
    extends Aggregator[Hit, Seq[Hit], Seq[Hit]] {
  require(k > 0, s"k must be positive: $k")

  private def better(a: Hit, b: Hit): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)
  // `distinct = true` gives SET semantics over (score, id): an exact
  // duplicate hit never occupies a second slot. This replaces a full
  // candidate-grain `.distinct()` EXCHANGE for callers whose input
  // relation produces the same hit more than once (a pair sharing two
  // membership cells in the tree×multi kNN graph) — dedup happens inside
  // the bounded map-side-combinable state instead of a corpus-pair
  // shuffle. Sorted-adjacent dedup is exact: equal hits are neighbors
  // under the total (score DESC, id ASC) order, and cross-partition
  // duplicates meet in merge's trim.
  private def dedupSorted(s: Seq[Hit]): Seq[Hit] =
    if (s.isEmpty) s
    else s.head +: s.sliding(2).collect {
      case Seq(p, c) if p != c => c
    }.toSeq
  private def trim(s: Seq[Hit]): Seq[Hit] = {
    val sorted = s.sortWith(better)
    (if (distinct) dedupSorted(sorted) else sorted).take(k)
  }

  override def zero: Seq[Hit] = Nil
  override def reduce(buf: Seq[Hit], a: Hit): Seq[Hit] =
    // A NaN score (cosine of a zero vector) is dropped OUTRIGHT: NaN
    // compares false against everything, so once admitted it could never
    // be displaced — whether it survived would depend on arrival order,
    // breaking the aggregate's partitioning-invariance contract.
    if (a.score.isNaN) buf
    // skip the sort when the buffer is full and `a` can't displace the tail
    else if (buf.size >= k && !better(a, buf.last)) buf
    else trim(buf :+ a)
  override def merge(x: Seq[Hit], y: Seq[Hit]): Seq[Hit] = trim(x ++ y)
  override def finish(r: Seq[Hit]): Seq[Hit] = r
  override def bufferEncoder: Encoder[Seq[Hit]] = TopKHits.seqHitEncoder
  override def outputEncoder: Encoder[Seq[Hit]] = TopKHits.seqHitEncoder
}

object TopKHits {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  private[functions] val seqHitEncoder: Encoder[Seq[Hit]] = ExpressionEncoder()
  val hitEncoder: Encoder[Hit] = Encoders.product[Hit]
}
