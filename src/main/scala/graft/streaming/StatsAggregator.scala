package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** §2.7: the reference's windowed FoldLeftFunction surface
  * (WikipediaApplication.java:152-202 — one mutable WikipediaStats buffer
  * folded per message) as a typed Spark `Aggregator`: init/update map 1:1,
  * and `merge` is the piece Samza never needed (its fold is sequential per
  * task) but a distributed partial aggregation requires. All components are
  * commutative monoids, so the distributed result equals the sequential
  * fold.
  *
  * Distinct titles are an exact set here (parity with the reference's
  * HashSet, WikipediaApplication.java:219). At 100 TB cardinality this
  * buffer is the wrong tool — use `approx_count_distinct` (HLL++) like
  * Pipelines.wikipediaStats does; this Aggregator exists for the typed
  * custom-fold API surface and for small-window exact parity.
  */
case class EditEvent(title: String, diffBytes: Long, isMinor: Boolean)
case class StatsBuf(edits: Long, byteDiff: Long, titles: Set[String], minorEdits: Long)
case class EditStats(edits: Long, byteDiff: Long, uniqueTitles: Long, minorEdits: Long)

object WikipediaStatsAggregator extends Aggregator[EditEvent, StatsBuf, EditStats] {
  override def zero: StatsBuf = StatsBuf(0L, 0L, Set.empty, 0L)

  override def reduce(b: StatsBuf, e: EditEvent): StatsBuf =
    StatsBuf(b.edits + 1, b.byteDiff + e.diffBytes, b.titles + e.title,
      b.minorEdits + (if (e.isMinor) 1 else 0))

  override def merge(a: StatsBuf, b: StatsBuf): StatsBuf =
    StatsBuf(a.edits + b.edits, a.byteDiff + b.byteDiff,
      a.titles ++ b.titles, a.minorEdits + b.minorEdits)

  override def finish(b: StatsBuf): EditStats =
    EditStats(b.edits, b.byteDiff, b.titles.size.toLong, b.minorEdits)

  override def bufferEncoder: Encoder[StatsBuf] = Encoders.kryo[StatsBuf]
  override def outputEncoder: Encoder[EditStats] = Encoders.product[EditStats]
}
