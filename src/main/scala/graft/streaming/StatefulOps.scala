package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Arbitrary stateful streaming operators — the Spark analogue of the
  * reference's RocksDB KeyValueStore + changelog (SURVEY.md §2.6 W5,
  * §2.5 J2). State lives in the streaming state store, checkpointed per
  * micro-batch (replacing Samza's Kafka changelog topics).
  */
object StatefulOps {

  /** W5: all-time running counter, emitted with every update — the
    * `count-edits-all-time` semantics (WikipediaApplication.java:166-181,
    * store config wikipedia-application.properties:31-34).
    *
    * Keyed by a caller-supplied partition key. For a single global total at
    * 100 TB scale do NOT feed one constant key (single hot partition):
    * pre-aggregate per shard (e.g. `pmod(hash(...), nShards)` as the key)
    * and sum the shard subtotals at read time — counts are associative, so
    * the merge is exact.
    */
  def runningCount[K: org.apache.spark.sql.Encoder](
      events: Dataset[K])(implicit spark: SparkSession): Dataset[(K, Long)] = {
    implicit val longEnc: org.apache.spark.sql.Encoder[Long] =
      org.apache.spark.sql.Encoders.scalaLong
    implicit val outEnc: org.apache.spark.sql.Encoder[(K, Long)] =
      org.apache.spark.sql.Encoders.tuple(
        implicitly[org.apache.spark.sql.Encoder[K]], org.apache.spark.sql.Encoders.scalaLong)
    events.groupByKey(identity)
      .mapGroupsWithState[Long, (K, Long)](GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[Long]) =>
          val total = state.getOption.getOrElse(0L) + rows.size
          state.update(total)
          (key, total)
      }
  }

  /** Streaming event deduplication: drop repeats of `keyCols` while their
    * state is younger than the watermark delay — the exactly-once guard a
    * training-data ingest pipeline puts in front of everything else. State
    * is bounded by the watermark (dropDuplicates without one grows
    * forever). Batch twin: dropDuplicates / SELECT DISTINCT. */
  def dedupStream(df: org.apache.spark.sql.DataFrame, tsCol: String,
                  watermark: String, keyCols: Seq[String]): org.apache.spark.sql.DataFrame =
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /** Streaming funnel tracker — `RelationalOps.funnelSteps` as a per-user
    * state machine (the keyed-state-plus-changelog pattern that IS the
    * reference's programming model): each user's state holds (steps
    * reached, anchor time, last-matched time); an event advances the
    * machine when it is the next step's type, strictly after the previous
    * match, and within `maxSpanMicros` of the anchor. Emits one
    * `FunnelAdvance` per advancement — the streaming changelog whose final
    * max-step-per-user counts equal the batch operator's on the same
    * events (spec-pinned equivalence).
    *
    * Ordering contract: within a micro-batch, events sort by event time;
    * ACROSS batches, per-user in-order delivery is the transport's job —
    * exactly the partition-by-key ordering Kafka gives and the reference
    * assumes. A late event older than the user's last match cannot rewind
    * the machine (greedy matching is prefix-stable: matched prefixes never
    * un-match). State is one fixed-size record per user that reached
    * step ≥ 1 — at 100 TB this is users-sized, the same bound as any keyed
    * session state, and a TTL timeout can expire closed funnels. */
  final case class FunnelEvent(userId: Long, eventType: String, tsMicros: Long)
  final case class FunnelState(reached: Int, anchorMicros: Long, prevMicros: Long)
  final case class FunnelAdvance(userId: Long, step: Int, eventType: String,
                                 tsMicros: Long)

  def funnelStream(events: Dataset[FunnelEvent], steps: Seq[String],
                   maxSpanMicros: Long)(
      implicit spark: SparkSession): Dataset[FunnelAdvance] = {
    import spark.implicits._
    require(steps.nonEmpty, "need at least one funnel step")
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[FunnelState, FunnelAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[FunnelState]) =>
          var st = state.getOption.getOrElse(FunnelState(0, 0L, 0L))
          val out = Seq.newBuilder[FunnelAdvance]
          rows.toSeq.sortBy(_.tsMicros).foreach { e =>
            if (st.reached < steps.size && e.eventType == steps(st.reached)) {
              val ok = st.reached == 0 ||
                (e.tsMicros > st.prevMicros &&
                  e.tsMicros <= st.anchorMicros + maxSpanMicros)
              if (ok) {
                st = FunnelState(st.reached + 1,
                  if (st.reached == 0) e.tsMicros else st.anchorMicros,
                  e.tsMicros)
                out += FunnelAdvance(user, st.reached, e.eventType, e.tsMicros)
              }
            }
          }
          if (st.reached > 0) state.update(st)
          out.result().iterator
      }
  }

  /** Streaming Markov transition extractor — `Sequences.markovTransitions`
    * as a per-key state machine: state = the key's LAST event type/time;
    * each arriving event emits one (from_type, to_type) transition record
    * and advances the state. Aggregating the emitted changelog by
    * (from, to) equals the batch matrix's counts on the same events
    * (spec-pinned equivalence, including transitions that SPAN micro-batch
    * boundaries — the state is exactly what carries them). Ordering
    * contract and state bound are funnelStream's: per-key in-order
    * delivery across batches is the transport's job, in-batch events sort
    * by (time, type); state is one fixed-size record per key. */
  final case class SeqEvent(userId: Long, eventType: String, tsMicros: Long)
  final case class LastEvent(eventType: String, tsMicros: Long)
  final case class Transition(userId: Long, fromType: String, toType: String,
                              tsMicros: Long)

  def transitionStream(events: Dataset[SeqEvent])(
      implicit spark: SparkSession): Dataset[Transition] = {
    import spark.implicits._
    events.groupByKey(_.userId)
      .flatMapGroupsWithState[LastEvent, Transition](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (user, rows, state: GroupState[LastEvent]) =>
          var last = state.getOption
          val out = Seq.newBuilder[Transition]
          rows.toSeq.sortBy(e => (e.tsMicros, e.eventType)).foreach { e =>
            last.foreach(l =>
              out += Transition(user, l.eventType, e.eventType, e.tsMicros))
            last = Some(LastEvent(e.eventType, e.tsMicros))
          }
          last.foreach(state.update)
          out.result().iterator
      }
  }

  /** Streaming rolling z-score anomaly detector —
    * `Timeseries.rollingAnomalies` as a per-key state machine: state = the
    * key's last `lookback` quantized values (one bounded deque per key —
    * O(lookback) state, the streaming twin of the batch window frame);
    * each arriving point is tested against the PRIOR history with the
    * identical exact-integer cross-multiplication
    * `(n·x − s1)² > k²·(n·s2 − s1²)` (BigInt — the DECIMAL(38,0) twin, no
    * silent wrap at money scale), then appended. Batch equivalence is
    * spec-pinned, micro-batch boundaries included — the carried deque is
    * exactly what makes a spike right after a boundary still see its
    * history. Ordering contract is funnelStream's: in-batch points sort
    * by `idx`, per-key in-order delivery across batches is the
    * transport's job. */
  final case class SeriesPoint(key: Long, idx: Long, value: Long)
  final case class AnomalyHist(values: Seq[Long])
  final case class AnomalyFlag(key: Long, idx: Long, nPrior: Long,
                               isAnomaly: Boolean)

  def anomalyStream(points: Dataset[SeriesPoint], lookback: Int, kSigma: Int,
                    minPrior: Int = 4)(
      implicit spark: SparkSession): Dataset[AnomalyFlag] = {
    import spark.implicits._
    require(lookback >= 2 && kSigma >= 1 && minPrior >= 2,
      s"bad params: lookback=$lookback kSigma=$kSigma minPrior=$minPrior")
    val k2 = BigInt(kSigma.toLong * kSigma)
    points.groupByKey(_.key)
      .flatMapGroupsWithState[AnomalyHist, AnomalyFlag](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key, rows, state: GroupState[AnomalyHist]) =>
          var hist = state.getOption.map(_.values.toVector)
            .getOrElse(Vector.empty[Long])
          val out = Seq.newBuilder[AnomalyFlag]
          rows.toSeq.sortBy(_.idx).foreach { p =>
            val n = BigInt(hist.size)
            val s1 = hist.foldLeft(BigInt(0))(_ + _)
            val s2 = hist.foldLeft(BigInt(0))((a, v) => a + BigInt(v) * v)
            val dev = n * p.value - s1
            val anom = hist.size >= minPrior && dev * dev > k2 * (n * s2 - s1 * s1)
            out += AnomalyFlag(key, p.idx, hist.size.toLong, anom)
            hist = (hist :+ p.value).takeRight(lookback)
          }
          state.update(AnomalyHist(hist))
          out.result().iterator
      }
  }

  final case class SeqId(key: String, seq: Long)
  final case class SeqMonState(frontier: Long, pending: Seq[Long])
  final case class SeqStatus(key: String, frontier: Long, nPending: Long,
                             firstMissing: Long, overflow: Boolean)

  /** Streaming sequence-completeness monitor — "have we seen every offset
    * up to the frontier?" for a per-key monotone id space (Kafka
    * offsets, CDC log positions, shard sequence numbers): state per key
    * is the CONTIGUOUS frontier (every id ≤ frontier seen) plus the
    * bounded set of ids arrived ahead of it; each batch advances the
    * frontier through any holes that filled and reports the first still-
    * missing id. Out-of-order arrival within the reorder window is the
    * normal case this exists for; a hole that never fills parks the
    * frontier and `firstMissing` names the loss. `maxPending` bounds
    * state (the deque discipline of [[anomalyStream]]): beyond it the
    * monitor sets `overflow` and JUMPS the frontier to the smallest
    * pending id (explicitly surrendering completeness for boundedness —
    * flagged, never silent). Ids at or below the frontier (replays,
    * duplicates) change nothing. Emits one status row per key per
    * batch. */
  def sequenceMonitor(rows: Dataset[SeqId], startAt: Long = 0L,
                      maxPending: Int = 10000)(
      implicit spark: SparkSession): Dataset[SeqStatus] = {
    import spark.implicits._
    require(maxPending >= 1, s"maxPending: $maxPending")
    rows.groupByKey(_.key)
      .mapGroupsWithState[SeqMonState, SeqStatus](GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[SeqMonState]) =>
          var frontier = state.getOption.map(_.frontier).getOrElse(startAt - 1)
          var pending = state.getOption.map(_.pending.to(scala.collection.immutable.SortedSet))
            .getOrElse(scala.collection.immutable.SortedSet.empty[Long])
          it.foreach { r =>
            if (r.seq > frontier) pending += r.seq
          }
          var overflow = false
          def drain(): Unit =
            while (pending.nonEmpty && pending.head == frontier + 1) {
              frontier += 1; pending -= pending.head
            }
          drain()
          // ENFORCE the bound, however scattered the backlog: one jump
          // per remaining excess, not one per batch — a single batch of
          // widely-spread ids must not park an over-bound state forever
          while (pending.size > maxPending) {
            overflow = true
            frontier = pending.head // surrender the hole, flagged
            pending -= frontier
            drain()
          }
          state.update(SeqMonState(frontier, pending.toSeq))
          SeqStatus(key, frontier, pending.size.toLong,
            if (pending.isEmpty) -1L else frontier + 1, overflow)
      }
  }

  /** Streaming distinct-count maintenance per key via KMV sketch state —
    * the batch [[graft.operators.Sketches.kmvDistinct]] (md5 lane) kept
    * incrementally: state per key is the k smallest distinct 32-bit
    * hashes ever seen (bounded — the whole point: a distinct COUNT over a
    * stream needs either this or an unbounded value set), updated through
    * the SAME [[graft.functions.KmvSketch]] reduce logic the batch
    * aggregate runs, with the SAME hash (first 4 md5 bytes — verified
    * byte-equal to the Column-side `md5Hash32`), so after any prefix of
    * the stream the estimate EQUALS the batch operator's on the same
    * rows — not approximately, exactly (spec-pinned across micro-batch
    * boundaries, duplicates spanning batches included: a re-seen value
    * re-hashes into the state's distinct set and changes nothing).
    * Emits one (key, est_distinct, sketch_full) row per key per batch. */
  final case class KeyedValue(key: String, value: String)
  final case class DistinctEstimate(key: String, estDistinct: Long,
                                    sketchFull: Boolean)

  /** JVM twin of `Sketches.md5Hash32`: first 8 hex digits of md5 as a
    * long in [0, 2^32). */
  private[streaming] def md5Hash32Jvm(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  def kmvDistinctStream(rows: Dataset[KeyedValue], k: Int)(
      implicit spark: SparkSession): Dataset[DistinctEstimate] = {
    import spark.implicits._
    require(k > 1, s"k must be >1: $k")
    val kernel = new graft.functions.KmvSketch(k)
    rows.groupByKey(_.key)
      .mapGroupsWithState[Seq[Long], DistinctEstimate](
        GroupStateTimeout.NoTimeout) {
        (key, it, state: GroupState[Seq[Long]]) =>
          var buf = state.getOption.getOrElse(Seq.empty[Long])
          it.foreach(r => buf = kernel.reduce(buf, md5Hash32Jvm(r.value)))
          state.update(buf)
          val est = if (buf.size < k) buf.size.toLong
            else (k - 1).toLong * 4294967296L / buf.last
          DistinctEstimate(key, est, buf.size >= k)
      }
  }

  /** W6 exact variant: sessionization via flatMapGroupsWithState with an
    * event-time timeout — the fallback SURVEY.md §7.4(4) names for when
    * session_window's append-mode emission doesn't fit (e.g. emitting
    * session summaries with custom payloads). State per key = the open
    * session; the watermark timeout closes and emits it. */
  final case class SessionState(start: Long, end: Long, count: Long)
  final case class SessionOut(userId: String, count: Long, durationMs: Long)

  def sessionizeExact(pageViews: Dataset[PageView], gapMs: Long)(
      implicit spark: SparkSession): Dataset[SessionOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    pageViews
      .withWatermark("ts", "1 second")
      .groupByKey(_.userId)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId, rows, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(SessionOut(userId, s.count, s.end - s.start))
          } else {
            val times = rows.map(_.ts.getTime).toSeq.sorted
            val closed = scala.collection.mutable.ArrayBuffer[SessionOut]()
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.end < gapMs =>
                  cur = Some(s.copy(end = math.max(s.end, t), count = s.count + 1))
                case Some(s) =>
                  closed += SessionOut(userId, s.count, s.end - s.start)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.end + gapMs)
            }
            closed.iterator
          }
      }
  }

  private sealed trait Upd
  private final case class ProfileUpd(userId: String, company: String) extends Upd
  private final case class ViewUpd(userId: String, pageId: String) extends Upd

  /** J2, exact changelog semantics: enrich each page view with the LATEST
    * profile seen for that user; views with no profile yet are dropped
    * (inner-join null-drop, StreamTableJoinExample.java:126-146). The
    * profile stream and the view stream co-process in one stateful operator
    * keyed on userId — the "table" is per-key state upserted by the
    * changelog (stream.sendTo(Table), :122-124), not a snapshot join.
    *
    * Within a micro-batch, profile updates for a key apply before that
    * key's views (matching the reference test's profiles-first feeding,
    * TestSamzaCookBookExamples.java:145-177).
    */
  def streamTableJoin(pageViews: Dataset[PageView], profiles: Dataset[Profile])(
      implicit spark: SparkSession): Dataset[EnrichedPageView] = {
    import spark.implicits._
    val updates: Dataset[(String, String, String, Boolean)] =
      profiles.map(p => (p.userId, p.company, "", true))
        .union(pageViews.map(v => (v.userId, "", v.pageId, false)))
    updates.groupByKey(_._1)
      .flatMapGroupsWithState[String, EnrichedPageView](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId, rows, state: GroupState[String]) =>
          // Single pass over the group iterator: profile rows fold into one
          // var, view rows buffer only their pageId string. Buffering is
          // unavoidable — batch profiles apply to ALL of the batch's views
          // (reference feeds profiles first), and the last profile isn't
          // known until the iterator is exhausted — but the buffer holds
          // one small string per view, not the whole micro-batch rows
          // (round-2 verdict: `rows.toSeq` buffered everything for hot keys).
          var latestProfile: Option[String] = None
          val viewPages = scala.collection.mutable.ArrayBuffer[String]()
          rows.foreach { r =>
            if (r._4) latestProfile = Some(r._2) else viewPages += r._3
          }
          latestProfile.foreach(state.update)
          state.getOption match {
            case Some(company) =>
              viewPages.iterator.map(p => EnrichedPageView(userId, company, p))
            case None => Iterator.empty
          }
      }
  }
}
