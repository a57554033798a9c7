package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over keyed event streams — the journey /
  * transition queries that sit next to funnels and retention in event
  * analytics (the batch twins of what the reference computes per-key in
  * stateful stream tasks, e.g. the per-user ordering
  * WikipediaStatsStreamTask keeps implicitly via task-per-key delivery).
  *
  * Both ops share one physical shape: ONE exchange on the sequence key, a
  * per-partition sort, and a lag/lead scan — the corpus is never joined to
  * itself and no state beyond the window frame exists. At 100 TB the cost
  * is a single shuffle at event grain followed by map-side-combinable
  * aggregation at transition/path grain (|types|² resp. |paths| rows, both
  * orders of magnitude below event cardinality).
  */
object Sequences {

  /** First-order Markov transition matrix of a keyed event sequence:
    * for each (from_type, to_type) adjacent pair in some key's timeline,
    * the transition count and the row-normalized probability. The
    * probability is floored basis points ((10000·n) div n_from / 10000) —
    * the repo-wide integer-division convention that makes count ratios
    * bit-identical across engines. `orderCols` must totally order each
    * key's events (pass a unique tie-breaker, same contract as scd2). */
  def markovTransitions(events: DataFrame, keyCol: String, typeCol: String,
                        orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val pairs = events
      .select(col(keyCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
    val counts = pairs.groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val fromTotals = counts.groupBy("from_type")
      .agg(sum("n").as("__n_from"))
    counts.join(broadcast(fromTotals), "from_type")
      .select(col("from_type"), col("to_type"), col("n"),
        (expr("(10000 * n) div __n_from") / lit(10000.0) + lit(0.0))
          .as("prob"))
  }

  /** Top-k most frequent length-`len` ordered type paths across all keys
    * ("view → view → click"): every window of `len` adjacent events in a
    * key's timeline is a path occurrence. Paths render as a joined string
    * (engine-portable group key). The count agg is map-side combinable and
    * the top-k is a bounded TakeOrderedAndProject over the paths-sized
    * relation — no window sort after the per-key lag scan. Ties break by
    * path string ascending. */
  def topPaths(events: DataFrame, keyCol: String, typeCol: String,
               orderCols: Seq[String], len: Int, k: Int): DataFrame = {
    require(len >= 2, s"path length must be >= 2: $len")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val steps = (0 until len).map(i =>
      if (i == 0) col(typeCol) else lead(col(typeCol), i).over(w))
    val withPath = events
      .select(col(keyCol), steps.last.isNotNull.as("__complete"),
        concat_ws(" > ", steps: _*).as("path"))
      .filter(col("__complete"))
    withPath.groupBy("path").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("path").asc)
      .limit(k)
  }

  /** BATCH GAP-SESSIONIZATION — the offline twin of the streaming session
    * window (`session_window` / the fMGWS variant in StatefulOps): a new
    * session starts where the gap to the previous event EXCEEDS
    * `gapMillis` (strictly — an event at exactly prev+gap still merges,
    * which is `session_window`'s inclusive-end semantics; the parity spec
    * pins batch == native grouping event for event, boundary included);
    * session ids are the running count of boundary flags
    * (exact, reproducible — no state machine). Output is session-grain:
    * (key, session_idx, n_events, start_ts, end_ts, duration_ms).
    *
    * Scale shape: ONE key exchange; the boundary lag, the running count,
    * and the final session agg all share its partitioning (the groupBy
    * keys prefix the window keys). Millisecond integer arithmetic —
    * engine-portable, no timestamp float lanes. */
  def sessionize(events: DataFrame, keyCol: String, tsCol: String,
                 orderCols: Seq[String], gapMillis: Long): DataFrame = {
    require(gapMillis > 0, s"gapMillis=$gapMillis")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val ms = unix_millis(col(tsCol))
    val boundary = when(lag(ms, 1).over(w).isNull ||
      ms - lag(ms, 1).over(w) > gapMillis, 1L).otherwise(0L)
    events
      .filter(col(tsCol).isNotNull)
      .select(col(keyCol), col(tsCol).as("__ts"),
        sum(boundary).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_idx"))
      .groupBy(col(keyCol), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min("__ts").as("start_ts"), max("__ts").as("end_ts"))
      .withColumn("duration_ms",
        unix_millis(col("end_ts")) - unix_millis(col("start_ts")))
  }

  /** MARKOV REMOVAL-EFFECT ATTRIBUTION (Anderl et al. 2014 — the
    * data-driven multi-touch model next to [[Timeseries.lastTouchAttribution]]'s
    * heuristic): journeys become a first-order chain
    * START → channels → {CONV, NULL}, truncated at the first conversion,
    * and a channel's credit is its REMOVAL EFFECT — how much the chain's
    * conversion probability drops when every hop into that channel is
    * redirected to NULL. Shares are removal effects normalized to basis
    * points.
    *
    * Conversion probability is the absorption probability approximated by
    * `iters` fixed synchronous value-iteration steps in EXACT integer
    * micro-units — p'(s) = (Σ_t n(s,t)·p(t)) div n_from(s) works on the
    * raw transition COUNTS (one floored division per state per step, no
    * pre-floored probability matrix compounding error), so the whole
    * computation is bit-identical on any engine and the SQL twin unrolls
    * it CTE for CTE.
    *
    * `channels` is the caller's channel taxonomy (config, not data — the
    * bound that keeps the state space fixed); events with other types are
    * ignored. Scale shape: ONE key exchange + shared window pass builds
    * the journey pairs; the transition matrix is (|channels|+3)²-bounded
    * and COLLECTS (the centroid/PCA driver-state class); the
    * channels×iters chase is driver arithmetic on that tiny matrix. */
  def removalEffectAttribution(events: DataFrame, keyCol: String,
                               orderCols: Seq[String], typeCol: String,
                               convType: String, channels: Seq[String],
                               iters: Int = 8): DataFrame = {
    require(channels.nonEmpty && channels.size <= 64, s"channels=$channels")
    require(iters >= 1 && iters <= 32, s"iters=$iters")
    val (start, conv, nul) = ("__START__", "__CONV__", "__NULL__")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val seen = coalesce(
      max(when(col(typeCol) === convType, 1).otherwise(0))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0))
    val base = events
      .filter(col(typeCol).isin(channels :+ convType: _*))
      .withColumn("__seen", seen)
      .filter(col("__seen") === 0)
      .withColumn("st",
        when(col(typeCol) === convType, conv).otherwise(col(typeCol)))
    val j = base.select(col(keyCol), col("st"),
      row_number().over(w).as("rn"), lead(col("st"), 1).over(w).as("nxt"))
    val pairs = j.filter(col("rn") === 1)
        .select(lit(start).as("f"), col("st").as("t"))
      .unionAll(j.filter(col("nxt").isNotNull)
        .select(col("st").as("f"), col("nxt").as("t")))
      .unionAll(j.filter(col("nxt").isNull && col("st") =!= conv)
        .select(col("st").as("f"), lit(nul).as("t")))
    val tc = pairs.groupBy("f", "t").agg(count(lit(1)).as("n")).collect()
    val n = tc.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val nFrom = n.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val states = start +: channels
    val targets = states ++ Seq(conv, nul)
    def chase(removed: Option[String]): Long = {
      var p = (states.map(_ -> 0L) ++ Seq(conv -> 1000000L, nul -> 0L)).toMap
      for (_ <- 1 to iters) {
        val upd = states.map { s =>
          val tot = nFrom.getOrElse(s, 0L)
          if (removed.contains(s) || tot == 0L) s -> 0L
          else s -> targets.map { t =>
            n.getOrElse((s, t), 0L) *
              (if (removed.contains(t)) 0L else p(t))
          }.sum / tot
        }.toMap
        p = p ++ upd
      }
      p(start)
    }
    val pFull = chase(None)
    val rem = channels.sorted.map { c =>
      val pc = chase(Some(c))
      (c, pc, math.max(pFull - pc, 0L))
    }
    val total = rem.map(_._3).sum
    val rows = rem.map { case (c, pc, re) =>
      (c, pFull, pc, re, if (total > 0L) re * 10000L / total else 0L)
    }
    import events.sparkSession.implicits._
    rows.toDF("channel", "p_full_micro", "p_removed_micro",
      "removal_micro", "share_bp")
  }

  /** Per-key ordered event-type SEQUENCES, truncated to `maxLen` steps —
    * events rendered as behavioral-LM training rows ("click > view >
    * purchase"), the flattening stage between raw telemetry and a
    * sequence model. `n_events` carries the key's FULL event count so
    * truncation is visible downstream.
    *
    * Scale shape: the truncation happens BEFORE the collect — a per-key
    * rank (shared window pass with the full count) filters to maxLen rows
    * per key, so no aggregation buffer ever holds an unbounded timeline
    * (the bot-user with 10⁸ events costs maxLen rows here, not an OOM —
    * the exact trap a bare collect_list sets). One exchange on the key;
    * the groupBy after the window reuses its partitioning. The collected
    * structs sort by the already-computed rank — deterministic however
    * partial aggregation interleaves. */
  def userSequences(events: DataFrame, keyCol: String, typeCol: String,
                    orderCols: Seq[String], maxLen: Int): DataFrame = {
    require(maxLen >= 1, s"maxLen must be positive: $maxLen")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val wAll = Window.partitionBy(col(keyCol))
    events
      .withColumn("__r", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      .filter(col("__r") <= maxLen)
      .groupBy(col(keyCol))
      .agg(max(col("__n")).as("n_events"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__r").as("r"),
              col(typeCol).as("t")))),
            x => x.getField("t")), " > ").as("seq"))
  }
}
