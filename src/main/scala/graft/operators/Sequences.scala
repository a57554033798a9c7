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
