package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Per-window trending top-k: tumbling-window item counts emitted when
  * the watermark CLOSES each window (append mode — a window's ranking is
  * final, never revised), then ranked and cut to the k most frequent
  * items per window in the same micro-batch, appended to a queryable
  * parquet panel. The "what was hot in the last hour" feed — the windowed
  * sibling of the all-time top-k query (q_topk_users), with the
  * watermark-closure guarantee batch recomputation can't give a live
  * consumer.
  *
  * Scale shape: the streaming agg is the standard (window, item)-keyed
  * state (bounded by the watermark); the per-batch rank runs over CLOSED
  * windows' count rows only — windows×items-sized, never event-sized, and
  * the window sort is per closed window (a handful per batch). Ties break
  * by item ascending — deterministic across re-executions, which
  * append-mode replay relies on. */
object Trending {

  /** The BATCH twin of [[topKPerWindow]]: identical windowing (the same
    * `window()` bucketing), identical ranking and tie-break, over a bounded
    * table — the backfill/replay formulation whose output a resumed stream
    * must extend, row for row (spec-pinned equivalence). The per-window
    * rank is a window sort over (window, item) COUNT rows — right when the
    * item vocabulary is bounded (event types, domains); for an unbounded
    * item space swap in a `TopKHits`-style bounded aggregate keyed on the
    * window, the [[graft.operators.Curation.fixedSizeSample]] shape. */
  def topKPerWindowBatch(events: DataFrame, tsCol: String, itemCol: String,
                         windowDur: String, k: Int): DataFrame = {
    require(k >= 1, s"k must be positive: $k")
    val counts = events
      .groupBy(window(col(tsCol), windowDur), col(itemCol).as("item"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("item"), col("n"))
    val w = Window.partitionBy("window_start")
      .orderBy(col("n").desc, col("item").asc)
    counts.withColumn("rnk", row_number().over(w).cast("long"))
      .filter(col("rnk") <= k)
      .select("window_start", "rnk", "item", "n")
  }

  def topKPerWindow(events: DataFrame, tsCol: String, itemCol: String,
                    windowDur: String, watermarkDelay: String, k: Int,
                    outDir: String, checkpoint: String): DataStreamWriter[Row] = {
    require(k >= 1, s"k must be positive: $k")
    val counts = events
      .withWatermark(tsCol, watermarkDelay)
      .groupBy(window(col(tsCol), windowDur), col(itemCol).as("item"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("window_start"), col("item"), col("n"))
    counts.writeStream
      .outputMode("append") // rows arrive only when their window closes
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val w = Window.partitionBy("window_start")
            .orderBy(col("n").desc, col("item").asc)
          batch.withColumn("rnk", row_number().over(w))
            .filter(col("rnk") <= k)
            .select(col("window_start"), col("rnk").cast("long").as("rnk"),
              col("item"), col("n"))
            .coalesce(1).write.mode("append").parquet(outDir)
        }
      }
  }
}
