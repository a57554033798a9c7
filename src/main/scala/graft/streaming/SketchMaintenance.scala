package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.Sketches

/** Streaming maintenance of STORED sketch artifacts — the ingest-path twin
  * of the batch [[graft.operators.Sketches]] kernels, on the
  * `appendBm25Stats` pattern: each micro-batch's shard sketch folds into a
  * parquet register table via write-tmp-then-swap, so live distinct counts
  * and frequency estimates survive QUERY RESTARTS (the stored table is the
  * state, not the streaming checkpoint) and any batch reader can estimate
  * off the same artifact the stream maintains (the reference's
  * changelog-backed store, samza `stores.*.changelog`, re-expressed as a
  * table a 100-TB deployment would actually query).
  *
  * Exactly-once across restarts: every swap stamps the micro-batch id into
  * the artifact (`__batch_id`), and a replayed batch (foreachBatch is
  * at-least-once) is SKIPPED when its id is already committed — one atomic
  * rename covers sketch + marker together, so there is no window where the
  * counts and the marker disagree. HLL's per-bucket MAX merge is idempotent
  * anyway; CMS's per-cell SUM is the lane that needs the guard. */
object SketchMaintenance {

  /** Swap `df` in as the new contents of `dir` (write-tmp-then-rename —
    * the UpsertParquet/appendBm25Stats discipline: a reader never sees a
    * half-written table, and the lazy self-read never races its own
    * overwrite). */
  private def swapIn(df: DataFrame, dir: String): Unit = {
    import org.apache.hadoop.fs.Path
    val spark = df.sparkSession
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(dir + ".tmp-append")
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(dir)
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"swap failed for $dst")
  }

  private def exists(spark: org.apache.spark.sql.SparkSession,
                     dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Last micro-batch id folded into the stored artifact, −1 if none.
    * The artifact is register-table-sized (64·groups for HLL,
    * depth·width for CMS), so the max() read is trivially bounded. */
  private def committedBatch(spark: org.apache.spark.sql.SparkSession,
                             dir: String): Long =
    if (!exists(spark, dir)) -1L
    else {
      // an all-empty first batch leaves a zero-row table: max() is NULL
      val r = spark.read.parquet(dir).agg(max("__batch_id")).collect()(0)
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }

  /** Fold a DELTA of (groupCol, valueCol) rows into a stored HLL register
    * table at `dir` — schema (groupCol, bucket, max_rank, __batch_id).
    * Replays of an already-committed `batchId` are skipped; pass a fresh
    * monotone id per delta (foreachBatch provides one). The merge is the
    * per-bucket MAX [[Sketches.hllMerge]] proved shard-exact through the
    * q_hll_merged oracle — stored ∪ delta never rescans history. */
  def appendHllSketch(delta: DataFrame, valueCol: String, groupCol: String,
                      dir: String, batchId: Long): Unit = {
    val spark = delta.sparkSession
    if (batchId <= committedBatch(spark, dir)) return
    val deltaRegs = Sketches.hllBuild(delta, valueCol, groupCol)
    val merged =
      if (!exists(spark, dir)) deltaRegs
      else Sketches.hllMerge(
        spark.read.parquet(dir).select(groupCol, "bucket", "max_rank")
          .unionByName(deltaRegs), groupCol)
    // the tmp write materializes the stored-table read BEFORE the swap
    // deletes it — no checkpoint needed (the appendBm25Stats ordering)
    swapIn(merged.withColumn("__batch_id", lit(batchId)), dir)
  }

  /** Streaming HLL maintenance: every micro-batch folds into the stored
    * register table. Estimate any time with
    * `Sketches.hllEstimate(spark.read.parquet(dir), groupCol)`. */
  def hllSketchSink(stream: DataFrame, valueCol: String, groupCol: String,
                    dir: String, checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendHllSketch(batch, valueCol, groupCol, dir, batchId)
      }

  /** Fold a DELTA's count-min shard into a stored CMS table at `dir` —
    * schema (row, bucket, cnt, __batch_id). CMS cells are additive, so
    * the merge is a per-cell SUM; the batch-id guard is what makes the
    * at-least-once replay exactly-once (a re-summed batch would
    * double-count, unlike HLL's idempotent MAX). */
  def appendCmsSketch(delta: DataFrame, itemCol: String, dir: String,
                      batchId: Long, depth: Int = 3,
                      width: Int = 1024): Unit = {
    val spark = delta.sparkSession
    if (batchId <= committedBatch(spark, dir)) return
    val deltaCells = Sketches.cmsBuild(delta, itemCol, depth, width)
    val merged =
      if (!exists(spark, dir)) deltaCells
      else spark.read.parquet(dir).select("row", "bucket", "cnt")
        .unionByName(deltaCells)
        .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    swapIn(merged.withColumn("__batch_id", lit(batchId)), dir)
  }

  /** Streaming CMS maintenance; point-estimate any time with
    * `Sketches.cmsEstimate(candidates, itemCol,
    * spark.read.parquet(dir), depth, width)`. */
  def cmsSketchSink(stream: DataFrame, itemCol: String, dir: String,
                    checkpoint: String, depth: Int = 3,
                    width: Int = 1024): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendCmsSketch(batch, itemCol, dir, batchId, depth, width)
      }
}
