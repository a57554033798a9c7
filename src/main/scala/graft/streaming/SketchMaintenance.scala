package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import graft.operators.Sketches
import graft.sources.AtomicSwap

/** Streaming maintenance of STORED sketch artifacts — the ingest-path twin
  * of the batch [[graft.operators.Sketches]] kernels, on the
  * `appendBm25Stats` pattern: each micro-batch's shard sketch folds into a
  * parquet register table via the shared [[AtomicSwap]] discipline, so live
  * distinct counts and frequency estimates survive QUERY RESTARTS (the
  * stored table is the state, not the streaming checkpoint) and any batch
  * reader can estimate off the same artifact the stream maintains (the
  * reference's changelog-backed store, samza `stores.*.changelog`,
  * re-expressed as a table a 100-TB deployment would actually query).
  *
  * Exactly-once across restarts: every swap stamps the micro-batch id AND
  * the stream lineage (the checkpoint path for the sink forms) into the
  * artifact, and a replayed batch (foreachBatch is at-least-once) is
  * SKIPPED when its id is already committed FOR THAT LINEAGE — one atomic
  * swap covers sketch + stamp together, so counts and marker can never
  * disagree. A NEW stream (different `streamId`) pointed at an existing
  * artifact starts its own id sequence and keeps merging on top of the
  * stored counts — batch ids restarting at 0 no longer silently discard
  * data. Wiping a checkpoint while keeping its PATH (same lineage id,
  * restarted ids) is the one unprotected case — the same discipline
  * transactional table formats demand of their txn-version column. HLL's
  * per-bucket MAX merge is idempotent anyway; CMS's per-cell SUM is the
  * lane the guard exists for. */
object SketchMaintenance {

  /** Last micro-batch id folded into the stored artifact BY THIS LINEAGE,
    * −1 if none (missing table, empty table, or a different stream's
    * stamp). The artifact is register-table-sized (64·groups for HLL,
    * depth·width for CMS), so the read is trivially bounded. Runs swap
    * recovery first — after a crash between delete and rename, the
    * orphaned complete tmp IS the artifact. */
  private def committedBatch(spark: org.apache.spark.sql.SparkSession,
                             dir: String, streamId: String): Long = {
    AtomicSwap.recover(spark, dir)
    if (!exists(spark, dir)) -1L
    else {
      val r = spark.read.parquet(dir)
        .filter(col("__stream_id") === streamId)
        .agg(max("__batch_id")).collect()(0)
      if (r.isNullAt(0)) -1L else r.getLong(0)
    }
  }

  private def exists(spark: org.apache.spark.sql.SparkSession,
                     dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Fold a DELTA of (groupCol, valueCol) rows into a stored HLL register
    * table at `dir` — schema (groupCol, bucket, max_rank, __batch_id,
    * __stream_id). Replays of an already-committed (streamId, batchId)
    * are skipped; foreachBatch provides the monotone id, the sink forms
    * pass the checkpoint path as the lineage. The merge is the per-bucket
    * MAX [[Sketches.hllMerge]] proved shard-exact through the
    * q_hll_merged oracle — stored ∪ delta never rescans history. */
  def appendHllSketch(delta: DataFrame, valueCol: String, groupCol: String,
                      dir: String, batchId: Long,
                      streamId: String = ""): Unit = {
    val spark = delta.sparkSession
    if (batchId <= committedBatch(spark, dir, streamId)) return
    val deltaRegs = Sketches.hllBuild(delta, valueCol, groupCol)
    val merged =
      if (!exists(spark, dir)) deltaRegs
      else Sketches.hllMerge(
        spark.read.parquet(dir).select(groupCol, "bucket", "max_rank")
          .unionByName(deltaRegs), groupCol)
    // the tmp write materializes the stored-table read BEFORE the swap
    // deletes it — the AtomicSwap ordering
    AtomicSwap.swapIn(merged.withColumn("__batch_id", lit(batchId))
      .withColumn("__stream_id", lit(streamId)), dir)
  }

  /** Streaming HLL maintenance: every micro-batch folds into the stored
    * register table. Estimate any time with
    * `Sketches.hllEstimate(spark.read.parquet(dir), groupCol)`. */
  def hllSketchSink(stream: DataFrame, valueCol: String, groupCol: String,
                    dir: String, checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendHllSketch(batch, valueCol, groupCol, dir, batchId,
          streamId = checkpoint)
      }

  /** Fold a DELTA's count-min shard into a stored CMS table at `dir` —
    * schema (row, bucket, cnt, __batch_id, __stream_id). CMS cells are
    * additive, so the merge is a per-cell SUM; the (streamId, batchId)
    * guard is what makes the at-least-once replay exactly-once (a
    * re-summed batch would double-count, unlike HLL's idempotent MAX). */
  def appendCmsSketch(delta: DataFrame, itemCol: String, dir: String,
                      batchId: Long, depth: Int = 3, width: Int = 1024,
                      streamId: String = ""): Unit = {
    val spark = delta.sparkSession
    if (batchId <= committedBatch(spark, dir, streamId)) return
    val deltaCells = Sketches.cmsBuild(delta, itemCol, depth, width)
    val merged =
      if (!exists(spark, dir)) deltaCells
      else spark.read.parquet(dir).select("row", "bucket", "cnt")
        .unionByName(deltaCells)
        .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    AtomicSwap.swapIn(merged.withColumn("__batch_id", lit(batchId))
      .withColumn("__stream_id", lit(streamId)), dir)
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
        appendCmsSketch(batch, itemCol, dir, batchId, depth, width,
          streamId = checkpoint)
      }
}
