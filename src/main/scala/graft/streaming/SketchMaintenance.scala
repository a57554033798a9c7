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
  * Exactly-once across restarts: the artifact carries one WATERMARK ROW
  * PER LINEAGE (`__stream_id`, high `__batch_id`) alongside the sketch
  * rows — every swap rewrites the whole small table, so sketch + all
  * watermarks commit in ONE atomic rename, and a replayed batch
  * (foreachBatch is at-least-once) is SKIPPED when its id is already
  * committed FOR ITS lineage. Watermarks of OTHER lineages are carried
  * forward, never erased — concurrent/interleaved writers each keep their
  * own replay guard (single-writer-at-a-time is still the discipline; the
  * carried watermarks make writer HANDOVER safe). A NEW stream (fresh
  * checkpoint → ids restart at 0) starts its own watermark and keeps
  * merging on top of the stored counts. Artifacts written by older
  * builds (no watermark rows) read as watermark −1: their next fold is
  * processed, which is idempotent for HLL's MAX and at-least-once for
  * CMS's SUM — documented, not silent failure. Wiping a checkpoint while
  * keeping its PATH (same lineage id, restarted ids) is DETECTED and
  * rejected: batch ids restarting at 0 while this lineage has committed
  * past 0 can only mean the checkpoint is gone — a genuine replay of
  * batch 0 implies committed == 0 (the fold landed but the checkpoint
  * commit didn't) and still no-ops. The one undetectable wipe is a
  * lineage whose ONLY committed batch was 0; everything later throws
  * instead of silently dropping data. */
object SketchMaintenance {

  /** Sketch rows vs watermark rows share one schema: watermark rows carry
    * `__stream_id` (data rows hold NULL there) and store the committed
    * batch id in the long payload column (`max_rank`/`cnt`) with the
    * bucket key pinned to −1 (outside every real bucket). Readers of the
    * REGISTERS filter [[dataRows]]. */
  private val WatermarkBucket = -1L

  /** A lineage id is the replay-guard key: two callers sharing one id
    * share one watermark lane, so the second's batch 0 would read as the
    * first's replay and be dropped — the empty-string default this
    * replaces had exactly that failure mode. The sinks pass their
    * checkpoint path; direct callers must pick something as unique. */
  private def requireLineage(streamId: String): Unit =
    require(streamId.nonEmpty,
      "streamId must be a non-empty lineage id (e.g. the checkpoint " +
        "path): two writers sharing a lineage share one replay guard, " +
        "and the second writer's batches would be dropped as replays")

  /** Batch ids restarting at 0 while this lineage committed past 0 can
    * only mean the checkpoint was wiped but its PATH (= lineage id) was
    * reused — every batch until ids catch up would be silently skipped,
    * dropping new data with no error. A genuine at-least-once replay of
    * batch 0 implies committed == 0, which still no-ops downstream. */
  private def rejectStaleLineage(batchId: Long, committed: Long,
                                 streamId: String, dir: String): Unit =
    if (batchId == 0L && committed > 0L)
      throw new IllegalStateException(
        s"stale lineage '$streamId' at $dir: batch ids restarted at 0 " +
          s"but this lineage already committed through batch $committed " +
          "— the checkpoint was wiped while its path was reused. Use a " +
          "fresh checkpoint dir (a fresh lineage id) to keep folding " +
          "into this artifact.")

  /** The register/cell rows of a stored sketch table — what estimators
    * read ([[Sketches.hllEstimate]]/[[Sketches.cmsEstimate]] inputs). */
  def dataRows(stored: DataFrame): DataFrame =
    if (stored.columns.contains("__stream_id"))
      stored.filter(col("__stream_id").isNull).drop("__stream_id")
    else stored

  private def exists(spark: org.apache.spark.sql.SparkSession,
                     dir: String): Boolean = {
    import org.apache.hadoop.fs.Path
    val p = new Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** (carried watermark rows for OTHER lineages, this lineage's committed
    * batch id). Runs swap recovery first — after a crash between delete
    * and rename, the orphaned complete tmp IS the artifact. Legacy tables
    * without watermark rows read as (∅, −1). */
  private def watermarks(spark: org.apache.spark.sql.SparkSession,
                         dir: String, streamId: String,
                         payloadCol: String): (Option[DataFrame], Long) = {
    AtomicSwap.recover(spark, dir)
    if (!exists(spark, dir)) (None, -1L)
    else {
      val stored = spark.read.parquet(dir)
      if (!stored.columns.contains("__stream_id")) (None, -1L)
      else {
        val marks = stored.filter(col("__stream_id").isNotNull)
        val mine = marks.filter(col("__stream_id") === streamId)
          .agg(max(payloadCol)).collect()(0)
        (Some(marks.filter(col("__stream_id") =!= streamId)),
          if (mine.isNullAt(0)) -1L else mine.getLong(0))
      }
    }
  }

  /** Fold a DELTA of (groupCol, valueCol) rows into a stored HLL register
    * table at `dir` — rows (groupCol, bucket, max_rank, __stream_id) with
    * per-lineage watermark rows as documented above. The merge is the
    * per-bucket MAX [[Sketches.hllMerge]] proved shard-exact through the
    * q_hll_merged oracle — stored ∪ delta never rescans history. */
  def appendHllSketch(delta: DataFrame, valueCol: String, groupCol: String,
                      dir: String, batchId: Long,
                      streamId: String): Unit = {
    requireLineage(streamId)
    val spark = delta.sparkSession
    val (others, committed) = watermarks(spark, dir, streamId, "max_rank")
    rejectStaleLineage(batchId, committed, streamId, dir)
    if (batchId <= committed) return
    val deltaRegs = Sketches.hllBuild(delta, valueCol, groupCol)
    val merged =
      if (!exists(spark, dir)) deltaRegs
      else Sketches.hllMerge(
        dataRows(spark.read.parquet(dir))
          .select(groupCol, "bucket", "max_rank")
          .unionByName(deltaRegs), groupCol)
    val mark = spark.range(1).select(lit("").as(groupCol),
      lit(WatermarkBucket).as("bucket"), lit(batchId).as("max_rank"),
      lit(streamId).as("__stream_id"))
    val marks = others.map(o =>
        o.select(col(groupCol), col("bucket"), col("max_rank"),
          col("__stream_id")).unionByName(mark))
      .getOrElse(mark)
    // the tmp write materializes the stored-table read BEFORE the swap
    // deletes it — the AtomicSwap ordering
    AtomicSwap.swapIn(
      merged.withColumn("__stream_id", lit(null).cast("string")).unionByName(marks),
      dir)
  }

  /** Streaming HLL maintenance: every micro-batch folds into the stored
    * register table. Estimate any time with
    * `Sketches.hllEstimate(SketchMaintenance.dataRows(
    *   spark.read.parquet(dir)), groupCol)`. */
  def hllSketchSink(stream: DataFrame, valueCol: String, groupCol: String,
                    dir: String, checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendHllSketch(batch, valueCol, groupCol, dir, batchId,
          streamId = checkpoint)
      }

  /** Fold a DELTA's count-min shard into a stored CMS table at `dir` —
    * rows (row, bucket, cnt, __stream_id) plus per-lineage watermark
    * rows. CMS cells are additive, so the merge is a per-cell SUM; the
    * per-lineage watermark is what makes the at-least-once replay
    * exactly-once (a re-summed batch would double-count, unlike HLL's
    * idempotent MAX). */
  def appendCmsSketch(delta: DataFrame, itemCol: String, dir: String,
                      batchId: Long, depth: Int = 3, width: Int = 1024,
                      streamId: String): Unit = {
    requireLineage(streamId)
    val spark = delta.sparkSession
    val (others, committed) = watermarks(spark, dir, streamId, "cnt")
    rejectStaleLineage(batchId, committed, streamId, dir)
    if (batchId <= committed) return
    val deltaCells = Sketches.cmsBuild(delta, itemCol, depth, width)
    val merged =
      if (!exists(spark, dir)) deltaCells
      else dataRows(spark.read.parquet(dir)).select("row", "bucket", "cnt")
        .unionByName(deltaCells)
        .groupBy("row", "bucket").agg(sum("cnt").as("cnt"))
    val mark = spark.range(1).select(lit(WatermarkBucket).as("row"),
      lit(WatermarkBucket).as("bucket"), lit(batchId).as("cnt"),
      lit(streamId).as("__stream_id"))
    val marks = others.map(o =>
        o.select(col("row"), col("bucket"), col("cnt"), col("__stream_id"))
          .unionByName(mark))
      .getOrElse(mark)
    AtomicSwap.swapIn(
      merged.withColumn("__stream_id", lit(null).cast("string")).unionByName(marks),
      dir)
  }

  /** Streaming CMS maintenance; point-estimate any time with
    * `Sketches.cmsEstimate(candidates, itemCol,
    * SketchMaintenance.dataRows(spark.read.parquet(dir)), depth,
    * width)`. */
  def cmsSketchSink(stream: DataFrame, itemCol: String, dir: String,
                    checkpoint: String, depth: Int = 3,
                    width: Int = 1024): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendCmsSketch(batch, itemCol, dir, batchId, depth, width,
          streamId = checkpoint)
      }

  /** Per-group running-total rows of the quantile-sample artifact live at
    * this sentinel id (the watermark rows live at −1); REAL row ids must
    * be non-negative — the append-only id discipline the dedup/link
    * artifacts already require. */
  private val TotalId = -2L

  /** Fold a DELTA into a stored bottom-k QUANTILE SAMPLE table at `dir` —
    * rows (grp, id, v, __stream_id): sample rows (id ≥ 0, one per sampled
    * row, v the quantized value), per-group running totals (id = −2, v =
    * row count so far), and the per-lineage watermark rows shared with
    * the HLL/CMS lanes. The merge re-ranks stored ∪ delta-sample through
    * the SAME bottom-k aggregate — exactly the union's sample (the
    * [[Sketches.quantileSketch]] merge law), so estimates off the stored
    * table equal a fresh whole-history sketch with NO approximation
    * stacking, and history is never rescanned. Totals are additive, so
    * the replay watermark is what keeps them exactly-once (a re-summed
    * batch would inflate n_total; the sample itself is replay-idempotent
    * by the merge law — documented asymmetry, same as CMS-vs-HLL). */
  def appendQuantileSample(delta: DataFrame, idCol: String, groupCol: String,
                           valueQ: org.apache.spark.sql.Column, k: Int,
                           dir: String, batchId: Long,
                           streamId: String): Unit = {
    requireLineage(streamId)
    require(k > 0, s"k must be positive: $k")
    val spark = delta.sparkSession
    val (others, committed) = watermarks(spark, dir, streamId, "v")
    rejectStaleLineage(batchId, committed, streamId, dir)
    if (batchId <= committed) return
    val base = delta.select(col(groupCol).cast("string").as("grp"),
      col(idCol).cast("long").as("id"), valueQ.cast("long").as("v"))
    val deltaSample = base.join(
      broadcast(graft.operators.Curation.fixedSizeSample(base, "id", "grp", k)),
      Seq("grp", "id"))
    val deltaTotals = base.groupBy("grp")
      .agg(count(lit(1)).as("v")).select(col("grp"), lit(TotalId).as("id"),
        col("v"))
    val (sampleRows, totalRows) =
      if (!exists(spark, dir)) (deltaSample, deltaTotals)
      else {
        val stored = dataRows(spark.read.parquet(dir))
          .select("grp", "id", "v")
        val pool = stored.filter(col("id") >= 0L).unionByName(deltaSample)
        val rerank = pool.join(
          broadcast(graft.operators.Curation.fixedSizeSample(pool, "id", "grp", k)),
          Seq("grp", "id"))
        val tot = stored.filter(col("id") === TotalId)
          .unionByName(deltaTotals)
          .groupBy("grp", "id").agg(sum("v").as("v"))
        (rerank, tot)
      }
    val mark = spark.range(1).select(lit("").as("grp"),
      lit(WatermarkBucket).as("id"), lit(batchId).as("v"),
      lit(streamId).as("__stream_id"))
    val marks = others.map(o =>
        o.select(col("grp"), col("id"), col("v"), col("__stream_id"))
          .unionByName(mark))
      .getOrElse(mark)
    AtomicSwap.swapIn(
      sampleRows.unionByName(totalRows)
        .withColumn("__stream_id", lit(null).cast("string"))
        .unionByName(marks),
      dir)
  }

  /** The (grp, id, v) sample rows of a stored quantile artifact. */
  def quantileSampleRows(stored: DataFrame): DataFrame =
    dataRows(stored).filter(col("id") >= 0L).select("grp", "id", "v")

  /** The (grp, n_total) running totals of a stored quantile artifact. */
  def quantileTotals(stored: DataFrame): DataFrame =
    dataRows(stored).filter(col("id") === TotalId)
      .select(col("grp"), col("v").as("n_total"))

  /** Estimate percentiles off the stored artifact — the
    * [[Sketches.sampleQuantiles]] kernel over [[quantileSampleRows]] +
    * [[quantileTotals]]; equals a whole-history
    * [[Sketches.quantileSketch]] exactly (merge law). */
  def quantileEstimate(stored: DataFrame, qs: Seq[Int]): DataFrame =
    Sketches.sampleQuantiles(quantileSampleRows(stored),
      quantileTotals(stored), qs)

  /** Streaming quantile-sample maintenance: every micro-batch folds into
    * the stored sample; estimate any time with
    * `quantileEstimate(spark.read.parquet(dir), qs)`. */
  def quantileSampleSink(stream: DataFrame, idCol: String, groupCol: String,
                         valueQ: org.apache.spark.sql.Column, k: Int,
                         dir: String, checkpoint: String): DataStreamWriter[Row] =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendQuantileSample(batch, idCol, groupCol, valueQ, k, dir, batchId,
          streamId = checkpoint)
      }
}
