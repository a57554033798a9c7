package graft.streaming

import graft.operators.RelationalOps
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming drift gate: every micro-batch's value distribution is scored
  * against a FIXED reference sample with the batch PSI
  * ([[RelationalOps.populationStability]] — add-one smoothed, integer
  * micro-unit terms), and one (batch_id, n_rows, psi_micro, alarm) row is
  * appended to a queryable parquet audit table. The standard "is
  * tonight's crawl shaped like the corpus we validated?" gate, placed in
  * front of ingest the way [[CurationStream.curationGate]] is placed in
  * front of training: an upstream format change, a locale flip, or a
  * broken scraper shifts the distribution long before row-level
  * expectations fail.
  *
  * Scale shape per batch: the REFERENCE side's bucket counts are computed
  * once and persisted (B rows, broadcast into every batch's merge) — the
  * reference sample is never rescanned; the batch side is one map-side
  * combinable bucket count; everything downstream is B-sized. The audit
  * append is one tiny file per batch (an upsert-table compaction applies
  * if batches are very frequent).
  *
  * Alarm threshold is in PSI micro-units (the conventional lines: 0.1 →
  * 100000 "investigate", 0.25 → 250000 "act"). */
object DriftMonitor {

  def psiGate(stream: DataFrame, valCol: String, ref: DataFrame,
              lo: Long, width: Long, nBuckets: Int,
              alarmAtMicro: Long, outDir: String,
              checkpoint: String): DataStreamWriter[Row] = {
    // reference bucket counts: computed once, tiny, reused every batch
    val refCounts = ref.select(col(valCol)).persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val n = batch.count()
        if (n > 0) {
          val psiMicro = RelationalOps
            .populationStability(refCounts, batch, valCol, lo, width, nBuckets)
            .agg(coalesce(sum("term_micro"), lit(0L)).as("s"))
            .collect()(0).getLong(0)
          import spark.implicits._
          Seq((batchId, n, psiMicro, psiMicro > alarmAtMicro))
            .toDF("batch_id", "n_rows", "psi_micro", "alarm")
            .coalesce(1).write.mode("append").parquet(outDir)
        }
      }
  }
}
