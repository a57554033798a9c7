package graft.streaming

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming ANN-index ingest — the vector twin of
  * [[CurationStream.nearDupIngest]], completing the index lifecycle's
  * stream side: each micro-batch of embeddings lands in the stored IVF
  * index through [[Similarity.appendToIvfIndex]] (assign against the
  * STORED centroid table, anti-join ids already present in the target
  * cells, append into the centroid-partitioned layout). Probes see every
  * ingested vector immediately through the same partition pruning; the
  * index is a storage artifact shared with the batch pipeline and
  * survives restarts — no executor state grows with the corpus.
  *
  * The FIRST batch bootstraps the index when none exists. Seeding takes
  * the batch's `kCentroids` LOWEST-id vectors explicitly —
  * [[Similarity.buildIvfIndex]]'s `id < k` seeding assumes a 0-based
  * corpus and would select NOTHING from a stream whose ids start
  * elsewhere (a Kafka feed rarely begins at id 0).
  *
  * Retry contract: the bootstrap write is mode-overwrite and the append
  * path anti-joins per-cell existing ids, so a replayed micro-batch
  * (either kind) leaves the index unchanged. Centroid drift under
  * sustained ingest is the documented rebuild trigger — refit with
  * [[Similarity.kmeansCentroids]] and rewrite when cell sizes skew. */
object AnnIngest {

  def ivfIngest(vectors: DataFrame, vecCol: String, idCol: String,
                indexDir: String, kCentroids: Int,
                checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (b: DataFrame, _: Long) =>
        ivfIngestStep(b, vecCol, idCol, indexDir, kCentroids)
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One micro-batch: bootstrap when no committed index exists, else
    * delta-append. Factored out so specs and batch backfills drive it
    * directly. */
  def ivfIngestStep(batch: DataFrame, vecCol: String, idCol: String,
                    indexDir: String, kCentroids: Int): Unit = {
    val spark = batch.sparkSession
    // an EMPTY batch (no-data micro-batch, idle-source trigger, restart
    // replay) must not bootstrap: a zero-centroid index would COMMIT its
    // marker and every later batch would take the append path, where
    // assigning against zero centroids drops every vector forever
    if (batch.isEmpty) return
    if (!Similarity.ivfIndexCommitted(spark, indexDir)) {
      // single-partition sort bound: runs on the limit(kCentroids) seed
      // relation below — k rows, never the batch
      val w = Window.orderBy(col(idCol))
      val seeds = batch.orderBy(col(idCol)).limit(kCentroids)
        .select((row_number().over(w) - 1).cast("int").as("centroid_id"),
          col(vecCol).as("c_vec"))
      Similarity.buildIvfIndexWith(batch, vecCol, idCol, seeds, indexDir)
    } else
      Similarity.appendToIvfIndex(batch, vecCol, idCol, indexDir)
  }

  /** DEDUP-GATED streaming ingest — the live SemDeDup gate, the stream
    * twin of `q_semdedup_indexed`: each micro-batch is screened against
    * the stored index ([[Similarity.semDedupAgainstIndex]] — partition-
    * pruned probes of the delta's touched cells, never a corpus rescan)
    * and only the SURVIVORS are appended, so the index holds an
    * already-deduplicated corpus and later batches dedup against exactly
    * that — the SemDeDup incremental invariant. Kept ids land under
    * `keptDir/epoch=<id>` (overwrite-per-epoch, the
    * [[CurationStream.nearDupIngest]] retry contract).
    *
    * Retry: the screen excludes same-id index rows (a replayed batch
    * whose survivors were already appended re-screens to the SAME kept
    * set) and [[Similarity.appendToIvfIndex]] anti-joins existing ids —
    * a replay rewrites identical flags and appends nothing. */
  def semDedupIngest(vectors: DataFrame, vecCol: String, idCol: String,
                     indexDir: String, keptDir: String, checkpointDir: String,
                     kCentroids: Int, threshold: Double): StreamingQuery =
    vectors.writeStream
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        semDedupIngestStep(b, vecCol, idCol, indexDir, kCentroids, threshold)
          .write.mode("overwrite").parquet(s"$keptDir/epoch=$epoch")
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** One dedup-gated micro-batch; returns the kept ids (one `idCol`
    * column). Bootstrap (no committed index): the first batch self-dedups
    * with the INLINE kernel over explicit lowest-id seeds (the
    * [[ivfIngestStep]] seeding — `id < k` would assume a 0-based stream)
    * and the index is built from its survivors only. Append path: screen
    * against the stored index, then append survivors. An empty batch
    * keeps nothing and must not bootstrap (see [[ivfIngestStep]]). */
  def semDedupIngestStep(batch: DataFrame, vecCol: String, idCol: String,
                         indexDir: String, kCentroids: Int,
                         threshold: Double): DataFrame = {
    val spark = batch.sparkSession
    if (batch.isEmpty) return batch.select(col(idCol)).limit(0)
    val kept =
      if (!Similarity.ivfIndexCommitted(spark, indexDir)) {
        val w = Window.orderBy(col(idCol))
        val seeds = batch.orderBy(col(idCol)).limit(kCentroids)
          .select((row_number().over(w) - 1).cast("int").as("centroid_id"),
            col(vecCol).as("c_vec"))
        val assigned = Similarity.assignToCentroids(batch, vecCol, idCol, seeds)
          .select(col(idCol), col("centroid_id"))
        val dropped = Similarity.blockedNearDupPairs(
            batch.join(assigned, idCol), vecCol, idCol, "centroid_id",
            threshold)
          .select(col("id_b").as(idCol)).distinct()
        val keptIds = batch.select(col(idCol))
          .join(dropped, Seq(idCol), "left_anti")
          // ckpt: one-shot — per-batch kept set, consumed by the flags
          // write AND the index build in this epoch only
          .localCheckpoint(true)
        Similarity.buildIvfIndexWith(batch.join(keptIds, Seq(idCol)),
          vecCol, idCol, seeds, indexDir)
        keptIds
      } else {
        val keptIds = Similarity.semDedupAgainstIndex(spark, indexDir,
            batch, vecCol, idCol, threshold)
          // ckpt: one-shot — the screen must finish BEFORE the survivors
          // append (the screen reads the index the append mutates)
          .localCheckpoint(true)
        Similarity.appendToIvfIndex(batch.join(keptIds, Seq(idCol)),
          vecCol, idCol, indexDir)
        keptIds
      }
    kept
  }
}
