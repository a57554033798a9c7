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
}
