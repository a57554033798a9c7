package graft.operators

import graft.expressions.Exprs.cosineSim
import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`array<float>`).
  *
  * Two tiers, same API:
  *  - `bruteForceTopK` — exact cosine top-k, one full scan. The right answer
  *    for a single probe over any corpus size: the scan is embarrassingly
  *    parallel, the top-k is a tiny per-partition heap (TakeOrderedAndProject)
  *    — no shuffle of the corpus itself.
  *  - `lshNearDupPairs` / `lshBuckets` — random-hyperplane LSH for all-pairs
  *    or repeated-probe workloads at 100 TB: bucket on a b-bit sign pattern,
  *    only compare within buckets. Candidate volume drops from n² to
  *    Σ bucket². Hyperplanes derive from md5 — deterministic, no model state.
  */
object Similarity {

  /** Exact top-k most-cosine-similar rows to the vector with id `queryId`.
    * The probe vector travels as a broadcast scalar subquery (one row), so
    * the big side streams through codegen'd expressions without shuffling.
    */
  def bruteForceTopK(emb: DataFrame, vecCol: String, idCol: String,
                     queryId: Long, k: Int): DataFrame = {
    val probe = emb.filter(col(idCol) === queryId)
      .select(col(vecCol).as("q_vec"))
    val scored = emb.filter(col(idCol) =!= queryId)
      .crossJoin(broadcast(probe))
      .select(col(idCol), round(cosineSim(col(vecCol), col("q_vec")), 4).as("cos_sim"))
    scored.orderBy(col("cos_sim").desc, col(idCol).asc).limit(k)
  }

  /** Bucket assignment for every vector: b-bit hyperplane sign pattern. */
  def lshBuckets(emb: DataFrame, vecCol: String, idCol: String,
                 dim: Int, bits: Int): DataFrame =
    emb.select(col(idCol), lshBucket(col(vecCol), dim, bits).as("bucket"))

  /** Approximate near-duplicate pairs: same LSH bucket AND exact cosine ≥
    * threshold. Exact-verify only runs within buckets. */
  def lshNearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
                      dim: Int, bits: Int, threshold: Double): DataFrame = {
    val withBucket = emb.select(col(idCol), col(vecCol))
      .withColumn("bucket", lshBucket(col(vecCol), dim, bits))
    val a = withBucket.select(col("bucket"), col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = withBucket.select(col("bucket"), col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosineSim(col("vec_a"), col("vec_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    // no distinct needed: each vector lives in exactly one bucket, so a
    // pair can only be produced once
  }

  /** IVF-style blocked near-duplicate pairs: only compare vectors sharing a
    * coarse partition (here a precomputed cluster/label column — at scale,
    * the output of a k-means coarse quantizer). Norms are computed once per
    * vector before the pair join, so each pair costs one dot product. The
    * block key carries the shuffle; pair generation is per-block. */
  def blockedNearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
                          blockCol: String, threshold: Double): DataFrame = {
    val a = emb.select(col(blockCol).as("blk"), col(idCol).as("id_a"), col(vecCol).as("v_a"))
    val b = emb.select(col(blockCol).as("blk"), col(idCol).as("id_b"), col(vecCol).as("v_b"))
    a.join(b, Seq("blk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        round(cosineSim(col("v_a"), col("v_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }

  /** Exact all-pairs cosine above a threshold — the baseline LSH
    * approximates. Quadratic; for oracle checks and small corpora. */
  def exactNearDupPairs(emb: DataFrame, vecCol: String, idCol: String,
                        threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("id_a"), col(vecCol).as("vec_a"))
    val b = emb.select(col(idCol).as("id_b"), col(vecCol).as("vec_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), round(cosineSim(col("vec_a"), col("vec_b")), 4).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}
