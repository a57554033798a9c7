package graft

import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity-operator properties not already pinned by the oracle queries:
  * the hot-cell guard (a planted mega-cell must produce BOUNDED candidate
  * work, and cells under the cap must be untouched) and the materialized
  * IVF index round-trip. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  /** n vectors with deterministic pseudo-random float components. */
  private def vecs(n: Int, dim: Int = 8) =
    (0 until n).map { i =>
      (i.toLong, Array.tabulate(dim)(j => (((i * 31 + j * 17) % 100) + 1) / 100.0f))
    }.toDF("id", "v")

  test("blocked pairs: a planted mega-cell is sub-split to bounded candidate counts") {
    // 2000 vectors ALL in one label cell. Uncapped, pair generation is
    // C(2000,2) = 1,999,000 candidates on one reducer — the d² hot key the
    // guard exists for. maxCell=100 → ~20 hash sub-cells → ~Σ C(~100,2) ≈
    // 99k candidates. threshold = -1 keeps every candidate (cosine ≥ -1
    // always), so the output count IS the candidate count.
    val emb = vecs(2000).withColumn("label", lit(0))
    val n = Similarity.blockedNearDupPairs(emb, "v", "id", "label",
      threshold = -1.0, maxCell = 100).count()
    assert(n < 300000L, s"candidates must be bounded by the sub-split, got $n")
    assert(n > 10000L, s"sub-cells must still generate within-cell pairs, got $n")
    // and the audit hook names the offending cell
    val over = Similarity.oversizedCells(
      emb.select(col("label"), col("id")), "label", maxCell = 100).collect()
    assert(over.length == 1 && over(0).getLong(1) == 2000L)
  }

  test("blocked pairs: cells at or under maxCell are untouched (exact results)") {
    val emb = vecs(200).withColumn("label", (col("id") % 4).cast("int"))
    val capped = Similarity.blockedNearDupPairs(emb, "v", "id", "label",
      threshold = 0.9, maxCell = 50) // cells are exactly 50 — not > cap
    val uncapped = Similarity.blockedNearDupPairs(emb, "v", "id", "label",
      threshold = 0.9, maxCell = 100000)
    val a = capped.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val b = uncapped.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(a == b, "guard must be a no-op below the cap")
    assert(a.nonEmpty)
  }

  test("LSH pairs: a planted mega-bucket is sub-split to bounded candidate counts") {
    // 1000 IDENTICAL vectors land in one hyperplane bucket (cos = 1 with
    // each other). maxCell=50 → ~20 sub-cells → ~Σ C(~50,2) ≈ 24.5k
    // candidates instead of C(1000,2) = 499.5k.
    val one = Array.tabulate(64)(j => (j + 1) / 64.0f)
    val emb = (0 until 1000).map(i => (i.toLong, one)).toDF("id", "v")
    val n = Similarity.lshNearDupPairs(emb, "v", "id", dim = 64, bits = 8,
      threshold = -1.0, maxCell = 50).count()
    assert(n < 80000L, s"candidates must be bounded by the sub-split, got $n")
    assert(n > 1000L, s"sub-cells must still generate within-cell pairs, got $n")
  }

  test("sub-split is deterministic: identical pair sets across executions") {
    val emb = vecs(500).withColumn("label", lit(0))
    def run() = Similarity.blockedNearDupPairs(emb, "v", "id", "label",
      threshold = 0.5, maxCell = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = run()
    assert(run() == first, "content-hash sub-cells must reproduce exactly")
  }

  test("materialized IVF index: build once, probe matches the inline end-to-end form") {
    val emb = vecs(400, dim = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfidx").toString + "/idx"
    Similarity.buildIvfIndex(emb, "v", "id", kCentroids = 4, indexDir = dir)
    val indexed = Similarity.ivfProbeById(spark, dir, "v", "id",
      queryId = 7L, k = 5, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    // the one-shot convenience (build to a temp dir + probe) must agree
    val oneShot = Similarity.ivfTopK(emb, "v", "id", queryId = 7L,
      k = 5, kCentroids = 4, nprobe = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toList
    assert(indexed == oneShot)
    assert(indexed.length == 5)
    // index layout: one directory per centroid cell
    val cellDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("centroid_id="))
    assert(cellDirs.length == 4, s"expected 4 cell directories, got ${cellDirs.map(_.getName).toList}")
  }
}
