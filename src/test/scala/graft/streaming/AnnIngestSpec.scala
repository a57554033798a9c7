package graft.streaming

import graft.SparkSpec
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class VecRow(vec_id: Long, embedding: Seq[Float])

/** The streaming IVF ingest lifecycle: first batch bootstraps the index
  * (non-zero-based ids), later batches delta-append, probes see new
  * vectors immediately, and a replayed step appends nothing. */
class AnnIngestSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def v(x: Float, y: Float): Seq[Float] = Seq(x, y, 0.1f, 0.1f)

  test("bootstrap from a non-zero-based stream, append, probe, replay-idempotent") {
    val idx = java.nio.file.Files.createTempDirectory("ann-ingest").toString + "/idx"
    val ck = java.nio.file.Files.createTempDirectory("ann-ingest-ck").toString
    val in = MemoryStream[VecRow]
    // ids start at 10: buildIvfIndex's `id < k` seeding would pick NOTHING
    in.addData(
      VecRow(10L, v(1f, 0f)), VecRow(11L, v(0f, 1f)),
      VecRow(12L, v(0.9f, 0.1f)), VecRow(13L, v(0.1f, 0.9f)))
    val q = AnnIngest.ivfIngest(in.toDF(), "embedding", "vec_id", idx,
      kCentroids = 2, checkpointDir = ck)
    q.processAllAvailable()
    // bootstrap committed: centroid table + partitioned cells exist
    assert(spark.read.parquet(idx + ".centroids").count() == 2)
    assert(spark.read.parquet(idx).count() == 4)

    // a second batch lands near the (1,0) cluster and is probe-visible
    // immediately after the epoch
    in.addData(VecRow(20L, v(0.95f, 0.05f)), VecRow(21L, v(0.05f, 0.95f)))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(idx).count() == 6)
    val probe = spark.createDataFrame(Seq(Tuple1(v(1f, 0f)))).toDF("q_vec")
    val hits = Similarity.ivfProbe(spark, idx, "embedding", "vec_id", probe,
      excludeId = -1L, k = 3, nprobe = 1).select("vec_id").as[Long].collect().toSet
    assert(hits.contains(20L), s"new vector probe-visible: $hits")
    assert(hits.subsetOf(Set(10L, 12L, 20L)), s"one-cell probe stays in-cluster: $hits")

    // a foreachBatch RETRY re-runs the same step with the same delta:
    // the per-cell anti-join appends nothing
    val replay = Seq(VecRow(20L, v(0.95f, 0.05f)), VecRow(21L, v(0.05f, 0.95f)))
      .toDF()
    AnnIngest.ivfIngestStep(replay, "embedding", "vec_id", idx, kCentroids = 2)
    assert(spark.read.parquet(idx).count() == 6, "replayed delta appends nothing")
    // ... and probes return each id at most once
    val again = Similarity.ivfProbe(spark, idx, "embedding", "vec_id", probe,
      excludeId = -1L, k = 10, nprobe = 2).select("vec_id").as[Long].collect()
    assert(again.length == again.distinct.length, s"no duplicate ids: ${again.toSeq}")
  }

  test("an empty first batch does not bootstrap a zero-centroid index") {
    val idx = java.nio.file.Files.createTempDirectory("ann-empty").toString + "/idx"
    val empty = Seq.empty[VecRow].toDF()
    AnnIngest.ivfIngestStep(empty, "embedding", "vec_id", idx, kCentroids = 2)
    assert(!Similarity.ivfIndexCommitted(spark, idx),
      "empty batch must leave no committed index — a zero-centroid index " +
        "would route every later batch down the append path and drop all vectors")
    // the real first batch still bootstraps normally afterwards
    AnnIngest.ivfIngestStep(
      Seq(VecRow(10L, v(1f, 0f)), VecRow(11L, v(0f, 1f))).toDF(),
      "embedding", "vec_id", idx, kCentroids = 2)
    assert(Similarity.ivfIndexCommitted(spark, idx))
    assert(spark.read.parquet(idx).count() == 2)
  }

  test("appendToIvfPqIndex: delta encoding equals a full rebuild; replay appends nothing") {
    import spark.implicits._
    def vec(i: Int) = Array.tabulate(8)(j =>
      (((i * 31 + j * 17) % 100) + 1) / 100.0f)
    val base = (0 until 30).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val delta = (100 until 110).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("pqappend").toFile
      .getAbsolutePath
    // incremental: build on base, append the delta against the FROZEN
    // codebook/centroids
    Similarity.buildIvfPqIndex(base, "embedding", "vec_id",
      kCentroids = 4, m = 2, kCodes = 4, dim = 8, s"$root/inc")
    Similarity.appendToIvfPqIndex(delta, "embedding", "vec_id",
      m = 2, dim = 8, s"$root/inc")
    // rebuild on the union: delta ids (100+) are above every seed id, so
    // centroids and codebook are identical and the two paths must agree
    // row for row
    Similarity.buildIvfPqIndex(base.unionByName(delta), "embedding",
      "vec_id", kCentroids = 4, m = 2, kCodes = 4, dim = 8, s"$root/full")
    def rows(dir: String) = spark.read.parquet(dir)
      .select("vec_id", "sub", "code", "centroid_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getInt(3))).toSet
    assert(rows(s"$root/inc") == rows(s"$root/full"),
      "append against the frozen store must equal the rebuild")
    // replay idempotency: the retried delta finds its ids and appends 0
    val before = spark.read.parquet(s"$root/inc").count()
    Similarity.appendToIvfPqIndex(delta, "embedding", "vec_id",
      m = 2, dim = 8, s"$root/inc")
    assert(spark.read.parquet(s"$root/inc").count() == before,
      "a replayed delta must append nothing")
    // changed-cell re-ingest: id 100 re-arrives with a DIFFERENT
    // embedding (vec(7), which may assign to another cell). The append
    // dedups against ids anywhere in the index — not just the delta's
    // touched cells — so the stale-codes-in-old-cell + fresh-codes-in-
    // new-cell double store (which would double adcCut's summed
    // distance) cannot happen: count unchanged, and every id still
    // lives in exactly one cell.
    Similarity.appendToIvfPqIndex(
      Seq((100L, vec(7))).toDF("vec_id", "embedding"),
      "embedding", "vec_id", m = 2, dim = 8, s"$root/inc")
    val idx = spark.read.parquet(s"$root/inc")
    assert(idx.count() == before,
      "a re-ingested id with a changed embedding must be refused")
    val spanning = idx.select("vec_id", "centroid_id").distinct()
      .groupBy("vec_id").count().filter(col("count") > 1).count()
    assert(spanning == 0, "no id may hold codes in two cells")
  }

  test("semDedupIngest: gate drops index dups and batch dups, keeps the rest; replay is stable") {
    val root = java.nio.file.Files.createTempDirectory("semdd-ingest").toString
    val idx = root + "/idx"
    val in = MemoryStream[VecRow]
    // bootstrap batch: 12 is a near-dup of 10 (same cell, cos ~0.9999)
    in.addData(
      VecRow(10L, v(1f, 0f)), VecRow(11L, v(0f, 1f)),
      VecRow(12L, v(0.99f, 0.01f)))
    val q = AnnIngest.semDedupIngest(in.toDF(), "embedding", "vec_id", idx,
      keptDir = root + "/kept", checkpointDir = root + "/ck",
      kCentroids = 2, threshold = 0.9)
    q.processAllAvailable()
    // the gate held 12 back: the index holds ONLY the survivors
    assert(spark.read.parquet(idx).select("vec_id").as[Long].collect().toSet
      == Set(10L, 11L), "bootstrap indexes only the self-deduped survivors")
    assert(spark.read.parquet(root + "/kept").select("vec_id")
      .as[Long].collect().toSet == Set(10L, 11L))

    // second batch: 20/21 duplicate INDEXED vectors, 22 is novel
    in.addData(
      VecRow(20L, v(0.98f, 0.02f)), VecRow(21L, v(0.02f, 0.98f)),
      VecRow(22L, v(0.7f, 0.7f)))
    q.processAllAvailable(); q.stop()
    assert(spark.read.parquet(idx).select("vec_id").as[Long].collect().toSet
      == Set(10L, 11L, 22L), "index grows only by the kept novel vector")
    assert(spark.read.parquet(root + "/kept/epoch=1").select("vec_id")
      .as[Long].collect().toSet == Set(22L))

    // foreachBatch RETRY of the already-appended batch: 22's OWN stored
    // row must not self-drop (id-equality excluded), the kept set is
    // identical, and the anti-joined append adds nothing
    val replayKept = AnnIngest.semDedupIngestStep(
      Seq(VecRow(20L, v(0.98f, 0.02f)), VecRow(21L, v(0.02f, 0.98f)),
        VecRow(22L, v(0.7f, 0.7f))).toDF(),
      "embedding", "vec_id", idx, kCentroids = 2, threshold = 0.9)
      .select("vec_id").as[Long].collect().toSet
    assert(replayKept == Set(22L), s"retry-stable kept set: $replayKept")
    assert(spark.read.parquet(idx).count() == 3, "replay appends nothing")

    // an empty batch keeps nothing and must not disturb the index
    val emptyKept = AnnIngest.semDedupIngestStep(Seq.empty[VecRow].toDF(),
      "embedding", "vec_id", idx, kCentroids = 2, threshold = 0.9)
    assert(emptyKept.isEmpty)
    assert(spark.read.parquet(idx).count() == 3)
  }
}
