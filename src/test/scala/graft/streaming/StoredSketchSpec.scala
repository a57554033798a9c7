package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Stored-artifact sketch maintenance across query RESTARTS — the round-9
  * closing of the loop the batch oracles opened: q_hll_merged proved
  * shard-merge == whole-corpus through the hash gate; here the same merge
  * runs inside a foreachBatch maintenance loop against a parquet register
  * table, the query dies, a new incarnation resumes from the checkpoint,
  * and the STORED sketch still equals the whole-corpus build. */
class StoredSketchSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("HLL: N micro-batches + a restart == the whole-corpus sketch; replays are no-ops") {
    val dir = Files.createTempDirectory("hll_store").toString + "/regs"
    val cp = Files.createTempDirectory("cp_hll").toString
    val in = MemoryStream[(String, String)]
    def start() = SketchMaintenance.hllSketchSink(
      in.toDS().toDF("g", "v"), "v", "g", dir, cp).start()

    val b1 = (1 to 400).map(i => ("g", s"user$i"))
    val b2 = (300 to 700).map(i => ("g", s"user$i")) // overlaps b1
    val b3 = (650 to 900).map(i => ("g", s"user$i"))

    val q1 = start()
    in.addData(b1: _*); q1.processAllAvailable()
    in.addData(b2: _*); q1.processAllAvailable()
    q1.stop()
    // second incarnation, same checkpoint + same stored artifact
    val q2 = start()
    in.addData(b3: _*); q2.processAllAvailable()
    q2.stop()

    def regs(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "bucket", "max_rank").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val stored = SketchMaintenance.dataRows(spark.read.parquet(dir))
    val whole = Sketches.hllBuild((b1 ++ b2 ++ b3).toDF("g", "v"), "v", "g")
    assert(regs(stored) == regs(whole),
      "stored registers must equal the whole-corpus sketch after a restart")
    val estStored = Sketches.hllEstimate(stored, "g").collect()(0).getLong(2)
    val estWhole = Sketches.hllEstimate(whole, "g").collect()(0).getLong(2)
    assert(estStored == estWhole && estStored > 0L)

    // at-least-once replay: re-folding an already-committed batch id must
    // not change the artifact (MAX is idempotent anyway; the guard is
    // what the CMS lane relies on). Batch 2 is the last committed — a
    // replayed batch 0 with committed > 0 now means a WIPED checkpoint
    // and throws instead (see the stale-lineage test).
    def storedRegs() = regs(SketchMaintenance.dataRows(spark.read.parquet(dir)))
    val before = storedRegs()
    SketchMaintenance.appendHllSketch(
      b3.toDF("g", "v"), "v", "g", dir, batchId = 2L, streamId = cp)
    assert(storedRegs() == before, "replay must be a no-op")
  }

  test("CMS: restart-spanning per-cell sums stay exact; replayed batches never double-count") {
    val dir = Files.createTempDirectory("cms_store").toString + "/cells"
    val cp = Files.createTempDirectory("cp_cms").toString
    val in = MemoryStream[String]
    def start() = SketchMaintenance.cmsSketchSink(
      in.toDS().toDF("item"), "item", dir, cp, depth = 3, width = 64).start()

    val b1 = Seq.fill(30)("hot") ++ (1 to 50).map(i => s"cold$i")
    val b2 = Seq.fill(20)("hot") ++ (51 to 90).map(i => s"cold$i")

    val q1 = start()
    in.addData(b1: _*); q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    in.addData(b2: _*); q2.processAllAvailable()
    q2.stop()

    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select("row", "bucket", "cnt").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val stored = SketchMaintenance.dataRows(spark.read.parquet(dir))
    val whole = Sketches.cmsBuild((b1 ++ b2).toDF("item"), "item",
      depth = 3, width = 64)
    assert(cells(stored) == cells(whole),
      "stored cells must equal the whole-corpus sketch after a restart")
    // point estimate off the stored artifact: CMS never underestimates
    val est = Sketches.cmsEstimate(Seq("hot").toDF("item"), "item",
        stored.select("row", "bucket", "cnt"), depth = 3, width = 64)
      .collect()(0).getLong(1)
    assert(est >= 50L, s"hot item saw 50 occurrences, estimate $est")

    // replay guard: re-folding the last committed batch must NOT
    // double-count (SUM is not idempotent — this is the lane the
    // per-lineage watermark exists for)
    def storedCells() =
      cells(SketchMaintenance.dataRows(spark.read.parquet(dir)))
    val before = storedCells()
    SketchMaintenance.appendCmsSketch(
      b2.toDF("item"), "item", dir, batchId = 1L, depth = 3, width = 64,
      streamId = cp)
    assert(storedCells() == before,
      "replayed batch must be skipped, not re-summed")

    // a NEW lineage (fresh checkpoint, ids restarting at 0) pointed at
    // the SAME artifact must keep MERGING, never silently skip — the
    // watermark is per (streamId, batchId), not a global high-water mark
    SketchMaintenance.appendCmsSketch(
      Seq.fill(5)("hot").toDF("item"), "item", dir, batchId = 0L,
      depth = 3, width = 64, streamId = "another-stream")
    val est2 = graft.operators.Sketches.cmsEstimate(
        Seq("hot").toDF("item"), "item",
        SketchMaintenance.dataRows(spark.read.parquet(dir))
          .select("row", "bucket", "cnt"),
        depth = 3, width = 64)
      .collect()(0).getLong(1)
    assert(est2 >= 55L, s"new lineage's batch must fold in: estimate $est2")

    // watermark CARRY-FORWARD: the other lineage's swap must not erase
    // this lineage's replay guard — a replay of the ORIGINAL stream's
    // batch 1 is still a no-op after the interleaved writer
    val afterOther = storedCells()
    SketchMaintenance.appendCmsSketch(
      b2.toDF("item"), "item", dir, batchId = 1L, depth = 3, width = 64,
      streamId = cp)
    assert(storedCells() == afterOther,
      "an interleaved lineage must not reset this lineage's watermark")
  }

  test("wiped checkpoint with a reused path throws instead of silently dropping data") {
    val dir = Files.createTempDirectory("cms_wipe").toString + "/cells"
    SketchMaintenance.appendCmsSketch(
      Seq("a", "b").toDF("item"), "item", dir, batchId = 0L,
      depth = 3, width = 64, streamId = "cp-wipe")
    SketchMaintenance.appendCmsSketch(
      Seq("c").toDF("item"), "item", dir, batchId = 1L,
      depth = 3, width = 64, streamId = "cp-wipe")
    // the checkpoint is wiped but its PATH (= lineage id) reused: the new
    // incarnation's ids restart at 0 while the artifact committed through
    // 1 — before round 10 this SKIPPED every new batch until ids caught
    // up, dropping data with no error; now it must refuse
    val e = intercept[IllegalStateException] {
      SketchMaintenance.appendCmsSketch(
        Seq("NEW-DATA").toDF("item"), "item", dir, batchId = 0L,
        depth = 3, width = 64, streamId = "cp-wipe")
    }
    assert(e.getMessage.contains("stale lineage") &&
      e.getMessage.contains("fresh checkpoint"))
    // same detection on the HLL lane
    val hdir = Files.createTempDirectory("hll_wipe").toString + "/regs"
    SketchMaintenance.appendHllSketch(
      Seq(("g", "u1")).toDF("g", "v"), "v", "g", hdir, batchId = 0L,
      streamId = "cp-wipe")
    SketchMaintenance.appendHllSketch(
      Seq(("g", "u2")).toDF("g", "v"), "v", "g", hdir, batchId = 1L,
      streamId = "cp-wipe")
    intercept[IllegalStateException] {
      SketchMaintenance.appendHllSketch(
        Seq(("g", "u3")).toDF("g", "v"), "v", "g", hdir, batchId = 0L,
        streamId = "cp-wipe")
    }
  }

  test("a genuine batch-0 replay (committed == 0) still no-ops, never throws") {
    val dir = Files.createTempDirectory("cms_b0").toString + "/cells"
    SketchMaintenance.appendCmsSketch(
      Seq.fill(7)("x").toDF("item"), "item", dir, batchId = 0L,
      depth = 3, width = 64, streamId = "cp-b0")
    def cells() = SketchMaintenance.dataRows(spark.read.parquet(dir))
      .select("row", "bucket", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val before = cells()
    // the fold landed but the checkpoint commit didn't → the stream
    // re-delivers batch 0; committed == 0 distinguishes this from a wipe
    SketchMaintenance.appendCmsSketch(
      Seq.fill(7)("x").toDF("item"), "item", dir, batchId = 0L,
      depth = 3, width = 64, streamId = "cp-b0")
    assert(cells() == before, "legit batch-0 replay must be a silent no-op")
  }

  test("an empty streamId is rejected — shared lanes drop the second writer's data") {
    val dir = Files.createTempDirectory("cms_empty").toString + "/cells"
    intercept[IllegalArgumentException] {
      SketchMaintenance.appendCmsSketch(
        Seq("x").toDF("item"), "item", dir, batchId = 0L,
        depth = 3, width = 64, streamId = "")
    }
    intercept[IllegalArgumentException] {
      SketchMaintenance.appendHllSketch(
        Seq(("g", "u")).toDF("g", "v"), "v", "g", dir, batchId = 0L,
        streamId = "")
    }
  }

  test("writer handover: a second lineage takes over the artifact, the first lineage's replay stays guarded") {
    // Stream A (checkpoint cpA) folds two batches, stops; stream B — a
    // DIFFERENT checkpoint, ids restarting at 0 — takes over the same
    // stored artifact. B must keep merging (its batch 0 is not A's
    // replay), A's re-delivered last batch must still be skipped (its
    // watermark was carried through B's swaps), and the final cells must
    // equal the whole-corpus sketch. CMS lane: SUM is not idempotent, so
    // any double-count or drop shows up exactly.
    val dir = Files.createTempDirectory("cms_handover").toString + "/cells"
    val cpA = Files.createTempDirectory("cp_handover_a").toString
    val cpB = Files.createTempDirectory("cp_handover_b").toString
    val inA = MemoryStream[String]
    val inB = MemoryStream[String]

    val a1 = Seq.fill(10)("hot") ++ (1 to 20).map(i => s"a$i")
    val a2 = Seq.fill(5)("hot") ++ (21 to 40).map(i => s"a$i")
    val b1 = Seq.fill(8)("hot") ++ (1 to 15).map(i => s"b$i")

    val qA = SketchMaintenance.cmsSketchSink(
      inA.toDS().toDF("item"), "item", dir, cpA,
      depth = 3, width = 64).start()
    inA.addData(a1: _*); qA.processAllAvailable()
    inA.addData(a2: _*); qA.processAllAvailable()
    qA.stop()

    val qB = SketchMaintenance.cmsSketchSink(
      inB.toDS().toDF("item"), "item", dir, cpB,
      depth = 3, width = 64).start()
    inB.addData(b1: _*); qB.processAllAvailable()
    qB.stop()

    def cells() = SketchMaintenance.dataRows(spark.read.parquet(dir))
      .select("row", "bucket", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val afterHandover = cells()
    // A's at-least-once re-delivery of its batch 1 arrives AFTER the
    // handover — B's swaps must have carried A's watermark forward
    SketchMaintenance.appendCmsSketch(
      a2.toDF("item"), "item", dir, batchId = 1L, depth = 3, width = 64,
      streamId = cpA)
    assert(cells() == afterHandover,
      "A's replayed batch must stay skipped after B's takeover")
    val whole = Sketches.cmsBuild((a1 ++ a2 ++ b1).toDF("item"), "item",
      depth = 3, width = 64)
    val wholeCells = whole.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(cells() == wholeCells,
      "handed-over artifact must equal the whole-corpus sketch")
  }

  test("AtomicSwap recovery: a crash between delete and rename never loses the merged sketch") {
    import org.apache.hadoop.fs.Path
    val dir = Files.createTempDirectory("hll_crash").toString + "/regs"
    val b1 = (1 to 300).map(i => ("g", s"user$i"))
    SketchMaintenance.appendHllSketch(
      b1.toDF("g", "v"), "v", "g", dir, batchId = 0L, streamId = "s")
    // simulate the crash window: the NEXT swap completed its tmp write
    // and the delete(dst), then died before the rename — dst missing,
    // complete tmp present
    val fs = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged = spark.read.parquet(dir).localCheckpoint(true)
    // (the whole table — registers AND watermark rows — is the artifact)
    merged.write.mode("overwrite").parquet(dir + ".tmp-append")
    fs.delete(new Path(dir), true)
    // restart path: the append must RECOVER the orphaned tmp (it IS the
    // artifact) instead of treating the store as empty and rebuilding
    // from the replayed batch alone
    val b2 = (200 to 500).map(i => ("g", s"user$i"))
    SketchMaintenance.appendHllSketch(
      b2.toDF("g", "v"), "v", "g", dir, batchId = 1L, streamId = "s")
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.select("g", "bucket", "max_rank").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val whole = graft.operators.Sketches
      .hllBuild((b1 ++ b2).toDF("g", "v"), "v", "g")
    assert(regs(SketchMaintenance.dataRows(spark.read.parquet(dir)))
      == regs(whole),
      "recovered artifact + next batch must equal the whole-corpus sketch")
  }

  test("quantile sample: streamed folds + a restart == the one-shot sketch; replayed totals never inflate") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("qs_store").toString + "/sample"
    val cp = Files.createTempDirectory("cp_qs").toString
    val in = MemoryStream[(String, Long, Long)]
    def start() = SketchMaintenance.quantileSampleSink(
      in.toDS().toDF("grp", "id", "v"), "id", "grp", col("v"), k = 64,
      dir, cp).start()

    val b1 = (1L to 500L).map(i => ("g", i, (i * 48271L) % 1000L))
    val b2 = (501L to 900L).map(i => ("g", i, (i * 16807L) % 1000L))
    val b3 = (901L to 1200L).map(i => ("g", i, (i * 69621L) % 1000L))

    val q1 = start()
    in.addData(b1: _*); q1.processAllAvailable()
    in.addData(b2: _*); q1.processAllAvailable()
    q1.stop() // restart boundary
    val q2 = start()
    in.addData(b3: _*); q2.processAllAvailable()
    q2.stop()

    val qs = Seq(25, 50, 90)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("grp", "q").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSeq
    val stored = rows(SketchMaintenance.quantileEstimate(
      spark.read.parquet(dir), qs))
    val oneShot = rows(Sketches.quantileSketch(
      (b1 ++ b2 ++ b3).toDF("grp", "id", "v"), "id", "grp", col("v"),
      k = 64, qs))
    assert(stored == oneShot,
      s"stored-lane estimates must equal the one-shot sketch\n$stored\n$oneShot")
    assert(stored.head._5 == 1200L, "running totals must sum the batches")

    // replayed batch: totals are additive, so the watermark guard is
    // what keeps n_total exact — a re-fold must change NOTHING
    SketchMaintenance.appendQuantileSample(
      b3.toDF("grp", "id", "v"), "id", "grp", col("v"), k = 64, dir,
      batchId = 2L, streamId = cp)
    assert(rows(SketchMaintenance.quantileEstimate(
      spark.read.parquet(dir), qs)) == stored,
      "replay must be a no-op for sample AND totals")
  }
}
