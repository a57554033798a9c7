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
    // what the CMS lane relies on)
    def storedRegs() = regs(SketchMaintenance.dataRows(spark.read.parquet(dir)))
    val before = storedRegs()
    SketchMaintenance.appendHllSketch(
      b1.toDF("g", "v"), "v", "g", dir, batchId = 0L, streamId = cp)
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

    // replay guard: re-folding batch 0 must NOT double-count (SUM is not
    // idempotent — this is the lane the per-lineage watermark exists for)
    def storedCells() =
      cells(SketchMaintenance.dataRows(spark.read.parquet(dir)))
    val before = storedCells()
    SketchMaintenance.appendCmsSketch(
      b1.toDF("item"), "item", dir, batchId = 0L, depth = 3, width = 64,
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
}
