package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming PSI gate: a micro-batch shaped like the reference passes
  * quietly; a shifted batch trips the alarm; every batch leaves one audit
  * row. */
class DriftMonitorSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("in-distribution batch is quiet, a shifted batch alarms, one audit row each") {
    val outDir = java.nio.file.Files.createTempDirectory("psi_out").toFile
    java.nio.file.Files.delete(outDir.toPath)
    val ckpt = java.nio.file.Files.createTempDirectory("psi_ckpt").toFile
    val ref = (1 to 600).map(i => (i % 100).toLong).toDF("v")
    val in = MemoryStream[Long]
    val q = DriftMonitor.psiGate(in.toDS().toDF("v"), "v", ref,
        lo = 0, width = 50, nBuckets = 6,
        alarmAtMicro = 250000L, // the conventional 0.25 "act" line
        outDir.getAbsolutePath, ckpt.getAbsolutePath)
      .start()
    try {
      // batch 1: same shape as the reference
      in.addData((1 to 300).map(i => (i % 100).toLong): _*)
      q.processAllAvailable()
      // batch 2: hard shift into the top bucket band
      in.addData((1 to 300).map(i => (i % 100 + 150).toLong): _*)
      q.processAllAvailable()
    } finally q.stop()
    val audit = spark.read.parquet(outDir.getAbsolutePath)
      .orderBy("batch_id")
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getBoolean(3))).toSeq
    assert(audit.size == 2, s"one audit row per non-empty batch: $audit")
    assert(audit(0)._1 == 300 && !audit(0)._3,
      s"in-distribution batch must not alarm: ${audit(0)}")
    assert(audit(1)._3 && audit(1)._2 > 250000L,
      s"shifted batch must cross the act line: ${audit(1)}")
  }
}
