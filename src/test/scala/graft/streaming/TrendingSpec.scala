package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Per-window trending top-k: rankings appear only when the watermark
  * closes a window, are cut at k with deterministic ties, and are never
  * revised. */
class TrendingSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("closed windows emit their final top-k; open windows emit nothing") {
    val outDir = java.nio.file.Files.createTempDirectory("trend_out").toFile
    java.nio.file.Files.delete(outDir.toPath)
    val ckpt = java.nio.file.Files.createTempDirectory("trend_ckpt").toFile
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = Trending.topKPerWindow(in.toDS().toDF("ts", "item"),
        "ts", "item", windowDur = "10 seconds", watermarkDelay = "5 seconds",
        k = 2, outDir.getAbsolutePath, ckpt.getAbsolutePath)
      .start()
    try {
      // window [1000, 1010): a×3, b×2, c×1 → top-2 = a, b
      in.addData(
        (ts(1001), "a"), (ts(1002), "a"), (ts(1003), "a"),
        (ts(1004), "b"), (ts(1005), "b"), (ts(1006), "c"))
      q.processAllAvailable()
      // nothing emitted yet — the window is still open
      assert(!outDir.exists() || spark.read.parquet(outDir.getAbsolutePath).isEmpty)
      // an event far enough ahead closes it (watermark 5s past 1010)
      in.addData((ts(1030), "z"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir.getAbsolutePath)
      .orderBy("window_start", "rnk")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3))).toSeq
    assert(out == Seq((1L, "a", 3L), (2L, "b", 2L)),
      s"final top-2 of the closed window, c cut: $out")
  }

  test("count ties rank deterministically by item") {
    val outDir = java.nio.file.Files.createTempDirectory("trend_tie").toFile
    java.nio.file.Files.delete(outDir.toPath)
    val ckpt = java.nio.file.Files.createTempDirectory("trend_tie_ckpt").toFile
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = Trending.topKPerWindow(in.toDS().toDF("ts", "item"),
        "ts", "item", "10 seconds", "5 seconds", k = 2,
        outDir.getAbsolutePath, ckpt.getAbsolutePath)
      .start()
    try {
      in.addData((ts(1001), "y"), (ts(1002), "x"), (ts(1003), "z"))
      q.processAllAvailable()
      in.addData((ts(1030), "flush"))
      q.processAllAvailable()
    } finally q.stop()
    val out = spark.read.parquet(outDir.getAbsolutePath)
      .orderBy("rnk").collect().map(_.getString(2)).toSeq
    assert(out == Seq("x", "y"), s"all-tied counts cut alphabetically: $out")
  }

  test("the live stream's closed-window panel equals the batch twin row for row") {
    val outDir = java.nio.file.Files.createTempDirectory("trend_eq").toFile
    java.nio.file.Files.delete(outDir.toPath)
    val ckpt = java.nio.file.Files.createTempDirectory("trend_eq_ckpt").toFile
    val rows = (0 until 60).map(i =>
      (ts(1000L + i), s"it${(i * 7 + i / 10) % 5}"))
    val in = MemoryStream[(java.sql.Timestamp, String)]
    val q = Trending.topKPerWindow(in.toDS().toDF("ts", "item"),
        "ts", "item", "10 seconds", "5 seconds", k = 2,
        outDir.getAbsolutePath, ckpt.getAbsolutePath)
      .start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      in.addData((ts(2000), "flush")) // closes every data window
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.read.parquet(outDir.getAbsolutePath)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    val batch = Trending.topKPerWindowBatch(
        rows.toDF("ts", "item"), "ts", "item", "10 seconds", k = 2)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getString(2),
        r.getLong(3))).toSet
    assert(streamed == batch,
      s"closed-window stream output must equal the batch twin:\n$streamed\nvs\n$batch")
  }
}
