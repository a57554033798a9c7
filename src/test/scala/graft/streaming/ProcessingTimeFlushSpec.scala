package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** W8: processing-time window flush — the reference emits the RUNNING
  * per-window aggregate on a wall-clock cadence (`task.window.ms=10000`,
  * WikipediaStatsStreamTask.java:83-96), not only when the window closes.
  * Spark form: `Trigger.ProcessingTime` + update output mode — every firing
  * re-emits the updated aggregate for windows touched in that batch. This
  * spec drives two waves into the SAME event-time window and asserts the
  * window was emitted once per firing with a growing count: the periodic
  * flush, observed before any watermark could close the window. */
class ProcessingTimeFlushSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  private def edit(title: String, t: Long) = WikipediaFeedEvent(
    "#en.wikipedia", s"[[$title]]  url * editor * (+7) comment", t, "s")

  test("ProcessingTime trigger + update mode re-emits the running window aggregate each firing") {
    val in = MemoryStream[WikipediaFeedEvent]
    val q = Pipelines.wikipediaStats(in.toDF(), "10 seconds")
      .writeStream.format("memory").queryName("t_ptflush")
      .outputMode("update")
      .trigger(Trigger.ProcessingTime("50 milliseconds"))
      .start()
    try {
      val base = 1540408890000L // window [1540408890, 1540408900)
      in.addData(edit("A", base), edit("B", base + 1000))
      q.processAllAvailable()
      in.addData(edit("C", base + 2000), edit("D", base + 3000))
      q.processAllAvailable()

      val out = spark.table("t_ptflush")
        .select(col("windowStart").cast("long").as("w"), col("edits"))
        .as[(Long, Long)].collect()
      val wnd = out.filter(_._1 == base / 1000)
      // two firings touched the window -> two emissions, counts 2 then 4;
      // no watermark advanced far enough to close it, so both are the
      // periodic flush, not the final append
      assert(wnd.map(_._2).sorted.toSeq == Seq(2L, 4L),
        s"expected running counts 2 then 4 for the open window, got ${wnd.toSeq}")
    } finally q.stop()
  }
}
