package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener
import org.apache.spark.sql.streaming.StreamingQueryListener._

/** W11: pipeline metrics — the reference's MetricsRegistry counters
  * (WikipediaApplication.java:169, repeatEdits) map to `observe()` metrics
  * surfaced through StreamingQueryListener progress events. */
class ObserveSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("observe() surfaces per-batch counters through the listener") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val listener = new StreamingQueryListener {
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val om = e.progress.observedMetrics
        if (om.containsKey("edit_metrics")) {
          val row = om.get("edit_metrics")
          seen.add((row.getAs[Long]("n_events"), row.getAs[Long]("n_invalid")))
        }
      }
    }
    spark.streams.addListener(listener)
    try {
      val in = MemoryStream[PageView]
      val q = in.toDS().toDF()
        .observe("edit_metrics",
          count(lit(1)).as("n_events"),
          sum(when(col("userId") === "invalidUserId", 1L).otherwise(0L)).as("n_invalid"))
        .filter(col("userId") =!= "invalidUserId")
        .writeStream.format("memory").queryName("t_observe").outputMode("append").start()
      in.addData(
        PageView("a", "u1", "x", ts(1)),
        PageView("b", "invalidUserId", "x", ts(2)),
        PageView("c", "u2", "x", ts(3)))
      q.processAllAvailable(); q.stop()
      assert(seen.contains((3L, 1L)),
        s"listener must see 3 events / 1 invalid, saw ${seen.toArray.toSeq}")
      assert(spark.table("t_observe").count() == 2)
    } finally spark.streams.removeListener(listener)
  }
}
