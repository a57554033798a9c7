package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Restart semantics: the reference persists operator state in RocksDB and
  * restores it from the Kafka changelog on restart
  * (wikipedia-application.properties:31-34); Spark's analogue is the state
  * store restored from the checkpoint directory. These tests stop a query
  * mid-stream and restart it against the same checkpoint. */
class RecoverySpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  implicit def sp: org.apache.spark.sql.SparkSession = spark

  test("W5 running count resumes from checkpointed state after a restart") {
    val cp = Files.createTempDirectory("cp_running").toString
    val in = MemoryStream[String]
    val totals = scala.collection.mutable.ArrayBuffer[Long]()
    // memory sink can't recover from a checkpoint; foreachBatch can
    def start() = StatefulOps.runningCount(in.toDS())
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[(String, Long)], _: Long) =>
        val rows = batch.collect().map(_._2)
        totals.synchronized { totals ++= rows }
        ()
      }
      .option("checkpointLocation", cp).outputMode("update").start()

    val q1 = start()
    in.addData("edit", "edit", "edit")
    q1.processAllAvailable()
    q1.stop()

    // second incarnation, same checkpoint: state must carry the 3
    val q2 = start()
    in.addData("edit", "edit")
    q2.processAllAvailable()
    q2.stop()

    assert(totals.contains(3L) && totals.contains(5L),
      s"restarted counter must resume at 3 and reach 5, saw ${totals.toSeq}")
  }

  test("J4 SQL stream-table join inside foreachBatch") {
    val pv = MemoryStream[PageView]
    val profiles = Seq(Profile("user1", "MSFT"), Profile("user2", "GOOG")).toDF()
    profiles.createOrReplaceTempView("profiles")
    val acc = scala.collection.mutable.ArrayBuffer[EnrichedPageView]()
    val q = pv.toDS().writeStream.foreachBatch { (batch: org.apache.spark.sql.Dataset[PageView], _: Long) =>
      batch.createOrReplaceTempView("pv_batch")
      val joined = batch.sparkSession.sql(
        """SELECT p.userId, pr.company, p.pageId
          |FROM pv_batch p JOIN profiles pr ON p.userId = pr.userId""".stripMargin)
      acc.synchronized { acc ++= joined.as[EnrichedPageView].collect() }
      ()
    }.start()
    pv.addData(
      PageView("a.com", "user1", "in", ts(1)),
      PageView("b.com", "user2", "cn", ts(2)),
      PageView("c.com", "user9", "us", ts(3)))
    q.processAllAvailable(); q.stop()
    assert(acc.sortBy(_.userId).toSeq == Seq(
      EnrichedPageView("user1", "MSFT", "a.com"),
      EnrichedPageView("user2", "GOOG", "b.com")))
  }
}
