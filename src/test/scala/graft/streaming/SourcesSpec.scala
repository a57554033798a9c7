package graft.streaming

import graft.SparkSpec
import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.nio.file.Files

/** Source/sink factory coverage (SURVEY.md §2.1-2.2): the custom DSv2
  * replay source (S2) and the rolled-file sink (K3). */
class SourcesSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("S2 custom DataSource V2 replay source streams a file in bounded micro-batches") {
    val f = Files.createTempFile("feed", ".txt")
    Files.writeString(f, (0 until 25).map(i => s"line-$i").mkString("\n"))
    val q = Sources.replayFeed(spark, f.toString, linesPerBatch = 10)
      .writeStream.format("memory").queryName("t_replay").outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("t_replay").as[(Long, String)].collect().sortBy(_._1)
    assert(out.length == 25)
    assert(out.head == (0L, "line-0") && out.last == (24L, "line-24"))
    // bounded rate: 25 lines at 10/batch needs >= 3 micro-batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3)
  }

  test("K3 rolled-file sink caps records per file (blob-roll semantics)") {
    val in = MemoryStream[PageView]
    in.addData((1 to 10).map(i => PageView(s"p$i", s"u$i", "us", ts(1000 + i))))
    val dir = Files.createTempDirectory("rolled").toString
    val cp = Files.createTempDirectory("cp").toString
    val q = Sinks.rolledFiles(in.toDS(), dir, cp, maxRecordsPerFile = 2).start()
    q.processAllAvailable(); q.stop()
    val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 5, s"expected >=5 rolled files, got ${files.length}")
    assert(spark.read.parquet(dir).count() == 10)
  }
}
