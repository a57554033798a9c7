package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming count-min maintenance: the BATCH [[Sketches.cmsBuild]] plan
  * (hash → posexplode → grid count) is itself a valid streaming
  * aggregation — the depth×width grid IS the bounded state Structured
  * Streaming maintains, so frequency infrastructure needs no second
  * streaming kernel (the same single-kernel claim kmvDistinctStream makes
  * for distinct counts, here for free because the sketch is a plain
  * count agg). Complete-mode memory sink holds the current grid. */
class CmsStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("the live grid equals the batch sketch after every micro-batch") {
    val in = MemoryStream[String]
    val q = Sketches.cmsBuild(in.toDS().toDF("item"), "item",
        depth = 2, width = 8)
      .writeStream.outputMode("complete")
      .format("memory").queryName("cms_live")
      .start()
    def grid(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    try {
      val batch1 = (0 until 40).map(i => s"w${i % 7}")
      in.addData(batch1: _*)
      q.processAllAvailable()
      assert(grid(spark.table("cms_live")) ==
        grid(Sketches.cmsBuild(batch1.toDF("item"), "item", 2, 8)),
        "after batch 1 the live grid must equal the batch sketch")
      // a second micro-batch with overlapping + new items: counts ACCUMULATE
      val batch2 = (0 until 25).map(i => s"w${i % 11}")
      in.addData(batch2: _*)
      q.processAllAvailable()
      assert(grid(spark.table("cms_live")) ==
        grid(Sketches.cmsBuild((batch1 ++ batch2).toDF("item"), "item", 2, 8)),
        "the maintained grid must equal the batch sketch of all data seen")
    } finally q.stop()
  }
}
