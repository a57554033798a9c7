package graft.streaming

import graft.SparkSpec
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming HyperLogLog maintenance: the BATCH [[Sketches.hllBuild]] plan
  * (hash → bucket/rank projection → per-bucket MAX) is itself a valid
  * streaming aggregation — 64 register rows per group IS the bounded state,
  * and MAX is trivially mergeable across micro-batches, so live distinct
  * counting costs the same kernel as the batch profile (the CMS/KMV
  * single-kernel claim, completed for the third sketch family). */
class HllStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("live registers equal the batch sketch after every micro-batch; estimates follow") {
    val in = MemoryStream[(String, String)]
    val q = Sketches.hllBuild(in.toDS().toDF("g", "v"), "v", "g")
      .writeStream.outputMode("complete")
      .format("memory").queryName("hll_live")
      .start()
    def regs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    try {
      val batch1 = (1 to 500).map(i => ("g", s"user$i"))
      in.addData(batch1: _*)
      q.processAllAvailable()
      assert(regs(spark.table("hll_live")) ==
        regs(Sketches.hllBuild(batch1.toDF("g", "v"), "v", "g")),
        "after batch 1 the live registers must equal the batch sketch")
      // overlap + growth: registers only ratchet up (MAX merge)
      val batch2 = (300 to 900).map(i => ("g", s"user$i"))
      in.addData(batch2: _*)
      q.processAllAvailable()
      val live = regs(spark.table("hll_live"))
      assert(live ==
        regs(Sketches.hllBuild((batch1 ++ batch2).toDF("g", "v"), "v", "g")),
        "the maintained registers must equal the batch sketch of all data seen")
      // and the estimate off the live table equals the batch estimate
      val est = Sketches.hllEstimate(spark.table("hll_live"), "g")
        .collect()(0).getLong(2)
      val batchEst = Sketches.hllEstimate(
        Sketches.hllBuild((batch1 ++ batch2).toDF("g", "v"), "v", "g"), "g")
        .collect()(0).getLong(2)
      assert(est == batchEst)
    } finally q.stop()
  }
}
