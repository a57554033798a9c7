package graft.streaming

import graft.SparkSpec
import graft.operators.Warehouse
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class Ev(k: String, v: Double)

/** Incremental agg-state maintenance: the stream's epoch deltas must merge
  * to EXACTLY the batch recompute, and a retried epoch must replace (not
  * double-count) its first attempt. */
class StateMaintenanceSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("stream-maintained state == batch recompute; deltas land per epoch") {
    val dir = java.nio.file.Files.createTempDirectory("state_maint").toString
    val in = MemoryStream[Ev]
    val q = StateMaintenance.maintainAggState(in.toDF(), Seq("k"), "v",
      s"$dir/deltas", s"$dir/ckpt")
    in.addData(Ev("a", 1.0), Ev("a", 2.5), Ev("b", -3.0))
    q.processAllAvailable()
    in.addData(Ev("a", 4.0), Ev("c", 0.25))
    q.processAllAvailable()
    in.addData(Ev("b", 10.0))
    q.processAllAvailable()
    q.stop()

    val all = Seq(Ev("a", 1.0), Ev("a", 2.5), Ev("b", -3.0),
      Ev("a", 4.0), Ev("c", 0.25), Ev("b", 10.0)).toDF()
    val expect = Warehouse.finalizeAggState(
        Warehouse.aggState(all, Seq("k"), "v"))
      .orderBy("k").collect().toSeq
    val got = Warehouse.finalizeAggState(
        StateMaintenance.currentState(spark, s"$dir/deltas", Seq("k"),
          all, "v"))
      .orderBy("k").collect().toSeq
    assert(got == expect, s"stream state drifted from batch:\n$got\nvs\n$expect")
    // three epochs, three delta partitions
    assert(new java.io.File(s"$dir/deltas").listFiles()
      .count(_.getName.startsWith("epoch=")) == 3)
  }

  test("stream-maintained zone map == batch zone map over all loads") {
    val dir = java.nio.file.Files.createTempDirectory("zm_maint").toString
    val in = MemoryStream[Ev]
    val bucket = org.apache.spark.sql.functions.expr(
      "CAST(abs(hash(k)) % 3 AS BIGINT)")
    val q = StateMaintenance.maintainZoneMap(in.toDF(), bucket, Seq("v"),
      s"$dir/deltas", s"$dir/ckpt")
    in.addData(Ev("a", 1.0), Ev("b", -3.0)); q.processAllAvailable()
    in.addData(Ev("a", 9.0), Ev("c", 0.5)); q.processAllAvailable()
    q.stop()
    val all = Seq(Ev("a", 1.0), Ev("b", -3.0), Ev("a", 9.0), Ev("c", 0.5)).toDF()
    val expect = Warehouse.zoneMap(all, bucket, Seq("v"))
      .orderBy("bucket").collect().toSeq
    val got = StateMaintenance.currentZoneMap(spark, s"$dir/deltas", all,
        bucket, Seq("v"))
      .orderBy("bucket").collect().toSeq
    assert(got == expect, s"zone map drifted:\n$got\nvs\n$expect")
  }

  test("a retried epoch overwrites its delta — no double counting") {
    val dir = java.nio.file.Files.createTempDirectory("state_retry").toString
    val batch = Seq(Ev("a", 5.0), Ev("b", 7.0)).toDF()
    // simulate the foreachBatch body running twice for the same epoch id
    Warehouse.aggState(batch, Seq("k"), "v")
      .write.mode("overwrite").parquet(s"$dir/deltas/epoch=0")
    Warehouse.aggState(batch, Seq("k"), "v")
      .write.mode("overwrite").parquet(s"$dir/deltas/epoch=0")
    val n = StateMaintenance.currentState(spark, s"$dir/deltas", Seq("k"),
        batch, "v")
      .agg(sum("n")).as[Long].collect().head
    assert(n == 2L, s"retry must not double-count: n=$n")
  }

  test("absent delta dir reads as the empty state") {
    val like = Seq(Ev("a", 1.0)).toDF()
    assert(StateMaintenance.currentState(spark,
      "/tmp/state_maint_nonexistent_xyz", Seq("k"), like, "v").count() == 0L)
  }
}
