package graft.streaming

import graft.SparkSpec
import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S1/K1 serde contract, tested WITHOUT a broker: `Sinks.encodeKafkaValue`
  * (all columns → one JSON `value`) must be inverted by
  * `Sources.decodeKafkaValue` (from_json over `value` + broker timestamp) —
  * the same produce/consume round-trip the reference's Kafka wiring relies
  * on (FilterExample.java:86-99). The broker only ferries the `value`
  * bytes; everything the engine is responsible for is these two transforms,
  * so this spec covers the S1/K1/S4/S5 value-path end-to-end. */
class KafkaSerdeSpec extends SparkSpec {
  import spark.implicits._

  test("decodeKafkaValue inverts encodeKafkaValue across types, nulls, and unicode") {
    val rows = Seq(
      (1L, Some("plain ascii"), Some(3.25), Some(ts(1000)), Seq("a", "b")),
      (2L, Some("quotes \" and \\ backslash, commas, {braces}"), Some(-0.0), Some(ts(2000)), Seq.empty[String]),
      (3L, Some("unicode: é漢字 😀"), None, Some(ts(3000)), Seq("x")),
      (4L, None, Some(1.0e-7), None, Seq("tab\tnewline\n"))
    )
    val in = rows.toDF("id", "txt", "score", "ev_ts", "tags")

    val encoded = Sinks.encodeKafkaValue(in)
    assert(encoded.columns.toSeq == Seq("value"), "producer frame is a single value column")

    // what the broker hands back: the value bytes + a broker-side timestamp
    val offBroker = encoded
      .select(col("value").cast("binary").as("value"),
        lit(ts(9999)).as("timestamp"))
    val decoded = Sources.decodeKafkaValue(offBroker, in.schema.asInstanceOf[StructType])

    assert(decoded.columns.toSeq == in.columns.toSeq :+ "arrivalTs")
    val back = decoded.drop("arrivalTs")
      .as[(Long, Option[String], Option[Double], Option[java.sql.Timestamp], Seq[String])]
      .collect().sortBy(_._1).toSeq
    assert(back == rows, s"decode must invert encode exactly:\n$back\nvs\n$rows")
    // broker timestamp surfaces as arrivalTs on every row
    assert(decoded.select("arrivalTs").as[java.sql.Timestamp].collect().forall(_ == ts(9999)))
  }

  test("round-trip preserves a nested struct column") {
    val in = Seq((10L, ("inner", 42)), (11L, ("deep", -1)))
      .toDF("id", "nested")
    val offBroker = Sinks.encodeKafkaValue(in)
      .select(col("value").cast("binary").as("value"), lit(ts(1)).as("timestamp"))
    val back = Sources.decodeKafkaValue(offBroker, in.schema.asInstanceOf[StructType])
      .drop("arrivalTs").as[(Long, (String, Int))].collect().sortBy(_._1).toSeq
    assert(back == Seq((10L, ("inner", 42)), (11L, ("deep", -1))))
  }

  test("decodeKafkaValueWithDlq flags malformed payloads, keeps raw evidence, passes tombstones") {
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType)))
    val raw = Seq(
      ("""{"id": 1, "txt": "good"}""", true),
      ("""{"id": 2 "txt": missing-comma}""", true), // malformed
      ("""not json at all""", true),
      (null.asInstanceOf[String], true) // tombstone: null payload
    ).toDF("v", "dummy")
      .select(col("v").cast("binary").as("value"), lit(ts(5)).as("timestamp"))
    val out = graft.sources.Sources.decodeKafkaValueWithDlq(raw, schema)
      .select("id", "txt", "raw_value", "is_corrupt")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)), r.getBoolean(3)))
    assert(out.length == 4)
    val good = out.filter(!_._4)
    val bad = out.filter(_._4)
    assert(bad.length == 2, s"exactly the two malformed rows flag: ${out.toSeq}")
    // corrupt rows keep the raw payload for replay
    assert(bad.forall(_._3.isDefined))
    assert(bad.exists(_._3.contains("not json at all")))
    // the good row decodes; the tombstone passes with null fields, unflagged
    assert(good.exists(t => t._1.contains(1L) && t._2.contains("good")))
    assert(good.exists(t => t._1.isEmpty && t._2.isEmpty && t._3.isEmpty))
  }

  test("dlqSink routes a stream: clean rows to good, corrupt payloads to the DLQ, epoch-idempotent") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("txt", StringType)))
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[String]
    in.addData("""{"id": 10, "txt": "a"}""", """BROKEN{""", """{"id": 11, "txt": "b"}""")
    val raw = in.toDF()
      .select(col("value").cast("binary").as("value"),
        lit(ts(7)).as("timestamp"))
    val base = java.nio.file.Files.createTempDirectory("dlq").toString
    val q = graft.sources.Sinks.dlqSink(
      graft.sources.Sources.decodeKafkaValueWithDlq(raw, schema),
      s"$base/good", s"$base/dlq", s"$base/ck").start()
    q.processAllAvailable(); q.stop()
    val good = spark.read.parquet(s"$base/good").select("id", "txt")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(good == Seq((10L, "a"), (11L, "b")))
    val dlq = spark.read.parquet(s"$base/dlq").select("raw_value").as[String].collect().toSeq
    assert(dlq == Seq("BROKEN{"))
  }
}
