package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** K4 retry policy: flaky writes succeed within the attempt budget
  * (CouchbaseTableExample.java:167-176 — 3 attempts, fixed backoff),
  * exhausted budgets surface the failure. */
class RetryingWriterSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("withRetries: succeeds on the last allowed attempt, rethrows past it") {
    var calls = 0
    val out = RetryingWriter.withRetries(3, backoffMs = 1) {
      calls += 1
      if (calls < 3) sys.error(s"transient $calls")
      "ok"
    }
    assert(out == "ok" && calls == 3)
    var calls2 = 0
    val e = intercept[RuntimeException] {
      RetryingWriter.withRetries(3, backoffMs = 1) { calls2 += 1; sys.error("always down") }
    }
    assert(e.getMessage == "always down" && calls2 == 3)
  }

  test("foreachRowSink: flaky per-row writes land exactly the stream's rows") {
    RetryingWriterSpec.sink.clear()
    RetryingWriterSpec.attempts.clear()
    val in = MemoryStream[String]
    val q = RetryingWriter.foreachRowSink(in.toDS(), attempts = 3, backoffMs = 1) { v =>
      val n = RetryingWriterSpec.attempts.merge(v, Integer.valueOf(1),
        (a: Integer, b: Integer) => Integer.valueOf(a + b))
      // every "flaky-" row fails its first two writes
      if (v.startsWith("flaky-") && n < 3) sys.error(s"transient for $v")
      RetryingWriterSpec.sink.add(v)
    }.start()
    try {
      in.addData("ok-1", "flaky-2", "ok-3", "flaky-4")
      q.processAllAvailable()
    } finally q.stop()
    val written = RetryingWriterSpec.sink.toArray.map(_.toString).toSeq.sorted
    assert(written == Seq("flaky-2", "flaky-4", "ok-1", "ok-3"))
    assert(RetryingWriterSpec.attempts.get("flaky-2") == 3)
    assert(RetryingWriterSpec.attempts.get("ok-1") == 1)
  }
}

/** Static landing zone: ForeachWriter instances deserialize per task, so
  * the spec observes effects through JVM-wide state (local[*] = one JVM). */
object RetryingWriterSpec {
  val sink = new java.util.concurrent.ConcurrentLinkedQueue[String]()
  val attempts = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
}
