package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming twins of the reference's cookbook integration tests
  * (/root/reference/src/test/java/samza/examples/cookbook/test/
  * TestSamzaCookBookExamples.java): same fixture data, same expected
  * outputs, driven through MemoryStream → memory sink. */
class CookbookSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
  implicit def sp: org.apache.spark.sql.SparkSession = spark

  /** The canonical 6-event page-view fixture (TestUtils.java:66-75):
    * 3 views each for two users, timestamps seconds apart. */
  private def sampleViews(t0: Long): Seq[PageView] = Seq(
    PageView("google.com/home", "user1", "india", ts(t0)),
    PageView("google.com/search", "user1", "india", ts(t0 + 2)),
    PageView("google.com/news", "user1", "india", ts(t0 + 4)),
    PageView("yahoo.com/home", "user2", "china", ts(t0 + 1)),
    PageView("yahoo.com/search", "user2", "china", ts(t0 + 3)),
    PageView("yahoo.com/fashion", "user2", "china", ts(t0 + 5)))

  private def run(q: StreamingQuery): Unit = { q.processAllAvailable() }

  test("P1 filter drops the invalid user (TestSamzaCookBookExamples.java:49-70)") {
    val in = MemoryStream[PageView]
    in.addData(sampleViews(1000) :+ PageView("bad.com", "invalidUserId", "nowhere", ts(1002)))
    val q = Pipelines.filterInvalidUsers(in.toDS(), "invalidUserId")
      .writeStream.format("memory").queryName("t_filter").outputMode("append").start()
    run(q); q.stop()
    val out = spark.table("t_filter").as[PageView].collect()
    assert(out.length == 6)
    assert(!out.exists(_.userId == "invalidUserId"))
  }

  test("W1 tumbling window counts per user (TestSamzaCookBookExamples.java:103-121)") {
    val in = MemoryStream[PageView]
    in.addData(sampleViews(1000))
    // flush event advances the watermark past the first window
    in.addData(PageView("x", "user3", "x", ts(2000)))
    val q = Pipelines.tumblingUserCounts(in.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("t_tumbling").outputMode("append").start()
    run(q); in.addData(PageView("x", "user3", "x", ts(3000))); run(q); q.stop()
    val out = spark.table("t_tumbling")
      .select("userId", "count").as[(String, Long)].collect().toMap
    assert(out("user1") == 3 && out("user2") == 3)
  }

  test("W6 session windows: exactly 2 sessions from the 6-event fixture (TestSamzaCookBookExamples.java:124-142)") {
    val in = MemoryStream[PageView]
    in.addData(sampleViews(1000))
    in.addData(PageView("x", "user3", "x", ts(2000)))
    val q = Pipelines.sessionUserCounts(in.toDS(), "10 seconds")
      .writeStream.format("memory").queryName("t_session").outputMode("append").start()
    run(q); in.addData(PageView("x", "user3", "x", ts(3000))); run(q); q.stop()
    val out = spark.table("t_session")
      .select("userId", "count").as[(String, Long)].collect()
      .filter(r => r._1 == "user1" || r._1 == "user2")
    assert(out.length == 2, s"expected exactly 2 closed sessions, got ${out.toSeq}")
    assert(out.forall(_._2 == 3))
  }

  test("J1 stream-stream join on pageId within TTL (TestSamzaCookBookExamples.java:73-100)") {
    val pv = MemoryStream[PageView]
    val ac = MemoryStream[AdClick]
    pv.addData(sampleViews(1000))
    ac.addData(
      AdClick("google.com/home", "ad1", "user1", ts(1030)),
      AdClick("yahoo.com/fashion", "ad2", "user2", ts(1040)),
      AdClick("unseen.com", "ad3", "user9", ts(1050)))
    val q = Pipelines.pageViewAdClickJoin(pv.toDS(), ac.toDS())
      .writeStream.format("memory").queryName("t_join").outputMode("append").start()
    run(q); q.stop()
    val out = spark.table("t_join").select("adId").as[String].collect().sorted
    assert(out.toSeq == Seq("ad1", "ad2"))
  }

  test("J2 stream-table join enriches with latest profile, drops unknown users (TestSamzaCookBookExamples.java:145-177)") {
    val pv = MemoryStream[PageView]
    val pr = MemoryStream[Profile]
    // profiles feed first (same staging as the reference test), including an
    // upsert: user1 moves companies; latest wins
    pr.addData(Profile("user1", "LNKD"), Profile("user1", "MSFT"), Profile("user2", "GOOG"))
    val q = StatefulOps.streamTableJoin(pv.toDS(), pr.toDS())
      .writeStream.format("memory").queryName("t_stj").outputMode("append").start()
    run(q)
    pv.addData(
      PageView("google.com/home", "user1", "india", ts(1000)),
      PageView("yahoo.com/home", "user2", "china", ts(1001)),
      PageView("bing.com", "user7", "us", ts(1002)))
    run(q); q.stop()
    val out = spark.table("t_stj").as[EnrichedPageView].collect().sortBy(_.userId)
    assert(out.toSeq == Seq(
      EnrichedPageView("user1", "MSFT", "google.com/home"),
      EnrichedPageView("user2", "GOOG", "yahoo.com/home")))
  }

  test("W5 all-time running count survives across micro-batches (WikipediaApplication.java:166-181)") {
    val in = MemoryStream[String]
    val q = StatefulOps.runningCount(in.toDS())
      .writeStream.format("memory").queryName("t_total").outputMode("update").start()
    in.addData("edit", "edit", "edit"); run(q)
    in.addData("edit", "edit"); run(q); q.stop()
    val totals = spark.table("t_total").as[(String, Long)].collect().map(_._2)
    // first batch emits 3, second emits the carried-forward 5
    assert(totals.contains(3L) && totals.contains(5L))
  }

  test("J3 remote-table join: cached rate-limited lookup enriches symbols (RemoteTableJoinExample.java:131-187)") {
    val in = MemoryStream[String]
    in.addData("AAPL", "MSFT", "AAPL", "")
    val q = RemoteLookup.joinQuotes(in.toDS())
      .writeStream.format("memory").queryName("t_remote").outputMode("append").start()
    run(q); q.stop()
    val out = spark.table("t_remote").as[StockQuote].collect()
    assert(out.length == 3) // empty symbol dropped
    assert(out.filter(_.symbol == "AAPL").map(_.close).distinct.length == 1)
  }

  test("J3 async remote join overlaps lookups while the rate limit holds " +
      "(RemoteTableJoinExample.java:162-187 getAsync semantics)") {
    AsyncProbe.reset()
    // 8 distinct keys, one partition, 150 ms latency each, window of 4:
    // the sync path would cost 8×150 ms; the windowed path ~2×150 ms.
    val keys = spark.createDataset((1 to 8).map(i => s"SYM$i")).repartition(1)
    val t0 = System.nanoTime()
    val out = RemoteLookup.joinQuotesAsync(keys, new LatencyAsyncStub(150),
      maxReqPerSec = 100, maxInFlight = 4, scope = "probe-overlap").collect()
    val elapsedMs = (System.nanoTime() - t0) / 1e6
    assert(out.length == 8)
    assert(out.map(_.symbol).toSeq == (1 to 8).map(i => s"SYM$i")) // order kept
    // the overlap claim: >1 request genuinely in flight at once
    assert(AsyncProbe.maxObserved.get() > 1,
      s"max in-flight was ${AsyncProbe.maxObserved.get()}")
    // and meaningfully faster than serial (8×150 = 1200 ms serial floor)
    assert(elapsedMs < 1000, s"took $elapsedMs ms — no overlap happened")

    // rate limit still binds request STARTS: 6 misses at 3/s means any
    // 4th start is >= ~1 s after the one 3 positions earlier
    AsyncProbe.reset()
    val keys2 = spark.createDataset((1 to 6).map(i => s"RL$i")).repartition(1)
    RemoteLookup.joinQuotesAsync(keys2, new LatencyAsyncStub(1),
      maxReqPerSec = 3, maxInFlight = 6, scope = "probe-rate").collect()
    val starts = AsyncProbe.startNanos.toArray(Array.empty[java.lang.Long])
      .map(_.longValue).sorted
    assert(starts.length == 6)
    starts.sliding(4).foreach { w =>
      assert(w.last - w.head >= 900L * 1000 * 1000,
        s"4 starts within ${(w.last - w.head) / 1e6} ms breaks 3/s") }
  }
}

/** JVM-wide gauges for the async-overlap spec: closures re-serialize the
  * client per task, so observations must land in static state. The stub
  * runs on its OWN fixed pool, not ForkJoinPool.commonPool — common-pool
  * parallelism is cores-1, so on a small CI box the sleeps would
  * serialize and the overlap assertions would fail with no product bug. */
object AsyncProbe {
  val inFlight = new java.util.concurrent.atomic.AtomicInteger
  val maxObserved = new java.util.concurrent.atomic.AtomicInteger
  val startNanos = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
  // daemon threads: a static never-shut-down pool must not pin the JVM
  // alive after the suite in an in-process (non-forked) runner
  val pool: java.util.concurrent.ExecutorService =
    java.util.concurrent.Executors.newFixedThreadPool(8, (r: Runnable) => {
      val t = new Thread(r, "async-probe")
      t.setDaemon(true)
      t
    })
  def reset(): Unit = { inFlight.set(0); maxObserved.set(0); startNanos.clear() }
}

/** Async stub with injected latency; records start stamps + concurrency. */
final class LatencyAsyncStub(latencyMs: Long) extends RemoteLookup.AsyncLookupClient {
  def fetchAsync(key: String): java.util.concurrent.CompletableFuture[Option[Double]] =
    java.util.concurrent.CompletableFuture.supplyAsync(() => {
      AsyncProbe.startNanos.add(System.nanoTime())
      val cur = AsyncProbe.inFlight.incrementAndGet()
      AsyncProbe.maxObserved.updateAndGet(m => math.max(m, cur))
      Thread.sleep(latencyMs)
      AsyncProbe.inFlight.decrementAndGet()
      Some(1.0)
    }, AsyncProbe.pool)
}
