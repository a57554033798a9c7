package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}

/** J3: stream–remote-table join — per-key lookups against an external
  * service with a read-through TTL cache and a process-wide rate limiter
  * (RemoteTableJoinExample.java:131-187: 10 req/s job-wide, 5 s cache TTL).
  *
  * Deliberately OUTSIDE Catalyst: a side-effecting RPC has no relational
  * semantics to optimize, so it runs as `mapPartitions` with a
  * lazily-initialized per-executor client — one client per JVM, init once,
  * shared across partitions (the reference's TableReadFunction lifecycle).
  * Zero-egress here, so the default client is a deterministic stub; a real
  * HTTP client swaps in via the same trait.
  */
object RemoteLookup {

  trait LookupClient extends Serializable {
    def fetch(key: String): Option[Double]
  }

  /** The reference's actual read-function shape: `getAsync` returning a
    * CompletableFuture (RemoteTableJoinExample.java:162-187), so a
    * high-latency backend overlaps requests instead of stalling the
    * partition one RPC at a time. */
  trait AsyncLookupClient extends Serializable {
    def fetchAsync(key: String): java.util.concurrent.CompletableFuture[Option[Double]]
  }

  /** Deterministic fake quote service (no network in this environment). */
  final class StubQuoteClient extends LookupClient {
    def fetch(key: String): Option[Double] =
      if (key.isEmpty) None
      else Some((math.abs(key.hashCode % 10000)) / 100.0)
  }

  /** Async face of any sync client: runs `fetch` on the JVM-wide common
    * pool. A real HTTP/NIO client implements [[AsyncLookupClient]] directly
    * (no thread per request); this adapter is for clients that only expose
    * a blocking call. */
  final class AsyncAdapter(client: LookupClient) extends AsyncLookupClient {
    def fetchAsync(key: String): java.util.concurrent.CompletableFuture[Option[Double]] =
      java.util.concurrent.CompletableFuture.supplyAsync(() => client.fetch(key))
  }

  /** Read-through cache with TTL + token-bucket rate limiter. The closure
    * deserializes one `RateLimitedCache` instance PER TASK, so the mutable
    * state cannot live on the instance (that would rate-limit per task, and
    * N concurrent tasks would hit the service at N×maxPerSec). Instead the
    * cache map and limiter stamps live in a JVM-wide registry keyed by
    * (ttlMs, maxPerSec, client class): every task in an executor resolves
    * the SAME shared state, giving the reference's per-process limit
    * (RemoteTableJoinExample.java:133 — 10 req/s job-wide when the job is
    * one process; at 1000 executors the budget is per-executor, which is
    * the standard distributed reading of a "job-wide" limiter).
    *
    * `scope` disambiguates DISTINCT backends served by the same client
    * class (two endpoints of one HTTP client type must not share a cache —
    * they would return each other's values — nor a rate budget). Defaults
    * to the client class name, which is correct when one class == one
    * backend; pass the endpoint/config identity otherwise. */
  final class RateLimitedCache(client: LookupClient, ttlMs: Long, maxPerSec: Int,
                               scope: String = null)
      extends Serializable {
    private val scopeKey = if (scope != null) scope else client.getClass.getName
    private def shared = RateLimitedCache.stateFor(ttlMs, maxPerSec, scopeKey)

    private def acquire(): Unit = {
      val stamps = shared.stamps
      var ok = false
      while (!ok) {
        val now = System.nanoTime()
        // One winner cleans + claims under the queue's own thread safety;
        // the size check races benignly (at worst a transient ±1 token).
        while (Option(stamps.peek()).exists(now - _ > 1e9.toLong)) stamps.poll()
        if (stamps.size < maxPerSec) { stamps.add(now); ok = true }
        else Thread.sleep(5)
      }
    }

    def get(key: String): Option[Double] = {
      val cache = shared.cache
      val hit = cache.get(key)
      if (hit != null && System.currentTimeMillis() - hit._1 < ttlMs) hit._2
      else {
        acquire()
        val v = client.fetch(key)
        // stamp at COMPLETION: acquire() can sleep under token pressure
        // and the fetch itself takes the backend's latency — a pre-fetch
        // stamp would write entries already near (or past) expiry,
        // turning the cache into a permanent miss storm when latency
        // approaches the TTL
        cache.put(key, (System.currentTimeMillis(), v))
        v
      }
    }

    /** Async read-through: cache hits complete immediately; misses acquire
      * a rate token SYNCHRONOUSLY (the limiter bounds request STARTS, so
      * overlap never lets more than maxPerSec launch per second) and write
      * the cache on completion. */
    def getAsync(key: String, async: AsyncLookupClient):
        java.util.concurrent.CompletableFuture[Option[Double]] = {
      val cache = shared.cache
      val hit = cache.get(key)
      if (hit != null && System.currentTimeMillis() - hit._1 < ttlMs)
        java.util.concurrent.CompletableFuture.completedFuture(hit._2)
      else {
        acquire()
        // completion-time stamp — see get(): a launch-time stamp ages the
        // entry by the whole in-flight latency
        async.fetchAsync(key).thenApply { v =>
          cache.put(key, (System.currentTimeMillis(), v)); v
        }
      }
    }
  }

  object RateLimitedCache {
    final class State {
      val cache = new java.util.concurrent.ConcurrentHashMap[String, (Long, Option[Double])]()
      val stamps = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    }
    private val registry =
      new java.util.concurrent.ConcurrentHashMap[(Long, Int, String), State]()
    private[streaming] def stateFor(ttlMs: Long, maxPerSec: Int, clientClass: String): State =
      registry.computeIfAbsent((ttlMs, maxPerSec, clientClass), _ => new State)
  }

  /** Enrich a stream of symbols with their latest quote. Symbols that fail
    * the lookup are dropped (reference treats errors as non-retriable for
    * missing symbols, RemoteTableJoinExample.java:162-187). */
  def joinQuotes(symbols: Dataset[String], client: LookupClient = new StubQuoteClient,
                 cacheTtlMs: Long = 5000, maxReqPerSec: Int = 10,
                 scope: String = null)(
      implicit spark: SparkSession): Dataset[StockQuote] = {
    import spark.implicits._
    val shared = new RateLimitedCache(client, cacheTtlMs, maxReqPerSec, scope)
    symbols.mapPartitions { it =>
      it.flatMap(sym => shared.get(sym).map(close => StockQuote(sym, close)))
    }
  }

  /** The OVERLAPPED form of [[joinQuotes]] — the reference's `getAsync`
    * semantics (RemoteTableJoinExample.java:162-187): up to `maxInFlight`
    * lookups are outstanding per task at once, so a backend with latency L
    * costs ~L·ceil(misses/maxInFlight) per partition instead of L·misses,
    * while the rate limiter still bounds request STARTS per second per JVM
    * (tokens are acquired synchronously before each launch). Cache
    * semantics are identical to the sync path — hits complete immediately
    * and never consume a token or an in-flight slot.
    *
    * The window is issued in order and drained in order (results keep the
    * input order within a partition); a failed future surfaces — remote
    * errors are the caller's retry policy, exactly as in the sync path. */
  def joinQuotesAsync(symbols: Dataset[String],
                      client: AsyncLookupClient = new AsyncAdapter(new StubQuoteClient),
                      cacheTtlMs: Long = 5000, maxReqPerSec: Int = 10,
                      maxInFlight: Int = 8, scope: String = null)(
      implicit spark: SparkSession): Dataset[StockQuote] = {
    require(maxInFlight >= 1, s"maxInFlight must be >= 1: $maxInFlight")
    import spark.implicits._
    val scopeKey = if (scope != null) scope else client.getClass.getName
    val shared = new RateLimitedCache(null, cacheTtlMs, maxReqPerSec, scopeKey)
    symbols.mapPartitions { it =>
      it.grouped(maxInFlight).flatMap { window =>
        // launch the whole window before joining any of it — this is where
        // the overlap comes from (spec-pinned: >1 concurrently in flight)
        val launched = window.map(sym => (sym, shared.getAsync(sym, client)))
        launched.flatMap { case (sym, fut) =>
          fut.join().map(close => StockQuote(sym, close))
        }
      }
    }
  }
}
