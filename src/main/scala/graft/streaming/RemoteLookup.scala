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

  /** Deterministic fake quote service (no network in this environment). */
  final class StubQuoteClient extends LookupClient {
    def fetch(key: String): Option[Double] =
      if (key.isEmpty) None
      else Some((math.abs(key.hashCode % 10000)) / 100.0)
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
      val now = System.currentTimeMillis()
      val hit = cache.get(key)
      if (hit != null && now - hit._1 < ttlMs) hit._2
      else {
        acquire()
        val v = client.fetch(key)
        cache.put(key, (now, v))
        v
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
}
