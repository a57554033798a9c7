package graft.streaming

import org.apache.spark.sql.{Dataset, ForeachWriter}
import org.apache.spark.sql.streaming.DataStreamWriter

/** K4 write-side resilience — the reference's Couchbase writer wraps every
  * upsert in a fixed-backoff retry policy (3 attempts, 1 s backoff,
  * CouchbaseTableExample.java:167-176) alongside its 4 req/s rate limit.
  * Same semantics here: `withRetries` for any side-effecting call, and a
  * per-row `ForeachWriter` sink (the upsert lifecycle: open per partition
  * epoch, process per row, close) whose writes retry with fixed backoff.
  * Rate limiting composes via the same JVM-wide token bucket the remote
  * lookup uses (RemoteLookup.RateLimitedCache's registry pattern). */
object RetryingWriter {

  /** Run `f`, retrying up to `attempts` times total with a fixed backoff.
    * Throws the LAST failure (with suppressed history semantics left to
    * the cause chain) once attempts are exhausted — a failed write must
    * fail the task, not vanish. */
  def withRetries[T](attempts: Int, backoffMs: Long)(f: => T): T = {
    require(attempts >= 1, "attempts must be >= 1")
    var i = 0
    while (true) {
      // NonFatal only: an InterruptedException is Spark cancelling this
      // task (retrying the side effect on a dead task duplicates external
      // writes and stalls teardown by attempts × backoff), and fatal JVM
      // errors (OOM) must fail fast, not loop.
      try return f
      catch {
        case scala.util.control.NonFatal(e) =>
          i += 1
          if (i >= attempts) throw e
          Thread.sleep(backoffMs)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** Per-row retrying sink: `write` runs for every row with the retry
    * policy applied. Exactly-once is the CALLER's contract (idempotent
    * upserts keyed by the row, the reference's model). */
  def foreachRowSink[T](ds: Dataset[T], attempts: Int = 3, backoffMs: Long = 1000)(
      write: T => Unit): DataStreamWriter[T] =
    ds.writeStream.foreach(new ForeachWriter[T] {
      override def open(partitionId: Long, epochId: Long): Boolean = true
      override def process(value: T): Unit = withRetries(attempts, backoffMs)(write(value))
      override def close(errorOrNull: Throwable): Unit = ()
    })
}
