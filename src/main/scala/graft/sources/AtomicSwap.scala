package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** THE write-tmp-then-swap discipline for swap-maintained parquet tables —
  * one shared implementation (previously copied in appendBm25Stats and the
  * sketch maintenance loop; UpsertParquet keeps its own bucket-pruned
  * variant): write the full new contents to `<dir>.tmp-append`, then
  * delete-and-rename into place, so a reader never observes a half-written
  * table and a lazy self-read never races its own overwrite.
  *
  * Crash atomicity: delete(dst)+rename is TWO filesystem ops. A crash
  * between them leaves dst missing while tmp holds the COMPLETE new table
  * (the write finished — parquet's _SUCCESS marker proves it). [[recover]]
  * closes that window by installing a complete orphaned tmp; both
  * [[swapIn]] and any read path of a swap-maintained table must call it
  * first, otherwise the next swap's delete(tmp) would destroy the only
  * copy of the data. A PARTIAL tmp (no _SUCCESS — crash mid-write) is
  * never installed; dst is intact in that case and the partial tmp is
  * discarded by the next swap. */
object AtomicSwap {

  private def tmpPath(dir: String) = new Path(dir + ".tmp-append")

  /** Install a complete orphaned tmp if the destination is missing —
    * the crash-between-delete-and-rename recovery. Idempotent; cheap
    * (two existence probes) when there is nothing to do. */
  def recover(spark: SparkSession, dir: String): Unit = {
    val dst = new Path(dir)
    val fs = dst.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = tmpPath(dir)
    if (!fs.exists(dst) && fs.exists(new Path(tmp, "_SUCCESS"))) {
      if (!fs.rename(tmp, dst))
        throw new IllegalStateException(s"swap recovery failed for $dst")
    }
  }

  /** Swap `df` in as the new contents of `dir`. Runs [[recover]] first so
    * an orphaned complete tmp from a crashed prior swap is never deleted
    * unread. */
  def swapIn(df: DataFrame, dir: String): Unit = {
    val spark = df.sparkSession
    recover(spark, dir)
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = tmpPath(dir)
    fs.delete(tmp, true)
    df.write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(dir)
    fs.delete(dst, true)
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(s"swap failed for $dst")
  }
}
