package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}

/** Output-layout management for pipeline results — at 100 TB the WRITE
  * layout decides every downstream read's cost:
  *
  *  - hive-style partition directories give free partition pruning on the
  *    partition columns;
  *  - `maxRecordsPerFile` bounds file sizes (the small-files problem is a
  *    repartition knob, not a post-hoc compaction job);
  *  - sorting within partitions clusters data for min/max page skipping in
  *    parquet.
  */
object Outputs {

  /** Write `df` as hive-partitioned parquet, `filesPerPartition` output
    * files per partition value, rows clustered by `sortCols` for parquet
    * min/max skipping. */
  def writePartitioned(df: DataFrame, dir: String, partitionCol: String,
                       filesPerPartition: Int, sortCols: Seq[String]): Unit =
    df.repartition(filesPerPartition, F.col(partitionCol))
      .sortWithinPartitions((partitionCol +: sortCols).map(F.col): _*)
      .write
      .partitionBy(partitionCol)
      .mode("overwrite")
      .parquet(dir)

  /** Compact an existing parquet directory to ~`targetFiles` files. */
  def compact(spark: org.apache.spark.sql.SparkSession, dir: String,
              outDir: String, targetFiles: Int): Unit =
    spark.read.parquet(dir).repartition(targetFiles)
      .write.mode("overwrite").parquet(outDir)

  /** Save `df` as a BUCKETED catalog table: rows hash-partitioned into
    * `numBuckets` files on `bucketCols` and sorted within each bucket.
    * Two tables bucketed the same way join WITHOUT any exchange — the
    * bucketing IS the shuffle, paid once at write time instead of on
    * every join (the standard layout for a fact table that joins on the
    * same key across many pipelines; `OutputsSpec` asserts the
    * exchange-free plan). */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .mode("overwrite")
      .format("parquet")
      .saveAsTable(table)
}
