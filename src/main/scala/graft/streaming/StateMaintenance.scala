package graft.streaming

import graft.operators.Warehouse
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming maintenance of a mergeable aggregate state — the incremental-
  * materialized-view contract of [[graft.operators.Warehouse.aggState]]
  * lifted onto Structured Streaming (the batch/stream pair the reference
  * keeps as a changelog-backed store, hello-samza
  * `WikipediaApplication.java:155-181`).
  *
  * Design: each micro-batch writes its OWN algebraic state delta under
  * `deltaDir/epoch=<id>` (mode=overwrite, so a retried batch REPLACES its
  * first attempt instead of double-counting — the CurationStream flags
  * convention); the queryable state is the merge of all epoch deltas,
  * which is exact because the state is associative+commutative. Nothing
  * ever rewrites history: the write path is append-only at epoch grain,
  * and compaction (folding old epochs into one) is itself just
  * [[graft.operators.Warehouse.mergeAggStates]] — run it whenever the
  * epoch count grows past a few thousand.
  *
  * Scale shape: per batch, one map-side-combinable aggregate over ONLY the
  * new data (key-cardinality output); the read-side merge is
  * epochs × keys work, independent of how many events history holds. */
object StateMaintenance {

  /** Generic epoch-delta maintainer: per micro-batch, reduce the batch
    * with `buildState` (ANY algebraic state builder — agg state, zone
    * map, …) and overwrite that epoch's delta partition. The overwrite
    * per epoch is the retry-safety contract; associativity of the state
    * is the caller's (merge-on-read) contract. */
  def maintainDelta(stream: DataFrame, deltaDir: String,
                    checkpointDir: String)
                   (buildState: DataFrame => DataFrame): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        buildState(batch)
          .write.mode("overwrite").parquet(s"$deltaDir/epoch=$epoch")
        ()
      }
      .start()

  /** Start the agg-state maintenance stream: per micro-batch, aggregate
    * the batch to its algebraic state and overwrite that epoch's delta. */
  def maintainAggState(stream: DataFrame, keyCols: Seq[String],
                       valueCol: String, deltaDir: String,
                       checkpointDir: String): StreamingQuery =
    maintainDelta(stream, deltaDir, checkpointDir)(
      Warehouse.aggState(_, keyCols, valueCol))

  /** Zone-map maintenance: every load keeps the skipping index current
    * without rescanning history — read-side, [[currentZoneMap]] folds the
    * epoch deltas with [[graft.operators.Warehouse.mergeZoneMaps]]. */
  def maintainZoneMap(stream: DataFrame, bucket: org.apache.spark.sql.Column,
                      statCols: Seq[String], deltaDir: String,
                      checkpointDir: String): StreamingQuery =
    maintainDelta(stream, deltaDir, checkpointDir)(
      Warehouse.zoneMap(_, bucket, statCols))

  /** The current zone map: merge every epoch delta (absent dir → empty). */
  def currentZoneMap(spark: SparkSession, deltaDir: String,
                     like: DataFrame, bucket: org.apache.spark.sql.Column,
                     statCols: Seq[String]): DataFrame = {
    val empty = Warehouse.zoneMap(like.limit(0), bucket, statCols)
    val stored = CurationStream.readIndexOrEmpty(spark, deltaDir, empty)
    Warehouse.mergeZoneMaps(
      Seq(stored.drop("epoch")
        .select(empty.columns.toIndexedSeq.map(col): _*)), statCols)
  }

  /** The current state: merge every epoch delta. Absent/uncommitted dir →
    * empty state shaped like `like`'s aggregation. */
  def currentState(spark: SparkSession, deltaDir: String,
                   keyCols: Seq[String], like: DataFrame,
                   valueCol: String): DataFrame = {
    val empty = Warehouse.aggState(like.limit(0), keyCols, valueCol)
    val stored = CurationStream.readIndexOrEmpty(spark, deltaDir, empty)
    Warehouse.mergeAggStates(
      Seq(stored.drop("epoch")
        .select(empty.columns.toIndexedSeq.map(col): _*)), keyCols)
  }
}
