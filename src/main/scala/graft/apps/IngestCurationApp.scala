package graft.apps

import graft.operators.Outputs
import graft.streaming.CurationStream
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The end-to-end training-data INGEST pipeline — the story the extension
  * suite tells, as one runnable app: a JSON document feed streams in,
  * malformed payloads route to a dead-letter directory, clean documents
  * pass the curation gate (quality ≥ threshold, language match,
  * deterministic sampling, within-watermark exact dedup), and each
  * micro-batch of survivors lands in deterministic training shards.
  *
  * Every stage is an operator this library tests independently
  * (`decodeKafkaValueWithDlq`-style corrupt routing, `curationGate`,
  * `writeTrainingShards`); the app is their composition, with the same
  * epoch-overwrite retry idempotency the streaming dedup sink uses. At
  * scale the feed is Kafka (`Sources.kafkaJson`) and the shard directory
  * is object storage — neither changes a line of the pipeline.
  *
  * Usage: runMain graft.apps.IngestCurationApp <jsonFeedFile> <outDir>
  *   [minQuality] [lang] [keepPct] [numShards]
  * Feed lines: {"doc_id": 1, "text": "...", "ts": "2026-01-01T00:00:00"}
  * Output: <outDir>/shards/epoch=N/shard_id=K/ parquet files (curated docs),
  *         <outDir>/dlq/epoch=N/ parquet files (malformed raw lines).
  */
object IngestCurationApp {

  def main(args: Array[String]): Unit = {
    val input = args.headOption.getOrElse(
      sys.error("usage: IngestCurationApp <jsonFeedFile> <outDir> [minQuality] [lang] [keepPct] [numShards]"))
    val outDir = if (args.length > 1) args(1) else "target/ingest-out"
    val minQuality = if (args.length > 2) args(2).toDouble else 0.3
    val lang = if (args.length > 3) args(3) else "en"
    val keepPct = if (args.length > 4) args(4).toInt else 100
    val numShards = if (args.length > 5) args(5).toInt else 4

    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("ingest-curation")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val q = run(spark, graft.sources.Sources.replayFeed(spark, input, linesPerBatch = 200),
      outDir, minQuality, lang, keepPct, numShards)
    q.processAllAvailable()
    q.stop()
    spark.stop()
  }

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("ts", TimestampType)))

  /** The wired pipeline over any raw line stream (column `value`) —
    * factored out so the spec drives it with a MemoryStream. */
  def run(spark: SparkSession, raw: DataFrame, outDir: String,
          minQuality: Double, lang: String, keepPct: Int,
          numShards: Int): org.apache.spark.sql.streaming.StreamingQuery = {
    // decode with corrupt routing (the DLQ contract: malformed lines keep
    // their raw bytes; a JSON null-field line is data, not corruption)
    val withCr = docSchema.add("_corrupt_record", StringType)
    val decoded = raw
      .select(from_json(col("value"), withCr,
          java.util.Map.of("columnNameOfCorruptRecord", "_corrupt_record")).as("m"),
        col("value").as("raw_value"))
      .select(col("m.*"), col("raw_value"))
      .withColumn("is_corrupt",
        col("_corrupt_record").isNotNull || col("doc_id").isNull || col("ts").isNull)
      .drop("_corrupt_record")

    decoded.writeStream
      .option("checkpointLocation", s"$outDir/ck")
      .foreachBatch { (batch: DataFrame, epoch: Long) =>
        val b = batch.persist()
        b.filter(col("is_corrupt"))
          .select(col("raw_value"))
          .write.mode("overwrite").parquet(s"$outDir/dlq/epoch=$epoch")
        // the curation gate runs BATCH-side inside foreachBatch: quality,
        // language, sampling hash, and exact dedup within the batch (the
        // cross-batch watermark dedup lives in the streaming form,
        // CurationStream.curationGate — here each epoch is the unit)
        val clean = b.filter(!col("is_corrupt"))
          .select(col("doc_id"), col("text"), col("ts"))
        val scored = graft.operators.TextAnalysis
          .qualityScore(clean, "text", "doc_id", keepCols = Seq("text", "ts"))
          .withColumn("lang_pred",
            graft.functions.TextFunctions.langId(lower(col("text"))))
        val kept = scored
          .filter(col("quality") >= minQuality && col("lang_pred") === lang &&
            graft.operators.Curation.keepsAtPct(col("doc_id"), lit(keepPct)))
          .dropDuplicates("doc_id")
          .select("doc_id", "text", "ts", "quality", "lang_pred")
        Outputs.writeTrainingShards(kept, "doc_id", numShards,
          s"$outDir/shards/epoch=$epoch")
        b.unpersist(); ()
      }
      .start()
  }
}
