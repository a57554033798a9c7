package graft.streaming

import graft.functions.TextFunctions._
import graft.operators.{Curation, TextAnalysis}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The curation kernels lifted to Structured Streaming — the ingest-time
  * form of the batch pipeline (reference scope: the filter/score stages of
  * the cookbook apps, e.g. FilterExample.java:96-99, applied to a document
  * feed instead of page views).
  *
  * Everything scan-side (quality metrics, language ID, the deterministic
  * sampling hash, the content fingerprint) is a pure codegen'd projection,
  * so it runs on a stream UNCHANGED — same expressions, same results as
  * the batch oracle queries. The only stateful stage is exact dedup, which
  * becomes `dropDuplicatesWithinWatermark` over the fingerprint: state is
  * bounded by the watermark instead of growing with the corpus (a stream
  * can't hold "all fingerprints ever"; the batch backfill catches
  * cross-watermark dups). */
object CurationStream {

  /** The SCAN side of the ingest gate, shared by the streaming form
    * ([[curationGate]]) and the foreachBatch ingest app
    * ([[graft.apps.IngestCurationApp]]): quality threshold, language
    * match, the deterministic `keepPct`% sampling hash, and the content
    * fingerprint the dedup stage keys on. Pure codegen projection +
    * filter — identical semantics on a stream and a batch by
    * construction, and the single home of the argument validation.
    * Returns `idCol, textCol, tsCol, quality, lang_pred, fp`. */
  def gateScan(docs: DataFrame, textCol: String, idCol: String, tsCol: String,
               minQuality: Double, wantLang: String, keepPct: Int): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"keepPct must be in [0,100]: $keepPct")
    TextAnalysis.qualityScore(docs, textCol, idCol, keepCols = Seq(textCol, tsCol))
      .withColumn("lang_pred", langId(lower(col(textCol))))
      .withColumn("fp", fingerprint(col(textCol)))
      .filter(col("quality") >= minQuality &&
        col("lang_pred") === wantLang &&
        Curation.keepsAtPct(col(idCol), lit(keepPct)))
  }

  /** Ingest gate: keep documents that (1) clear the quality threshold,
    * (2) match the wanted language, (3) survive the deterministic
    * `keepPct`% sampling hash, and (4) are the first copy of their content
    * fingerprint within the watermark. Returns the kept rows with their
    * quality/lang columns attached (downstream sinks decide what to drop).
    */
  def curationGate(docs: DataFrame, textCol: String, idCol: String,
                   tsCol: String, minQuality: Double, wantLang: String,
                   keepPct: Int, dedupWatermark: String = "10 minutes"): DataFrame = {
    val kept = gateScan(docs, textCol, idCol, tsCol, minQuality, wantLang, keepPct)
    StatefulOps.dedupStream(kept, tsCol, dedupWatermark, Seq("fp"))
      .select(col(idCol), col(tsCol), col("quality"), col("lang_pred"), col("fp"))
  }

  /** Mixture-budget ingest gate: the STREAMING executor of a stored
    * [[graft.operators.Curation.tokenBudget]] plan — each arriving
    * document passes with its source's `rate_bp` via the SAME bp-grain
    * hash rule the batch [[graft.operators.Curation.allocationSample]]
    * applies, so the stream admits EXACTLY the rows the batch run would
    * have (spec-pinned row equality — replay, backfill, and live ingest
    * agree by construction). The plan attaches as a stream-static
    * broadcast join; unplanned sources drop (no budget). Re-planning =
    * writing a new plan table and restarting the query — the plan is
    * deliberately a table, not stream state, so mixture owners audit it
    * at rest. */
  def mixtureGate(docs: DataFrame, idCol: String, domainCol: String,
                  plan: DataFrame, planSourceCol: String,
                  rateBpCol: String): DataFrame =
    graft.operators.Curation.allocationSample(docs, idCol, domainCol,
      plan, planSourceCol, rateBpCol)

  /** MODEL-BASED ingest gate: admit documents whose fastText-style linear
    * quality score clears `minLogitMicro` — the learned upgrade of
    * [[curationGate]]'s hand-rule threshold. The logit is computed INLINE
    * on the document row ([[graft.operators.TextAnalysis.linearLogitMicro]]
    * as a `withColumn`, weight vector embedded as an array literal), so the
    * gate is a genuinely stateless projection+filter — no join, no
    * watermark, no state store — and batch/replay/live agree row-for-row
    * by construction (`CurationStreamSpec` pins stream == batch). NULL
    * text folds to a NULL logit, which the ≥ filter drops. Re-training =
    * shipping a new weight array and restarting the query — the model is
    * config, not stream state, same auditability convention as
    * [[mixtureGate]]. */
  def classifierGate(docs: DataFrame, textCol: String, idCol: String,
                     weightsMicro: Seq[Long], biasMicro: Long,
                     minLogitMicro: Long): DataFrame =
    docs.withColumn("logit_micro",
        graft.operators.TextAnalysis.linearLogitMicro(col(textCol),
          weightsMicro, biasMicro))
      .filter(col("logit_micro") >= minLogitMicro)

  /** Read a stored index directory, treating ABSENT or uncommitted-empty
    * (a first write attempt that died leaves the path existing with only
    * `_temporary` — no committed parquet) as an empty frame shaped like
    * `like`. ONLY the schema-inference failure maps to empty — any other
    * AnalysisException (corrupted committed files, incompatible schema
    * evolution) rethrows: treating those as empty would silently forget
    * every indexed row and let historical duplicates pass as new, with
    * the stream still green. */
  private[graft] def readIndexOrEmpty(spark: SparkSession, dir: String,
                                      like: DataFrame): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    // resolve the filesystem FROM the path (s3a://, hdfs://, file:// all
    // work regardless of fs.defaultFS); FileSystem.get(conf) would pin the
    // default scheme and throw Wrong-FS for anything else
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    if (fs.exists(p))
      try spark.read.parquet(dir)
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getErrorClass == "UNABLE_TO_INFER_SCHEMA" ||
              String.valueOf(e.getMessage).contains("Unable to infer schema") =>
          like.limit(0)
      }
    else like.limit(0)
  }

  /** One micro-batch of incremental NEAR-dup dedup against a stored band
    * index — the streaming lift of the batch shape `IncrementalDedupSpec`
    * pins ([[graft.operators.Dedup.minhashBands]] as a persisted table):
    * the batch's band keys (1) equi-join the index to find collisions with
    * any PREVIOUSLY ingested document, (2) self-join for within-batch
    * collisions the index can't know yet (earlier id wins), and (3) append
    * to the index so later batches see this one. Returns one row per batch
    * doc: (doc, is_dup, matched_doc — the smallest colliding id, null when
    * clean).
    *
    * Scale shape: the historical corpus is touched ONLY through the band
    * index (4 small rows per doc, bucketable on band_key); no text rescan,
    * no growing executor state — the index lives in storage, so unlike a
    * `dropDuplicates` state store it survives restarts and is shared by
    * the batch pipeline. Band collisions are CANDIDATES (the LSH
    * guarantee); a verify stage joining stored shingles filters false
    * positives exactly as in the batch operator — at the reference's
    * dedup-gate semantics the band flag is the drop signal.
    *
    * Idempotency note: a foreachBatch RETRY can re-append the same batch's
    * bands. The stored side therefore EXCLUDES the batch's own band ROWS
    * (left-anti on the exact (doc, band, band_key) triple) before the
    * lookup — without that, a retried batch would find its first-attempt
    * bands in the index and flag BOTH members of a within-batch pair
    * (dropping the content entirely). The triple-level anti (vs dropping
    * every stored row of the batch's ids) keeps cross-batch detection
    * intact when an id is RE-ingested with new content: the id's old
    * bands stay visible, so another batch member duplicating the old
    * content still flags. Duplicate index rows from a retry only cost
    * lookup fan-out and compact away with [[graft.operators.Outputs]] —
    * on a production cluster write the index through a transactional
    * table format instead. */
  def nearDupStep(batch: DataFrame, textCol: String, idCol: String,
                  indexDir: String): DataFrame = {
    val spark = batch.sparkSession
    val bands = graft.operators.Dedup.minhashBands(batch, textCol, idCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // absent or uncommitted-empty index reads as empty; see
    // readIndexOrEmpty for the failure-mode contract
    val stored = readIndexOrEmpty(spark, indexDir, bands)
    val oldHits = bands
      .join(stored
        .join(bands.select("doc", "band", "band_key"),
          Seq("doc", "band", "band_key"), "left_anti")
        .select(col("band"), col("band_key"), col("doc").as("old_doc")),
        Seq("band", "band_key"))
      .filter(col("doc") =!= col("old_doc"))
      .groupBy("doc").agg(min("old_doc").as("m_old"))
    val withinHits = bands
      .join(bands.select(col("band"), col("band_key"), col("doc").as("other_doc")),
        Seq("band", "band_key"))
      .filter(col("other_doc") < col("doc"))
      .groupBy("doc").agg(min("other_doc").as("m_new"))
    val flags = batch.select(col(idCol).as("doc"))
      .join(oldHits, Seq("doc"), "left")
      .join(withinHits, Seq("doc"), "left")
      .select(col("doc"),
        (col("m_old").isNotNull || col("m_new").isNotNull).as("is_dup"),
        least(col("m_old"), col("m_new")).as("matched_doc"))
    // append AFTER the lookup plans are built — but force the flags first so
    // this batch can't see its own appended bands through the stored read
    // ckpt: one-shot — per-batch flags, next batch reads parquet (fresh stats)
    val out = flags.localCheckpoint(eager = true)
    bands.write.mode("append").parquet(indexDir)
    bands.unpersist()
    out
  }

  /** The ingest wrapper: run [[nearDupStep]] per micro-batch via
    * foreachBatch, writing the per-doc flags under `flagsDir`. Each epoch
    * OVERWRITES its own `epoch=<id>` subdirectory (readable as one
    * partitioned table), so a retried batch replaces its first attempt's
    * flags instead of appending duplicates — the flags side of the same
    * retry-idempotency contract [[nearDupStep]] keeps for the lookups.
    * The band index at `indexDir` is both this stream's state and a
    * queryable artifact the batch pipeline shares. */
  def nearDupIngest(docs: DataFrame, textCol: String, idCol: String,
                    indexDir: String, flagsDir: String,
                    checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        nearDupStep(b, textCol, idCol, indexDir)
          .write.mode("overwrite").parquet(s"$flagsDir/epoch=$epoch")
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming entity resolution against a STORED
    * [[graft.operators.Dedup.buildLinkIndex]] reference: every
    * micro-batch links via [[graft.operators.Dedup.linkAgainstIndex]]
    * (only the delta's kernel + a candidates-sized verify run per batch;
    * the reference kernel was paid at index-build time) and writes its
    * matches under `matchesDir/epoch=<id>` — the overwrite-per-epoch
    * retry contract [[nearDupIngest]] uses, so a replayed batch replaces
    * its first attempt instead of duplicating matches. The stream never
    * mutates the reference; grow it explicitly with
    * [[graft.operators.Dedup.appendLinkIndex]] between batches (new
    * reference records become visible to the NEXT micro-batch's stored
    * read — eventual visibility, the index-maintenance contract
    * AnnIngest documents). */
  def linkIngest(docs: DataFrame, textCol: String, idCol: String,
                 indexDir: String, matchesDir: String, checkpointDir: String,
                 maxDist: Int): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .foreachBatch { (b: DataFrame, epoch: Long) =>
        graft.operators.Dedup
          .linkAgainstIndex(b.sparkSession, indexDir, b, textCol, idCol, maxDist)
          .write.mode("overwrite").parquet(s"$matchesDir/epoch=$epoch")
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
