package graft.streaming

import graft.functions.TextFunctions._
import graft.operators.{Curation, TextAnalysis}
import org.apache.spark.sql.DataFrame
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

  /** Ingest gate: keep documents that (1) clear the quality threshold,
    * (2) match the wanted language, (3) survive the deterministic
    * `keepPct`% sampling hash, and (4) are the first copy of their content
    * fingerprint within the watermark. Returns the kept rows with their
    * quality/lang columns attached (downstream sinks decide what to drop).
    */
  def curationGate(docs: DataFrame, textCol: String, idCol: String,
                   tsCol: String, minQuality: Double, wantLang: String,
                   keepPct: Int, dedupWatermark: String = "10 minutes"): DataFrame = {
    require(keepPct >= 0 && keepPct <= 100, s"keepPct must be in [0,100]: $keepPct")
    val scored = TextAnalysis.qualityScore(docs, textCol, idCol,
        keepCols = Seq(textCol, tsCol))
      .withColumn("lang_pred", langId(lower(col(textCol))))
      .withColumn("fp", fingerprint(col(textCol)))
    val kept = scored
      .filter(col("quality") >= minQuality &&
        col("lang_pred") === wantLang &&
        Curation.keepsAtPct(col(idCol), lit(keepPct)))
    StatefulOps.dedupStream(kept, tsCol, dedupWatermark, Seq("fp"))
      .select(col(idCol), col(tsCol), col("quality"), col("lang_pred"), col("fp"))
  }
}
