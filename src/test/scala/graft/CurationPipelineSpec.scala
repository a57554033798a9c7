package graft

import graft.operators.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** End-to-end curation workflow — the operators composed the way a
  * training-data pipeline actually chains them: exact-dedup keep list →
  * near-dup cluster survivors → quality/language/repetition filters → a
  * final curated corpus. Pins that the pieces COMPOSE (one lazy plan per
  * stage, joins on ids, no operator demands its own driver program) and
  * that the output is deterministic. */
class CurationPipelineSpec extends SparkSpec {

  test("dedup -> cluster-survivor -> quality filter chain composes into a curated corpus") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    val total = docs.count()

    // stage 1: exact dedup — keep the canonical (min-id) copy of each text
    val keep = Dedup.exact(docs, "text", "doc_id").select(col("keep_id").as("doc_id"))
    // stage 2: near-dup clustering — among near-dups keep the cluster min
    val pairs = Dedup.minhashNearDups(docs, "text", "doc_id", threshold = 0.5)
    val clusters = Dedup.nearDupClusters(pairs)
    val nearDupLosers = clusters.filter(col("id") =!= col("cluster_id"))
      .select(col("id").as("doc_id"))
    // stage 3: signal filters
    val quality = TextAnalysis.qualityScore(docs, "text", "doc_id")
    val lang = TextAnalysis.languageId(docs, "text", "doc_id")
    val rep = TextAnalysis.repetitionScore(docs, "text", "doc_id")

    val curated = docs
      .join(keep, "doc_id")                                   // exact survivors
      .join(nearDupLosers, Seq("doc_id"), "left_anti")        // drop near-dup losers
      .join(quality.filter(col("quality") >= 0.3).select("doc_id"), "doc_id")
      .join(lang.filter(col("lang_pred") === "en").select("doc_id"), "doc_id")
      .join(rep.filter(col("rep_ratio") <= 0.2).select("doc_id"), "doc_id")

    val n1 = curated.count()
    val n2 = curated.count()
    assert(n1 == n2, "pipeline must be deterministic")
    assert(n1 > 0, "curation must keep something")
    assert(n1 < total, "curation must drop something (dups/quality/lang)")
    // survivors are self-consistent: no two curated docs are exact dups
    val fp = curated.select(graft.functions.TextFunctions.fingerprint(col("text")).as("fp"))
    assert(fp.count() == fp.distinct().count(), "curated corpus still contains exact dups")
  }
}
