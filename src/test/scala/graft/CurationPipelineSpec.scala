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

  test("MixturePlanApp: plan executes, shards land, realized tokens track allocations") {
    val out = java.nio.file.Files.createTempDirectory("mixplan").toFile
    graft.apps.MixturePlanApp.run(spark, "/root/testdata/sf0.001",
      out.getAbsolutePath, budget = 15000L,
      weightSpec = "src0=4000,src1=2000,src2=1000", numShards = 2)
    val report = spark.read.parquet(s"${out.getAbsolutePath}/report")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(3), r.getLong(5), r.getLong(6)))).toMap
    // unplanned sources carry weight 0, alloc 0, and shipped nothing
    report.filterNot(kv => Set("src0", "src1", "src2")(kv._1)).foreach {
      case (s, (w, alloc, realized, docs)) =>
        assert(w == 0L && alloc == 0L && realized == 0L && docs == 0L,
          s"unplanned $s must ship nothing: ${report(s)}")
    }
    // planned sources shipped, and realized tokens track the allocation
    // within Bernoulli-by-hash noise (generous band: tiny corpus)
    Seq("src0", "src1", "src2").foreach { s =>
      val (_, alloc, realized, _) = report(s)
      assert(alloc > 0, s"$s got no budget")
      assert(realized > 0, s"$s shipped nothing")
      assert(math.abs(realized - alloc) <= math.max(600L, alloc / 2),
        s"$s realized $realized vs planned $alloc")
    }
    val shards = spark.read.parquet(s"${out.getAbsolutePath}/shards")
    assert(shards.select("shard_id").distinct().count() == 2)
    assert(shards.count() ==
      report.values.map(_._4).sum, "every sampled doc lands in a shard")
  }
}
