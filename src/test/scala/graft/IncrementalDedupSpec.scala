package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** The incremental-dedup hook: `minhashBands` exposes per-document band
  * keys so NEW documents join the existing corpus's (persisted) band index
  * instead of re-scanning the corpus — the 100 TB ingestion path where
  * yesterday's index is a table and today's delta is small. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  test("a new near-dup document finds its match through the stored band index") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    // "stored index": band keys for the existing corpus (in production a
    // bucketed table, written once per ingest)
    val index = Dedup.minhashBands(corpus, "text", "doc_id")

    // craft a delta: a near-duplicate of an existing doc (same text with a
    // small edit) plus one unrelated doc
    val victim = corpus.orderBy("doc_id").select("doc_id", "text")
      .as[(Long, String)].head()
    val delta = Seq(
      (100001L, victim._2 + " trailing edit"),
      (100002L, "completely unrelated fresh content nothing shared here at all xyzzy"))
      .toDF("doc_id", "text")
    val deltaBands = Dedup.minhashBands(delta, "text", "doc_id")

    // candidate lookup = band-key equi-join of delta against the index —
    // touches only matching buckets, never the corpus text
    val candidates = deltaBands.select(col("band"), col("band_key"), col("doc").as("new_doc"))
      .join(index.select(col("band"), col("band_key"), col("doc").as("old_doc")),
        Seq("band", "band_key"))
      .select("new_doc", "old_doc").distinct()
      .as[(Long, Long)].collect().toSet

    assert(candidates.contains((100001L, victim._1)),
      s"near-dup delta doc must collide with its victim, got $candidates")
    assert(!candidates.exists(_._1 == 100002L),
      s"unrelated delta doc must not collide, got $candidates")
  }

  test("stored dedup index reproduces the inline pairs exactly, threshold re-tunable") {
    val corpus = Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = java.nio.file.Files.createTempDirectory("dedup-idx").toString + "/idx"
    Dedup.buildDedupIndex(corpus, "text", "doc_id", dir)
    val inline = Dedup.minhashNearDups(corpus, "text", "doc_id",
      numHashes = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.5)
    val indexed = Dedup.nearDupsFromIndex(spark, dir, threshold = 0.5)
    assert(inline.exceptAll(indexed).isEmpty && indexed.exceptAll(inline).isEmpty,
      "stored-index pairs must equal the inline kernel's pairs")
    // threshold tuning against the index never reruns the text kernel and
    // only loosens/tightens the verify: a lower bar is a superset
    val loose = Dedup.nearDupsFromIndex(spark, dir, threshold = 0.3)
      .select("id_a", "id_b")
    assert(indexed.select("id_a", "id_b").exceptAll(loose).isEmpty)
    assert(loose.count() >= indexed.count())
  }
}
