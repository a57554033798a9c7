package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus deduplication for training-data pipelines, four flavours:
  * exact, MinHash+LSH, SimHash, and verified n-gram Jaccard.
  *
  * Scale design (100 TB corpus, 1000 executors):
  *  - every variant is shuffle-on-key groupBy/join — no driver collects, no
  *    cross-partition state;
  *  - the all-pairs step only ever happens *within an LSH band bucket*
  *    (candidate generation), never across the corpus;
  *  - hash functions are parameterized: md5 (engine-portable, anchors the
  *    DuckDB oracle) vs xxhash64 (codegen'd, ~5× cheaper — the default at
  *    scale). Both paths share the same plan shape.
  */
object Dedup {

  /** Exact dedup: one row per distinct normalized text, keeping the lowest
    * id as the canonical document. Plain hash-aggregate — partial (map-side)
    * aggregation makes this a single shuffle of (hash → id,count). */
  def exact(docs: DataFrame, textCol: String, idCol: String): DataFrame =
    docs.groupBy(fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Distinct (doc, shingle) rows — the shared intermediate of every
    * shingle-based dedup variant. Uniqueness is established INSIDE the
    * shingle kernel (per-document set), so no corpus-wide distinct shuffle
    * is needed — rows come out of the scan already unique per doc. */
  private def shingleRows(docs: DataFrame, textCol: String, idCol: String,
                          shingleSize: Int): DataFrame =
    docs
      .select(col(idCol).as("doc"),
        explode(graft.expressions.Exprs.wordShinglesDistinct(col(textCol), shingleSize)).as("shingle"))

  /** MinHash signature: `numHashes` genuinely independent hash functions,
    * one min() agg column each — a single shuffle of the shingle rows, no
    * row explosion, all map-side combinable.
    *
    * Each seed gets its OWN full hash (md5 of "j:shingle" for the oracle
    * path, xxhash64 seeded with j for the scale path). A double-hashing
    * derivation (h1 + j·h2) was tried and reverted: with j·h2 orders of
    * magnitude below h1's range, the argmin of every seed collapses to the
    * same shingle and the family degenerates — near-dup pairs at J≈0.8 got
    * missed SYSTEMATICALLY (same pairs at any band count). The
    * DedupScaleModeSpec recall test pins this.
    */
  private def signatures(sh: DataFrame, numHashes: Int, useMd5: Boolean): DataFrame = {
    def h(j: Int): Column =
      if (useMd5) min(md5(concat(lit(s"$j:"), col("shingle"))))
      else min(xxhash64(lit(j), col("shingle")))
    val aggs = (0 until numHashes).map(j => h(j).as(s"mh$j"))
    sh.groupBy(col("doc")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: band b's key = md5 of minhashes [b*r, b*r+r) joined with
    * '|'. Docs sharing any band key become candidate pairs — the classic
    * S-curve: near-duplicates collide in ≥1 band w.h.p., unrelated docs
    * almost never do. Output: (doc, band, band_key), unpivoted for the
    * bucket self-join. */
  private def bandsFromSignatures(sig: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    val numBands = numHashes / rowsPerBand
    val bandStructs = (0 until numBands).map { b =>
      val key = md5(concat_ws("|", (0 until rowsPerBand).map(r => col(s"mh${b * rowsPerBand + r}")): _*))
      struct(lit(b).as("band"), key.as("band_key"))
    }
    sig.select(col("doc"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  /** Per-document LSH band keys (public hook for incremental dedup: new
    * documents join existing band buckets without rescanning the corpus). */
  def minhashBands(docs: DataFrame, textCol: String, idCol: String,
                   numHashes: Int = 16, rowsPerBand: Int = 4,
                   shingleSize: Int = 3, useMd5: Boolean = true): DataFrame =
    bandsFromSignatures(
      signatures(shingleRows(docs, textCol, idCol, shingleSize), numHashes, useMd5),
      numHashes, rowsPerBand)

  /** Candidate near-duplicate pairs from MinHash LSH, verified with the true
    * n-gram Jaccard and filtered at `threshold`. Output: (id_a, id_b,
    * jaccard) with id_a < id_b. The verify join only touches candidate
    * pairs, so the expensive exact Jaccard runs on a tiny fraction of the
    * corpus. */
  def minhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      numHashes: Int = 16, rowsPerBand: Int = 4,
                      shingleSize: Int = 3, threshold: Double = 0.5,
                      useMd5: Boolean = true): DataFrame = {
    // The (doc, shingle) relation feeds BOTH candidate generation and the
    // Jaccard verify — materialize it once instead of re-deriving from text.
    // (At cluster scale this would be a checkpointed intermediate table.)
    val sh = shingleRows(docs, textCol, idCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = bandsFromSignatures(signatures(sh, numHashes, useMd5), numHashes, rowsPerBand)
    val a = bands.select(col("band"), col("band_key"), col("doc").as("id_a"))
    val b = bands.select(col("band"), col("band_key"), col("doc").as("id_b"))
    val candidates = a.join(b, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    verifyJaccardOnShingles(sh, candidates, threshold)
  }

  /** Exact n-gram Jaccard for a given pair set: |A ∩ B| / |A ∪ B| over
    * distinct shingles. Expressed as explode + two semi-shuffles — never
    * materializes shingle sets in memory. */
  private def verifyJaccardOnShingles(sh: DataFrame, pairs: DataFrame,
                                      threshold: Double): DataFrame = {
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    // Shingle equality is part of the SECOND join's key — joining on id_b
    // alone and filtering afterwards would materialize an |A|×|B| shingle
    // cross product per candidate pair (measured 30M rows for 11k pairs).
    val inter = pairs
      .join(sh.select(col("doc").as("id_a"), col("shingle")), Seq("id_a"))
      .join(sh.select(col("doc").as("id_b"), col("shingle")), Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .withColumn("jaccard", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(round(col("jaccard"), 4) >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash near-duplicate pairs: band each 64-bit fingerprint into four
    * 16-bit chunks; fingerprints within Hamming distance d <= 3 of each
    * other MUST share at least one chunk (pigeonhole), so chunk buckets are
    * a lossless candidate filter at that radius (and a high-recall one a
    * bit beyond); candidates verify with the codegen'd Hamming kernel.
    * Output: (id_a, id_b, hamming) with id_a < id_b. */
  def simhashNearDups(docs: DataFrame, textCol: String, idCol: String,
                      maxDist: Int = 3): DataFrame = {
    val sh = simhash(docs, textCol, idCol)
    val chunks = sh
      .select(col("doc"), col("simhash"), explode(sequence(lit(0), lit(3))).as("chunk_id"))
      .withColumn("chunk", substr(col("simhash"), lit(1) + lit(16) * col("chunk_id"), lit(16)))
    val a = chunks.select(col("chunk_id"), col("chunk"), col("doc").as("id_a"), col("simhash").as("sa"))
    val b = chunks.select(col("chunk_id"), col("chunk"), col("doc").as("id_b"), col("simhash").as("sb"))
    a.join(b, Seq("chunk_id", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sa", "sb").distinct()
      .select(col("id_a"), col("id_b"),
        graft.expressions.Exprs.hammingDist(col("sa"), col("sb")).as("hamming"))
      .filter(col("hamming") <= maxDist)
  }

  /** Connected-components clustering over near-duplicate pairs — the
    * dedup DECISION step: every document in a component keeps the
    * component's minimum id as its cluster id (the canonical survivor).
    *
    * Iterative min-label propagation: each round, every node takes the min
    * of its own label and its neighbours' labels; converges in O(component
    * diameter) rounds (near-dup clusters are shallow — pairs chain through
    * shared content). Each round is one distributed join+aggregate; the
    * driver only orchestrates the loop and checks the fixpoint, never
    * holds data. Output: (id, cluster_id) for every id appearing in a pair.
    */
  def nearDupClusters(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a"), col("id_b"))
      .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.select(col("id_a").as("id")).distinct()
      .withColumn("cluster_id", col("id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Labels only ever decrease (towards the component minimum), so the
    // fixpoint test is "did the label sum change" — one scalar aggregate
    // per round instead of a self-join diff.
    def labelSum(df: DataFrame): Long =
      df.agg(sum("cluster_id")).collect()(0).getLong(0)
    var prevSum = labelSum(labels)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("id", "id_b"), Seq("id_b"))
        .groupBy(col("id_a").as("id")).agg(min("cluster_id").as("n_min"))
      val updated = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"),
          least(col("cluster_id"), coalesce(col("n_min"), col("cluster_id"))).as("cluster_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val curSum = labelSum(updated)
      labels.unpersist()
      labels = updated
      converged = curSum == prevSum
      prevSum = curSum
      iter += 1
    }
    edges.unpersist()
    labels
  }

  /** Exact n-gram Jaccard pairs above a threshold (no LSH pre-filter) — the
    * exact baseline the LSH path approximates. Sparse formulation: docs pair
    * up only through shared shingles (a self-join on the shingle value), so
    * disjoint documents never meet; any pair with zero intersection has
    * Jaccard 0 and can't pass a positive threshold anyway. Still quadratic
    * in the worst case (all docs share a shingle) — LSH is the scale path. */
  def ngramJaccardPairs(docs: DataFrame, textCol: String, idCol: String,
                        shingleSize: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = shingleRows(docs, textCol, idCol, shingleSize)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy("doc").agg(count(lit(1)).as("n_sh"))
    val inter = sh.alias("a").join(sh.alias("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("doc").as("id_a"), col("n_sh").as("n_a")), Seq("id_a"))
      .join(sizes.select(col("doc").as("id_b"), col("n_sh").as("n_b")), Seq("id_b"))
      .withColumn("jaccard", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(round(col("jaccard"), 4) >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** SimHash: 64-bit locality-sensitive fingerprint. Bit k of the result is
    * the sign of Σ over tokens of (±1 from bit k of md5(token)). Documents
    * are near-duplicates when Hamming distance is small. Emitted as a 64-char
    * bit string (engine-portable; avoids signed-int bit-63 pitfalls).
    *
    * Plan shape: explode(tokens) × explode(64 bit positions) → two hash
    * aggregates. ~128 rows per document in flight, all map-side combinable.
    */
  def simhash(docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    // Two structural choices keep this one codegen'd pass:
    //  - token multiplicity is a weight: aggregate (doc, token) → count and
    //    hash each distinct token ONCE (Σ contrib over duplicate rows ==
    //    Σ contrib·count over distinct rows);
    //  - the 64 bit positions are 64 sum() AGG COLUMNS over the token rows,
    //    not a 64× explode — no row multiplication, map-side combinable,
    //    and the bit arithmetic on 16 pre-extracted hex digits stays in
    //    whole-stage codegen. The final fingerprint is a concat of 64
    //    sign bits — no collect_list/sort.
    // word_shingles(text, 1) == tokens, via the codegen kernel instead of
    // the interpreted filter(split(...)) chain; the empty-text edge case
    // ([""] vs []) is closed by the non-empty filter.
    val toks = docs.select(col(idCol).as("doc"),
        explode(graft.expressions.Exprs.wordShingles(col(textCol), 1)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("doc", "tok").agg(count(lit(1)).as("cnt"))
    val h = md5(col("tok"))
    val digits = (0 until 16).map(i =>
      conv(substring(h, i + 1, 1), 16, 10).cast("int").as(s"d$i"))
    val src = toks.select(col("doc") +: col("cnt") +: digits: _*)
    val sums = (0 until 64).map { k =>
      val d = col(s"d${k / 4}")
      val pow2 = 1 << (3 - k % 4)
      val bit = pmod(floor(d / pow2).cast("int"), lit(2))
      sum(when(bit === 1, col("cnt")).otherwise(-col("cnt"))).as(s"s$k")
    }
    val agged = src.groupBy("doc").agg(sums.head, sums.tail: _*)
    val bits = (0 until 64).map(k => when(col(s"s$k") > 0, "1").otherwise("0"))
    agged.select(col("doc"), concat(bits: _*).as("simhash"))
  }
}
