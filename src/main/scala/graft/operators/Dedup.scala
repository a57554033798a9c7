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
    * shingle-based dedup variant. */
  private def shingleRows(docs: DataFrame, textCol: String, idCol: String,
                          shingleSize: Int): DataFrame =
    docs
      .select(col(idCol).as("doc"), tokens(col(textCol)).as("tk"))
      .select(col("doc"), explode(shinglesFromTokens(col("tk"), shingleSize)).as("shingle"))
      .distinct()

  /** Per-seed hash of a shingle: H(seed || ":" || shingle), H = md5 hex
    * (oracle mode) or xxhash64-as-hex (scale mode — codegen'd, ~5× cheaper).
    * The min of a hex string is its lexicographic min — identical in any
    * engine. */
  private def seedHash(seed: Int, useMd5: Boolean): Column = {
    val keyed = concat(lit(s"$seed:"), col("shingle"))
    if (useMd5) md5(keyed) else conv(xxhash64(keyed).cast("string"), 10, 16)
  }

  /** MinHash signature: ONE aggregation with `numHashes` min() columns —
    * a single shuffle of the shingle rows, no row explosion, all map-side
    * combinable. (A per-(doc,seed) explode would multiply shuffle volume by
    * numHashes for no benefit.) */
  private def signatures(sh: DataFrame, numHashes: Int, useMd5: Boolean): DataFrame = {
    val aggs = (0 until numHashes).map(j => min(seedHash(j, useMd5)).as(s"mh$j"))
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
    val inter = pairs
      .join(sh.withColumnRenamed("doc", "id_a").withColumnRenamed("shingle", "sh_a"), Seq("id_a"))
      .join(sh.withColumnRenamed("doc", "id_b").withColumnRenamed("shingle", "sh_b"), Seq("id_b"))
      .filter(col("sh_a") === col("sh_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("n_sh", "n_a"), Seq("id_a"))
      .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("n_sh", "n_b"), Seq("id_b"))
      .withColumn("jaccard", col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")))
      .filter(round(col("jaccard"), 4) >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
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
    // Token multiplicity is a weight, so aggregate (doc, token) → count and
    // hash each distinct token ONCE, instead of recomputing md5 at all 64
    // bit positions of every occurrence. Σ contrib over duplicate rows ==
    // Σ contrib·count over distinct rows — the oracle uses the former, the
    // engine the latter.
    val toks = docs.select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("tok"))
      .groupBy("doc", "tok").agg(count(lit(1)).as("cnt"))
      .withColumn("h", md5(col("tok")))
    val withPos = toks.select(col("doc"), col("h"), col("cnt"),
      explode(sequence(lit(0), lit(63))).as("pos"))
    // hex digit pos/4 of md5(tok), bit (3 - pos%4) of that digit;
    // arithmetic form because functions.shiftright only takes a literal
    // shift amount
    val digit = conv(substr(col("h"), (col("pos") / 4).cast("int") + 1, lit(1)), 16, 10).cast("int")
    val pow2 = pow(lit(2.0), lit(3) - pmod(col("pos"), lit(4))).cast("int")
    val bit = pmod(floor(digit / pow2).cast("int"), lit(2))
    val contrib = (when(bit === 1, 1).otherwise(-1)) * col("cnt")
    withPos
      .withColumn("contrib", contrib)
      .groupBy("doc", "pos").agg(sum("contrib").as("s"))
      .withColumn("b", when(col("s") > 0, "1").otherwise("0"))
      .groupBy("doc")
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("b")))),
        x => x.getField("b")), "").as("simhash"))
  }
}
