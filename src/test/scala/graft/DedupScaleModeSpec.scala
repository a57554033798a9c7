package graft

import graft.operators.Dedup

/** The xxhash64 scale mode (useMd5=false) must find the same verified
  * near-duplicates as the md5 oracle mode: candidate generation differs
  * per hash family, but the Jaccard verify pins the final pair set for
  * well-separated duplicates. */
class DedupScaleModeSpec extends SparkSpec {
  import spark.implicits._

  test("both hash modes recall every high-similarity pair (LSH S-curve guarantee)") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // ground truth: exact n-gram Jaccard at 0.8 — far above the banding
    // scheme's S-curve midpoint, so any reasonable hash family must catch
    // all of them; borderline pairs (J≈0.5-0.7) may legitimately differ
    // between families
    val truth = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.8)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture corpus has planted near-dups")
    // 32 hashes / 8 bands: per-pair miss probability at J=0.8 is ~1.5%
    // (vs ~12% at the 16/4 default) — at the fixture's pair count both
    // fixed hash families recall everything. The outcome is deterministic
    // per family; this pins it.
    for (md5Mode <- Seq(true, false)) {
      val pairs = Dedup.minhashNearDups(docs, "text", "doc_id",
        numHashes = 32, rowsPerBand = 4, useMd5 = md5Mode)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      val missed = truth -- pairs
      assert(missed.isEmpty, s"useMd5=$md5Mode missed high-sim pairs: $missed")
      // and everything emitted is verified >= the 0.5 threshold by construction
      assert(pairs.size >= truth.size)
    }
  }

  test("both SimHash families are locality-sensitive, and fast-mode banding is lossless") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.functions._
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    // ground truth at J >= 0.95: nearly-identical token multisets. SimHash
    // does NOT guarantee Hamming <= 3 for them (a J=0.95 pair in this
    // corpus sits at distance 4-6 in the md5 family) — the property a
    // family must have is that true near-dups land FAR below random
    // distance (E[random] = 32 bits): assert <= 16 for every truth pair.
    val truth = Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.95)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(truth.nonEmpty, "fixture corpus has extreme near-dups")
    def hammings(fp: DataFrame): Map[(Long, Long), Long] = {
      val t = truth.toSeq.toDF("id_a", "id_b")
      t.join(fp.select(col("doc").as("id_a"), col("simhash").as("sa")), Seq("id_a"))
        .join(fp.select(col("doc").as("id_b"), col("simhash").as("sb")), Seq("id_b"))
        .select(col("id_a"), col("id_b"),
          bit_count(col("sa").bitwiseXOR(col("sb"))).cast("long").as("h"))
        .as[(Long, Long, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap
    }
    val md5H = hammings(Dedup.simhashPacked(docs, "text", "doc_id"))
    val fastH = hammings(Dedup.simhashPackedFast(docs, "text", "doc_id"))
    truth.foreach { p =>
      assert(md5H(p) <= 16, s"md5 family puts near-dup $p at ${md5H(p)} bits")
      assert(fastH(p) <= 16, s"xxhash64 family puts near-dup $p at ${fastH(p)} bits")
    }
    // banding losslessness for the fast family: the banded pipeline must
    // return EXACTLY the brute-force Hamming<=3 pair set (pigeonhole: <=3
    // flipped bits cannot touch all four 16-bit chunks)
    val fp = Dedup.simhashPackedFast(docs, "text", "doc_id")
    val brute = fp.select(col("doc").as("id_a"), col("simhash").as("sa"))
      .crossJoin(fp.select(col("doc").as("id_b"), col("simhash").as("sb")))
      .filter(col("id_a") < col("id_b"))
      .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val banded = Dedup.simhashNearDupsFast(docs, "text", "doc_id", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(banded == brute, s"banding lost pairs: ${brute -- banded}, invented: ${banded -- brute}")
  }

  test("lshBandPlan picks the integrated-error argmin and tracks the threshold") {
    // independent recheck: Simpson-free trapezoid integral over a finer grid
    def scurve(s: Double, b: Int, r: Int) = 1.0 - math.pow(1.0 - math.pow(s, r), b)
    def indepErr(t: Double, n: Int, b: Int, r: Int): Double = {
      val g = 4000
      (0 until g).map { i =>
        val s = (i + 0.5) / g
        if (s < t) scurve(s, b, r) else 1.0 - scurve(s, b, r)
      }.sum / g
    }
    for (t <- Seq(0.3, 0.5, 0.8); n <- Seq(16, 64, 128)) {
      val p = Dedup.lshBandPlan(t, n)
      assert(p.bands * p.rowsPerBand === n)
      val best = (1 to n).filter(n % _ == 0)
        .map(r => (n / r, r)).minBy { case (b, r) => indepErr(t, n, b, r) }
      assert((p.bands, p.rowsPerBand) === best, s"t=$t n=$n")
      // the chosen S-curve's transition must straddle the target: a pair
      // AT the threshold is neither a sure candidate nor a sure miss
      assert(scurve(t, p.bands, p.rowsPerBand) > 0.02 &&
        scurve(t, p.bands, p.rowsPerBand) < 0.98, s"t=$t n=$n")
      assert(p.fpArea >= 0 && p.fnArea >= 0 && p.fpArea + p.fnArea < 0.25)
    }
    // a higher threshold demands MORE rows per band (sharper curve, shifted right)
    assert(Dedup.lshBandPlan(0.9, 128).rowsPerBand >
      Dedup.lshBandPlan(0.4, 128).rowsPerBand)
    // weighting misses harder shifts the curve left (recall posture):
    // never fewer bands than the balanced plan
    assert(Dedup.lshBandPlan(0.7, 64, fnWeight = 4.0).bands >=
      Dedup.lshBandPlan(0.7, 64).bands)
    // the repo default (16 hashes, r=4) is exactly the balanced plan at 0.5
    val d = Dedup.lshBandPlan(0.5, 16)
    assert((d.bands, d.rowsPerBand) === ((4, 4)))
  }
}
