package graft

import graft.operators.RelationalOps
import org.apache.spark.sql.functions._

/** Poisson-bootstrap determinism and statistics contracts: the affine
  * count kernel replays bit-identically (including under repartitioning),
  * replicate sizes concentrate around n, the mean division is exactly
  * floored, and the CI row is an exact order-statistic selection from the
  * replicate set. */
class BootstrapSpec extends SparkSpec {
  import spark.implicits._

  private val B = 16

  /** Sequential reference of the per-(row, resample) count — the same
    * md5-lane base digest + affine row + CDF ladder, computed in plain
    * Scala. */
  private def refCount(id: String, j: Int): Long = {
    val md5 = java.security.MessageDigest.getInstance("MD5")
      .digest(id.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val h = (0 until 8).map { i =>
      val d = Character.digit(md5.charAt(i), 16).toLong
      d * (1L << (4 * (7 - i)))
    }.sum
    val (a, c) = RelationalOps.bootRowParams(B)(j)
    val u = (a * h + c) % RelationalOps.BootP
    val k = RelationalOps.bootThresholds.indexWhere(u < _)
    if (k < 0) 8L else k.toLong
  }

  test("CDF thresholds are the Poisson(1) quantization: increasing, anchored at e^-1") {
    val t = RelationalOps.bootThresholds
    assert(t == t.sorted && t.distinct == t, "strictly increasing ladder")
    assert(t.head == math.floor(math.exp(-1.0) * RelationalOps.BootP).toLong)
    assert(t.last < RelationalOps.BootP, "count 8 branch stays reachable")
  }

  test("replicate sums equal the sequential reference exactly") {
    val rows = (1L to 200L).map(i => (i.toString, i * 7L))
    val df = rows.toDF("id", "cents")
    val got = RelationalOps.poissonBootstrap(df, col("id"), col("cents"), B)
      .select("b", "n_eff", "mean_ccents")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    for (j <- 0 until B) {
      val cs = rows.map { case (id, x) => (refCount(id, j), x) }
      val nEff = cs.map(_._1).sum
      val sx = cs.map { case (c, x) => c * x }.sum
      assert(got(j.toLong) == ((nEff, 100 * sx / nEff)),
        s"resample $j must match the sequential reference")
    }
  }

  test("deterministic under repartitioning; replicate sizes concentrate near n") {
    val df = (1L to 3000L).toDF("id")
      .select(col("id").cast("string").as("id"), (col("id") % 97).as("cents"))
    val a = RelationalOps.poissonBootstrap(df, col("id"), col("cents"), B)
      .orderBy("b").collect().toSeq
    val b = RelationalOps.poissonBootstrap(df.repartition(7), col("id"),
      col("cents"), B).orderBy("b").collect().toSeq
    assert(a == b, "partitioning must not change any replicate")
    val sizes = a.map(_.getLong(1))
    assert(sizes.forall(n => n > 2700 && n < 3300),
      s"Poisson(1) replicate sizes concentrate around n=3000: $sizes")
  }

  test("CI is an exact order-statistic selection over the replicates") {
    val df = (1L to 500L)
      .toDF("id")
      .select(col("id").cast("string").as("id"), (col("id") * 13 % 1009).as("cents"))
    val reps = RelationalOps.poissonBootstrap(df, col("id"), col("cents"), B)
      .select("mean_ccents").as[Long].collect().sorted
    val ci = RelationalOps.poissonBootstrapCI(df, col("id"), col("cents"), B)
      .collect()(0)
    assert(ci.getLong(0) == B)
    val (loR, medR, hiR) =
      (math.max(1, math.ceil(0.025 * B).toInt), (B + 1) / 2,
        math.min(B, math.ceil(0.975 * B).toInt))
    assert(ci.getLong(1) == reps(loR - 1), "lo = rank ceil(0.025 B)")
    assert(ci.getLong(2) == reps(medR - 1), "median = rank (B+1)/2")
    assert(ci.getLong(3) == reps(hiR - 1), "hi = rank ceil(0.975 B)")
    assert(ci.getLong(1) <= ci.getLong(2) && ci.getLong(2) <= ci.getLong(3))
  }
}
