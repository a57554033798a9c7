package graft

import graft.operators.Outputs

/** Z-order layout: hand-checked bit interleave and the locality contract
  * the layout exists for (range-partitioned files with disjoint, sorted
  * zval ranges → parquet footer pruning works on every interleaved
  * column). */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zOrderKey: hand-computed interleave on an exact 2-bit grid") {
    // values 0..3 with min 0 / max 3 scale to themselves; a's bits land
    // at positions 0,2 and b's at 1,3
    val df = (for { a <- 0L to 3L; b <- 0L to 3L } yield (a, b))
      .toDF("a", "b")
    val out = Outputs.zOrderKey(df, Seq("a", "b"), bits = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(out((0L, 0L)) == 0L)
    assert(out((3L, 0L)) == 5L)   // 0b0101
    assert(out((0L, 3L)) == 10L)  // 0b1010
    assert(out((3L, 3L)) == 15L)
    assert(out((1L, 2L)) == 9L,   // a=01 → bits 0; b=10 → bit 3: 0b1001
      s"got ${out((1L, 2L))}")
    assert(out.values.toSeq.sorted == (0L to 15L).toList,
      "the 4×4 grid maps bijectively onto 0..15")
  }

  test("zOrderKey: the Morton fast path is bijective on a 32×32 grid (5 bits)") {
    // pins the magic-mask spread against the generic loop's semantics:
    // 1024 grid points must map onto exactly the 1024 interleaved keys
    val df = (for { a <- 0L until 32L; b <- 0L until 32L } yield (a, b))
      .toDF("a", "b")
    val z = Outputs.zOrderKey(df, Seq("a", "b"), bits = 5)
      .collect().map(_.getLong(2))
    assert(z.distinct.length == 1024, "bijective")
    assert(z.min == 0L && z.max == 1023L, s"range [0,1023]: ${z.min}..${z.max}")
  }

  test("zOrderKey: degenerate dimension scales to 0 and drops out") {
    val df = Seq((5L, 1L), (5L, 2L), (5L, 3L)).toDF("a", "b")
    val out = Outputs.zOrderKey(df, Seq("a", "b"), bits = 4)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    // a is constant → s0 = 0; zval is b's bits interleaved at odd slots,
    // so it is strictly monotone in b
    assert(out(1L) < out(2L) && out(2L) < out(3L), s"got: $out")
  }

  test("zOrderedWrite: files hold disjoint sorted zval ranges (the pruning contract)") {
    val dir = java.nio.file.Files.createTempDirectory("zorder").toFile
    val df = (for { a <- 0L until 32L; b <- 0L until 32L } yield (a, b))
      .toDF("a", "b")
    Outputs.zOrderedWrite(df, Seq("a", "b"), dir.getAbsolutePath,
      numFiles = 4, bits = 5)
    val files = dir.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length >= 2, "range partitioning must produce several files")
    val ranges = files.map { f =>
      val z = spark.read.parquet(f.getAbsolutePath)
        .select("zval").collect().map(_.getLong(0))
      assert(z.toSeq == z.toSeq.sorted, s"${f.getName}: sorted within file")
      (z.min, z.max)
    }.sortBy(_._1)
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) =>
        assert(hi < lo, s"file zval ranges must be disjoint: $hi vs $lo")
      case _ =>
    }
  }
}
