package graft

import graft.operators.{Curation, RelationalOps, Sketches, Timeseries}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the session's exact-integer kernels on ARBITRARY
  * inputs — each compared against a sequential BigInt/brute-force
  * reference. The hand fixtures pin known values; these pin the
  * arithmetic identities on inputs nobody chose. */
class KernelPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(1042L + i)))

  test("cms estimates never undercount any item, on arbitrary streams") {
    val streamGen = Gen.nonEmptyListOf(Gen.choose(0, 30).map(i => s"it$i"))
    samples(streamGen, 8).zipWithIndex.foreach { case (items, i) =>
      val df = items.toDF("item")
      val exact = items.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
      val est = Sketches.cmsEstimate(items.distinct.toDF("item"), "item",
          Sketches.cmsBuild(df, "item", depth = 2, width = 8),
          depth = 2, width = 8)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      exact.foreach { case (k, n) =>
        assert(est(k) >= n, s"sample $i: $k est ${est(k)} < exact $n")
      }
      // and the total over-count is bounded by collisions, never negative
      assert(est.values.sum >= items.size.toLong)
    }
  }

  test("autocorr equals the BigInt reference on arbitrary integer series") {
    val seriesGen = Gen.listOfN(40,
      Gen.choose(-500L, 500L)).suchThat(_.nonEmpty)
    samples(seriesGen, 6).zipWithIndex.foreach { case (xs, si) =>
      val df = xs.zipWithIndex.map { case (x, i) => ("k", i.toLong, x) }
        .toDF("k", "seq", "v")
      val out = Timeseries.autocorr(df, "k", Seq("seq"), "v", maxLag = 3)
        .collect().map(r => r.getLong(1) ->
          (if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
      (1 to 3).foreach { h =>
        val n = BigInt(xs.length); val s = BigInt(xs.sum)
        val sxx = xs.map(x => BigInt(x) * x).sum
        val den = n * n * sxx - n * s * s
        val expected =
          if (xs.length <= h || den == 0) None
          else {
            val sxy = xs.dropRight(h).zip(xs.drop(h))
              .map { case (a, b) => BigInt(a) * b }.sum
            val aH = BigInt(xs.dropRight(h).sum)
            val bH = BigInt(xs.drop(h).sum)
            val num = n * n * sxy - n * s * (aH + bH) + (n - h) * s * s
            // BigInt / truncates toward zero, matching div
            Some(((BigInt(10000) * num) / den).toLong)
          }
        assert(out(h.toLong) == expected, s"sample $si lag $h")
      }
    }
  }

  test("weightedMedian equals the brute-force reference on arbitrary weighted rows") {
    val rowGen = Gen.listOfN(30, for {
      v <- Gen.choose(-100L, 100L); w <- Gen.choose(1L, 9L)
    } yield (v, w)).suchThat(_.nonEmpty)
    samples(rowGen, 8).zipWithIndex.foreach { case (rows, si) =>
      val df = rows.map { case (v, w) => ("g", v, w) }.toDF("g", "v", "w")
      val got = RelationalOps.weightedMedian(df, "g", "v", "w")
        .collect().map(r => (r.getLong(1), r.getLong(2))).head
      val tot = rows.map(_._2).sum
      val sorted = rows.sortBy(_._1)
      var cum = 0L
      val ref = sorted.find { case (_, w) => cum += w; cum * 2 >= tot }.get._1
      assert(got == ((ref, tot)), s"sample $si: $got vs ($ref, $tot)")
    }
  }

  test("tokenBudget invariants hold on arbitrary fixtures: alloc ≤ avail, Σalloc ≤ budget") {
    val srcGen = Gen.listOfN(12, for {
      a <- Gen.choose(0L, 200L); w <- Gen.choose(0L, 5000L)
    } yield (a, w))
    samples(srcGen, 8).zipWithIndex.foreach { case (srcs0, si) =>
      val srcs = srcs0.zipWithIndex.map { case ((a, w), i) => (s"s$i", a, w) }
      val budget = 400L
      val out = Curation.tokenBudget(
        srcs.map(s => (s._1, s._2)).toDF("source", "avail"), "source", "avail",
        srcs.map(s => (s._1, s._3)).toDF("source", "w"), "source", "w",
        budget, rounds = 4)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
      var total = 0L
      srcs.foreach { case (name, avail, weight) =>
        val (a, alloc) = out(name)
        assert(a == avail)
        assert(alloc >= 0 && alloc <= avail, s"sample $si $name: $alloc > $avail")
        if (weight <= 0) assert(alloc == 0, s"sample $si $name: zero weight must allocate 0")
        total += alloc
      }
      assert(total <= budget, s"sample $si: allocated $total over budget $budget")
    }
  }

  test("entropyCodedSize equals the sequential micro-bit reference on arbitrary ASCII docs") {
    val Ln2 = graft.operators.TextAnalysis.Ln2
    val docGen = Gen.listOfN(60, Gen.choose(32.toChar, 126.toChar)).map(_.mkString)
    samples(Gen.listOfN(6, docGen), 5).zipWithIndex.foreach { case (texts, si) =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.operators.TextAnalysis
        .entropyCodedSize(df, "text", "doc_id")
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
      texts.zipWithIndex.foreach { case (t, i) =>
        val n = t.length.toLong
        val counts = t.groupBy(identity).view.mapValues(_.length.toLong)
        val bitsMicro = counts.values.map { nc =>
          nc * math.round((math.log(n.toDouble) - math.log(nc.toDouble))
            / Ln2 * 1e6)
        }.sum
        val expBytes = if (n == 0) 0L else (bitsMicro + 7999999L) / 8000000L
        val (nBytes, estBytes) = out(i.toLong)
        assert(nBytes == t.getBytes("UTF-8").length.toLong, s"sample $si doc $i")
        assert(estBytes == expBytes,
          s"sample $si doc $i: engine $estBytes vs reference $expBytes")
        // the order-0 bound: never above ceil(n*log2(alphabet)/8)+1
        val alpha = math.max(counts.size, 1)
        val cap = (n * math.log(alpha.toDouble) / Ln2 / 8).ceil.toLong + 1
        assert(estBytes <= cap, s"sample $si doc $i: $estBytes over cap $cap")
      }
    }
  }
}
