package graft

import graft.operators.{Preferences, RelationalOps, Warehouse}
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests for the round-8 audit/warehouse operators — the
  * algebraic invariants that justify their scale claims: merge ==
  * recompute under arbitrary splits, statistic symmetry/invariance, and
  * exact zero on analytically-zero inputs. Deterministic ScalaCheck
  * sampling (fixed seeds), the KernelPropertiesSpec convention. */
class AuditPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(8042L + i)))

  test("aggState: merge == recompute for arbitrary data and arbitrary split rules") {
    val rowsGen = Gen.nonEmptyListOf(for {
      k <- Gen.choose(0, 5).map(i => s"k$i")
      v <- Gen.choose(-10000, 10000).map(_ / 100.0)
    } yield (k, v))
    samples(rowsGen, 6).zipWithIndex.foreach { case (rows, i) =>
      val df = rows.toDF("k", "v")
      val mod = 2 + i % 3
      val parts = (0 until mod).map(r =>
        Warehouse.aggState(df.filter(abs(hash($"v")) % mod === r),
          Seq("k"), "v"))
      val merged = Warehouse.finalizeAggState(
        Warehouse.mergeAggStates(parts, Seq("k"))).orderBy("k").collect().toSeq
      val full = Warehouse.finalizeAggState(
        Warehouse.aggState(df, Seq("k"), "v")).orderBy("k").collect().toSeq
      assert(merged == full, s"sample $i drifted")
    }
  }

  test("ksStatistic: symmetric in its two groups, bounded in [0, 10000], zero on itself") {
    val rowsGen = Gen.nonEmptyListOf(for {
      g <- Gen.oneOf("a", "b")
      v <- Gen.choose(0, 50000).map(_ / 100.0)
    } yield (g, v))
    samples(rowsGen, 6).zipWithIndex.foreach { case (rows, i) =>
      // ensure both groups are populated
      val df = (rows :+ (("a", 1.0)) :+ (("b", 2.0))).toDF("g", "v")
      val ab = RelationalOps.ksStatistic(df, "g", "v", "a", "b")
        .as[(Long, Long, Long)].collect().head
      val ba = RelationalOps.ksStatistic(df, "g", "v", "b", "a")
        .as[(Long, Long, Long)].collect().head
      assert(ab._3 == ba._3, s"sample $i: KS must be symmetric")
      assert(ab._3 >= 0L && ab._3 <= 10000L)
      // identical relation against itself (both groups = whole data):
      val same = df.select(lit("a").as("g"), $"v")
        .unionByName(df.select(lit("b").as("g"), $"v"))
      assert(RelationalOps.ksStatistic(same, "g", "v", "a", "b")
        .as[(Long, Long, Long)].collect().head._3 == 0L,
        s"sample $i: a distribution has zero distance to itself")
    }
  }

  test("giniIndex: invariant under integer scaling, bounded in [0, 1e6)") {
    val valsGen = Gen.nonEmptyListOf(Gen.choose(0, 100000).map(_ / 100.0))
    samples(valsGen, 6).zipWithIndex.foreach { case (vals, i) =>
      val df = vals.toDF("v")
      val g1 = RelationalOps.giniIndex(df, "v")
        .as[(Long, Long, Long)].collect().head._3
      val g7 = RelationalOps.giniIndex(df.select(($"v" * 7).as("v")), "v")
        .as[(Long, Long, Long)].collect().head._3
      assert(g1 == g7, s"sample $i: Gini must be scale-invariant ($g1 vs $g7)")
      assert(g1 >= 0L && g1 < 1000000L)
    }
  }

  test("chiSquare: symmetric in its arguments; exact zero on outer-product (independent) tables") {
    val margGen = for {
      as <- Gen.listOfN(3, Gen.choose(1, 4))
      bs <- Gen.listOfN(4, Gen.choose(1, 3))
    } yield (as, bs)
    samples(margGen, 5).zipWithIndex.foreach { case ((as, bs), i) =>
      // counts c_xy = a_x * b_y -> exactly independent by construction
      val rows = for {
        (a, x) <- as.zipWithIndex
        (b, y) <- bs.zipWithIndex
        _ <- 1 to a * b
      } yield (s"x$x", s"y$y")
      val df = rows.toDF("x", "y")
      val xy = RelationalOps.chiSquare(df, "x", "y")
        .as[(Long, Long, Long)].collect().head
      val yx = RelationalOps.chiSquare(df, "y", "x")
        .as[(Long, Long, Long)].collect().head
      assert(xy._3 == 0L, s"sample $i: outer-product table must read 0, got ${xy._3}")
      assert(xy._3 == yx._3 && xy._1 == yx._1 && xy._2 == yx._2,
        s"sample $i: chi2 must be symmetric")
    }
  }

  test("bradleyTerry: strengths renormalize to ~1e6 and are invariant to input partitioning") {
    val winsGen = Gen.nonEmptyListOf(for {
      wi <- Gen.choose(0, 4); lj <- Gen.choose(0, 4); if wi != lj
      n <- Gen.choose(1L, 20L)
    } yield (s"m$wi", s"m$lj", n)).suchThat(_.nonEmpty)
    samples(winsGen, 5).zipWithIndex.foreach { case (wins, i) =>
      val df = wins.toDF("winner", "loser", "n_wins")
        .groupBy("winner", "loser").agg(sum("n_wins").as("n_wins"))
      val s1 = Preferences.bradleyTerry(df, iters = 2)
        .orderBy("item").collect().map(r => (r.getString(0), r.getLong(2))).toSeq
      val s2 = Preferences.bradleyTerry(df.repartition(7), iters = 2)
        .orderBy("item").collect().map(r => (r.getString(0), r.getLong(2))).toSeq
      assert(s1 == s2, s"sample $i: partitioning changed the fit")
      val total = s1.map(_._2).sum
      assert(math.abs(total - 1000000L) <= s1.size.toLong,
        s"sample $i: strengths must renormalize (sum $total)")
    }
  }
}
