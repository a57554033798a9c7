package graft

import graft.expressions.{Exprs, ShingleKernel}
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property tests pinning the native expressions to their composable
  * reference semantics on arbitrary inputs — the codegen kernels must be
  * drop-in equal to the slow forms they replaced. */
class ExpressionPropertiesSpec extends SparkSpec {

  /** Deterministic sampling (scalatestplus bridge isn't on the offline
    * classpath, so drive ScalaCheck generators directly). */
  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val text = Gen.listOf(word).map(_.mkString(" "))
  private val spacedText = for {
    t <- text; pre <- Gen.choose(0, 2); mid <- Gen.choose(0, 2)
  } yield (" " * pre) + t.replace(" ", " " * (mid + 1))

  /** Naive reference implementation of the shingle semantics. */
  private def naiveShingles(s: String, n: Int): Seq[String] = {
    val toks = s.split(" ").filter(_.nonEmpty).toSeq
    if (toks.length <= n) Seq(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSeq
  }

  test("ShingleKernel matches the naive sliding-window semantics on arbitrary spacing") {
    for {
      s <- samples(spacedText, 300)
      n <- 1 to 5
    } {
      val got = ShingleKernel.compute(UTF8String.fromString(s), n)
        .toObjectArray(org.apache.spark.sql.types.StringType)
        .map(_.toString).toSeq
      assert(got == naiveShingles(s, n), s"text=<$s> n=$n")
    }
  }

  test("CosineSimilarity expression equals the HOF formulation on random vectors") {
    import spark.implicits._
    val vecs = Seq.tabulate(50)(i =>
      (i.toLong, Array.tabulate(16)(j => math.sin(i * 17 + j * 3).toFloat)))
      .toDF("id", "v")
    val both = vecs.as("a").crossJoin(vecs.as("b"))
      .select(
        Exprs.cosineSim(col("a.v"), col("b.v")).as("native"),
        (aggregate(zip_with(col("a.v"), col("b.v"), (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x) /
          (sqrt(aggregate(zip_with(col("a.v"), col("a.v"), (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)) *
           sqrt(aggregate(zip_with(col("b.v"), col("b.v"), (x, y) => x.cast("double") * y.cast("double")), lit(0.0), (acc, x) => acc + x)))).as("hof"))
      .select(max(abs(col("native") - col("hof"))).as("maxdiff"))
      .as[Double].collect()(0)
    assert(both == 0.0, s"native and HOF cosine must be bit-identical, max diff $both")
  }

  test("wikipedia parser round-trips generated well-formed lines") {
    import spark.implicits._
    val titles = Seq("Some Page", "Talk:Thing", "Special:Log/x", "A (b) c")
    val flagsSet = Seq("", "M", "N", "!", "B", "MB", "N!")
    val lines = for {
      (t, i) <- titles.zipWithIndex
      f <- flagsSet
    } yield graft.streaming.WikipediaFeedEvent("#en.wikipedia",
      s"[[$t]] $f https://x.org/d?i=$i * user$i * (${if (i % 2 == 0) "+" else "-"}${i + 1}) summary $i",
      1000000L + i, "src")
    val parsed = graft.streaming.WikipediaParse.parse(lines.toDF())
    assert(parsed.count() == lines.length, "every well-formed line must parse")
    val rows = parsed.collect()
    rows.foreach { r =>
      assert(titles.contains(r.getAs[String]("title")))
      assert(r.getAs[Boolean]("isMinor") == r.getAs[String]("unparsedFlags").contains("M"))
      assert(r.getAs[Boolean]("isTalk") == r.getAs[String]("title").startsWith("Talk:"))
    }
  }

  test("BloomMightContain agrees with the filter's own probe; nulls pass through") {
    import spark.implicits._
    val members = (0 until 500).map(i => s"shingle $i")
    val bf = members.toDF("s").stat.bloomFilter("s", 500, 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val probes = (members ++ (1000 until 1500).map(i => s"other $i"))
      .map(Option(_)) :+ Option.empty[String]
    val got = probes.toDF("s")
      .select(col("s"), Exprs.bloomMightContain(col("s"), bfB).as("hit"))
      .collect()
      .map(r => Option(r.getString(0)) ->
        (if (r.isNullAt(1)) None else Some(r.getBoolean(1)))).toMap
    probes.foreach { p =>
      val expect = p.map(bf.mightContainString) // None for the null probe
      assert(got(p) == expect, s"probe=$p")
    }
    // every member must hit (Bloom has no false negatives)
    members.foreach(m => assert(got(Some(m)) == Some(true), m))
  }

  test("LetterCounts equals the 26-x-replace column twin on arbitrary text") {
    import spark.implicits._
    val mixed = for {
      t <- spacedText
      caps <- Gen.listOf(Gen.alphaUpperChar).map(_.mkString)
      junk <- Gen.listOf(Gen.oneOf('0', '9', '!', 'ü', 'И', '漢', ' ')).map(_.mkString)
    } yield t + caps + junk
    val rows = samples(mixed, 200).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "t")
    def twin(ch: Char) =
      (length(col("t")) - length(replace(replace(col("t"),
        lit(ch.toString), lit("")), lit(ch.toUpper.toString), lit("")))).cast("long")
    val got = df.select(col("id"),
        graft.expressions.Exprs.letterCounts(col("t")).as("lc"),
        array(('a' to 'z').map(twin): _*).as("tw"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
  }

  test("TermFrequencies equals the per-term size(filter(...)) twin on " +
      "arbitrary token arrays; panel order and misses pin to zero") {
    import spark.implicits._
    // small vocabulary so panel terms actually collide with tokens
    val tok = Gen.oneOf("apple", "banana", "cherry", "date", "egg", "fig")
    val doc = Gen.listOf(tok).map(_.mkString(" "))
    val panel = Seq("banana", "date", "nosuchterm", "apple")
    val rows = samples(doc, 200).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "t")
    val toks = filter(split(col("t"), " "), x => x =!= "")
    val got = df.select(col("id"),
        Exprs.termFrequencies(toks, panel).as("tf"),
        array(panel.map(tm =>
          size(filter(toks, x => x === lit(tm))).cast("long")): _*).as("tw"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
    // null text → null array (the null-intolerant UnaryExpression
    // contract the BM25 consumer's drop-semantics rely on)
    val nr = Seq((0L, Option.empty[String])).toDF("id", "t")
      .select(Exprs.termFrequencies(filter(split(col("t"), " "),
        x => x =!= ""), panel).as("tf")).collect()(0)
    assert(nr.isNullAt(0))
    // empty panel → empty counts, not a crash
    val er = Seq((0L, "apple fig")).toDF("id", "t")
      .select(Exprs.termFrequencies(filter(split(col("t"), " "),
        x => x =!= ""), Nil).as("tf")).collect()(0)
    assert(er.getSeq[Long](0).isEmpty)
  }

  test("PanelTermStats equals termFrequencies + size(tokens) on arbitrary " +
      "spacing, tabs and non-ASCII text (0x20-only split)") {
    import spark.implicits._
    // tokens may carry tabs/newlines/multibyte glyphs INSIDE them — only
    // 0x20 splits, exactly like split(text, " ") — and spacing varies
    val tok = Gen.oneOf("apple", "banana", "a\tb", "ü漢", "apple!", "x")
    val doc = for {
      ts <- Gen.listOf(tok)
      pre <- Gen.choose(0, 2); gap <- Gen.choose(1, 3)
    } yield (" " * pre) + ts.mkString(" " * gap)
    val panel = Seq("banana", "a\tb", "ü漢", "missing", "apple")
    val rows = samples(doc, 200).zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val df = rows.toDF("id", "t")
    val toks = filter(split(col("t"), " "), x => x =!= "")
    val got = df.select(col("id"),
        Exprs.panelTermStats(col("t"), panel).as("ps"),
        concat(Exprs.termFrequencies(toks, panel),
          array(size(toks).cast("long"))).as("tw"))
      .collect()
    got.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"id=${r.getLong(0)}")
    }
  }
}
