package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions.col

/** Positive-example coverage for the curation signals whose oracle rows
  * are all-zero on the synthetic corpus (it plants no PII) and for the
  * repetition ratio's edge cases. */
class TextOpsSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  test("piiCounts fires on emails, urls and ipv4 and not on clean text") {
    val docs = Seq(
      (1L, "contact me at jane.doe+spam@example.org or bob@sub.domain.co"),
      (2L, "see https://example.com/path?q=1 and http://other.net"),
      (3L, "server at 10.0.0.1 and 192.168.1.255 responded"),
      (4L, "a perfectly clean sentence with no identifiers at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.piiCounts(docs, "text", "doc_id")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 2L, 0L, 0L)))
    assert(out(1) == ((2L, 0L, 2L, 0L)))
    assert(out(2) == ((3L, 0L, 0L, 2L)))
    assert(out(3) == ((4L, 0L, 0L, 0L)))
  }

  test("repetitionScore: unique text ~0, fully repeated text high, short text defined") {
    val docs = Seq(
      (1L, "one two three four five six seven eight"),  // all shingles unique
      (2L, Seq.fill(20)("spam ham eggs").mkString(" ")), // heavy repetition
      (3L, "hi")                                         // shorter than shingle size
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionScore(docs, "text", "doc_id", 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    val byId = out.map(r => r._1 -> r).toMap
    assert(byId(1L)._4 == 0.0)
    assert(byId(2L)._4 > 0.9, s"templated text must score high, got ${byId(2L)}")
    assert(byId(3L)._2 == 1L && byId(3L)._4 == 0.0, "short docs shingle to one unit, ratio 0")
  }

  test("tokenHistogram: exact bin edges, boundary counts land in the upper bin") {
    val docs = Seq(
      (1L, "a b c"),                         // 3 tokens  → bin 0
      (2L, Seq.fill(50)("x").mkString(" ")), // 50 tokens → bin 50 (boundary)
      (3L, Seq.fill(49)("x").mkString(" ")), // 49        → bin 0
      (4L, Seq.fill(120)("x").mkString(" ")) // 120       → bin 100
    ).toDF("doc_id", "text")
    val out = TextAnalysis.tokenHistogram(docs, "text", binWidth = 50)
      .orderBy("bin_lo").as[(Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L), (50L, 1L), (100L, 1L)))
  }

  test("corpusStats: exact counts, token sums, and hand-computed language entropy") {
    // srcA: 2 en + 2 de (uniform over 2 langs → entropy ln 2);
    // srcB: 3 en only (entropy 0). Token counts are whitespace words.
    val docs = Seq(
      (1L, "a b c", "en", "srcA"), (2L, "d e", "en", "srcA"),
      (3L, "f", "de", "srcA"), (4L, "g h i j", "de", "srcA"),
      (5L, "k l", "en", "srcB"), (6L, "m", "en", "srcB"), (7L, "n o p", "en", "srcB")
    ).toDF("doc_id", "text", "lang", "source")
    val out = TextAnalysis.corpusStats(docs, "text", "doc_id", "source", "lang")
      .orderBy("source")
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(out.length == 2)
    val (a, b) = (out(0), out(1))
    assert(a._1 == "srcA" && a._2 == 4L && a._3 == 10L && a._4 == 2L)
    assert(math.abs(a._6 - math.log(2)) < 1e-3, s"uniform 2-lang entropy must be ln2, got ${a._6}")
    assert(b._1 == "srcB" && b._2 == 3L && b._3 == 6L && b._4 == 1L)
    assert(b._6 == 0.0, "single-language source must have zero entropy")
  }

  test("redactPii: URL-first order swallows credentials inside URLs; clean text unchanged") {
    val docs = Seq(
      (1L, "mail jane.doe@example.org from 10.0.0.1"),
      (2L, "fetch https://user@host.example.com/p?x=1 now"), // @ inside URL: one <URL>, no <EMAIL>
      (3L, "nothing sensitive here at all")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redactPii(docs, "text", "doc_id")
      .as[(Long, String)].collect().sortBy(_._1)
    assert(out(0)._2 == "mail <EMAIL> from <IP>")
    assert(out(1)._2 == "fetch <URL> now",
      s"URL must be redacted whole before the email pass, got ${out(1)._2}")
    assert(out(2)._2 == "nothing sensitive here at all")
  }

  test("stripRepeatedSpans drops corpus-frequent spans, keeps rare ones in order") {
    // Span "buy now" appears in 4 docs (df=4 > maxDf=3); every other span is
    // unique. Doc 4 is pure boilerplate; doc 5 is empty; doc 6 has an odd
    // token count (tail chunk of 1 token must survive).
    val docs = Seq(
      (1L, "buy now alpha beta"),
      (2L, "buy now gamma delta"),
      (3L, "buy now epsilon zeta"),
      (4L, "buy now buy now"),
      (5L, ""),
      (6L, "rare span tail")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.stripRepeatedSpans(docs, "text", "doc_id", span = 2, maxDf = 3)
      .as[(Long, String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(out.map(_._1) == Seq(1L, 2L, 3L, 4L, 5L, 6L), "every input doc must appear")
    assert(out(0) == ((1L, "alpha beta", 1L, 1L)))
    assert(out(3) == ((4L, "", 0L, 2L)), "all-boilerplate doc must come back empty, not vanish")
    assert(out(4) == ((5L, "", 0L, 0L)), "empty doc must come back empty with zero chunks")
    assert(out(5) == ((6L, "rare span tail", 2L, 0L)), "odd-length tail chunk must survive")
  }

  test("ngramContainmentPairs: a quoted subset scores ~1 where Jaccard stays low") {
    // Doc 2 is doc 1's first 6 tokens verbatim: containment = 4/4 = 1.0
    // (every trigram of doc 2 appears in doc 1), while Jaccard = 4/18 ≈ 0.22
    // — under a useful Jaccard threshold. Doc 3 is unrelated.
    val long = "alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      "kilo lima mike november oscar papa quebec romeo"
    val docs = Seq(
      (1L, long),
      (2L, "alpha bravo charlie delta echo foxtrot"),
      (3L, "zulu yankee xray whiskey victor uniform tango sierra")
    ).toDF("doc_id", "text")
    val contain = graft.operators.Dedup
      .ngramContainmentPairs(docs, "text", "doc_id", shingleSize = 3, threshold = 0.9)
      .as[(Long, Long, Double)].collect().toSeq
    assert(contain == Seq((1L, 2L, 1.0)),
      s"subset doc must hit containment 1.0 and nothing else may pair: $contain")
    val jac = graft.operators.Dedup
      .ngramJaccardPairs(docs, "text", "doc_id", shingleSize = 3, threshold = 0.5)
      .collect()
    assert(jac.isEmpty, "the same pair must be invisible to Jaccard at 0.5")
  }

  test("repeatedSpans: unaligned cross-doc span found; within-doc repeat alone excluded") {
    // docs 1 and 2 share the same 4-token span at DIFFERENT offsets (1 vs
    // 3 tokens in) — the aligned-chunk pass would miss it, sliding windows
    // must not. doc 3 repeats a span twice internally but no other doc has
    // it → excluded at minDocs=2. doc 4 shares nothing.
    val docs = Seq(
      (1L, "x alpha beta gamma delta y z"),
      (2L, "p q r alpha beta gamma delta"),
      (3L, "one two three four one two three four"),
      (4L, "totally unrelated words here now")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repeatedSpans(docs, "text", "doc_id",
      spanTokens = 4, minDocs = 2)
      .orderBy("span")
      .select("span", "n_docs", "n_occ", "first_doc")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(("alpha beta gamma delta", 2L, 2L, 1L)),
      s"exactly the shared span, found at unaligned offsets: $out")
  }

  test("winsorize: values clamp to the group's own percentile band") {
    // group "a": 1..20 → type-7 p05 = 1.95, p95 = 19.05 (both engines
    // interpolate identically; q_percentiles pins the parity corpus-wide).
    // group "b": all equal → band collapses, nothing clamps.
    val rows = (1 to 20).map(i => ("a", i.toDouble)) ++ Seq.fill(5)(("b", 7.0))
    val df = rows.toDF("k", "v")
    val out = graft.operators.Curation.winsorize(df, "v", Seq("k"))
      .select("k", "v", "clamped", "was_clamped")
      .as[(String, Double, Double, Boolean)].collect().toSeq
    val a = out.filter(_._1 == "a").sortBy(_._2)
    assert(a.head == ("a", 1.0, 1.95, true) && a.last == ("a", 20.0, 19.05, true))
    assert(a.count(_._4) == 2, "only the two extreme values clamp at p05/p95 of 1..20")
    assert(out.filter(_._1 == "b").forall(r => r._3 == 7.0 && !r._4),
      "a degenerate band must pass every value through unclamped")
  }

  test("winsorize: rows with a NULL group key are kept and clamp within their own band") {
    // a plain equi-join would silently drop the null group (null != null);
    // the null-safe join must keep the rows AND use the null group's own
    // percentiles, not another group's.
    val rows = Seq((Some("a"), 1.0), (Some("a"), 2.0), (Some("a"), 3.0)) ++
      (1 to 20).map(i => (Option.empty[String], i.toDouble))
    val df = rows.toDF("k", "v")
    val out = graft.operators.Curation.winsorize(df, "v", Seq("k"))
      .select("k", "v", "clamped", "was_clamped")
      .as[(Option[String], Double, Double, Boolean)].collect().toSeq
    val nulls = out.filter(_._1.isEmpty).sortBy(_._2)
    assert(nulls.size == 20, s"null-group rows must survive the band join: ${out.size}")
    assert(nulls.head == ((None, 1.0, 1.95, true)) && nulls.last == ((None, 20.0, 19.05, true)),
      s"null group must clamp within its OWN band: ${nulls.head}, ${nulls.last}")
    assert(out.count(_._1.nonEmpty) == 3, "named group unaffected")
  }

  test("unigramLogProb matches a hand-computed two-word corpus") {
    // Corpus: 6 tokens total — "a"×4, "b"×2. p(a)=2/3, p(b)=1/3.
    val docs = Seq(
      (1L, "a a a"),   // mean lp = ln(2/3)
      (2L, "a b b")    // mean lp = (ln(2/3) + 2 ln(1/3)) / 3
    ).toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0)._2 == 3L && out(1)._2 == 3L)
    assert(math.abs(out(0)._3 - math.log(2.0 / 3)) < 1e-4)
    assert(math.abs(out(1)._3 - (math.log(2.0 / 3) + 2 * math.log(1.0 / 3)) / 3) < 1e-4)
  }

  test("bigramCondLogProb: hand-computed conditionals, context-consistent, minCount after totals") {
    // bigrams: "a b"x3 (docs 1,1,2), "b a"x1, "a c"x1 -> c(a.)=4, c(b.)=1
    val docs = Seq(
      (1L, "a b a b"),  // a b, b a, a b
      (2L, "a b"),      // a b
      (3L, "a c")       // a c
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCondLogProb(docs, "text")
      .as[(String, String, Long, Double)].collect()
      .map(t => ((t._1, t._2), (t._3, t._4))).toMap
    assert(out.keySet == Set(("a", "b"), ("b", "a"), ("a", "c")))
    assert(out(("a", "b"))._1 == 3L)
    assert(math.abs(out(("a", "b"))._2 - math.log(3.0 / 4)) < 1e-4)
    assert(math.abs(out(("a", "c"))._2 - math.log(1.0 / 4)) < 1e-4)
    assert(out(("b", "a"))._2 == 0.0, "c(b a)=c(b.)=1 -> ln(1)=0, and +0.0 not -0.0")
    // probabilities given each context sum to 1 (self-consistent model)
    val pSumA = math.exp(out(("a", "b"))._2) + math.exp(out(("a", "c"))._2)
    assert(math.abs(pSumA - 1.0) < 1e-3)
    // minCount truncates the REPORT, not the totals: "a c" disappears but
    // "a b"'s conditional still uses c(a.)=4
    val cut = TextAnalysis.bigramCondLogProb(docs, "text", minCount = 2L)
      .as[(String, String, Long, Double)].collect()
    assert(cut.map(t => (t._1, t._2)).toSet == Set(("a", "b")))
    assert(math.abs(cut.head._4 - math.log(3.0 / 4)) < 1e-4)
  }

  private def r4(x: Double): Double = math.round(x * 1e4) / 1e4

  test("bigramDocLogProb: hand-computed totals; unknown bigrams back off to 0.4·p_unigram") {
    // bigrams: doc1 = (a,b)(b,a)(a,b), doc2 = (a,b)(b,c)
    // counts: (a,b)=3, (b,a)=1, (b,c)=1; contexts c(a.)=3, c(b.)=2
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val out = TextAnalysis.bigramDocLogProb(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    // doc1: ln(3/3) + ln(1/2) + ln(3/3); doc2: ln(3/3) + ln(1/2)
    val lnHalf = r4(math.log(1.0 / 2))
    assert(out(0) == ((1L, 3L, lnHalf)), s"doc1: ${out(0)}")
    assert(out(1) == ((2L, 2L, lnHalf)), s"doc2: ${out(1)}")

    // minCount above every count empties the model: every pair scores the
    // stupid-backoff 0.4 * p_unigram(w2) over unigrams a:3 b:3 c:1 (N=7)
    val bo = TextAnalysis.bigramDocLogProb(docs, "text", "doc_id", minCount = 4L)
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    val lpA = r4(math.log(0.4 * 3 / 7.0)); val lpB = lpA
    val lpC = r4(math.log(0.4 * 1 / 7.0))
    assert(bo(0)._3 == r4(lpB + lpA + lpB), s"doc1 backoff: ${bo(0)}")
    assert(bo(1)._3 == r4(lpB + lpC), s"doc2 backoff: ${bo(1)}")
    // a one-token document has no bigrams and drops out entirely
    val one = Seq((9L, "solo")).toDF("doc_id", "text")
    assert(TextAnalysis.bigramDocLogProb(one, "text", "doc_id").count() == 0)
  }

  test("stored LM scores match inline; OOV tokens floor instead of dropping; streams score unchanged") {
    val docs = Seq((1L, "a b a b"), (2L, "a b c")).toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("lm").toString + "/lm"
    TextAnalysis.buildLmTable(docs, "text", dir)
    val inline = TextAnalysis.bigramDocLogProb(docs, "text", "doc_id")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    val stored = TextAnalysis.bigramDocLogProbFrom(docs, "text", "doc_id", dir)
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(stored == inline, s"stored == inline: $stored vs $inline")

    // cross-corpus scoring: "a z" — the model never saw bigram (a,z) and
    // the vocab never saw z, so the pair backs off at the add-one floor
    // over the STORED totals (a:3 b:3 c:1, N=7) instead of vanishing
    val other = Seq((7L, "a z")).toDF("doc_id", "text")
    val sc = TextAnalysis.bigramDocLogProbFrom(other, "text", "doc_id", dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(sc == Seq((7L, 1L, r4(math.log(0.4 * 1 / 7.0)))), s"OOV floor: $sc")

    // the same scoring plan runs on a STREAM (stream-static broadcast
    // joins + stateful agg), matching the batch numbers exactly
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    in.addData((1L, "a b a b"), (2L, "a b c"))
    val q = TextAnalysis.bigramDocLogProbFrom(
        in.toDF().toDF("doc_id", "text"), "text", "doc_id", dir)
      .writeStream.format("memory").queryName("lm_stream").outputMode("complete")
      .start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("lm_stream")
      .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(streamed == inline, s"stream == batch: $streamed")
  }

  test("dedupReport: per-source duplication ratios, exact zero for a clean source") {
    val docs = Seq(
      (1L, "same text here", "A"), (2L, "same text here", "A"),
      (3L, "different text", "A"),
      (4L, "unique one", "B"), (5L, "unique two", "B"),
      // one null text among uniques is its own (empty) content, NOT a dup;
      // two of them ARE duplicated empty content
      (6L, null.asInstanceOf[String], "C"), (7L, "real prose", "C"),
      (8L, null.asInstanceOf[String], "D"), (9L, null.asInstanceOf[String], "D")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.dedupReport(docs, "text", "source")
      .as[(String, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(out(0) == (("A", 3L, 2L, 1L, 0.3333)), s"A: ${out(0)}")
    assert(out(1) == (("B", 2L, 2L, 0L, 0.0)), s"B clean: ${out(1)}")
    assert(out(2) == (("C", 2L, 2L, 0L, 0.0)), s"single null is not a dup: ${out(2)}")
    assert(out(3) == (("D", 2L, 1L, 1L, 0.5)), s"two nulls are dup empty content: ${out(3)}")
  }

  test("sourceOverlap: hand-computed shingle sets; zero-overlap pairs absent") {
    val docs = Seq(
      (1L, "x y z w", "A"),   // shingles {x y z, y z w}
      (2L, "x y z w", "A"),   // duplicate content: set size still 2
      (3L, "x y z", "B"),     // <= 3 tokens: one whole-text shingle {x y z}
      (4L, "p q r s", "C")    // {p q r, q r s} — disjoint from A and B
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceOverlap(docs, "text", "source")
      .as[(String, String, Long, Long, Long, Double, Double)].collect()
    // only the overlapping pair appears; absent row == zero overlap
    assert(out.length == 1, s"exactly one overlapping pair: ${out.toSeq}")
    val (a, b, na, nb, common, jac, cont) = out.head
    assert((a, b, na, nb, common) == (("A", "B", 2L, 1L, 1L)))
    assert(jac == 0.5, "1 common / (2 + 1 - 1)")
    assert(cont == 1.0, "B's whole set is inside A")

    // blank documents produce the kernel's "" whole-text shingle; it must
    // NOT read as shared content between otherwise-disjoint sources
    val blanks = Seq(
      (1L, "x y z w", "A"), (2L, "", "A"),
      (3L, "p q r s", "C"), (4L, "   ", "C")
    ).toDF("doc_id", "text", "source")
    assert(TextAnalysis.sourceOverlap(blanks, "text", "source").count() == 0,
      "a blank doc in each source is not leakage")
  }

  test("gopherQualityFlags: each rule fails independently; empty/null text fails all") {
    val good = Seq.fill(15)("the cat runs of").mkString(" ")  // 60 words, 2 stopwords
    val docs = Seq(
      (1L, good),
      (2L, "the of"),                                  // too short
      (3L, Seq.fill(20)("123 456 789").mkString(" ")), // no alphabetic words
      (4L, ""),
      (5L, null.asInstanceOf[String])
    ).toDF("doc_id", "text")
    val out = TextAnalysis.gopherQualityFlags(docs, "text", "doc_id")
      .select("doc_id", "n_words", "n_stop", "r_words", "r_mean_len", "r_alpha",
        "r_stop", "pass_all")
      .as[(Long, Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().sortBy(_._1)
    assert(out(0) == ((1L, 60L, 2L, true, true, true, true, true)), s"good: ${out(0)}")
    // mean word length (3+2)/2 = 2.5 also dips under the 3.0 floor
    assert(out(1) == ((2L, 2L, 2L, false, false, true, true, false)), s"short: ${out(1)}")
    assert(!out(2)._6 && !out(2)._8, s"numeric doc fails r_alpha: ${out(2)}")
    assert(out(3) == ((4L, 0L, 0L, false, false, false, false, false)), s"empty: ${out(3)}")
    assert(out(4) == ((5L, 0L, 0L, false, false, false, false, false)), s"null: ${out(4)}")
    // the ratio columns are null (not NaN) for the empty document
    val nulls = TextAnalysis.gopherQualityFlags(docs, "text", "doc_id")
      .filter(org.apache.spark.sql.functions.col("doc_id") >= 4L)
      .select("mean_word_len", "alpha_frac").collect()
    assert(nulls.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  // ---- DSIR importance weights ----

  test("dsirWeights matches an independent add-one-smoothed computation") {
    // corpus: target doc "alpha beta", raw docs "alpha gamma gamma" and
    // "delta delta delta" — reimplement the formula in plain Scala with
    // the same micro-unit rounding and compare exactly
    val rows = Seq((1L, "alpha beta", true), (2L, "alpha gamma gamma", false),
      (3L, "delta delta delta", false))
    val docs = rows.toDF("doc_id", "text", "is_t")
    val toks = rows.flatMap { case (id, t, tg) => t.split(" ").map(w => (id, w, tg)) }
    val cr = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val ct = toks.filter(_._3).groupBy(_._2).view.mapValues(_.size.toLong)
      .toMap.withDefaultValue(0L)
    val (nr, nt, v) = (toks.size.toDouble, toks.count(_._3).toDouble, cr.size.toDouble)
    def lrMicro(w: String): Long =
      BigDecimal((math.log((ct(w) + 1) / (nt + v)) - math.log((cr(w) + 1) / (nr + v))) * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    def expect(id: Long): Double = {
      val ws = toks.filter(_._1 == id).map(_._2)
      BigDecimal(ws.map(lrMicro).sum.toDouble / 1e6 / ws.size)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = TextAnalysis.dsirWeights(docs, "text", "doc_id", col("is_t"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2))).toMap
    rows.foreach { case (id, t, _) =>
      assert(got(id) == ((t.split(" ").length.toLong, expect(id))),
        s"doc $id: ${got(id)} vs expected ${expect(id)}")
    }
    // the target-vocabulary doc must outrank the target-disjoint doc
    assert(got(1L)._2 > got(3L)._2)
  }

  test("dsirWeights is invariant to partitioning") {
    val docs = (1L to 60L)
      .map(i => (i, s"w${i % 9} w${i % 4} w${i % 4} shared", i % 10 == 0))
      .toDF("doc_id", "text", "is_t")
    def run(p: Int) = TextAnalysis.dsirWeights(docs.repartition(p), "text", "doc_id", col("is_t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    assert(run(1) == run(13))
  }

  test("oovRate: deterministic vocab cut, floored bp rate, empty doc absent") {
    // corpus counts: the ×3, cat ×2, dog ×2, zzz ×1 — vocabSize=3 keeps
    // {the, cat, dog} (count desc, word asc breaks the cat/dog tie
    // deterministically INSIDE the kept set; zzz at count 1 is cut)
    val docs = Seq(
      (1L, "the cat the dog"),
      (2L, "the cat dog zzz"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.oovRate(docs, "text", "doc_id", vocabSize = 3)
      .orderBy("doc")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 4L, 0L, 0.0),
      (2L, 4L, 1L, 0.25)), s"got: $out") // doc 3 has no tokens → absent
  }

  test("zipfPanel: slope from exact rank frequencies") {
    // freqs: a×16, b×8, c×4, d×2 → perfect Zipf with slope 1 between
    // adjacent power-of-two ranks
    val text = Seq.fill(16)("a") ++ Seq.fill(8)("b") ++ Seq.fill(4)("c") ++
      Seq.fill(2)("d")
    val docs = Seq((1L, text.mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.zipfPanel(docs, "text", ranks = Seq(1, 2, 4))
      .orderBy("rank_lo")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 2L, 16L, 8L, 1.0),
      (2L, 4L, 8L, 2L, 2.0)), s"got: $out") // ln(8/2)/ln(4/2) = 2
  }

  test("zipfPanel: ranks beyond the vocabulary drop their pairs") {
    val docs = Seq((1L, "a a b")).toDF("doc_id", "text") // vocab size 2
    val out = TextAnalysis.zipfPanel(docs, "text", ranks = Seq(1, 2, 4))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(out.map(t => (t._1, t._2)) == Seq((1L, 2L)), s"got: $out")
  }

  // ---- inverted index (posting lists) ----

  test("postingLists: df band cuts head and tail, postings sorted numerically") {
    val docs = Seq(
      (10L, "common rare alpha"),
      (2L, "common alpha"),
      (1L, "common alpha"),
      (30L, "common")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.postingLists(docs, "text", "doc_id",
        minDf = 2, maxDf = 3)
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    // "common" (df 4) cut as head, "rare" (df 1) cut as tail
    assert(out == Seq(("alpha", 3L, "1,2,10")), s"got: $out")
  }

  test("postingLists: in-doc repeats count once toward df") {
    val docs = Seq((1L, "x x x"), (2L, "x y")).toDF("doc_id", "text")
    val out = TextAnalysis.postingLists(docs, "text", "doc_id", 1, 10)
      .as[(String, Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq(("x", 2L, "1,2"), ("y", 1L, "2")), s"got: $out")
  }

  // ---- shingle novelty ----

  test("noveltyScore: exact copy of an earlier doc scores 0, fresh doc 1") {
    val docs = Seq(
      (1L, "a b c d e f"),   // first: all novel
      (2L, "a b c d e f"),   // exact copy: nothing novel
      (3L, "p q r s t u")    // disjoint: all novel
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, "text", "doc_id", 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out == Seq((1L, 4L, 4L, 1.0), (2L, 4L, 0L, 0.0),
      (3L, 4L, 4L, 1.0)), s"got: $out")
  }

  test("pmiPairs: perfect collocation scores ln(N/c), stopword-class words cut by maxDf") {
    // "alpha beta" always co-occur (4 docs of N=8): pmi = ln(8·4/(4·4)) = ln 2.
    // "the" appears in every doc: with maxDf=6 its pairs vanish.
    val docs = (1L to 4L).map(i => (i, "alpha beta the")) ++
      (5L to 8L).map(i => (i, "gamma the"))
    val out = TextAnalysis.pmiPairs(docs.toDF("doc_id", "text"), "text",
        "doc_id", minPairCount = 2, maxDf = 6)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(("alpha", "beta")), s"got: $out")
    val ln2r4 = BigDecimal(math.log(2.0))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(("alpha", "beta")) == ((4L, ln2r4)),
      s"got: ${out(("alpha", "beta"))}, want (4, $ln2r4)")
  }

  test("noveltyScore: partial overlap scores the unseen fraction only") {
    val docs = Seq(
      (1L, "a b c d"),       // shingles: abc, bcd
      (2L, "a b c x")        // shingles: abc (seen), bcx (novel) → 1/2
    ).toDF("doc_id", "text")
    val out = TextAnalysis.noveltyScore(docs, "text", "doc_id", 3)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    assert(out(1) == ((2L, 2L, 1L, 0.5)), s"got: $out")
  }

  test("dictionaryTag: case-folded matches with positions; non-terms silent") {
    val docs = Seq((1L, "Spark JOIN is a join"), (2L, "nothing here"))
      .toDF("doc_id", "text")
    val dict = Seq(("join", "kw"), ("SPARK", "engine"), ("ghost", "x"))
      .toDF("term", "tag")
    val out = TextAnalysis.dictionaryTag(docs, "text", "doc_id",
        dict, "term", "tag")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getString(3))).toSet
    assert(out == Set((1L, 0L, "spark", "engine"), (1L, 1L, "join", "kw"),
      (1L, 4L, "join", "kw")), s"got: $out")
  }

  test("compressionRatio: redundancy orders ratios; empty text emits NULL") {
    val repetitive = Array.fill(200)("the same phrase again").mkString(" ")
    // java.util.Random's LCG is specified by the JLS — deterministic
    // across JVMs; printable-range noise is near-incompressible
    val rnd = new scala.util.Random(42)
    val noisy = (0 until 800).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    val docs = Seq((1L, repetitive), (2L, noisy), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.compressionRatio(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    val (nb1, nc1, Some(r1)) = out(1L)
    val (nb2, _, Some(r2)) = out(2L)
    assert(nb1 == repetitive.getBytes("UTF-8").length.toLong)
    assert(nc1 < nb1 / 10, s"repetition must compress hard: $nc1 of $nb1")
    assert(r1 < r2 - 2000,
      s"repetitive must sit far below noisy: $r1 vs $r2")
    assert(r2 > 5000, s"near-random text barely compresses: $r2")
    assert(nb2 == 800L)
    // the empty stream still costs the zlib header/trailer — reported
    // honestly; only the RATIO is pinned NULL
    assert(out(3L)._1 == 0L && out(3L)._3.isEmpty, s"empty doc: ${out(3L)}")
  }

  test("entropyCodedSize: hand-computed order-0 sizes; empty/uniform docs; ratio ordering matches zlib's axis") {
    // "aabb": each char costs (ln4 - ln2)/ln2 = exactly 1 bit -> 4 bits
    // -> ceil(4/8) = 1 byte; "abcd": 2 bits each -> 8 bits -> 1 byte;
    // "aaaa": 0 bits -> 0 bytes; "": NULL ratio, 0 bytes
    val docs = Seq((1L, "aabb"), (2L, "abcd"), (3L, "aaaa"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.entropyCodedSize(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    assert(out(1L) == ((4L, 1L, Some(2500L))), s"aabb: ${out(1L)}")
    assert(out(2L) == ((4L, 1L, Some(2500L))), s"abcd: ${out(2L)}")
    assert(out(3L) == ((4L, 0L, Some(0L))), s"aaaa: ${out(3L)}")
    assert(out(4L) == ((0L, 0L, None)), s"empty: ${out(4L)}")
    // same quality axis as the zlib kernel: repetitive text sits far
    // below printable noise (the compressionRatio spec's corpus)
    val repetitive = Array.fill(200)("the same phrase again").mkString(" ")
    val rnd = new scala.util.Random(42)
    val noisy = (0 until 800).map(_ => (rnd.nextInt(94) + 33).toChar).mkString
    val big = Seq((1L, repetitive), (2L, noisy)).toDF("doc_id", "text")
    val r = TextAnalysis.entropyCodedSize(big, "text", "doc_id")
      .collect().map(x => x.getLong(0) -> x.getLong(3)).toMap
    assert(r(1L) < r(2L) - 2000, s"repetitive far below noisy: $r")
    // multibyte UTF-8: n_bytes counts octets, the model counts chars
    val mb = Seq((1L, "éé")).toDF("doc_id", "text")
    val m = TextAnalysis.entropyCodedSize(mb, "text", "doc_id").collect().head
    assert(m.getLong(1) == 4L && m.getLong(2) == 0L && m.getLong(3) == 0L)
  }

  test("scriptMix: astral-plane codepoints count once and land in other") {
    // emoji are outside every BMP class; both engines count CODEPOINTS
    // (not UTF-16 units), so one emoji = one n_other, never two
    val docs = Seq((1L, "ab 😀😀")).toDF("doc_id", "text")
    val r = TextAnalysis.scriptMix(docs, "text", "doc_id").collect().head
    assert(r.getLong(1) == 2L, "latin")
    assert(r.getLong(6) == 4L, s"nonspace must count codepoints: ${r.getLong(6)}")
    assert(r.getLong(7) == 2L, s"two emoji → two other: ${r.getLong(7)}")
  }

  test("scriptMix: hand-counted classes, residual other, zero-text NULL share") {
    val docs = Seq(
      (1L, "ab1 Жи 中文中 س é"), // 2 latin, 1 digit, 2 cyr, 3 cjk, 1 arabic,
                                   // é = other; nonspace = 10
      (2L, ""),                    // empty → all zero, latin_bp NULL
      (3L, "abcd")                 // pure latin → 10000 bp
    ).toDF("doc_id", "text")
    val rows = TextAnalysis.scriptMix(docs, "text", "doc_id")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6), r.getLong(7),
          if (r.isNullAt(8)) None else Some(r.getLong(8))))).toMap
    assert(rows(1L) == ((2L, 1L, 2L, 3L, 1L, 10L, 1L, Some(2000L))),
      s"got: ${rows(1L)}")
    assert(rows(2L) == ((0L, 0L, 0L, 0L, 0L, 0L, 0L, None)))
    assert(rows(3L) == ((4L, 0L, 0L, 0L, 0L, 4L, 0L, Some(10000L))))
  }

  test("featureHash: identical docs get identical vectors; repeats scale the sum") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "alpha alpha alpha")).toDF("doc_id", "text")
    val out = TextAnalysis.featureHash(docs, "text", "doc_id", dim = 64)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val d1 = out.filter(_._1._1 == 1L).map { case ((_, i), v) => i -> v }
    val d2 = out.filter(_._1._1 == 2L).map { case ((_, i), v) => i -> v }
    assert(d1 == d2, "same text, same hashed vector")
    // doc 3: one token thrice -> a single feature with |f_sum| = 3
    val d3 = out.filter(_._1._1 == 3L).values.toSeq
    assert(d3.map(math.abs) == Seq(3L), s"got: $d3")
    out.foreach { case ((_, i), _) => assert(i >= 0 && i < 64) }
  }

  test("featureHash: opposite-signed colliding tokens cancel and drop") {
    // brute-force two tokens that land in the same bucket with opposite
    // signs under the md5 lane at dim=8, then assert their doc vanishes
    def h32(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      (0 until 8).map { i =>
        val d = Character.digit(md.charAt(i), 16).toLong
        d * (1L << (4 * (7 - i)))
      }.sum
    }
    val cands = (1 to 500).map(i => s"t$i")
    val byBucket = cands.groupBy(t => h32(t) % 8)
    val pair = byBucket.values.flatMap { ts =>
      val plus = ts.find(t => (h32(t) >> 20) % 2 == 0)
      val minus = ts.find(t => (h32(t) >> 20) % 2 == 1)
      for (p <- plus; m <- minus) yield (p, m)
    }.headOption
    assert(pair.nonEmpty, "fixture must contain a cancelling pair")
    val (p, m) = pair.get
    val docs = Seq((1L, s"$p $m")).toDF("doc_id", "text")
    assert(TextAnalysis.featureHash(docs, "text", "doc_id", dim = 8)
      .count() == 0L, s"pair ($p,$m) must cancel to an empty vector")
  }

  test("linearScore: zero weights yield the bias; missing weights contribute 0") {
    val docs = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    val feats = TextAnalysis.featureHash(docs, "text", "doc_id", dim = 16)
    val zeroW = spark.range(16).selectExpr("id AS idx", "CAST(0 AS LONG) AS w")
    val out = TextAnalysis.linearScore(feats, zeroW, "idx", "w", biasMicro = 7L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out == Map(1L -> ((7L, true)), 2L -> ((7L, true))), s"got: $out")
    // an EMPTY weight table (every feature unweighted) also folds to bias
    val emptyW = spark.range(0).selectExpr("id AS idx", "id AS w")
    val out2 = TextAnalysis.linearScore(feats, emptyW, "idx", "w",
      biasMicro = -3L).collect().map(r => r.getLong(1)).toSet
    assert(out2 == Set(-3L))
  }

  test("linearScoreScan == featureHash+linearScore on random corpora; null/empty edge contract") {
    // property: feature grouping distributes over addition, so the
    // zero-shuffle scan must produce the join form's logit EXACTLY on
    // every doc the join form emits; docs the join form drops (no tokens,
    // or a fully-cancelled feature vector) must score exactly `bias`;
    // NULL text must score NULL (and only NULL text may)
    val rnd = new scala.util.Random(42)
    val vocab = (1 to 30).map(i => s"w$i")
    val dim = 16
    val bias = 7919L
    val weightsMicro: Seq[Long] = Seq.fill(dim)(rnd.nextLong() % 1000L)
    val docs = ((1 to 60).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens — includes tokenless docs
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    } ++ Seq((100L, null: String), (101L, ""), (102L, "   ")))
      .toDF("doc_id", "text")

    val scan = TextAnalysis.linearScoreScan(docs, "text", "doc_id",
        weightsMicro, bias)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getBoolean(2)))))
      .toMap
    val wTab = weightsMicro.zipWithIndex
      .map { case (w, i) => (i.toLong, w) }.toDF("idx", "w")
    val joined = TextAnalysis.linearScore(
        TextAnalysis.featureHash(docs, "text", "doc_id", dim),
        wTab, "idx", "w", bias)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2))))
      .toMap

    assert(scan.size == 63, "the scan form scores every row, null text included")
    assert(joined.nonEmpty, "fixture must produce join-form rows")
    joined.foreach { case (doc, lv) =>
      assert(scan(doc).contains(lv), s"doc $doc: scan=${scan(doc)} join=$lv")
    }
    (scan.keySet -- joined.keySet - 100L).foreach { doc =>
      assert(scan(doc).exists(_._1 == bias),
        s"doc $doc absent from the join form must fold to bias: ${scan(doc)}")
    }
    assert(scan(100L).isEmpty, "NULL text scores NULL in the scan form")
    assert(!joined.contains(100L), "NULL text emits no join-form row")
    Seq(101L, 102L).foreach { doc =>
      assert(scan(doc).contains((bias, true)), s"tokenless doc $doc scores bias")
      assert(!joined.contains(doc), "tokenless docs emit no join-form row")
    }
  }

  test("nbAccuracy: separable vocab classifies held-out perfectly; partition-invariant") {
    import spark.implicits._
    // ids chosen so the Knuth 80% split puts both classes in train AND test;
    // class vocabularies are disjoint -> held-out accuracy must be 10000 bp
    val docs = (0 until 40).map { i =>
      val en = i % 2 == 0
      val text = if (en) "the quick brown fox" else "der schnelle braune fuchs"
      (i.toLong, text, en)
    }.toDF("doc_id", "text", "is_en")
    val r = graft.operators.TextAnalysis.nbAccuracy(docs, "text", "doc_id",
      "is_en", trainPct = 80).as[(Long, Long, Long)].collect().head
    assert(r._1 > 0 && r._2 == r._1 && r._3 == 10000L, s"got $r")
    val r7 = graft.operators.TextAnalysis.nbAccuracy(docs.repartition(7),
      "text", "doc_id", "is_en", trainPct = 80)
      .as[(Long, Long, Long)].collect().head
    assert(r7 == r, "accuracy must not depend on partitioning")
  }

  test("readability: hand-computed Flesch milli; sentence floor; tokenless NULL") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat. it purred!"),   // W=5, S=2, Syl: e,a,a,i,u,e -> 6
      (2L, "no terminal punctuation here"), // W=4, S=1(floor), Syl: o,e,i,a,u,ua,io,e,e -> 9
      (3L, "")                            // tokenless -> NULL score
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.readability(docs, "text", "doc_id")
      .orderBy("doc").collect()
    val d1 = r(0)
    assert((d1.getLong(1), d1.getLong(2), d1.getLong(3)) == ((5L, 2L, 6L)))
    // 206835 - (1015*5) div 2 - (84600*6) div 5 = 206835 - 2537 - 101520
    assert(d1.getLong(4) == 102778L)
    assert(r(1).getLong(2) == 1L, "sentence count floors at 1")
    assert(r(2).isNullAt(4), "tokenless doc has no defined score")
  }

  test("vocabularyRichness: hand-computed Chao1 and Good–Turing mass, f2=0 fallback") {
    // g1: counts a=2, b=1, c=1 → N=4, V=3, f1=2, f2=1 →
    //   chao1 = 3 + 4 div 2 = 5; unseen = 10000·2 div 4 = 5000
    // g2: all singletons (x, y) → f2=0 → bias-corrected
    //   chao1 = 2 + (2·1) div 2 = 3; unseen = 10000
    val docs = Seq(("g1", "a a b"), ("g1", "c"), ("g2", "x y"))
      .toDF("src", "text")
    val out = TextAnalysis.vocabularyRichness(docs, "text", "src")
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6)))).toMap
    assert(out("g1") == ((4L, 3L, 2L, 1L, 5L, 5000L)), s"g1: ${out("g1")}")
    assert(out("g2") == ((2L, 2L, 2L, 0L, 3L, 10000L)), s"g2: ${out("g2")}")
  }

  test("kneserNeyBigram: exact rationals, per-context mass sums to 1") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a b"), (3L, "a c")).toDF("doc_id", "text")
    val out = TextAnalysis.kneserNeyBigram(docs, "text")
      .orderBy("w1", "w2")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // c12(a,b)=2, c12(a,c)=1; c1=3, nf(a)=2, nc(b)=nc(c)=1, nt=2
    // p(b|a) = (max(8-3,0)*2 + 3*2*1)/(4*3*2) = 16/24; p(c|a) = 8/24
    assert(out.toSeq == Seq(("a", "b", 2L, 0.666667), ("a", "c", 1L, 0.333333)),
      out.toSeq.toString)
    assert(math.abs(out.map(_._4).sum - 1.0) < 1e-5)
  }

  test("sourceJsDivergence: identical sources give 0, disjoint give ln 2") {
    import spark.implicits._
    val same = Seq((1L, "x y", "a"), (2L, "x y", "b"))
      .toDF("doc_id", "text", "source")
    val r1 = TextAnalysis.sourceJsDivergence(same, "text", "source")
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    assert(r1.toSeq == Seq(("a", 0.0), ("b", 0.0)), r1.toSeq.toString)
    val disj = Seq((1L, "x x", "a"), (2L, "y y", "b"))
      .toDF("doc_id", "text", "source")
    val r2 = TextAnalysis.sourceJsDivergence(disj, "text", "source")
      .orderBy("source")
      .collect().map(r => (r.getString(0), r.getDouble(3)))
    // the JSD upper bound: completely disjoint vocabularies
    assert(r2.toSeq == Seq(("a", 0.693147), ("b", 0.693147)),
      r2.toSeq.toString)
  }
}
