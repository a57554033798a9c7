package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming curation gate: the batch curation kernels applied at ingest.
  * Each micro-batch must apply the SAME quality/lang/sampling decisions as
  * the batch oracle queries (pure projections), and exact dedup must drop
  * a within-watermark duplicate arriving in a LATER micro-batch (state
  * carries across batches, bounded by the watermark). */
class CurationStreamSpec extends SparkSpec {
  import spark.implicits._
  implicit def sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

  case class Doc(doc_id: Long, text: String, ev_ts: java.sql.Timestamp)

  private val prose =
    "the quick brown fox jumps over the lazy dog and then it was a very " * 8

  test("gate keeps quality English prose, drops low-quality/wrong-lang/duplicate docs") {
    val in = MemoryStream[Doc]
    val out = CurationStream.curationGate(in.toDF(), "text", "doc_id", "ev_ts",
      minQuality = 0.5, wantLang = "en", keepPct = 100,
      dedupWatermark = "10 minutes")
    val q = out.writeStream.format("memory").queryName("t_cgate")
      .outputMode("append").start()

    in.addData(
      Doc(1L, prose + "first unique document", ts(1000)),
      Doc(2L, "x", ts(1001)), // low quality: one-char fragment
      Doc(3L, "der die das und ist nicht von mit auf ein " * 10, ts(1002))) // German
    q.processAllAvailable()
    // duplicate of doc 1's text arrives in a LATER micro-batch — the
    // fingerprint state must still be live (within the watermark) and drop it
    in.addData(Doc(4L, prose + "first unique document", ts(1010)),
      Doc(5L, prose + "a second unique document", ts(1011)))
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("t_cgate").select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 5L),
      s"expected only the two unique quality English docs, got $kept")
    // the gate surfaces its decisions: quality and predicted language ride along
    val cols = spark.table("t_cgate").columns.toSeq
    assert(cols == Seq("doc_id", "ev_ts", "quality", "lang_pred", "fp"))
  }

  test("incremental near-dup: index collisions across batches, within-batch earlier id wins") {
    val tmp = java.nio.file.Files.createTempDirectory("neardup").toString
    val in = MemoryStream[Doc]
    val q = CurationStream.nearDupIngest(in.toDF(), "text", "doc_id",
      s"$tmp/index", s"$tmp/flags", s"$tmp/ckpt")

    // batch 1: doc 1 is the original; doc 2 is its near-dup IN THE SAME
    // batch (the index can't know it yet — the self-join must)
    in.addData(
      Doc(1L, prose + "original tail", ts(1000)),
      Doc(2L, prose + "original tail edited", ts(1001)))
    q.processAllAvailable()
    // batch 2: doc 3 near-dups doc 1 ACROSS batches (via the stored
    // index); doc 4 is unrelated
    in.addData(
      Doc(3L, prose + "original tail third copy", ts(1010)),
      Doc(4L, "entirely different content with nothing shared at all xyzzy " * 10, ts(1011)))
    q.processAllAvailable()
    q.stop()

    val flags = spark.read.parquet(s"$tmp/flags")
      .select("doc", "is_dup", "matched_doc")
      .as[(Long, Boolean, Option[Long])].collect()
      .map { case (k, v, m) => k -> (v, m) }.toMap
    assert(flags(1L) == (false, None), s"the original must be clean: $flags")
    assert(flags(2L) == (true, Some(1L)), s"within-batch dup must match the earlier id: $flags")
    assert(flags(3L)._1 && flags(3L)._2.contains(1L),
      s"cross-batch dup must collide through the stored index: $flags")
    assert(flags(4L) == (false, None), s"unrelated doc must stay clean: $flags")
    // the index now carries bands for all four docs — the batch pipeline's
    // shared artifact, not executor state
    assert(spark.read.parquet(s"$tmp/index").select("doc").distinct().count() == 4)
  }

  test("nearDupStep: a retried batch (bands already appended) reproduces identical flags") {
    // Simulates a foreachBatch retry: the first attempt appended the
    // batch's bands to the index before failing downstream; the re-run
    // must NOT find the batch's own first-attempt bands and flag the
    // earlier member of a within-batch pair (which would drop both copies).
    val tmp = java.nio.file.Files.createTempDirectory("neardup-retry").toString
    val batch = Seq(
      (1L, prose + "original tail"),
      (2L, prose + "original tail edited")).toDF("doc_id", "text")
    val first = CurationStream.nearDupStep(batch, "text", "doc_id", s"$tmp/index")
      .orderBy("doc").select("doc", "is_dup").as[(Long, Boolean)].collect().toSeq
    val retry = CurationStream.nearDupStep(batch, "text", "doc_id", s"$tmp/index")
      .orderBy("doc").select("doc", "is_dup").as[(Long, Boolean)].collect().toSeq
    assert(first == Seq((1L, false), (2L, true)),
      s"first attempt: earlier id clean, later id flagged: $first")
    assert(retry == first,
      s"the retry must ignore the batch's own stored bands: $retry != $first")
  }

  test("nearDupStep: a re-ingested id's OLD bands still catch another doc duplicating them") {
    // batch 1: doc 1 carries text X. batch 2 re-ingests id 1 with NEW text
    // Y and brings doc 2 carrying the old text X. The band-row-level anti
    // (not an id-level one) must keep doc 1's stored X bands visible so
    // doc 2 flags against them — while doc 1 itself (matching only its own
    // old rows) stays clean.
    val tmp = java.nio.file.Files.createTempDirectory("neardup-reuse").toString
    val textX = prose + "original tail"
    val textY = "entirely different fresh content with nothing shared at all xyzzy " * 10
    CurationStream.nearDupStep(
      Seq((1L, textX)).toDF("doc_id", "text"), "text", "doc_id", s"$tmp/index").count()
    val second = CurationStream.nearDupStep(
      Seq((1L, textY), (2L, textX + " tiny edit")).toDF("doc_id", "text"),
      "text", "doc_id", s"$tmp/index")
      .orderBy("doc").select("doc", "is_dup", "matched_doc")
      .as[(Long, Boolean, Option[Long])].collect().toSeq
    assert(second == Seq((1L, false, None), (2L, true, Some(1L))),
      s"doc 2 must flag against id 1's OLD stored bands: $second")
  }

  test("sampling hash drops the same ids on a stream as in batch") {
    val in = MemoryStream[Doc]
    // keepPct = 30: exactly the ids the batch q_sampling keep-rule selects
    val out = CurationStream.curationGate(in.toDF(), "text", "doc_id", "ev_ts",
      minQuality = 0.0, wantLang = "en", keepPct = 30,
      dedupWatermark = "1 minute")
    val q = out.writeStream.format("memory").queryName("t_csample")
      .outputMode("append").start()
    val ids = (1L to 200L)
    in.addData(ids.map(i => Doc(i, prose + s"unique tail $i", ts(1000 + i))): _*)
    q.processAllAvailable()
    q.stop()

    val kept = spark.table("t_csample").select("doc_id").as[Long].collect().toSet
    val expected = ids.filter(i => math.floorMod(
      math.floorMod(i, 1000003L) * 2654435761L, 100L) < 30).toSet
    assert(kept == expected, "stream and batch must sample identical id sets")
    assert(kept.nonEmpty && kept.size < ids.size, "the 30% cut must be a real subset")
  }

  test("mixtureGate admits exactly the rows the batch allocationSample would") {
    val plan = Seq(("web", 7000L), ("books", 2500L)).toDF("source", "rate_bp")
    val rows = (0 until 300).map(i =>
      (i.toLong, Seq("web", "books", "forums")(i % 3)))
    val in = MemoryStream[(Long, String)]
    val q = CurationStream.mixtureGate(in.toDS().toDF("doc_id", "source"),
        "doc_id", "source", plan, "source", "rate_bp")
      .writeStream.format("memory").queryName("t_mixgate")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(150)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("t_mixgate")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val batch = graft.operators.Curation.allocationSample(
        rows.toDF("doc_id", "source"), "doc_id", "source",
        plan, "source", "rate_bp")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(streamed == batch,
      "live ingest, replay, and batch backfill must admit identical rows")
    assert(batch.nonEmpty && !batch.exists(_._2 == "forums"),
      s"unplanned sources must ship nothing: ${batch.filter(_._2 == "forums")}")
  }

  test("classifierGate: stream == batch, stateless (no state store), NULL text drops") {
    val rnd = new scala.util.Random(7)
    val weights: Seq[Long] = Seq.fill(32)(rnd.nextLong() % 500000L)
    val bias = -100000L
    val minLogit = 0L
    val vocab = (1 to 20).map(i => s"tok$i")
    val docs = (1 to 80).map { i =>
      Doc(i.toLong, Seq.fill(1 + rnd.nextInt(15))(
        vocab(rnd.nextInt(vocab.size))).mkString(" "), ts(1000 + i))
    } ++ Seq(Doc(200L, null, ts(2000)), Doc(201L, "", ts(2001)))

    val in = MemoryStream[Doc]
    val q = CurationStream.classifierGate(in.toDF(), "text", "doc_id",
        weights, bias, minLogit)
      .writeStream.format("memory").queryName("t_clfgate")
      .outputMode("append").start()
    try {
      val (b1, b2) = docs.splitAt(40)
      in.addData(b1: _*); q.processAllAvailable()
      in.addData(b2: _*); q.processAllAvailable()
      // the gate's whole point: a pure projection+filter carries NO state
      // store — the docstring contract the join form silently broke
      assert(q.lastProgress.stateOperators.isEmpty,
        s"classifierGate must be stateless: ${q.lastProgress.stateOperators.mkString(",")}")
    } finally q.stop()

    val streamed = spark.table("t_clfgate")
      .select("doc_id", "logit_micro")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val batch = CurationStream.classifierGate(
        docs.map(d => (d.doc_id, d.text, d.ev_ts))
          .toDF("doc_id", "text", "ev_ts"),
        "text", "doc_id", weights, bias, minLogit)
      .select("doc_id", "logit_micro")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(streamed == batch,
      s"stream and batch must admit identical rows with identical logits")
    assert(batch.nonEmpty && batch.size < docs.size,
      "the threshold must be a real cut on this fixture")
    assert(!streamed.contains(200L), "NULL text must never pass the gate")
    // kept rows carry the full input row shape plus the score
    assert(spark.table("t_clfgate").columns.toSeq ==
      Seq("doc_id", "text", "ev_ts", "logit_micro"))
  }

  test("linkIngest: batches link against the stored reference; appendLinkIndex grows it between batches") {
    import graft.operators.Dedup
    val tmp = java.nio.file.Files.createTempDirectory("linkingest").toString
    val ref = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated reference content about engines here"))
      .toDF("doc_id", "text")
    Dedup.buildLinkIndex(ref, "text", "doc_id", s"$tmp/index")
    val in = MemoryStream[Doc]
    val q = CurationStream.linkIngest(in.toDF(), "text", "doc_id",
      s"$tmp/index", s"$tmp/matches", s"$tmp/ckpt", maxDist = 10)
    // batch 1: one near-match of reference 1, one unrelated row
    in.addData(
      Doc(11L, "the quick brown fox jumps over the lazy dog tonite", ts(1000)),
      Doc(12L, "nothing shared with any reference row at all zyxw quux", ts(1001)))
    q.processAllAvailable()
    // the reference grows BETWEEN batches — visible to the next one
    Dedup.appendLinkIndex(
      Seq((3L, "brand new reference row with a unique tail alpha"))
        .toDF("doc_id", "text"), "text", "doc_id", s"$tmp/index")
    in.addData(
      Doc(13L, "brand new reference row with a unique tail betaa", ts(1010)))
    q.processAllAvailable(); q.stop()
    val matches = spark.read.parquet(s"$tmp/matches")
      .select("id_l", "id_r").as[(Long, Long)].collect().toSet
    assert(matches.contains((1L, 11L)), s"batch-1 near-match expected: $matches")
    assert(!matches.exists(_._2 == 12L), s"unrelated row must not link: $matches")
    assert(matches.contains((3L, 13L)),
      s"post-append reference must link in the NEXT batch: $matches")
  }
}
