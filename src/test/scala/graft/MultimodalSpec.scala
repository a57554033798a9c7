package graft

import graft.operators.{Multimodal, Similarity}
import org.apache.spark.sql.functions._

/** The media lane beyond the oracle queries: feature extraction must
  * produce unit-norm deterministic vectors that feed the Similarity
  * operators unchanged, and resize planning must fit-without-upscaling
  * from metadata alone. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._
  implicit val sp: org.apache.spark.sql.SparkSession = spark

  private def media = Multimodal.withPayload(
    Seq(
      (1L, "the quick brown fox"),
      (2L, "the quick brown fox"), // identical content to 1
      (3L, "completely different words here"),
      (4L, "")                     // empty payload edge
    ).toDF("doc_id", "text"), "text", "doc_id")

  test("extractFeatures: deterministic, unit-norm, empty payload safe") {
    val f1 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.doc_id)
    val f2 = Multimodal.extractFeatures(media, dim = 16).collect().sortBy(_.doc_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq,
      "feature extraction must be deterministic")
    f1.filter(_.doc_id != 4L).foreach { m =>
      val n = math.sqrt(m.features.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"doc ${m.doc_id} not unit-norm: $n")
    }
    // empty payload: all-zero vector, not NaN
    val empty = f1.find(_.doc_id == 4L).get.features
    assert(empty.forall(_ == 0f), "empty payload must be the zero vector, never NaN")
    // identical payloads → identical vectors; different content differs
    assert(f1(0).features.toSeq == f1(1).features.toSeq)
    assert(f1(0).features.toSeq != f1(2).features.toSeq)
  }

  test("extracted features feed the Similarity family unchanged (composition)") {
    val feats = Multimodal.extractFeatures(media, dim = 16).toDF()
    val top = Similarity.bruteForceTopK(feats, "features", "doc_id",
      queryId = 1L, k = 2).collect()
    // doc 2 (identical content) must be the top hit at cosine 1.0
    assert(top.head.getLong(0) == 2L)
    assert(top.head.getDouble(1) == 1.0)
  }

  test("resizePlan: aspect-preserving fit, never upscales, metadata only") {
    val meta = Seq(
      Multimodal.MediaMeta(1L, 100L, 640, 480, 10),  // downscale 2x
      Multimodal.MediaMeta(2L, 100L, 200, 100, 10),  // inside the box
      Multimodal.MediaMeta(3L, 100L, 1000, 100, 10)  // width-bound
    ).toDS()
    val plans = Multimodal.resizePlan(meta, maxW = 320, maxH = 240)
      .collect().sortBy(_.doc_id)
    assert(plans(0).out_w == 320 && plans(0).out_h == 240 && plans(0).scale == 0.5)
    assert(plans(1).out_w == 200 && plans(1).out_h == 100 && plans(1).scale == 1.0,
      "an image already inside the box must not upscale")
    assert(plans(2).out_w == 320 && plans(2).out_h == 32)
    // aspect ratio preserved within integer floor
    plans.foreach(p => assert(math.abs(
      p.out_w.toDouble / p.out_h - p.width.toDouble / p.height) < 0.15))
  }
}
