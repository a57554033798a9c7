package graft

import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Batch-perceptron contracts: the synchronous update rule matches a
  * sequential reference exactly, zero-init makes round 1 update on every
  * document, the returned model is the audit's weights, and the curve is
  * partitioning-invariant. */
class PerceptronSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  // deterministic token -> (idx, sign) via the same md5 lane featureHash uses
  private def hashOf(tok: String): Long =
    java.security.MessageDigest.getInstance("MD5")
      .digest(tok.getBytes("UTF-8")).take(4)
      .foldLeft(0L)((acc, b) => (acc << 8) | (b & 0xffL))

  /** Sequential reference of the full batch training loop. */
  private def refTrain(docs: Seq[(Long, String, Boolean)], rounds: Int)
      : Seq[(Long, Long, Long, Long)] = {
    val feats = docs.map { case (id, text, _) =>
      val fs = text.split("\\s+").filter(_.nonEmpty)
        .map(tok => { val h = hashOf(tok); (h % dim, 1L - 2L * ((h >> 20) % 2)) })
        .groupBy(_._1).map { case (i, xs) => i -> xs.map(_._2).sum }
        .filter(_._2 != 0L)
      id -> fs
    }.toMap
    val ys = docs.map { case (id, _, pos) => id -> (if (pos) 1L else -1L) }.toMap
    val w = Array.fill(dim)(0L)
    var bias = 0L
    (1 to rounds).map { r =>
      val mis = docs.map(_._1).filter { id =>
        val s = feats(id).map { case (i, f) => f * w(i.toInt) }.sum + bias
        ys(id) * s <= 0L
      }
      for (id <- mis; (i, f) <- feats(id)) w(i.toInt) += ys(id) * f
      bias += mis.map(ys).sum
      (r.toLong, mis.size.toLong, w.map(math.abs).sum, bias)
    }
  }

  private val corpus = Seq(
    (1L, "alpha beta alpha", true),
    (2L, "gamma delta", false),
    (3L, "alpha beta beta epsilon", true),
    (4L, "delta delta zeta", false),
    (5L, "beta epsilon", true),
    (6L, "zeta gamma gamma", false),
    (7L, "alpha epsilon epsilon", true),
    (8L, "eta theta", false))

  test("audit curve equals the sequential batch-update reference round for round") {
    val df = corpus.toDF("doc_id", "text", "is_pos")
    val got = TextAnalysis.trainPerceptron(df, "text", "doc_id", "is_pos",
        dim, rounds = 4)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == refTrain(corpus, 4))
  }

  test("round 1 misclassifies every document (zero-init margin 0)") {
    val df = corpus.toDF("doc_id", "text", "is_pos")
    val r1 = TextAnalysis.trainPerceptron(df, "text", "doc_id", "is_pos",
      dim, rounds = 1).collect()(0)
    assert(r1.getLong(1) == corpus.size.toLong)
  }

  test("perceptronWeights is the audit's final model: l1 and bias agree; scores separate the fixture") {
    val df = corpus.toDF("doc_id", "text", "is_pos")
    val model = TextAnalysis.perceptronWeights(df, "text", "doc_id", "is_pos",
      dim, rounds = 6)
    assert(model.size == dim + 1, "dim weights + trailing bias entry")
    val audit = TextAnalysis.trainPerceptron(df, "text", "doc_id", "is_pos",
      dim, rounds = 6).orderBy(col("round").desc).collect()(0)
    assert(model.dropRight(1).map(p => math.abs(p._2)).sum == audit.getLong(2))
    assert(model.last == ((dim.toLong, audit.getLong(3))))
    // the model drives linearScore: the tiny fixture is separable, so after
    // 6 rounds training accuracy is perfect
    val weights = model.dropRight(1).toDF("feature_idx", "w")
    val scored = TextAnalysis.linearScore(
        TextAnalysis.featureHash(df, "text", "doc_id", dim),
        weights, "feature_idx", "w", biasMicro = model.last._2)
      .join(df.select(col("doc_id").as("doc"), col("is_pos")), Seq("doc"))
    assert(scored.filter(col("predicted") =!= col("is_pos")).count() == 0L)
  }

  test("partitioning invariance: 1 vs 7 partitions give identical curves") {
    val df = corpus.toDF("doc_id", "text", "is_pos")
    val a = TextAnalysis.trainPerceptron(df.coalesce(1), "text", "doc_id",
      "is_pos", dim, 3).orderBy("round").collect().toSeq
    val b = TextAnalysis.trainPerceptron(df.repartition(7), "text", "doc_id",
      "is_pos", dim, 3).orderBy("round").collect().toSeq
    assert(a == b)
  }
}
