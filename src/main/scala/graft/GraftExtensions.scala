package graft

import graft.expressions.{CosineSimilarity, WordShingles}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL-surface registration for the native expressions:
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * makes `cosine_sim(a, b)` and `word_shingles(text, n)` available to
  * `spark.sql(...)` — the engine's equivalent of the reference's SQL UDF
  * config (samza.sql UDFs, SURVEY.md §2.3 P6-P7). The Column API
  * (graft.expressions.Exprs) works without any session config.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** The injected function set, exposed so a live session can register the
    * SAME builders at runtime (ColumnBridge.registerNativeFunction) and so
    * specs evaluate them end-to-end without building a fresh session. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "cosine_sim(arrayFloat, arrayFloat)")
        CosineSimilarity(args(0), args(1))
      }),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "word_shingles(text, n)")
        val n = args(1) match {
          case Literal(v: Int, _) => v
          case other => other.eval().asInstanceOf[Number].intValue()
        }
        WordShingles(args(0), n)
      }),
    (FunctionIdentifier("hamming_dist"),
      new ExpressionInfo(classOf[graft.expressions.HammingDistance].getName, "hamming_dist"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "hamming_dist(bitsA, bitsB)")
        graft.expressions.HammingDistance(args(0), args(1))
      }),
    (FunctionIdentifier("jaro_winkler"),
      new ExpressionInfo(classOf[graft.expressions.JaroWinkler].getName, "jaro_winkler"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "jaro_winkler(a, b)")
        graft.expressions.JaroWinkler(args(0), args(1))
      }),
    (FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[graft.expressions.NfcNormalize].getName, "nfc_normalize"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "nfc_normalize(text)")
        graft.expressions.NfcNormalize(args(0))
      }))

  /** Runtime registration on a live session — same builders the build-time
    * extension injects. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit =
    functions.foreach { case (id, _, builder) =>
      org.apache.spark.sql.graft.ColumnBridge.registerNativeFunction(spark, id.funcName, builder)
    }
}
