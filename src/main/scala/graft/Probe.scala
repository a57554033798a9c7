package graft

import graft.expressions.Exprs
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiling harness: times individual pipeline stages at a chosen
  * scale factor. Not part of the driver contract. */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.load(spark, d, "documents")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
    }
    def timeNoop(name: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"$name%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (noop)")
    }
    val sh = docs.select(col("doc_id").as("doc"),
      explode(Exprs.wordShingles(col("text"), 3)).as("shingle"))
    time("shingles_raw") { sh.count() }
    val shd = sh.distinct()
    time("shingles_distinct") { shd.count() }
    val withH = shd.select(col("doc"),
      conv(substring(md5(col("shingle")), 1, 15), 16, 10).cast("long").as("h1"),
      conv(substring(md5(col("shingle")), 16, 10), 16, 10).cast("long").as("h2"))
    val aggs = (0 until 16).map(j => min(col("h1") + lit(j.toLong) * col("h2")).as(s"mh$j"))
    val sig = withH.groupBy("doc").agg(aggs.head, aggs.tail: _*)
    time("signatures") { sig.count() }
    val bands = operators.Dedup.minhashBands(docs, "text", "doc_id")
    time("bands") { bands.count() }
    val a = bands.select(col("band"), col("band_key"), col("doc").as("id_a"))
    val bb = bands.select(col("band"), col("band_key"), col("doc").as("id_b"))
    val cand = a.join(bb, Seq("band", "band_key")).filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    time("candidates") { cand.count() }
    timeNoop("full_minhash") { operators.Dedup.minhashNearDups(docs, "text", "doc_id") }
    timeNoop("ngram_jaccard") { operators.Dedup.ngramJaccardPairs(docs, "text", "doc_id", 3, 0.2) }
    timeNoop("simhash") { operators.Dedup.simhash(docs, "text", "doc_id") }
    spark.stop()
  }
}
