package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.load(spark, d, "documents")
    docs.count()
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-28s ${(System.nanoTime()-t0)/1e9}%6.2f s  rows=$n")
    }
    val sh = docs.select(col("doc_id").as("doc"), explode(shingles(col("text"), 3)).as("shingle")).distinct()
    time("shingles_distinct") { sh.count() }
    time("shingles_distinct_again") { sh.count() }
    val sig = sh.groupBy("doc").agg((0 until 16).map(j => min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"mh$j")).head,
      (0 until 16).map(j => min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"mh$j")).tail: _*)
    time("signatures") { sig.count() }
    val full = graft.operators.Dedup.minhashNearDups(docs, "text", "doc_id")
    time("full_minhash") { full.count() }
    time("tokens_only") { docs.select(explode(tokens(col("text")))).count() }
    time("shingles_nodistinct") { docs.select(col("doc_id"), explode(shingles(col("text"), 3))).count() }
    spark.stop()
  }
}
