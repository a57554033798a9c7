package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch instrumentation for the q_dedup_clusters path: prints the wall
  * time of each phase (pairs pipeline, edge checkpoint, each CC round) so
  * loop tuning works from measurements, not guesses. Not part of the
  * driver contract. */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.all.foreach(tn => Tables.load(spark, sfDir, tn).count())

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    // Phase timing of the minhash pipeline (inlined from Dedup internals).
    val sh0 = docs.select(col("doc_id").as("doc"),
      explode(graft.expressions.Exprs.wordShinglesDistinct(col("text"), 3)).as("shingle"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("phase shingles")(sh0.count())
    val aggs = (0 until 16).map(j => min(md5(concat(lit(s"$j:"), col("shingle")))).as(s"mh$j"))
    val sig0 = sh0.groupBy(col("doc")).agg(aggs.head, aggs.tail: _*)
    timed("phase signatures")(sig0.write.format("noop").mode("overwrite").save())
    val bandStructs = (0 until 4).map { b =>
      val key = md5(concat_ws("|", (0 until 4).map(r => col(s"mh${b * 4 + r}")): _*))
      struct(lit(b).as("band"), key.as("band_key"))
    }
    val bands0 = sig0.select(col("doc"), explode(array(bandStructs: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
    val a0 = bands0.select(col("band"), col("band_key"), col("doc").as("id_a"))
    val b0 = bands0.select(col("band"), col("band_key"), col("doc").as("id_b"))
    val cand0 = a0.join(b0, Seq("band", "band_key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
    timed("phase candidates")(cand0.write.format("noop").mode("overwrite").save())
    sh0.unpersist()

    val pairs = graft.operators.Dedup.minhashNearDups(docs, "text", "doc_id",
      numHashes = 16, rowsPerBand = 4, shingleSize = 3, threshold = 0.5)
    val edges = timed("edges checkpoint (pairs pipeline)") {
      pairs.select(col("id_a"), col("id_b"))
        .union(pairs.select(col("id_b").as("id_a"), col("id_a").as("id_b")))
        .localCheckpoint()
    }
    println(s"[probe] edges=${edges.count()}")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    var labels = timed("init labels") {
      val l = edges.groupBy(col("id_a").as("id"))
        .agg(min(least(col("id_a"), col("id_b"))).as("cluster_id"))
        .localCheckpoint(eager = false)
      l.agg(sum("cluster_id")).collect()
      l
    }
    var iter = 0
    var go = true
    while (go && iter < 10) {
      iter += 1
      val updated = timed(s"round $iter") {
        val own = labels.select(col("id"), col("cluster_id").as("cl"))
        val fromNeighbors = edges
          .join(labels.withColumnRenamed("id", "id_b"), Seq("id_b"))
          .select(col("id_a").as("id"), col("cluster_id").as("cl"))
        val parent = labels.select(col("id").as("p_id"), col("cluster_id").as("p_cl"))
        val fromParent = labels.join(parent, col("cluster_id") === col("p_id"))
          .select(col("id"), col("p_cl").as("cl"))
        val u = own.union(fromNeighbors).union(fromParent)
          .groupBy("id").agg(min("cl").as("cluster_id"))
          .localCheckpoint(eager = false)
        u.agg(sum("cluster_id")).collect()
        u
      }
      val a = labels.agg(sum("cluster_id")).collect()(0).getLong(0)
      val b = updated.agg(sum("cluster_id")).collect()(0).getLong(0)
      labels = updated
      if (a == b) go = false
    }
    println(s"[probe] converged after $iter rounds")
    spark.stop()
  }
}
