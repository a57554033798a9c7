package graft

import graft.operators.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Recall pricing for the IVF-family `_scaled` lanes against the EXACT
  * all-pairs ground truth — the speed/recall trade as a number, not an
  * argument (BASELINE.md's trend rows carry the wall times; these rows
  * carry what the speed bought). Not part of the driver contract.
  *
  * Ground truth is the brute-force relation the blocked lanes prune:
  *  - pairs: every (id_a < id_b) with rounded cosine ≥ 0.35 — the
  *    candidate set q_ivf_pairs_scaled / the semdedup lanes would emit
  *    with ONE all-covering cell;
  *  - knn: every vector's exact top-3 by (rounded cosine DESC, id) —
  *    what q_knn_graph_scaled approximates within cells.
  * Both ground-truth kernels are n² by construction — that is WHY the
  * blocked lanes exist — so this probe is runnable at sf0.1/sf1 (2k/20k
  * vectors) but intentionally not part of any per-round gate.
  *
  * Lane pairs are subsets of the exact pairs (a blocked lane only ever
  * PRUNES candidates; the verify threshold is identical), so pair
  * recall is |lane| / |exact|; the semdedup DROP sets inherit the
  * subset property (drop = "some smaller-id pair partner exists"), so
  * drop recall is |lane drops| / |exact drops|.
  *
  * Usage: sbt "runMain graft.RecallProbe [sfDir] [knnonly] [sweep] [graphsweep]"
  * (the sfDir is the first NON-FLAG argument, so flag-only invocations
  * keep the default directory instead of consuming a flag as the path)
  */
object RecallProbe {
  private val Flags = Set("knnonly", "sweep", "graphsweep")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = args.find(!Flags.contains(_)).getOrElse("/root/testdata/sf0.1")
    val emb = Tables.load(spark, d, "embeddings")
    val n = emb.count()

    def pairSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("id_a"), col("id_b")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    def dropSet(pairs: Set[(Long, Long)]): Set[Long] = pairs.map(_._2)

    // ---- exact all-pairs ground truth (threshold family) ----
    // Two operating points: 0.35 is the ORACLE CONTRACT threshold (it
    // admits moderately-similar pairs, which single-probe blocking
    // naturally splits across cells — the structurally low-recall
    // regime), and 0.5 is the top of this synthetic corpus's similarity
    // distribution (max pair cosine 0.6; no true near-dup pairs were
    // planted), standing in for the production near-dup operating
    // point where partners are nearly colinear and co-cell far more
    // often.
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    // lazy: localCheckpoint is eager, and the knnonly mode never needs
    // the pair ground truth
    lazy val allPairs = a.join(broadcast(b), col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        (round(graft.expressions.Exprs.cosineSim(col("v_a"), col("v_b")), 4)
          + lit(0.0)).as("cs"))
      .filter(!isnan(col("cs")))
      // ckpt: one-shot — the n² scan feeds both thresholds once
      .filter(col("cs") >= 0.35).localCheckpoint()

    def row(lane: String, got: Int, base: Int, kind: String): Unit =
      println(f"[recall] $lane%-22s $kind%-6s $got%8d / $base%8d = " +
        f"${if (base == 0) 1.0 else got.toDouble / base}%.4f")

    // `knnonly` skips the pair/drop families — re-pricing the kNN
    // p-sweep without paying the exact pair ground truth twice
    for (thr <- Seq(0.35, 0.5) if !args.contains("knnonly")) {
      val exactPairs = pairSet(allPairs.filter(col("cs") >= thr))
      println(s"[recall] sf_dir=$d n=$n threshold=$thr " +
        s"exact_pairs=${exactPairs.size}")
      val flatPairs = pairSet(
        Similarity.ivfNearDupPairs(emb, "embedding", "vec_id",
          k = Similarity.AutoCells, threshold = thr))
      val treePairs = pairSet(
        Similarity.blockedNearDupPairs(
          Similarity.treeAssign(emb, "embedding", "vec_id"),
          "embedding", "vec_id", "cell", threshold = thr))
      val multiPairs = pairSet(
        Similarity.ivfNearDupPairsMulti(emb, "embedding", "vec_id",
          k = Similarity.AutoCells, threshold = thr, nAssign = 2))
      // r13: the tree × multi composition — shadow memberships pair in
      // any shared cell (distinct, the multi-lane convention)
      val treeMultiPairs = pairSet(
        Similarity.blockedNearDupPairs(
          Similarity.treeMultiMemberships(emb, "embedding", "vec_id"),
          "embedding", "vec_id", "cell", threshold = thr).distinct())
      // Lever #2 (measurement-only, no oracle lane): Lloyd-refined
      // centroids replace the lowest-id seeding, so cells follow the
      // data's actual structure; same single-assignment pair kernel.
      val refinedPairs = pairSet(
        Similarity.blockedNearDupPairs(
          emb.join(
            Similarity.assignToCentroids(emb, "embedding", "vec_id",
              Similarity.kmeansCentroids(emb, "embedding", "vec_id",
                Similarity.AutoCells, iters = 2))
              .select(col("vec_id"), col("centroid_id")),
            "vec_id"),
          "embedding", "vec_id", "centroid_id", threshold = thr))
      row(s"q_ivf_pairs_scaled@$thr", (flatPairs intersect exactPairs).size,
        exactPairs.size, "pairs")
      row(s"q_ivf_pairs_multi@$thr", (multiPairs intersect exactPairs).size,
        exactPairs.size, "pairs")
      row(s"q_semdedup_tree_multi_p@$thr", (treeMultiPairs intersect exactPairs).size,
        exactPairs.size, "pairs")
      row(s"q_semdedup_scaled@$thr", (dropSet(flatPairs) intersect dropSet(exactPairs)).size,
        dropSet(exactPairs).size, "drops")
      row(s"q_semdedup_tree@$thr", (dropSet(treePairs) intersect dropSet(exactPairs)).size,
        dropSet(exactPairs).size, "drops")
      row(s"q_semdedup_tree_multi@$thr", (dropSet(treeMultiPairs) intersect dropSet(exactPairs)).size,
        dropSet(exactPairs).size, "drops")
      row(s"q_semdedup_multi@$thr", (dropSet(multiPairs) intersect dropSet(exactPairs)).size,
        dropSet(exactPairs).size, "drops")
      row(s"refined_kmeans2@$thr", (dropSet(refinedPairs) intersect dropSet(exactPairs)).size,
        dropSet(exactPairs).size, "drops")
    }

    // ---- exact knn@3 ground truth (ranking family) ----
    import spark.implicits._
    val topk = udaf(new graft.functions.TopKHits(3),
      graft.functions.TopKHits.hitEncoder)
    val exactEdges = a.join(broadcast(b), col("id_a") =!= col("id_b"))
      .select(col("id_a").as("src"),
        (round(graft.expressions.Exprs.cosineSim(col("v_a"), col("v_b")), 4)
          + lit(0.0)).as("cs"),
        col("id_b").as("dst"))
      .groupBy("src").agg(topk(col("cs"), col("dst")).as("hits"))
      .select(col("src"), explode(col("hits")).as("h"))
      .select(col("src"), col("h.id").as("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val laneEdges = Similarity.knnGraph(emb, "embedding", "vec_id",
        k = Similarity.AutoCells, kNeighbors = 3)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    row("q_knn_graph_scaled", (laneEdges intersect exactEdges).size,
      exactEdges.size, "edges")
    // r13: the multi-probe lane — same ranking, top-nProbe probed cells
    // (the extended p-list under `sweep` prices the ~0.3-recall
    // operating point the r12 verdict asked for — recall is ~linear in
    // nProbe on this corpus, so is candidate cost)
    val probeList =
      if (args.contains("sweep") || args.contains("knnonly")) Seq(2, 3, 4, 6, 8)
      else Seq(2, 3)
    for (np <- probeList) {
      val multiEdges = Similarity.knnGraphMulti(emb, "embedding", "vec_id",
          k = Similarity.AutoCells, kNeighbors = 3, nProbe = np)
        .select(col("src"), col("dst")).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      row(s"q_knn_graph_multi@p$np", (multiEdges intersect exactEdges).size,
        exactEdges.size, "edges")
    }
    // r13: the tree-blocked adjacency lanes (n·log n scale shape)
    val treeEdges = Similarity.knnGraphTree(emb, "embedding", "vec_id",
        kNeighbors = 3)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    row("q_knn_graph_tree", (treeEdges intersect exactEdges).size,
      exactEdges.size, "edges")
    val treeMultiEdges = Similarity.knnGraphTreeMulti(emb, "embedding",
        "vec_id", kNeighbors = 3)
      .select(col("src"), col("dst")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    row("q_knn_graph_tree_multi", (treeMultiEdges intersect exactEdges).size,
      exactEdges.size, "edges")

    // ---- leaf-size sweep for the tree-blocked ADJACENCY lanes (r13):
    // same knob, other family — the semdedup sweep below showed larger
    // leaves win on both axes at this corpus size; this prices the same
    // trade for the scale-safe kNN path (edge recall@3 × wall per
    // maxLeaf), turning the graph lanes' recall from a fixed number at
    // leaf=64 into a priced operating curve ----
    if (args.contains("graphsweep")) {
      for (leaf <- Seq(64, 256, 1024); multi <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val edges = (if (multi)
            Similarity.knnGraphTreeMulti(emb, "embedding", "vec_id",
              kNeighbors = 3, maxLeaf = leaf)
          else
            Similarity.knnGraphTree(emb, "embedding", "vec_id",
              kNeighbors = 3, maxLeaf = leaf))
          .select(col("src"), col("dst")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
        val secs = (System.nanoTime() - t0) / 1e9
        val lane = if (multi) "graph_tree_multi" else "graph_tree"
        println(f"[graphsweep] $lane%-16s maxLeaf=$leaf%-5d edges " +
          f"${(edges intersect exactEdges).size}%6d / ${exactEdges.size}%6d" +
          f" = ${if (exactEdges.isEmpty) 1.0 else (edges intersect exactEdges).size.toDouble / exactEdges.size}%.4f" +
          f"  wall ${secs}%7.2f s")
      }
    }

    // ---- leaf-size sweep for the tree lanes (r12 verdict task 5):
    // drop recall @0.35 × wall time per maxLeaf — the leaf knob as a
    // priced trade instead of a default ----
    if (args.contains("sweep")) {
      val exactDrops = dropSet(pairSet(allPairs))
      for (leaf <- Seq(64, 256, 1024); shadows <- Seq(false, true)) {
        val t0 = System.nanoTime()
        val rel =
          if (shadows) Similarity.treeMultiMemberships(emb, "embedding",
            "vec_id", maxLeaf = leaf)
          else Similarity.treeAssign(emb, "embedding", "vec_id",
            maxLeaf = leaf)
        val drops = dropSet(pairSet(
          Similarity.blockedNearDupPairs(rel, "embedding", "vec_id",
            "cell", threshold = 0.35).distinct()))
        val secs = (System.nanoTime() - t0) / 1e9
        val lane = if (shadows) "tree_multi" else "tree"
        println(f"[sweep] $lane%-10s maxLeaf=$leaf%-5d drops " +
          f"${(drops intersect exactDrops).size}%6d / ${exactDrops.size}%6d" +
          f" = ${if (exactDrops.isEmpty) 1.0 else (drops intersect exactDrops).size.toDouble / exactDrops.size}%.4f" +
          f"  wall ${secs}%7.2f s")
      }
    }
    spark.stop()
  }
}
