package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge relations — the companion of the
  * pointer-doubling connected-components kernel in [[Dedup]] (which
  * handles the undirected clustering side). Everything here follows the
  * same loop discipline: a FIXED number of rounds chosen by the caller,
  * per-round localCheckpoint to truncate lineage, and per-round work that
  * is plain joins/aggregations on the edge relation — no driver-side row
  * data ever.
  */
object Graphs {

  /** Weighted PageRank with fixed iteration count, in EXACT integer
    * micro-rank units (1e6 = rank 1.0) so every engine — and every
    * partitioning — produces bit-identical ranks: per-edge contributions
    * are floored integer shares `(r·w) div Σw_out`, and the damping mix
    * `(100−d)/100 + d·Σc/100` is integer arithmetic throughout (the
    * floored-share convention the funnel/skew panels already use; the
    * deliberate sub-ulp floor losses leak rank mass exactly like the
    * standard dangling-node leak this formulation keeps — documents, not
    * redistributes). Ranks emerge as micro-units / 1e6 (one exact power-
    * of-ten division). Overflow headroom: r·w rides decimal(38,0) —
    * micro-ranks (~1e6·n/|V| hubs) times big edge weights overflow a LONG
    * exactly on the hub edges that matter at web scale, the silent-wrap
    * class the skew report's DECIMAL numerator documents.
    *
    * Scale shape per iteration: ONE shuffle keyed on the edge source (the
    * rank join), one on the destination (the contribution agg), one
    * nodes-sized left join — the edge relation is scanned, never
    * self-joined, and rank/degree relations are nodes-sized. The
    * localCheckpoint per round bounds plan growth exactly like the CC
    * loop; `iters` is the plan depth, chosen by the caller (PageRank on a
    * web graph converges in tens of rounds; quality-signal uses run 3–5).
    * Returns (node, rank) with rank 1.0 = the pre-damping uniform mass. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iters: Int,
               dampingPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 100, s"iters out of range: $iters")
    require(dampingPct >= 0 && dampingPct <= 100, s"dampingPct: $dampingPct")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e = edges.select(col(srcCol).cast("string").as("s"),
        col(dstCol).cast("string").as("t"),
        col(weightCol).cast("long").as("w"))
      .persist(lvl) // scanned twice per iteration (contribs + outw build)
    val nodes = e.select(col("s").as("node"))
      .union(e.select(col("t").as("node"))).distinct().persist(lvl)
    val outw = e.groupBy(col("s")).agg(sum("w").as("wout")).persist(lvl)
    val base = lit(1000000L * (100 - dampingPct) / 100)
    var r = nodes.select(col("node"), lit(1000000L).as("r"))
    for (_ <- 0 until iters) {
      val contribs = e
        .join(r.select(col("node").as("s"), col("r")), "s")
        .join(outw, "s")
        .select(col("t").as("node"),
          expr("CAST(r AS DECIMAL(38,0)) * w div wout").cast("long").as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      r = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (base + expr(s"($dampingPct * coalesce(c, CAST(0 AS BIGINT))) div 100"))
            .as("r"))
        .localCheckpoint()
    }
    r.select(col("node"), (col("r") / 1e6).as("rank"))
  }
}
