package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-data analytics — the comparison-log operators an RLHF-era
  * training pipeline runs over pairwise human/model judgments: derive
  * comparisons, aggregate the win matrix, and fit Bradley–Terry strengths.
  *
  * Reference grounding: the reference's keyed pairing idiom (`KV` re-key +
  * keyed aggregation, hello-samza `TumblingWindowExample.java:106-117`)
  * generalized to paired-observation analytics.
  *
  * All arithmetic is exact integer micro fixed-point with floored division
  * (Spark `div` ≡ DuckDB `//`), so results are partition-order invariant
  * and engine-exact.
  */
object Preferences {

  /** Derive pairwise comparisons from an event log: rows sharing
    * `pairIdCol` (exactly two of them) are one head-to-head trial; the row
    * with the larger `scoreCol` wins, ties break to the lexicographically
    * smaller `itemCol` (deterministic). Same-item trials carry no
    * preference signal and are dropped, as are incomplete pairs.
    *
    * Scale shape: ONE aggregation at pair grain (min_by/max_by partial
    * aggregates — no self-join of the event log against itself), then a
    * projection. 100 TB of trials never materializes row pairs. */
  def comparisons(df: DataFrame, pairIdCol: Column, itemCol: String,
                  scoreCol: String, orderCol: String): DataFrame = {
    val lo = min_by(struct(col(itemCol).as("item"), col(scoreCol).as("score")),
      col(orderCol)).as("a")
    val hi = max_by(struct(col(itemCol).as("item"), col(scoreCol).as("score")),
      col(orderCol)).as("b")
    df.groupBy(pairIdCol.as("__pair"))
      .agg(count(lit(1)).as("__n"), lo, hi)
      .filter(col("__n") === 2 && col("a.item") =!= col("b.item"))
      .select(
        when(col("a.score") > col("b.score"), col("a.item"))
          .when(col("b.score") > col("a.score"), col("b.item"))
          .otherwise(least(col("a.item"), col("b.item"))).as("winner"),
        when(col("a.score") > col("b.score"), col("b.item"))
          .when(col("b.score") > col("a.score"), col("a.item"))
          .otherwise(greatest(col("a.item"), col("b.item"))).as("loser"))
  }

  /** Win matrix: (winner, loser, n_wins) — the sufficient statistic for
    * every paired-comparison model; item²-bounded however large the log. */
  def winMatrix(cmp: DataFrame): DataFrame =
    cmp.groupBy("winner", "loser").agg(count(lit(1)).as("n_wins"))

  /** Bradley–Terry strength fitting by `iters` minorization–maximization
    * steps (Hunter 2004's MM algorithm) over a win matrix, in exact micro
    * fixed-point: strengths start uniform at 1e6 and renormalize to sum
    * ~1e6 each step, so the output is engine-exact and scale-free.
    *
    * MM step (all floored integer division):
    *   c_ij = (t_ij * 1e6) div max(s_i + s_j, 1)      t_ij = n_ij + n_ji
    *   D_i  = Σ_j c_ij
    *   raw_i = (W_i * 1e12) div max(D_i, 1)           W_i = total wins
    *   s_i  = (raw_i * 1e6) div max(Σ raw, 1)
    * Products ride decimal(38,0) (DuckDB HUGEINT) — W_i * 1e12 leaves Long
    * range past ~9e6 wins per item, well inside a 100 TB comparison log.
    *
    * Scale shape: the win matrix is item²-bounded, so every iteration is
    * item-cardinality work — the only corpus-sized pass is the aggregation
    * that produced `wins`. Callers should persist `wins` (tiny) before
    * looping; [[fitBradleyTerry]] does exactly that. Items with zero wins
    * pin to strength 0 (the MM fixed point for them). */
  def bradleyTerry(wins: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"iters must be >= 1: $iters")
    // directed totals t_ij (both orientations present for every observed pair)
    val fwd = wins.select(col("winner").as("i"), col("loser").as("j"),
      col("n_wins").as("w"))
    val rev = wins.select(col("loser").as("i"), col("winner").as("j"),
      col("n_wins").as("w"))
    // sym feeds every MM round and items every raw step — lazy persists
    // (item²-bounded), reclaimed when the returned plan is dereferenced
    val sym = fwd.unionByName(rev).groupBy("i", "j").agg(sum("w").as("t"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val items = sym.select(col("i").as("item"))
      .distinct()
      .join(fwd.groupBy("i").agg(sum("w").as("wins"))
        .select(col("i").as("item"), col("wins")), Seq("item"), "left")
      .select(col("item"), coalesce(col("wins"), lit(0L)).as("wins"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var s = items.select(col("item"), col("wins"), lit(1000000L).as("s"))
    for (_ <- 1 to iters) {
      val d = sym
        .join(s.select(col("item").as("i"), col("s").as("si")), Seq("i"))
        .join(s.select(col("item").as("j"), col("s").as("sj")), Seq("j"))
        .groupBy(col("i").as("item"))
        .agg(sum(expr("CAST(t AS DECIMAL(38,0)) * 1000000 div greatest(si + sj, 1)"))
          .as("D"))
      // raw stays ~2e12 in practice (D_i ≥ ΣT_ij/2 ≥ W_i at micro scale),
      // far inside Long; the PRODUCT is what needs decimal headroom.
      val raw = s.select(col("item"), col("wins"))
        .join(d, Seq("item"))
        .select(col("item"), col("wins"),
          expr("CAST(wins AS DECIMAL(38,0)) * 1000000 * 1000000" +
            " div greatest(D, 1)").as("raw"))
      val tot = raw.agg(sum("raw").as("__tot"))
      // localCheckpoint per round — the repo's LOOP-KERNEL discipline
      // (ivfRefit/connected-components convention): without it, iteration
      // k's plan embeds iteration k-1 TWICE (the si/sj joins), so the
      // lineage doubles per round and the optimizer re-derives the whole
      // chain 2^iters times (measured 42 s for 3 rounds at sf0.1; 0.5 s
      // checkpointed). The strength relation is item-cardinality — tiny.
      s = org.apache.spark.sql.graft.ColumnBridge.flatCheckpoint(
        raw.crossJoin(broadcast(tot))
          .select(col("item"), col("wins"),
            expr("CAST(raw AS DECIMAL(38,0)) * 1000000 div greatest(__tot, 1)")
              .cast("long").as("s")))
    }
    // no unpersist of sym/items — same rationale as the Graphs loop
    // kernels (r9): canonicalized-plan cache reuse across repeated calls
    // is worth more than early block release; ContextCleaner reclaims.
    s.select(col("item"), col("wins"), col("s").as("strength_micro"))
  }

  /** End-to-end: comparisons → win matrix (persisted — it feeds every MM
    * iteration; lazy, reclaimed by the ContextCleaner when the returned
    * plan is dereferenced) → Bradley–Terry strengths. */
  def fitBradleyTerry(df: DataFrame, pairIdCol: Column, itemCol: String,
                      scoreCol: String, orderCol: String,
                      iters: Int = 3): DataFrame = {
    val wins = winMatrix(comparisons(df, pairIdCol, itemCol, scoreCol, orderCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bradleyTerry(wins, iters)
  }
}
