package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyed time-series analytics — smoothing and trend estimation over
  * ordered event streams (the batch twins of the per-key running state the
  * reference keeps in stateful tasks, e.g. the running aggregates of
  * WikipediaStatsStreamTask; reference semantics at
  * src/main/java/samza/examples/wikipedia/task/WikipediaStatsStreamTask.java).
  *
  * Both operators follow the repo's exact-arithmetic convention: inputs are
  * quantized to integer units (cents, hour buckets) by the CALLER, all
  * accumulation is integer/decimal (order-invariant under any partitioning),
  * and division happens exactly once at the end — either as the engine's
  * IEEE double division of two exact integers (bit-identical across engines
  * for identical operands) or as truncated integer micro-units (Spark `div`
  * and DuckDB `//` both truncate toward zero, verified incl. negatives).
  */
object Timeseries {

  /** Exponentially-weighted moving average over a bounded lookback, with
    * EXACT integer weights: weight of the i-th most recent point is
    * `1e6 / 2^i` (truncated), so the kernel is a pure integer dot product
    * over at most `lookback` lagged values — bit-identical on any engine
    * and any partitioning, unlike a recursive EWMA whose float state
    * depends on history length. Rows near a key's start use only the
    * weights whose lags exist (the denominator shrinks to match — no
    * zero-padding bias). Returns the input keys plus `ewma` = the weighted
    * mean of `valueCol` (caller-quantized integer units) as a double.
    *
    * Scale shape: ONE exchange on the key + per-partition sort; all
    * `lookback` lags share that single window pass (one WindowExec, no
    * per-lag shuffles). The frame is O(lookback) per row — no unbounded
    * state, no corpus self-join. At 100 TB this is the minimum possible
    * shape for any per-key ordered scan. */
  def ewmaSmooth(df: DataFrame, keyCol: String, orderCols: Seq[String],
                 valueCol: String, idCols: Seq[String],
                 lookback: Int = 8): DataFrame = {
    require(lookback >= 1 && lookback <= 20, s"lookback: $lookback")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val weights = ewmaWeights(lookback)
    val terms = weights.zipWithIndex.map { case (wt, i) =>
      val v = if (i == 0) col(valueCol) else lag(col(valueCol), i).over(w)
      (coalesce(v, lit(0L)) * wt,
        when(v.isNotNull, lit(wt)).otherwise(lit(0L)))
    }
    val num = terms.map(_._1).reduce(_ + _)
    val den = terms.map(_._2).reduce(_ + _)
    df.select(idCols.map(col) :+
      (round(num.cast("double") / den, 4) + lit(0.0)).as("ewma"): _*)
  }

  /** The truncated `1e6 / 2^i` weight ladder — exposed so an oracle twin
    * can embed the IDENTICAL literals. */
  def ewmaWeights(lookback: Int): Seq[Long] =
    (0 until lookback).map(i => 1000000L / (1L << i))

  /** Per-group ordinary-least-squares trend line of integer `yCol` against
    * integer `xCol`: slope and intercept from the closed-form normal
    * equations, computed ENTIRELY in exact integer arithmetic —
    * `slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)` with DECIMAL(38,0)
    * sums (order-invariant, no float accumulation) and one truncated
    * micro-unit division at the end (1e-6 resolution; Spark `div` ≡
    * DuckDB `//`, both truncate toward zero so negative slopes agree).
    * The intercept is derived from the TRUNCATED slope — `(1e6·Σy −
    * slope_micro·Σx) / n` — so both outputs stay engine-exact instead of
    * compounding independent roundings. Degenerate groups (n < 2 or zero
    * x-variance) emit NULL slope/intercept rather than a divide-by-zero.
    *
    * Built-in `regr_slope`-style aggregates are double-accumulating and
    * summation-order-dependent — useless for a cross-engine hash gate and
    * a real nondeterminism hazard in any incremental pipeline.
    *
    * Scale shape: ONE map-side-combinable aggregation (five sums + a
    * count) at group grain — the corpus scans once, nothing after the agg
    * exceeds group cardinality. The decimal accumulators are the same
    * silent-wrap guard as the skew report: n·Σxy at web scale overflows
    * LONG exactly on the hot groups that matter. */
  def olsTrend(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val agg = df.groupBy(col(groupCol))
      .agg(count(lit(1)).cast(d38).as("n"),
        sum(col(xCol).cast(d38)).as("sx"),
        sum(col(yCol).cast(d38)).as("sy"),
        sum((col(xCol).cast(d38) * col(xCol)).cast(d38)).as("sxx"),
        sum((col(xCol).cast(d38) * col(yCol)).cast(d38)).as("sxy"))
    val den = expr("n * sxx - sx * sx")
    val slopeMicro = expr("(1000000 * (n * sxy - sx * sy)) div (n * sxx - sx * sx)")
    val interMicro = expr("(1000000 * sy - __slope_micro * sx) div n")
    agg
      .withColumn("__slope_micro",
        when(col("n") >= 2 && den =!= 0, slopeMicro))
      .select(col(groupCol), col("n").cast("long").as("n"),
        (col("__slope_micro").cast("long") / 1e6).as("slope"),
        (when(col("__slope_micro").isNotNull, interMicro)
          .cast("long") / 1e6).as("intercept"))
  }
}
