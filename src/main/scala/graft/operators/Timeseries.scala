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

  /** Rolling z-score anomaly flags over a trailing window of `lookback`
    * PRIOR points (the current row never sees itself — a spike must not
    * mask its own detection). Entirely in exact integer arithmetic: with
    * trailing sums s1 = Σx, s2 = Σx² over n prior rows,
    * `z² = (n·x − s1)² / (n·s2 − s1²)`, so the k-sigma test is the exact
    * integer cross-multiplication `(n·x − s1)² > k²·(n·s2 − s1²)` — no
    * sqrt, no division, no float accumulation, bit-identical on any
    * engine/partitioning. `z2_floor` (the floored integer quotient) is
    * emitted as the explainable magnitude; it is NULL for a zero-variance
    * frame (where the boolean is still exact: any deviation from a
    * constant history is anomalous) and for warm-up rows (n < minPrior,
    * always non-anomalous — no evidence, no alarm).
    *
    * Squared terms ride DECIMAL(38,0): (n·x)² at web-scale money values
    * overflows a LONG exactly on the outliers being tested.
    *
    * Scale shape: ONE exchange on the key + per-partition sort; count,
    * both sums, and every derived column share that single window pass,
    * O(lookback) frame state per row — the ewmaSmooth shape with a second
    * moment. */
  def rollingAnomalies(df: DataFrame, keyCol: String, orderCols: Seq[String],
                       valueCol: String, idCols: Seq[String],
                       lookback: Int, kSigma: Int,
                       minPrior: Int = 4): DataFrame = {
    require(lookback >= 2 && kSigma >= 1 && minPrior >= 2,
      s"bad params: lookback=$lookback kSigma=$kSigma minPrior=$minPrior")
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(-lookback, -1)
    val d38 = "decimal(38,0)"
    val out = df
      .withColumn("__n", count(col(valueCol)).over(w).cast(d38))
      .withColumn("__s1", coalesce(sum(col(valueCol).cast(d38)).over(w),
        lit(0).cast(d38)))
      .withColumn("__s2", coalesce(
        sum((col(valueCol).cast(d38) * col(valueCol)).cast(d38)).over(w),
        lit(0).cast(d38)))
      .withColumn("__dev", expr(s"CAST(__n * $valueCol AS $d38) - __s1"))
      .withColumn("__var", expr("__n * __s2 - __s1 * __s1"))
    out.select(idCols.map(col) :+
      col("__n").cast("long").as("n_prior") :+
      when(col("__n") >= minPrior,
        expr(s"__dev * __dev > ${kSigma.toLong * kSigma} * __var"))
        .otherwise(lit(false)).as("is_anomaly") :+
      when(col("__n") >= minPrior && col("__var") > 0,
        expr("(__dev * __dev) div __var")).cast("long").as("z2_floor"): _*)
  }

  /** CUSUM change-point detection per key, DISTRIBUTED: the textbook
    * recursion `S_i = max(0, S_{i−1} + (x_i − μ − slack))` looks
    * inherently sequential, but with P_i = the prefix sum of the drift
    * terms, `S_i = P_i − min(P_0..P_i)` exactly — so the whole detector is
    * one running sum plus one running min over the SAME ordered window
    * pass, both exact integer aggregates. μ is each key's own mean in
    * integer micro-units (floored `1e6·Σx div n` — two-pass CUSUM: the
    * reference level from a first aggregation, broadcast back), `slack`
    * and the alarm threshold `h` are caller units scaled by 1e6
    * internally. Emits the CUSUM statistic (micro-units / 1e6) and the
    * alarm flag `S > h` — a persistent upward mean-shift accumulates
    * drift faster than the slack drains it and trips the alarm; i.i.d.
    * noise keeps resetting to 0.
    *
    * Scale shape: one keys-sized mean agg broadcast back over the scan,
    * then ONE exchange on the key with running sum + running min sharing
    * a single window pass — no recursion in the plan, no driver loop,
    * O(1) state per row. */
  def cusumAlarms(df: DataFrame, keyCol: String, orderCols: Seq[String],
                  valueCol: String, idCols: Seq[String],
                  slack: Long, threshold: Long): DataFrame = {
    require(slack >= 0 && threshold > 0, s"slack=$slack threshold=$threshold")
    val means = df.groupBy(col(keyCol))
      .agg(expr(s"(1000000 * CAST(sum($valueCol) AS DECIMAL(38,0))) div count(1)")
        .as("__mu_micro"))
    val wRun = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // decimal-first multiply: `1000000 * value` in LONG would silently
    // wrap at |value| > ~9.2e12 — exactly the repo-wide hazard class the
    // decimal accumulators exist for
    val drift = expr(s"CAST($valueCol AS DECIMAL(38,0)) * 1000000") -
      col("__mu_micro") - lit(1000000L * slack)
    val out = df.join(broadcast(means), keyCol)
      .withColumn("__p", sum(drift.cast("decimal(38,0)")).over(wRun))
      .withColumn("__s",
        col("__p") - least(min(col("__p")).over(wRun), lit(0).cast("decimal(38,0)")))
    out.select(idCols.map(col) :+
      (col("__s").cast("long") / 1e6).as("cusum") :+
      (col("__s") > lit(threshold).cast("decimal(38,0)") * 1000000L).as("alarm"): _*)
  }

  /** Per-key autocorrelation function at lags 1..maxLag — the seasonality /
    * burstiness probe of a behavioral time series (a near-1 ACF at lag k
    * means the series repeats with period k; white noise sits near 0).
    * Entirely engine-exact: with S = Σx, the lag-h autocovariance scaled
    * by n² is the INTEGER
    * `num_h = n²·Σ(x_i·x_{i+h}) − n·S·(A_h + B_h) + (n−h)·S²`
    * (A_h / B_h = the head / tail partial sums over the n−h overlapping
    * pairs), and `acf_bp = (10000·num_h) div num_0` — one truncated
    * division of two exact DECIMAL(38,0) integers (Spark `div` ≡ DuckDB
    * `//`, truncation toward zero verified for negatives in the olsTrend
    * spec). No float accumulation anywhere, so the output is bit-identical
    * under any partitioning. Lags with no pairs (n ≤ h) or a constant
    * series (num_0 = 0) emit NULL acf_bp rather than a fake 0.
    *
    * Reach: n²·Σx² with 5-digit-cents values holds to ~1e12 rows per key
    * in DECIMAL(38,0) — the per-key series length, not corpus size, is the
    * bound.
    *
    * Scale shape: ONE exchange on the key + per-partition sort; all
    * maxLag leads share that single window pass; then one
    * map-side-combinable agg at key grain and a maxLag-way stack of the
    * (tiny) per-key row. The corpus never self-joins. */
  def autocorr(df: DataFrame, keyCol: String, orderCols: Seq[String],
               valueCol: String, maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 32, s"maxLag: $maxLag")
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(col(keyCol)).orderBy(orderCols.map(col): _*)
    val withLeads = (1 to maxLag).foldLeft(
      df.select(col(keyCol) +: col(valueCol).as("__x") +: orderCols.map(col): _*)) {
      case (acc, h) => acc.withColumn(s"__l$h", lead(col("__x"), h).over(w))
    }
    val lagAggs = (1 to maxLag).flatMap { h =>
      Seq(
        sum((col("__x").cast(d38) * col(s"__l$h")).cast(d38)).as(s"__sxy$h"),
        sum(when(col(s"__l$h").isNotNull, col("__x")).cast(d38)).as(s"__a$h"),
        sum(col(s"__l$h").cast(d38)).as(s"__b$h"))
    }
    val baseAggs = Seq(
      count(lit(1)).cast(d38).as("__n"),
      sum(col("__x").cast(d38)).as("__s"),
      sum((col("__x").cast(d38) * col("__x")).cast(d38)).as("__sxx"))
    val allAggs = baseAggs ++ lagAggs
    val agg = withLeads.groupBy(col(keyCol)).agg(allAggs.head, allAggs.tail: _*)
    val den = "(__n * __n * __sxx - __n * __s * __s)"
    val perLag = (1 to maxLag).map { h =>
      val num = s"(__n * __n * __sxy$h - __n * __s * (__a$h + __b$h)" +
        s" + (__n - $h) * __s * __s)"
      s"$h" + "L, CASE WHEN __n > " + h + s" AND $den <> 0" +
        s" THEN CAST((10000 * $num) div $den AS BIGINT) END"
    }.mkString(", ")
    agg.selectExpr(keyCol,
      s"stack($maxLag, $perLag) AS (lag, acf_bp)")
  }

  /** Seasonal profile: per (group, season-bucket) activity index against
    * the group's overall mean — `index_bp = (10000·Σ_b·n) div (n_b·Σ)`,
    * i.e. bucket-mean / group-mean in floored basis points (10000 = flat;
    * an hour at 2× its group's average reads 20000). The mean RATIO form
    * cancels the units, and the cross-multiplied integer form never
    * divides until the end — engine/partitioning-exact with
    * caller-quantized integer values. Season buckets are portable by
    * construction: `hour` = hour-of-day 0–23, `isodow` = ISO day-of-week
    * 1–7 Monday-first (Spark's Sunday-first `dayofweek` and DuckDB's
    * 0-based `dow` disagree; ISO numbering is the one both engines can
    * express). Groups with Σ = 0 emit NULL index (a flat-zero series has
    * no meaningful profile). Buckets with no rows simply don't appear —
    * callers gap-fill with the grid join of [[RelationalOps]] if they
    * need dense panels.
    *
    * Scale shape: one map-side-combinable agg at (group, bucket) grain —
    * at most 24·|groups| rows — then a groups-sized total re-agg joined
    * back broadcast. The corpus scans exactly once. */
  def seasonalProfile(df: DataFrame, groupCol: String, tsCol: String,
                      valueCol: String, season: String = "hour"): DataFrame = {
    val d38 = "decimal(38,0)"
    val bucket = season match {
      case "hour" => hour(col(tsCol)).cast("long")
      case "isodow" => (weekday(col(tsCol)) + 1).cast("long")
      case other => throw new IllegalArgumentException(s"season: $other")
    }
    val byBucket = df
      .select(col(groupCol), bucket.as("bucket"), col(valueCol).as("__x"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(count(lit(1)).cast(d38).as("__nb"),
        sum(col("__x").cast(d38)).as("__sb"))
    val totals = byBucket.groupBy(col(groupCol))
      .agg(sum(col("__nb")).as("__n"), sum(col("__sb")).as("__s"))
    byBucket.join(broadcast(totals), groupCol)
      .select(col(groupCol), col("bucket"),
        col("__nb").cast("long").as("n"),
        when(expr("__nb * __s") =!= 0,
          expr("(10000 * __sb * __n) div (__nb * __s)"))
          .cast("long").as("index_bp"))
  }

  /** Last-touch attribution: credit each conversion's value to the LAST
    * non-conversion event the same key emitted before it (ordered by
    * `orderCols` — include a unique id after the timestamp so ties are
    * deterministic); conversions with no prior touch credit "(direct)".
    * Output per touch channel: (channel, n_conversions, sum_value at 2 dp)
    * in exact integer cents.
    *
    * Physically one window pass (the running `last(..., ignoreNulls)` over
    * rows-preceding) plus a map-side-combinable aggregate — no self-join
    * of the event log, no per-conversion scan-back. The window partitions
    * by the entity key, so 100 TB of events shuffle once on a key whose
    * per-partition slices are user-history-sized, never global. */
  /** KAPLAN–MEIER SURVIVAL CURVE with right-censoring — retention's
    * honest estimator: at each duration t with d(t) observed events, the
    * survival multiplies by (n_at_risk − d)/n_at_risk, and censored
    * subjects leave the risk set WITHOUT counting as events (averaging
    * them in is the classic churn-overstatement bug).
    *
    * Cross-engine exactness: the prefix PRODUCT becomes a prefix SUM of
    * per-step log terms, each term rounded to integer micro-units
    * (ln of an exact rational — the proven round(ln·1e6) lane), so the
    * accumulation is integer and order-invariant; only the final
    * exp(logS) display column re-enters float. When the last at-risk
    * subjects all die (d = n), logS is −∞ — that row reports NULL
    * log-survival and s_bp = 0 explicitly.
    *
    * Scale shape: subject rows reduce to duration-grain counts (one
    * map-side-combinable agg); the cumulative windows run over the
    * DURATION DOMAIN, not subjects (the KS/Gini value-domain class);
    * output rows = distinct event durations. */
  def kaplanMeier(df: DataFrame, durationCol: Column,
                  eventCol: Column): DataFrame = {
    val base = df.select(durationCol.cast("long").as("t"),
        eventCol.cast("boolean").as("__e"))
      .filter(col("t").isNotNull && col("__e").isNotNull)
    val grain = base.groupBy("t")
      .agg(sum(when(col("__e"), 1L).otherwise(0L)).as("d"),
        sum(when(col("__e"), 0L).otherwise(1L)).as("__c"))
    // single-partition sort bound: grain = distinct event times (the
    // value domain of t), never the subject rows
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wCur = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = grain.agg(sum(col("d") + col("__c")).cast("long").as("__n"))
    grain.crossJoin(broadcast(n))
      .withColumn("n_at_risk",
        col("__n") - coalesce(sum(col("d") + col("__c")).over(wPrev), lit(0L)))
      .withColumn("__term",
        when(col("d") < col("n_at_risk"),
          round(log((col("n_at_risk") - col("d")).cast("double") /
            col("n_at_risk").cast("double")) * 1e6, 0).cast("long")))
      .withColumn("logs_micro", sum(col("__term")).over(wCur))
      .filter(col("d") > 0L)
      .select(col("t"), col("n_at_risk"), col("d"),
        when(col("d") < col("n_at_risk"), col("logs_micro")).as("logs_micro"),
        when(col("d") >= col("n_at_risk"), lit(0L))
          .otherwise(round(
            exp(col("logs_micro").cast("double") / 1e6) * 10000, 0)
            .cast("long")).as("s_bp"))
  }

  def lastTouchAttribution(df: DataFrame, keyCol: String, orderCols: Seq[String],
                           typeCol: String, valueCol: String,
                           convType: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val touch = last(
      when(col(typeCol) =!= convType, col(typeCol)), ignoreNulls = true).over(w)
    df.withColumn("__touch", touch)
      .filter(col(typeCol) === convType)
      .groupBy(coalesce(col("__touch"), lit("(direct)")).as("channel"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(round(col(valueCol) * 100, 0).cast("long")) / 100.0, 2)
          .as("sum_value"))
  }

  /** Single best mean-shift CHANGEPOINT (binary segmentation's first
    * split, Scott & Knott / the CUSUM-optimum batch form): the split of an
    * ordered panel that maximizes the between-segment sum-of-squares
    * reduction. [[cusumAlarms]] watches a stream drift past a threshold;
    * this finds the batch-optimal breakpoint after the fact. The true gain
    * is gain(t) = D²/(n·t·(n−t)) with D = n·S_t − t·S; since the
    * denominator VARIES with t, the argmax must compare the rationals
    * D²/b(t), b(t) = t·(n−t), exactly (argmaxing D² alone is biased
    * toward mid-panel splits). The comparison key is the exact pair
    * (D² div b, ((D² mod b)·n⁴) div b): for any two splits
    * b₁·b₂ ≤ n⁴/16 < n⁴, so unequal rationals always differ in one of the
    * two integer keys (floor(x·K/b) separates fractions differing by
    * ≥ 1/(b₁b₂) whenever K ≥ b₁b₂) — no double ever picks the winner
    * (ties break to the earliest split). Returns one row (split_at,
    * n_left, n_right, mean_left, mean_right, gain) — gain in squared
    * value units, means in exact micro.
    *
    * Caller contract: a BOUNDED ordered panel (calendar grain — the
    * [[graft.operators.Stats.theilSen]] contract), so the prefix-sum
    * window's single-partition sort is data-independent. Overflow: n²·S²
    * and the remainder key (D² mod b)·n⁴ ≤ n⁶/4 at calendar grain
    * (≤1e5 points × cents) stay inside decimal(38,0); the quotient keys
    * exceed LONG, so integral division is taken as (x − x mod b)/b in
    * decimal — exact because the numerator is an exact multiple of b.
    * NOTE the quotients' headroom is NARROWER than the products': Spark
    * types decimal(38,0)/decimal(38,0) as decimal(38,6) — only 32
    * integer digits — so each quotient (k1 = D²/b, k2 = (r·n⁴)/b) must
    * stay under 1e32 or it silently NULLs (non-ANSI) and demotes that
    * split via NULLS LAST. At the stated grain the bound holds with
    * ~1000× to spare: |D| ≤ n²·ymax ≤ 1e17 at ymax ≤ 1e7 cents, so
    * k1 ≤ D²/(n−1) ≤ 1e29, and k2 < n⁴ ≤ 1e20. Callers beyond that
    * grain must re-derive both bounds, not just the product one. */
  def changepointMean(df: DataFrame, orderQ: Column,
                      valueQ: Column): DataFrame = {
    val d38 = "decimal(38,0)"
    val b = df.select(orderQ.cast("long").as("__t"),
        valueQ.cast("long").as("__y"))
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    val wCur = Window.orderBy("__t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = b.agg(count(lit(1)).as("__n"),
      sum(col("__y").cast(d38)).as("__s"))
    b.withColumn("__i", row_number().over(Window.orderBy("__t")).cast("long"))
      .withColumn("__st", sum(col("__y").cast(d38)).over(wCur))
      .crossJoin(broadcast(tot))
      .filter(col("__i") < col("__n"))
      // __gain = D² = (n·S_t − t·S)², expanded so every term is a product
      // of exact decimals; identical expression text in the DuckDB twin.
      .withColumn("__gain",
        expr(s"""CAST(__n AS $d38) * (__n - __i) * __st * __st
               + CAST(__n AS $d38) * __i * (__s - __st) * (__s - __st)
               - CAST(__i AS $d38) * (__n - __i) * __s * __s"""))
      .withColumn("__b", expr(s"CAST(__i AS $d38) * (__n - __i)"))
      .withColumn("__r", expr("__gain % __b"))
      .withColumn("__k1", expr(s"CAST((__gain - __r) / __b AS $d38)"))
      .withColumn("__rn",
        expr(s"__r * CAST(__n AS $d38) * __n * __n * __n"))
      .withColumn("__k2",
        expr(s"CAST((__rn - __rn % __b) / __b AS $d38)"))
      .orderBy(col("__k1").desc, col("__k2").desc, col("__t").asc).limit(1)
      .select(col("__t").as("split_at"), col("__i").as("n_left"),
        (col("__n") - col("__i")).as("n_right"),
        (expr("(1000000 * __st) div __i").cast("double") / 1e6)
          .as("mean_left"),
        (expr("(1000000 * (__s - __st)) div (__n - __i)").cast("double")
          / 1e6).as("mean_right"),
        (round(col("__gain").cast("double") /
          (col("__n").cast("double") * col("__i").cast("double") *
            (col("__n") - col("__i")).cast("double")), 4) + lit(0.0))
          .as("gain"))
  }
}
