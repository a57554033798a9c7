package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classical statistics over quantized columns — the rank-correlation and
  * hypothesis-test panel an experimentation/curation pipeline reads before
  * trusting a metric move (the batch analytics layer next to
  * [[RelationalOps.mannWhitneyU]], which pioneered this file's rank
  * arithmetic; reference semantics: the per-type aggregates of
  * src/main/java/samza/examples/wikipedia/task/WikipediaStatsStreamTask.java
  * generalized to cross-metric association and k-sample tests).
  *
  * File-wide exactness convention (the [[Timeseries]] contract): callers
  * quantize inputs to integer units (cents); every accumulation is
  * long/decimal(38,0) — order-invariant under any partitioning; division
  * happens once per scalar at the end, either as IEEE double division of two
  * exact integers (bit-identical across engines for identical operands) or
  * as truncated integer micro-units (Spark `div` ≡ DuckDB `//`, verified
  * incl. negatives). Rank kernels work on the VALUE DOMAIN (one row per
  * distinct quantized value), never the corpus: the single-partition sort a
  * midrank window needs is bounded by the value domain (cents of a bounded
  * metric), the same bound [[RelationalOps.mannWhitneyU]] documents.
  */
object Stats {

  private val d38 = "decimal(38,0)"

  /** Midranks (×2, so ties' half-ranks stay integral) of `valCol` within
    * `partCols`: one row per distinct (partition, value) with `outCol` =
    * 2·midrank. Value-domain grain in, value-domain grain out. */
  private def midrank2(byVal: DataFrame, partCols: Seq[String],
                       valCol: String, cntCol: String,
                       outCol: String): DataFrame = {
    // single-partition-per-group sort bound: distinct quantized values of
    // one partition, not rows (the mannWhitneyU bound)
    val w = (if (partCols.isEmpty) Window.orderBy(valCol)
             else Window.partitionBy(partCols.map(col): _*).orderBy(valCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    byVal.withColumn(outCol,
      coalesce(sum(cntCol).over(w), lit(0L)) * 2L + col(cntCol) + 1L)
  }

  /** Spearman rank correlation per group, tie-corrected — Pearson's r over
    * midranks, the monotone-association readout that survives outliers and
    * arbitrary monotone metric transforms (where q_regression's Pearson
    * does not). Ranks ride 2× integer midranks; the five cross-sums ride
    * decimal(38,0); rho is ONE double expression over exact integers,
    * rounded. Zero-variance groups (a constant column) yield NULL.
    *
    * Scale shape (optimization r14, guide §2.3/§2.4): ONE corpus scan
    * into a (group, x, y) PAIR-DOMAIN count agg (map-side combinable);
    * both per-column value-domain rank relations derive from that small
    * relation (a stacked second-level agg — the corpus is never scanned
    * again), the midrank windows stay value-domain bound (file header),
    * and the rank attach joins run on the pair domain, not the corpus
    * (the r13 form scanned the corpus twice and shipped every ROW through
    * two rank joins; every cross-sum is recovered exactly as
    * Σ cnt·f(rx, ry) over the pair domain — identical integers, identical
    * rho). Overflow headroom: midranks ≤ 2n+1, so the largest sum
    * Σrx·ry ≤ 4n³ and the rho numerator n·Σxy − ΣxΣy stays inside
    * decimal(38,0) for per-group n up to ~1e9 — quantize coarser (the
    * value domain only shrinks) past that. */
  def spearmanRho(df: DataFrame, groupCol: String,
                  xQ: Column, yQ: Column): DataFrame = {
    val base = df.select(col(groupCol).as("__g"),
      xQ.cast("long").as("__x"), yQ.cast("long").as("__y"))
      // pairwise-complete rows only, BEFORE ranking: a row dropped later
      // by the other column's join must not shift anyone's midrank
      .filter(col("__g").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
    // the only corpus-grain pass: distinct (g, x, y) cells with counts
    val xy = base.groupBy(col("__g"), col("__x"), col("__y"))
      .agg(count(lit(1)).as("__cnt"))
      // ckpt: one-shot — pair-domain-bounded, built once per call (no
      // loop); read by the rank derivation AND the final attach
      .localCheckpoint(true)
    // per-column value-domain counts FOLD from the pair domain (summing
    // __cnt per (g, value) sees exactly the rows the corpus-grain form
    // saw — same __t, same midranks, bit-identical)
    val ranked = midrank2(
      xy.select(col("__g"), col("__cnt"),
          expr("stack(2, 0L, __x, 1L, __y) AS (__c, __v)"))
        .groupBy(col("__g"), col("__c"), col("__v"))
        .agg(sum(col("__cnt")).as("__t")),
      Seq("__g", "__c"), "__v", "__t", "__r2").drop("__t")
    def ranksOf(tag: Int, v: String, out: String): DataFrame = ranked
      .filter(col("__c") === tag)
      .select(col("__g"), col("__v").as(v), col("__r2").as(out))
    xy
      .join(ranksOf(0, "__x", "__rx2"), Seq("__g", "__x"))
      .join(ranksOf(1, "__y", "__ry2"), Seq("__g", "__y"))
      .groupBy(col("__g"))
      .agg(sum(col("__cnt")).cast(d38).as("__n"),
        sum((col("__cnt").cast(d38) * col("__rx2")).cast(d38)).as("__sx"),
        sum((col("__cnt").cast(d38) * col("__ry2")).cast(d38)).as("__sy"),
        sum((col("__cnt").cast(d38) * col("__rx2") * col("__rx2")).cast(d38)).as("__sxx"),
        sum((col("__cnt").cast(d38) * col("__ry2") * col("__ry2")).cast(d38)).as("__syy"),
        sum((col("__cnt").cast(d38) * col("__rx2") * col("__ry2")).cast(d38)).as("__sxy"))
      .select(col("__g").as(groupCol), col("__n").cast("long").as("n"),
        when(expr("(__n*__sxx - __sx*__sx) = 0 OR (__n*__syy - __sy*__sy) = 0"),
            lit(null).cast("double"))
          .otherwise(round(
            expr(s"CAST(__n*__sxy - __sx*__sy AS DOUBLE)") /
              sqrt(expr(s"CAST(__n*__sxx - __sx*__sx AS DOUBLE)") *
                   expr(s"CAST(__n*__syy - __sy*__sy AS DOUBLE)")),
            4) + lit(0.0))
          .as("rho"))
  }

  /** Approximate Spearman from a BOUNDED per-group row sample — the
    * production scale lane of [[spearmanRho]], whose exact kernel is the
    * statistics family's only corpus-grain double rank-join. Ranks are
    * estimated against the sample ECDF: a hash-threshold id sample per
    * group — keep rows whose Knuth id-hash clears h(id) < k·M div n
    * (the [[Curation.knuthHash]] lane; M = 2³⁰-scale modulus, n = group
    * rows), a pure scan-side filter that is deterministic and
    * engine-reproducible with NO top-k state and NO shuffle (a bottom-k
    * aggregate in this slot costs O(k) per input row — measured 49 s at
    * sf1) — folded once into sorted distinct-value/count arrays that
    * BROADCAST (collected driver-side first: groups × ≤ k rows, the
    * PQ-codebook bounded-collect class); every corpus row then ranks
    * itself by an O(log k) binary search in a typed mapPartitions
    * (2·|{s < x}| + |{s = x}| + 1, the 2× midrank convention against
    * the sample — see the in-code note for why every declarative
    * encoding of the descent measured pathological), and rho is the
    * same exact Pearson tail over those integer ranks. Two corpus
    * scans, no rank join, no corpus-grain shuffle beyond two
    * map-side-combinable aggs — the whole rank structure rides a
    * groups×k broadcast. The group column is compared and RETURNED in
    * its string form (the typed hot loop's key).
    *
    * Error bound: the sample ECDF obeys DKW — P(sup|F̂−F| > ε) ≤
    * 2·e^(−2kε²), so with k = 512 every rank is within ±6.0% of its
    * true quantile with 95% confidence (±2.7% at k = 2048; the sample
    * SIZE itself is binomial around nominal k — Bernoulli-by-hash, not
    * exact-k), and rho inherits that scale of error (measured against
    * the exact twin in BASELINE.md). Groups with ≤ k rows keep every
    * row (threshold ≥ M) — the sketch is EXACT there (the sample
    * midrank formula equals the value-domain midrank when
    * sample = group).
    *
    * Duplicate ids (a non-unique row key) are handled as a CLUSTER
    * sample: the hash filter admits every row of a sampled id —
    * deterministic and engine-identical, where per-row top-k sampling
    * would tie-break duplicate ids differently per engine. */
  def spearmanSketch(df: DataFrame, groupCol: String, idCol: String,
                     xQ: Column, yQ: Column, k: Int = 512,
                     budgetRows: Long = 0L): DataFrame = {
    require(k >= 16 && k <= 65536, s"k out of range: $k")
    val hashMod = 1000000007L
    val base = df.select(col(groupCol).as("__g"), col(idCol).as("__id"),
        xQ.cast("long").as("__x"), yQ.cast("long").as("__y"))
      .filter(col("__g").isNotNull && col("__id").isNotNull &&
        col("__x").isNotNull && col("__y").isNotNull)
    // persisted across its TWO consumers — the guard count below and the
    // broadcast join feeding the model collect — so the corpus-scan
    // group-count aggregate runs once, not twice (r12 ADVICE); released
    // right after the model materializes. NOTE: this function is EAGER
    // by design — two driver-side jobs (the guard count, the model
    // collect) run at call time, because the scan stage's typed hot loop
    // must close over the broadcast model before its plan can exist.
    val thr = base.groupBy("__g").agg(count(lit(1)).as("__n"))
      .select(col("__g"),
        expr(s"(CAST($k AS BIGINT) * $hashMod) div __n").as("__thr"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Bounded-collect guard: the driver-side model is ≲ groups × 2k rows,
    // so a near-unique groupCol would collect close to the whole corpus.
    // Fail fast with the grain named instead of OOMing the driver. The
    // default budget DERIVES from the driver's actual heap (r11 ADVICE
    // hard-coded 8e6): a collected model row (boxed group string + three
    // boxed longs) plus its share of the per-axis vs/eq/lt arrays and
    // groupBy scratch costs ~200 bytes, and the model may claim at most
    // a quarter of the heap — floored at 1M rows so a small test heap
    // still admits gate-scale corpora (a 1 GiB driver → ~1.3M rows;
    // the old flat 8e6 needed ~6.4 GiB to be safe). Pass `budgetRows`
    // explicitly to override (specs pin the failure path with it).
    val budget = if (budgetRows > 0L) budgetRows
      else math.max(1000000L, Runtime.getRuntime.maxMemory() / 4L / 200L)
    // try/finally: the guard require below is EXPECTED to throw on
    // near-unique group columns (specs pin that path) — the cached
    // threshold relation must not outlive the failure
    val modelRows = try {
      val nGroups = thr.count()
      require(nGroups * k.toLong <= budget,
        s"spearmanSketch: $nGroups groups x k=$k sample rows exceed the " +
          s"driver-collect budget ($budget); coarsen groupCol or lower k")
      val sampleRows = base.join(broadcast(thr), Seq("__g"))
        .filter(Curation.knuthHash(col("__id"), hashMod) < col("__thr"))
      // The sample model — per (group, axis), sorted distinct values with
      // per-value count `eq` and exclusive cumulative `lt` (# sample < v)
      // — collects DRIVER-SIDE: groups × ≤ k rows, the same bounded
      // collect class as the PQ codebooks and IVF centroids, broadcast
      // once to every task.
      sampleRows
        .groupBy(col("__g").cast("string").as("__gs"), col("__x"), col("__y"))
        .agg(count(lit(1)).as("__c")).collect()
    } finally thr.unpersist()
    def axisModel(get: org.apache.spark.sql.Row => Long)
        : Map[String, (Array[Long], Array[Long], Array[Long])] =
      modelRows.groupBy(_.getString(0)).map { case (g, rows) =>
        val byV = rows.groupBy(get).view
          .mapValues(_.map(_.getLong(3)).sum).toArray.sortBy(_._1)
        val vs = byV.map(_._1)
        val eq = byV.map(_._2)
        val lt = eq.scanLeft(0L)(_ + _).dropRight(1)
        g -> (vs, eq, lt)
      }
    // the (x, y) grain above loses nothing: eq/lt per axis re-aggregate
    // from it, and one collect serves both axes
    val mx = axisModel(_.getLong(1))
    val my = axisModel(_.getLong(2))
    val bc = base.sparkSession.sparkContext.broadcast((mx, my))
    // Scan-side EXACT binary-search rank against the broadcast model in
    // a typed mapPartitions — the one genuinely imperative hot loop in
    // this file, and deliberately so: every declarative encoding of the
    // per-row O(log k) descent measured pathological at sf1 (a linear
    // array HOF: 47 s; the rank joined per distinct value: 11 s; an
    // aggregate() fold: broke whole-stage codegen and interpreted
    // Projects copied the k-arrays into every row: 45 s; this form:
    // ~scan cost). Rows whose group has NO sampled id (possible only
    // for extreme n where the Bernoulli threshold rounds to 1) drop,
    // mirroring the twin's inner join against the sample relation.
    // The Pearson partials fold IN the same loop (one output row per
    // partition × group, never a per-row rank tuple — the rank-tuple
    // shuffle alone measured ~6 s at sf1): per-partition sums stay in
    // primitive longs (rx2·ry2 ≤ (2k+1)² ≈ 1e6, safe to ~9e12 rows per
    // partition), cross-partition totals ride decimal(38,0).
    val inEnc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.STRING,
      org.apache.spark.sql.Encoders.scalaLong,
      org.apache.spark.sql.Encoders.scalaLong)
    val partials = base
      .select(col("__g").cast("string").as("_1"), col("__x").as("_2"),
        col("__y").as("_3"))
      .as[(String, Long, Long)](inEnc)
      .mapPartitions { it =>
        val (mxL, myL) = bc.value
        def rank2(m: Map[String, (Array[Long], Array[Long], Array[Long])],
                  g: String, v: Long): Long = {
          val (vs, eq, lt) = m(g)
          val i = java.util.Arrays.binarySearch(vs, v)
          if (i >= 0) 2L * lt(i) + eq(i) + 1L
          else {
            val ip = -i - 1 // insertion point = # sample values < v
            val less = if (ip == 0) 0L else lt(ip - 1) + eq(ip - 1)
            2L * less + 1L
          }
        }
        val acc = scala.collection.mutable.HashMap
          .empty[String, Array[Long]]
        it.foreach { case (g, x, y) =>
          if (mxL.contains(g)) {
            val rx = rank2(mxL, g, x); val ry = rank2(myL, g, y)
            val a = acc.getOrElseUpdate(g, new Array[Long](6))
            a(0) += 1L; a(1) += rx; a(2) += ry
            a(3) += rx * rx; a(4) += ry * ry; a(5) += rx * ry
          }
        }
        acc.iterator.map { case (g, a) =>
          (g, a(0), a(1), a(2), a(3), a(4), a(5))
        }
      }(org.apache.spark.sql.catalyst.encoders
        .ExpressionEncoder[(String, Long, Long, Long, Long, Long, Long)]())
      .toDF("__g", "__pn", "__psx", "__psy", "__psxx", "__psyy", "__psxy")
    partials.groupBy(col("__g"))
      .agg(sum(col("__pn").cast(d38)).as("__n"),
        sum(col("__psx").cast(d38)).as("__sx"),
        sum(col("__psy").cast(d38)).as("__sy"),
        sum(col("__psxx").cast(d38)).as("__sxx"),
        sum(col("__psyy").cast(d38)).as("__syy"),
        sum(col("__psxy").cast(d38)).as("__sxy"))
      .select(col("__g").as(groupCol), col("__n").cast("long").as("n"),
        when(expr("(__n*__sxx - __sx*__sx) = 0 OR (__n*__syy - __sy*__sy) = 0"),
            lit(null).cast("double"))
          .otherwise(round(
            expr(s"CAST(__n*__sxy - __sx*__sy AS DOUBLE)") /
              sqrt(expr(s"CAST(__n*__sxx - __sx*__sx AS DOUBLE)") *
                   expr(s"CAST(__n*__syy - __sy*__sy AS DOUBLE)")),
            4) + lit(0.0))
          .as("rho"))
  }

  /** Kendall tau-b over a BOUNDED relation (caller contract: a group-grain
    * or value-domain aggregate, thousands of rows, NOT the corpus — the
    * all-pairs kernel is quadratic by definition; at corpus grain use
    * [[spearmanRho]], whose value-domain rank kernel is linear). Exact
    * concordant/discordant/tie pair counts; tau-b's tie-corrected
    * denominator sqrt((n0−n1)(n0−n2)) as one double expression. Returns a
    * single row (n_pairs, concordant, discordant, tau_b). */
  def kendallTauB(df: DataFrame, idCol: String,
                  xQ: Column, yQ: Column): DataFrame = {
    val b = df.select(col(idCol).cast("long").as("__i"),
      xQ.cast("long").as("__x"), yQ.cast("long").as("__y"))
      // complete rows only: a NULL-x pair would count into n_pairs but
      // none of the C/D/tie counters, deflating tau-b
      .filter(col("__i").isNotNull && col("__x").isNotNull &&
        col("__y").isNotNull)
    val pairs = b.join(
      broadcast(b.select(col("__i").as("__j"),
        col("__x").as("__x2"), col("__y").as("__y2"))),
      col("__i") < col("__j"))
    pairs.agg(
        count(lit(1)).as("__np"),
        sum(when(col("__x") =!= col("__x2") && col("__y") =!= col("__y2") &&
            ((col("__x") < col("__x2")) === (col("__y") < col("__y2"))),
          1L).otherwise(0L)).as("__c"),
        sum(when(col("__x") =!= col("__x2") && col("__y") =!= col("__y2") &&
            ((col("__x") < col("__x2")) =!= (col("__y") < col("__y2"))),
          1L).otherwise(0L)).as("__d"),
        sum(when(col("__x") === col("__x2"), 1L).otherwise(0L)).as("__tx"),
        sum(when(col("__y") === col("__y2"), 1L).otherwise(0L)).as("__ty"))
      .select(col("__np").as("n_pairs"),
        col("__c").as("concordant"), col("__d").as("discordant"),
        when(expr("__np = __tx OR __np = __ty"), lit(null).cast("double"))
          .otherwise(round(
            expr("CAST(__c - __d AS DOUBLE)") /
              sqrt(expr("CAST(__np - __tx AS DOUBLE)") *
                   expr("CAST(__np - __ty AS DOUBLE)")), 4) + lit(0.0))
          .as("tau_b"))
  }

  /** Kruskal–Wallis H — the k-sample generalization of
    * [[RelationalOps.mannWhitneyU]] ("did ANY variant shift the metric
    * distribution?"), tie-corrected via the identity
    * H = (n−1)·Σ n_g(r̄_g−r̄)² / Σ(r_i−r̄)², which absorbs the classic
    * 12/(n(n+1)) form's tie divisor. All rank arithmetic in exact 2×
    * integer midranks on the value domain; the one inexact step is each
    * group's mean rank truncated to ppm (`div`, identical on both
    * engines), bounding |ΔH| under k·1e-6 — the theta_micro convention.
    * Returns one row (n, k, h).
    *
    * Scale shape: one value-domain agg + midrank window (domain-bounded
    * sort), one (group, value) agg, one group-grain reduce, a 1-row
    * broadcast. Overflow: Σn_g·dev_ppm² ≤ 4e12·n³ — inside decimal(38,0)
    * to n ≈ 2e8; shrink the ppm scale at larger n. */
  def kruskalWallisH(df: DataFrame, valueQ: Column,
                     groupCol: String): DataFrame = {
    val b = df.select(col(groupCol).as("__g"), valueQ.cast("long").as("__v"))
      // NULL values would join the value domain (shifting every midrank)
      // yet drop from the per-group join — filter first, like the siblings
      .filter(col("__g").isNotNull && col("__v").isNotNull)
    val mid = midrank2(
      b.groupBy("__v").agg(count(lit(1)).as("__t")),
      Nil, "__v", "__t", "__mid2")
    val tot = mid.agg(
      sum(col("__t").cast(d38)).as("__n"),
      // Σ(2r_i)² over ROWS via the value domain; den4 = Σ(2r_i)² − n(n+1)²
      sum((col("__t").cast(d38) * col("__mid2") * col("__mid2")).cast(d38))
        .as("__s2"))
    val perG = b.groupBy("__g", "__v").agg(count(lit(1)).as("__tg"))
      .join(mid.select("__v", "__mid2"), "__v")
      .groupBy("__g")
      .agg(sum(col("__tg").cast(d38)).as("__ng"),
        sum((col("__tg").cast(d38) * col("__mid2")).cast(d38)).as("__rg2"))
    perG.crossJoin(broadcast(tot))
      // group mean of 2·rank in ppm — the single truncation
      .withColumn("__mg2ppm", expr("(1000000 * __rg2) div __ng"))
      .withColumn("__dev",
        (col("__mg2ppm") - expr(s"CAST(1000000 AS $d38) * (__n + 1)"))
          .cast(d38))
      .agg(max(col("__n")).as("__n"), count(lit(1)).as("__k"),
        sum((col("__ng") * col("__dev") * col("__dev")).cast(d38))
          .as("__num"),
        max(expr(s"__s2 - __n * (__n + 1) * (__n + 1)")).as("__den4"))
      .select(col("__n").cast("long").as("n"), col("__k").as("k"),
        when(col("__den4") === 0, lit(null).cast("double"))
          .otherwise(round(
            expr("CAST(__n - 1 AS DOUBLE)") *
              (expr("CAST(__num AS DOUBLE)") / lit(1e12)) /
              expr("CAST(__den4 AS DOUBLE)"), 4) + lit(0.0))
          .as("h"))
  }

  /** Effect-size panel — Cohen's d (and the small-sample-corrected
    * Hedges' g) of each group AGAINST THE REST: the "how big is the
    * difference in standard-deviation units" readout that makes metric
    * gaps comparable across metrics and table sizes, where a z or F only
    * says "detectable" (the mean-difference sibling of [[cramersV]]).
    * Group sums n/Σv/Σv² ride decimal(38,0); the rest-side moments are
    * exact differences from the 1-row totals (one scan, no second pass);
    * sample variances keep exact integer numerators n·Σv² − (Σv)² over
    * n(n−1), and d is one double expression. Groups with n<2 on either
    * side, or zero pooled variance, yield NULL. Returns per group
    * (group, n_in, mean_in, mean_rest, cohens_d, hedges_g). */
  def cohensD(df: DataFrame, valueQ: Column, groupCol: String): DataFrame = {
    val perG = df.select(col(groupCol).as("__g"), valueQ.cast("long").as("__v"))
      .filter(col("__v").isNotNull && col("__g").isNotNull)
      .groupBy("__g")
      .agg(count(lit(1)).cast(d38).as("__n1"),
        sum(col("__v").cast(d38)).as("__s1"),
        sum((col("__v").cast(d38) * col("__v")).cast(d38)).as("__ss1"))
    val tot = perG.agg(sum(col("__n1")).as("__n"), sum(col("__s1")).as("__s"),
      sum(col("__ss1")).as("__ss"))
    val m = perG.crossJoin(broadcast(tot))
      .withColumn("__n2", (col("__n") - col("__n1")).cast(d38))
      .withColumn("__s2", (col("__s") - col("__s1")).cast(d38))
      .withColumn("__ss2", (col("__ss") - col("__ss1")).cast(d38))
      // d as doubles over exact decimal components, identical formula text
      .withColumn("__m1", expr("CAST(__s1 AS DOUBLE) / CAST(__n1 AS DOUBLE)"))
      .withColumn("__m2", expr("CASE WHEN __n2 >= 1 THEN" +
        " CAST(__s2 AS DOUBLE) / CAST(__n2 AS DOUBLE) END"))
      // CASE-guarded: ANSI mode errors on division by zero even in an
      // intermediate column the final guard would have masked
      .withColumn("__v1", expr("CASE WHEN __n1 >= 2 THEN" +
        " CAST(__n1*__ss1 - __s1*__s1 AS DOUBLE)" +
        " / CAST(__n1*(__n1 - 1) AS DOUBLE) END"))
      .withColumn("__v2", expr("CASE WHEN __n2 >= 2 THEN" +
        " CAST(__n2*__ss2 - __s2*__s2 AS DOUBLE)" +
        " / CAST(__n2*(__n2 - 1) AS DOUBLE) END"))
      .withColumn("__sp2", expr("CASE WHEN __n1 >= 2 AND __n2 >= 2 THEN" +
        " (CAST(__n1 - 1 AS DOUBLE) * __v1" +
        " + CAST(__n2 - 1 AS DOUBLE) * __v2)" +
        " / CAST(__n1 + __n2 - 2 AS DOUBLE) END"))
    m.select(col("__g").as(groupCol), col("__n1").cast("long").as("n_in"),
      (round(col("__m1"), 4) + lit(0.0)).as("mean_in"),
      (round(col("__m2"), 4) + lit(0.0)).as("mean_rest"),
      when(expr("__n1 < 2 OR __n2 < 2 OR __sp2 IS NULL OR __sp2 <= 0"),
          lit(null).cast("double"))
        .otherwise(round((col("__m1") - col("__m2")) / sqrt(col("__sp2")), 4)
          + lit(0.0)).as("cohens_d"),
      when(expr("__n1 < 2 OR __n2 < 2 OR __sp2 IS NULL OR __sp2 <= 0"),
          lit(null).cast("double"))
        .otherwise(round((col("__m1") - col("__m2")) / sqrt(col("__sp2")) *
          (lit(1.0) - lit(3.0) /
            expr("CAST(4*(__n1 + __n2) - 9 AS DOUBLE)")), 4) + lit(0.0))
        .as("hedges_g"))
  }

  /** Wald–Wolfowitz RUNS TEST — is an ordered series random around its
    * median, or does it trend/oscillate? (Too few runs = level shifts or
    * trend — the [[Timeseries.changepointMean]] signal; too many =
    * negative autocorrelation.) Values above the explicitly-selected
    * median sign +, below sign −, exact ties to the median drop (the
    * standard treatment); the run count is one lag comparison over the
    * ordered panel. R, n₊, n₋ are exact integers; z against the exact
    * mean 2n₊n₋/n + 1 is one double expression. Returns one row
    * (n_pos, n_neg, runs, z); NULL z when either sign class is empty.
    *
    * Caller contract: a BOUNDED ordered panel (the [[theilSen]]
    * calendar-grain contract) — the ordering window is panel-sized. */
  def runsTest(df: DataFrame, orderQ: Column, valueQ: Column): DataFrame = {
    val b = df.select(orderQ.cast("long").as("__t"),
        valueQ.cast("long").as("__y"))
      .filter(col("__t").isNotNull && col("__y").isNotNull)
    // explicit two-middle median on the doubled values (exact for both
    // parities without fractional arithmetic): med2 = lo + hi
    val w = Window.orderBy(col("__y"))
    val cnt = b.agg(count(lit(1)).as("__m"))
    val med2 = b.withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(cnt))
      .filter(col("__rn") === expr("(__m + 1) div 2") ||
        col("__rn") === expr("__m div 2 + 1"))
      .agg(sum(col("__y")).as("__half"), count(lit(1)).as("__k"))
      // odd m: one middle row selected twice-over → ×2; even m: two rows
      .select((col("__half") * (lit(3L) - col("__k"))).as("__med2"))
    val signed = b.crossJoin(broadcast(med2))
      .withColumn("__sgn",
        when(col("__y") * 2L > col("__med2"), 1L)
          .when(col("__y") * 2L < col("__med2"), 0L))
      .filter(col("__sgn").isNotNull)
    val wOrd = Window.orderBy(col("__t"))
    signed
      .withColumn("__chg",
        when(lag(col("__sgn"), 1).over(wOrd).isNull ||
          lag(col("__sgn"), 1).over(wOrd) =!= col("__sgn"), 1L)
          .otherwise(0L))
      .agg(sum(col("__sgn")).as("__n1"),
        sum(lit(1L) - col("__sgn")).as("__n2"),
        sum(col("__chg")).as("runs"))
      .select(col("__n1").as("n_pos"), col("__n2").as("n_neg"), col("runs"),
        // 2n₊n₋ = n ⇒ zero variance (e.g. one of each sign): no z exists
        when(expr("__n1 = 0 OR __n2 = 0 OR 2*__n1*__n2 <= __n1 + __n2"),
            lit(null).cast("double"))
          .otherwise(round(
            (col("runs").cast("double") -
              (lit(2.0) * expr("CAST(__n1 AS DOUBLE)") *
                expr("CAST(__n2 AS DOUBLE)") /
                expr("CAST(__n1 + __n2 AS DOUBLE)") + lit(1.0))) /
            sqrt(lit(2.0) * expr("CAST(__n1 AS DOUBLE)") *
              expr("CAST(__n2 AS DOUBLE)") *
              (lit(2.0) * expr("CAST(__n1 AS DOUBLE)") *
                expr("CAST(__n2 AS DOUBLE)") -
                expr("CAST(__n1 + __n2 AS DOUBLE)")) /
              (expr("CAST(__n1 + __n2 AS DOUBLE)") *
                expr("CAST(__n1 + __n2 AS DOUBLE)") *
                (expr("CAST(__n1 + __n2 AS DOUBLE)") - lit(1.0)))), 4)
            + lit(0.0))
          .as("z"))
  }

  /** Two-proportion z-test (pooled) — the conversion-rate A/B readout:
    * z = (p₁−p₂)/√(p̂(1−p̂)(1/n₁+1/n₂)) with the pooled p̂. Counts are
    * exact; the z is ONE double expression over four exact longs, written
    * identically on both engines. Returns one row
    * (n_1, x_1, n_2, x_2, rate_1, rate_2, z); NULL z when a group is
    * empty or the pooled rate is degenerate (0 or 1). One corpus scan
    * into a 2×2 aggregate. */
  def twoProportionsZ(df: DataFrame, successFlag: Column,
                      groupFlag: Column): DataFrame = {
    val base = df.select(successFlag.cast("boolean").as("__s"),
        groupFlag.cast("boolean").as("__g"))
      .filter(col("__s").isNotNull && col("__g").isNotNull)
    base.agg(
        sum(when(col("__g"), 1L).otherwise(0L)).as("__n1"),
        sum(when(col("__g") && col("__s"), 1L).otherwise(0L)).as("__x1"),
        sum(when(!col("__g"), 1L).otherwise(0L)).as("__n2"),
        sum(when(!col("__g") && col("__s"), 1L).otherwise(0L)).as("__x2"))
      .select(col("__n1").as("n_1"), col("__x1").as("x_1"),
        col("__n2").as("n_2"), col("__x2").as("x_2"),
        (round(expr("CASE WHEN __n1 > 0 THEN" +
          " CAST(__x1 AS DOUBLE) / CAST(__n1 AS DOUBLE) END"), 6)
          + lit(0.0)).as("rate_1"),
        (round(expr("CASE WHEN __n2 > 0 THEN" +
          " CAST(__x2 AS DOUBLE) / CAST(__n2 AS DOUBLE) END"), 6)
          + lit(0.0)).as("rate_2"),
        when(expr("__n1 = 0 OR __n2 = 0 OR __x1 + __x2 = 0" +
            " OR __x1 + __x2 = __n1 + __n2"), lit(null).cast("double"))
          .otherwise(round(
            (expr("CAST(__x1 AS DOUBLE) / CAST(__n1 AS DOUBLE)") -
             expr("CAST(__x2 AS DOUBLE) / CAST(__n2 AS DOUBLE)")) /
            sqrt(expr("CAST(__x1 + __x2 AS DOUBLE) / CAST(__n1 + __n2 AS DOUBLE)") *
              (lit(1.0) - expr("CAST(__x1 + __x2 AS DOUBLE) / CAST(__n1 + __n2 AS DOUBLE)")) *
              (lit(1.0) / expr("CAST(__n1 AS DOUBLE)") +
               lit(1.0) / expr("CAST(__n2 AS DOUBLE)"))), 4) + lit(0.0))
          .as("z"))
  }

  /** Cramér's V — the [0,1] effect size for [[RelationalOps.chiSquare]]'s
    * independence statistic: V = √(χ²/(n·(min(k_a,k_b)−1))), comparable
    * across tables of any size where raw χ² is not (χ² grows with n even
    * at fixed association — the "everything is significant at 1e12 rows"
    * trap). Rides the chiSquare kernel unchanged (exact integer cells,
    * per-cell micro truncation); V is one double expression over
    * chi2_micro and the two exact cardinalities. Null when either margin
    * is constant (V undefined). */
  def cramersV(df: DataFrame, colA: String, colB: String): DataFrame = {
    // the shared kernel already carries the marginal cardinalities — a
    // separate countDistinct pass would re-scan the corpus for nothing
    RelationalOps.chiSquareKernel(df, colA, colB)
      .withColumnRenamed("k_a", "__ka").withColumnRenamed("k_b", "__kb")
      .select(col("n"), col("dof"), col("chi2_micro"),
        col("__ka"), col("__kb"))
      .select(col("n"), col("dof"),
        (round(col("chi2_micro") / 1e6, 4) + lit(0.0)).as("chi2"),
        when(expr("n = 0 OR least(__ka, __kb) <= 1"),
            lit(null).cast("double"))
          .otherwise(round(sqrt(col("chi2_micro").cast("double") / 1e6 /
            (col("n").cast("double") *
              (least(col("__ka"), col("__kb")) - 1).cast("double"))), 4)
            + lit(0.0))
          .as("cramers_v"))
  }

  /** Theil–Sen robust trend — the median of all pairwise slopes over a
    * BOUNDED panel (caller contract: a value-domain or calendar-grain
    * aggregate, like [[kendallTauB]]'s; the all-pairs kernel is quadratic
    * in the PANEL, which a calendar grain keeps data-independent). Breaks
    * down only past 29% outliers where OLS breaks at one — the trend line
    * for metrics with spikes. Slopes are exact-integer differences divided
    * once in double; the median is selected EXPLICITLY (row_number against
    * the pair count, averaging the two middles when even) — no engine
    * quantile whose interpolation arithmetic might differ by an ulp.
    * Intercept is the Conover variant median(y) − slope·median(x), same
    * explicit selection. Returns one row (n, n_slopes, slope, intercept).
    *
    * SIDE-EFFECT caveat: the internal `localCheckpoint(true)` makes
    * DataFrame CONSTRUCTION eagerly run the panel aggregate (explain/plan
    * dumps included) and truncates lineage to executor-local storage — on
    * a cluster an executor loss makes the query unrecoverable. At scale
    * swap for `persist(MEMORY_AND_DISK)` + unpersist or a reliable
    * `checkpoint()`; the plan shape is identical. */
  def theilSen(df: DataFrame, xQ: Column, yQ: Column): DataFrame = {
    // ckpt (optimization r13): the panel feeds FIVE consumers (both sides
    // of the slopes pair join, medX, medY, n) — without materialization
    // each consumer re-executes the caller's corpus-grain aggregate from
    // the scan (5 corpus scans per call; guide §5 "reused AND expensive").
    // The relation is panel-bounded by the caller contract (calendar /
    // value-domain grain), so the one-shot eager checkpoint is tiny; the
    // function is consequently EAGER at construction time.
    val b = df.select(xQ.cast("long").as("__x"), yQ.cast("long").as("__y"))
      .filter(col("__x").isNotNull && col("__y").isNotNull)
      // ckpt: one-shot — panel-bounded by the caller contract, built once
      // per call (no loop); five consumers read it
      .localCheckpoint(true)
    // explicit middle-of-the-sorted-run median; single-partition sorts are
    // panel-bounded by the caller contract
    def median1(vals: DataFrame, v: String, out: String): DataFrame = {
      val w = Window.orderBy(col(v))
      val cnt = vals.agg(count(lit(1)).as("__m"))
      vals.withColumn("__rn", row_number().over(w))
        .crossJoin(broadcast(cnt))
        .filter(col("__rn") === expr("(__m + 1) div 2") ||
          col("__rn") === expr("__m div 2 + 1"))
        .agg(avg(col(v)).as(out), max(col("__m")).as(s"${out}_n"))
    }
    // spread the pair GENERATION (panel × panel/2 rows out of a panel-
    // sized input — the byte-based partitioning of the checkpointed agg
    // output cannot see the quadratic explosion, so without this the
    // whole pair stream is generated on 1-2 tasks); the panel is bounded,
    // so the repartition shuffle is trivially small at any corpus size
    val slopes = b
      .repartition(df.sparkSession.sparkContext.defaultParallelism)
      .join(
        broadcast(b.select(col("__x").as("__x2"), col("__y").as("__y2"))),
        col("__x") < col("__x2"))
      .select(((col("__y2") - col("__y")).cast("double") /
        (col("__x2") - col("__x")).cast("double")).as("__s"))
    val medS = median1(slopes, "__s", "__sl")
    val medX = median1(b.select(col("__x").cast("double").as("__xd")),
      "__xd", "__mx")
    val medY = median1(b.select(col("__y").cast("double").as("__yd")),
      "__yd", "__my")
    val n = b.agg(count(lit(1)).as("n"))
    n.crossJoin(broadcast(medS)).crossJoin(broadcast(medX))
      .crossJoin(broadcast(medY))
      .select(col("n"), col("__sl_n").as("n_slopes"),
        (round(col("__sl"), 6) + lit(0.0)).as("slope"),
        (round(col("__my") - col("__sl") * col("__mx"), 4) + lit(0.0))
          .as("intercept"))
  }

  /** Mutual information between two categorical columns, plus the
    * sqrt-normalized NMI — the model-free association screen (feature
    * selection, leakage detection: a feature with high MI against the
    * label of a held-out split leaks). Counts are exact integers; each
    * cell's contribution c·ln(n·c/(c_a·c_b)) is ONE double expression over
    * exact integers floored to nano units (floor of a bit-identical double
    * is bit-identical), so the cross-cell sum is an exact long sum —
    * order-invariant where a double Σ would depend on partitioning. The
    * entropies for NMI ride the same floored-nano lane. Returns one row
    * (n, n_cells, mi_nats, nmi).
    *
    * Scale shape: one (a,b) cell agg (map-side combinable), two marginal
    * aggs OF THE CELLS (cell-grain, not corpus), one 1-row broadcast —
    * the corpus is scanned once. Nano floor error: ≤ cells·1e-9/n in MI. */
  def mutualInfo(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val base = df.select(aCol.cast("string").as("__a"),
        bCol.cast("string").as("__b"))
      .filter(col("__a").isNotNull && col("__b").isNotNull)
    val cells = base.groupBy("__a", "__b").agg(count(lit(1)).as("__cab"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ma = cells.groupBy("__a").agg(sum(col("__cab")).as("__ca"))
    val mb = cells.groupBy("__b").agg(sum(col("__cab")).as("__cb"))
    val tot = cells.agg(sum(col("__cab")).cast("long").as("__n"))
    def nano(x: Column): Column = floor(x * lit(1e9)).cast("long")
    val joined = cells.join(ma, "__a").join(mb, "__b")
      .crossJoin(broadcast(tot))
    val haNano = ma.crossJoin(broadcast(tot))
      .agg(sum(nano(col("__ca").cast("double") *
        log(col("__n").cast("double") / col("__ca").cast("double"))))
        .as("__ha"))
    val hbNano = mb.crossJoin(broadcast(tot))
      .agg(sum(nano(col("__cb").cast("double") *
        log(col("__n").cast("double") / col("__cb").cast("double"))))
        .as("__hb"))
    joined
      .agg(max(col("__n")).as("__n"), count(lit(1)).as("n_cells"),
        sum(nano(col("__cab").cast("double") *
          log(col("__n").cast("double") * col("__cab").cast("double") /
            (col("__ca").cast("double") * col("__cb").cast("double")))))
          .as("__mi"))
      .crossJoin(broadcast(haNano)).crossJoin(broadcast(hbNano))
      .select(col("__n").as("n"), col("n_cells"),
        // +0.0 normalizes the -0.0 a floored near-zero MI can round to
        (round(col("__mi").cast("double") /
          (lit(1e9) * col("__n").cast("double")), 6) + lit(0.0)).as("mi_nats"),
        // the 1e9·n scale cancels: MI/√(Ha·Hb) = __mi/√(__ha·__hb)
        when(expr("__ha <= 0 OR __hb <= 0"), lit(null).cast("double"))
          .otherwise(round(col("__mi").cast("double") /
            sqrt(col("__ha").cast("double") * col("__hb").cast("double")),
            6) + lit(0.0))
          .as("nmi"))
  }

  /** Difference-in-differences — the pre/post × treat/control 2×2 that
    * turns "the metric moved after launch" into "the metric moved MORE for
    * the treated" (parallel-trends causal readout; the additive sibling of
    * [[RelationalOps]]' CUPED regression adjustment). Four cell means in
    * micro units (one `div` each, engine-identical); the DiD contrast is
    * exact long arithmetic over them. Returns one row with the four means
    * and `did`. One map-side-combinable 4-cell aggregate — single corpus
    * scan, no shuffle beyond the 4-row reduce. */
  def diffInDiff(df: DataFrame, valueQ: Column, treated: Column,
                 post: Column): DataFrame = {
    val base = df.select(valueQ.cast("long").as("__y"),
        treated.cast("boolean").as("__t"), post.cast("boolean").as("__p"))
      .filter(col("__y").isNotNull && col("__t").isNotNull &&
        col("__p").isNotNull)
    val cells = base.groupBy("__t", "__p")
      .agg(count(lit(1)).as("__n"), sum(col("__y").cast(d38)).as("__s"))
      .withColumn("__m", expr("(1000000 * __s) div __n"))
    cells.agg(sum(col("__n")).as("n"),
        max(when(col("__t") && !col("__p"), col("__m"))).as("__m10"),
        max(when(col("__t") && col("__p"), col("__m"))).as("__m11"),
        max(when(!col("__t") && !col("__p"), col("__m"))).as("__m00"),
        max(when(!col("__t") && col("__p"), col("__m"))).as("__m01"))
      .select(col("n"),
        (col("__m10") / 1e6).as("mean_treat_pre"),
        (col("__m11") / 1e6).as("mean_treat_post"),
        (col("__m00") / 1e6).as("mean_ctrl_pre"),
        (col("__m01") / 1e6).as("mean_ctrl_post"),
        (((col("__m11") - col("__m10")) - (col("__m01") - col("__m00"))) /
          1e6).as("did"))
  }

  /** Brier-score decomposition (Murphy 1973) over a basis-point score —
    * the scalar companion to [[RelationalOps]]' calibration panel: total
    * Brier = reliability − resolution + uncertainty (up to binning), so a
    * pipeline reads WHERE a score's loss comes from (mis-calibration vs
    * lack of discrimination) before recalibrating. Scores are exact bp
    * integers; per-row squared error Σ(p−o)² accumulates exactly in
    * decimal(38,0); per-bin mean score / event rate truncate to micro
    * units (the theta_micro convention) and the two decomposition sums
    * accumulate exactly around them. NULL labels are EXCLUDED (the
    * file-wide convention) — an unlabeled row is no evidence, not a
    * negative outcome. Returns one row
    * (n, brier, reliability, resolution, uncertainty).
    *
    * Scale shape: one row-grain agg to bin grain (≤ bins rows), then
    * arithmetic against a 1-row broadcast — corpus scanned once. */
  def brierDecomposition(df: DataFrame, scoreBp: Column, label: Column,
                         bins: Int): DataFrame = {
    require(bins >= 2 && bins <= 10000, s"bins out of range: $bins")
    val base = df.select(scoreBp.cast("long").as("__p"),
        when(label.cast("boolean"), 1L)
          .when(!label.cast("boolean"), 0L).as("__o"))
      .filter(col("__p").between(0L, 10000L) && col("__o").isNotNull)
    val perB = base
      .withColumn("__b", least(expr(s"(__p * $bins) div 10000"),
        lit((bins - 1).toLong)))
      .groupBy("__b")
      .agg(count(lit(1)).cast(d38).as("__nb"),
        sum(col("__p").cast(d38)).as("__sp"),
        sum(col("__o").cast(d38)).as("__pos"),
        sum(((col("__p") - lit(10000L) * col("__o")).cast(d38) *
          (col("__p") - lit(10000L) * col("__o")).cast(d38)).cast(d38))
          .as("__sq"))
    val tot = perB.agg(sum(col("__nb")).as("__n"),
      sum(col("__pos")).as("__posall"))
    perB.crossJoin(broadcast(tot))
      // bin mean score and bin event rate in micro-probability units:
      // score bp → micro is ×100; rates are (1e6·pos) div n
      .withColumn("__pbm", expr("(100 * __sp) div __nb"))
      .withColumn("__obm", expr("(1000000 * __pos) div __nb"))
      .withColumn("__obmall", expr("(1000000 * __posall) div __n"))
      .agg(max(col("__n")).as("__n"), max(col("__posall")).as("__posall"),
        sum(col("__sq")).as("__sqall"),
        sum((col("__nb") * (col("__pbm") - col("__obm")).cast(d38) *
          (col("__pbm") - col("__obm")).cast(d38)).cast(d38)).as("__rel"),
        sum((col("__nb") * (col("__obm") - col("__obmall")).cast(d38) *
          (col("__obm") - col("__obmall")).cast(d38)).cast(d38)).as("__res"))
      .select(col("__n").cast("long").as("n"),
        round(expr("CAST(__sqall AS DOUBLE)") /
          (lit(1e8) * expr("CAST(__n AS DOUBLE)")), 6).as("brier"),
        round(expr("CAST(__rel AS DOUBLE)") /
          (lit(1e12) * expr("CAST(__n AS DOUBLE)")), 6).as("reliability"),
        round(expr("CAST(__res AS DOUBLE)") /
          (lit(1e12) * expr("CAST(__n AS DOUBLE)")), 6).as("resolution"),
        round(expr("CAST(__posall AS DOUBLE)") *
          (expr("CAST(__n AS DOUBLE)") - expr("CAST(__posall AS DOUBLE)")) /
          (expr("CAST(__n AS DOUBLE)") * expr("CAST(__n AS DOUBLE)")), 6)
          .as("uncertainty"))
  }

  /** Log-rank test (Mantel–Cox) — "do two cohorts share a survival
    * curve?", the inferential companion to [[Timeseries.kaplanMeier]]
    * (which draws the curves; this says whether their gap is noise).
    * Same subjects-relation input and the same value-domain at-risk
    * kernel: one agg to the distinct-duration grain, a reverse cumulative
    * window bounded by the duration domain. At each event time the
    * hypergeometric mean d·n1/n and variance d·n1(n−n1)(n−d)/(n²(n−1))
    * truncate to micro units (`div` ≡ `//`); O−E and the z-score are one
    * double expression at the end. Returns one row
    * (observed_1, expected_1, variance, z).
    *
    * Overflow headroom: the variance numerator rides decimal(38,0) at
    * ≤ 1e6·d·n³ — safe while subjects-per-distinct-duration keeps
    * d·n³ < 1e32 (any realistic duration quantization; coarsen the
    * duration unit if a single tick ever holds ~n events). */
  def logRank(df: DataFrame, durationCol: Column, eventCol: Column,
              groupFlag: Column): DataFrame = {
    val base = df.select(durationCol.cast("long").as("t"),
        eventCol.cast("boolean").as("__e"), groupFlag.cast("boolean").as("__g1"))
      .filter(col("t").isNotNull && col("__e").isNotNull &&
        col("__g1").isNotNull)
    val grain = base.groupBy("t").agg(
      count(lit(1)).as("__a"),
      sum(when(col("__g1"), 1L).otherwise(0L)).as("__a1"),
      sum(when(col("__e"), 1L).otherwise(0L)).as("__d"),
      sum(when(col("__e") && col("__g1"), 1L).otherwise(0L)).as("__d1"))
    // single-partition sort bound: the duration value domain (the
    // kaplanMeier bound), never the subject rows
    val wPrev = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = grain.agg(sum(col("__a")).cast("long").as("__n"),
      sum(col("__a1")).cast("long").as("__n1t"))
    grain.crossJoin(broadcast(tot))
      .withColumn("__ni",
        col("__n") - coalesce(sum(col("__a")).over(wPrev), lit(0L)))
      .withColumn("__n1i",
        col("__n1t") - coalesce(sum(col("__a1")).over(wPrev), lit(0L)))
      .filter(col("__d") > 0L)
      .agg(sum(col("__d1")).as("__o1"),
        sum(expr(s"(1000000 * CAST(__d AS $d38) * __n1i) div __ni"))
          .as("__e1m"),
        sum(when(col("__ni") > 1L,
          expr(s"(1000000 * CAST(__d AS $d38) * __n1i * (__ni - __n1i)" +
            s" * (__ni - __d)) div (CAST(__ni AS $d38) * __ni * (__ni - 1))"))
          .otherwise(lit(0L))).as("__vm"))
      .select(col("__o1").as("observed_1"),
        round(col("__e1m").cast("double") / 1e6, 4).as("expected_1"),
        round(col("__vm").cast("double") / 1e6, 4).as("variance"),
        when(col("__vm") <= 0L, lit(null).cast("double"))
          .otherwise(round(
            (col("__o1").cast("double") - col("__e1m").cast("double") / 1e6) /
              sqrt(col("__vm").cast("double") / 1e6), 4) + lit(0.0))
          .as("z"))
  }

  /** One-way ANOVA — the between/within variance decomposition over a
    * quantized metric: F = (SSB/(k−1))/(SSW/(n−k)) plus the effect size
    * η² = SSB/(SSB+SSW) (an F alone says "significant", η² says "how
    * much"). Group and grand means truncate to micro units (the one
    * engine-identical inexactness); both sums of squares then accumulate
    * exactly in decimal(38,0) around those truncated means, so SSW ≥ 0
    * structurally. F and η² are double expressions over the two exact
    * scaled sums — no big cross-product, so the decimal headroom bound is
    * Σn_g·dev², safe to corpus sizes ~1e12 at cent quantization.
    *
    * Scale shape: ONE map-side-combinable (group, Σv, Σv², n) aggregate,
    * then group-grain arithmetic against a 1-row broadcast. */
  def anovaF(df: DataFrame, valueQ: Column, groupCol: String): DataFrame = {
    val perG = df.select(col(groupCol).as("__g"), valueQ.cast("long").as("__v"))
      .filter(col("__g").isNotNull && col("__v").isNotNull)
      .groupBy("__g")
      .agg(count(lit(1)).cast(d38).as("__ng"),
        sum(col("__v").cast(d38)).as("__sg"),
        sum((col("__v").cast(d38) * col("__v")).cast(d38)).as("__ssg"))
    val tot = perG.agg(sum(col("__ng")).as("__n"),
      sum(col("__sg")).as("__s"))
    perG.crossJoin(broadcast(tot))
      .withColumn("__mg", expr("(1000000 * __sg) div __ng"))
      .withColumn("__gm", expr("(1000000 * __s) div __n"))
      .agg(max(col("__n")).as("__n"), count(lit(1)).as("__k"),
        sum((col("__ng") * (col("__mg") - col("__gm")).cast(d38) *
          (col("__mg") - col("__gm")).cast(d38)).cast(d38)).as("__ssb"),
        sum((expr(s"CAST(1000000000000 AS $d38) * __ssg") -
          expr(s"2 * CAST(__mg AS $d38) * 1000000 * __sg") +
          (col("__ng") * col("__mg").cast(d38) * col("__mg").cast(d38))
            .cast(d38)).cast(d38)).as("__ssw"))
      .select(col("__n").cast("long").as("n"), col("__k").as("k"),
        when(expr("__ssw = 0 OR __k <= 1 OR __n <= __k"),
            lit(null).cast("double"))
          .otherwise(round(
            (expr("CAST(__ssb AS DOUBLE)") / expr("CAST(__k - 1 AS DOUBLE)")) /
            (expr("CAST(__ssw AS DOUBLE)") / expr("CAST(__n - __k AS DOUBLE)")),
            4) + lit(0.0)).as("f_stat"),
        when(expr("__ssb + __ssw = 0"), lit(null).cast("double"))
          .otherwise(round(expr("CAST(__ssb AS DOUBLE)") /
            (expr("CAST(__ssb AS DOUBLE)") + expr("CAST(__ssw AS DOUBLE)")),
            6) + lit(0.0)).as("eta_sq"))
  }
}
