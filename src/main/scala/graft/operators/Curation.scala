package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-curation operators beyond per-document scoring: sequence packing
  * for training batches and per-domain mixture sampling. Like the rest of
  * the curation family these are declared as lazy plans over the documents
  * table — composable with the dedup keep-lists and quality filters.
  * (Reference scope: the per-event scoring/filter stages of
  * samza-hello-samza's cookbook pipelines, e.g. FilterExample.java:96-99,
  * generalized to the batch curation ops a training pipeline needs.) */
object Curation {

  /** Per-round checkpoint with ORIGIN STATISTICS DROPPED — loop kernels
    * must use this, never bare localCheckpoint: inherited size estimates
    * compound across rounds (see ColumnBridge.flatCheckpoint). */
  private def flatCk(df: DataFrame): DataFrame =
    org.apache.spark.sql.graft.ColumnBridge.flatCheckpoint(df)

  /** Overflow-safe Knuth multiplicative hash of an id column, in [0, mod):
    * the id reduces mod a prime BEFORE the multiply so the product stays
    * well inside Long range at any id (a raw id * 2654435761 wraps past
    * id ≈ 3.5e9 — Spark would silently wrap while an ANSI engine errors,
    * breaking cross-engine reproducibility). The ONE definition both
    * samplers and their oracle twins mirror — change it here and in the
    * SQL together, nowhere else. */
  private[graft] def knuthHash(id: org.apache.spark.sql.Column, mod: Long) =
    pmod(pmod(id, lit(1000003L)) * 2654435761L, lit(mod))

  /** Deterministic train/validation/test split — the eval-holdout stage
    * every training pipeline runs before anything touches the data. The
    * SAME id hash as the samplers buckets each document into a named
    * split by cumulative percentage thresholds: with (train 90, val 5,
    * test 5), hash < 90 → train, < 95 → val, else test. Properties that
    * matter and fall out of the hash: membership is a pure function of
    * the id (reproducible across runs, machines, and engines — no seed
    * state to lose), immune to ingest order, and STABLE UNDER GROWTH —
    * a document added tomorrow cannot move today's documents between
    * splits, so eval contamination can't creep in through re-splitting.
    * Scale shape: one scan-side codegen'd projection, zero shuffles.
    * `splits` maps name → percentage; must sum to 100. Iteration order
    * of the thresholds is the ascending cumulative boundary, so the
    * assignment is independent of map ordering. */
  def splitAssignments(df: DataFrame, idCol: String,
                       splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percentages must sum to 100: $splits")
    require(splits.forall(_._2 > 0), s"every split needs a positive share: $splits")
    val h = knuthHash(col(idCol), 100L)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val expr0 = splits.zip(cum).init.foldRight(lit(splits.last._1)) {
      case (((name, _), bound), rest) => when(h < bound, name).otherwise(rest)
    }
    // a null id hashes to null, every `h < bound` is false, and the
    // fold's otherwise would SILENTLY route the row into the LAST split —
    // concentrated eval contamination from exactly the malformed rows a
    // holdout stage must reject. Fail loudly at execution instead.
    val guarded = when(col(idCol).isNull,
      raise_error(lit(s"splitAssignments: null $idCol — split membership " +
        "must be a pure function of a non-null id"))).otherwise(expr0)
    df.select(col(idCol), guarded.as("split"))
  }

  /** Train a decision STUMP (one-split classifier) exactly: for every
    * feature, every observed value is a candidate threshold; the rule
    * `value <= t → pos` (or its flipped polarity) is scored by exact
    * cumulative label counts, and the argmax is deterministic
    * (accuracy desc, feature asc, threshold asc, polarity asc). One row:
    * (feature, threshold, polarity 'le_pos'|'le_neg', acc_bp).
    *
    * The trainable upgrade path between hand rules ([[qualityPercentileCut]])
    * and the shipped linear model ([[graft.operators.TextAnalysis.linearScoreScan]]):
    * exact, seedless, engine-portable — training IS a query, so the model
    * artifact is auditable the same way every other result is.
    *
    * Scale shape: one unpivot + one aggregate to (feature, value) grain;
    * the threshold sweep is a per-feature window over the VALUE DOMAIN
    * (bounded for integer-ish features, the KS/Gini argument); the argmax
    * is a 1-row TakeOrdered. The corpus is scanned once. */
  def trainStump(df: DataFrame, featureCols: Seq[String],
                 labelCol: String): DataFrame = {
    require(featureCols.nonEmpty, "need at least one feature")
    val stacked = featureCols.map { f =>
      df.filter(col(f).isNotNull && col(labelCol).isNotNull)
        .select(lit(f).as("feature"), col(f).cast("long").as("value"),
          col(labelCol).cast("boolean").as("pos"))
    }.reduce(_ unionByName _)
    val grain = stacked.groupBy("feature", "value")
      .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("np"),
        sum(when(col("pos"), 0L).otherwise(1L)).as("nn"))
    val w = Window.partitionBy(col("feature")).orderBy(col("value"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = grain.groupBy("feature")
      .agg(sum("np").as("tp"), sum("nn").as("tn"))
    grain
      .select(col("feature"), col("value"),
        sum("np").over(w).as("cnp"), sum("nn").over(w).as("cnn"))
      .join(tot, "feature")
      .select(col("feature"), col("value"), col("tp"), col("tn"),
        (col("cnp") + col("tn") - col("cnn")).as("acc_le_pos"),
        (col("cnn") + col("tp") - col("cnp")).as("acc_le_neg"))
      .select(col("feature"), col("value").as("threshold"),
        when(col("acc_le_pos") >= col("acc_le_neg"), lit("le_pos"))
          .otherwise(lit("le_neg")).as("polarity"),
        expr("greatest(acc_le_pos, acc_le_neg) * 10000 div (tp + tn)")
          .as("acc_bp"))
      .orderBy(col("acc_bp").desc, col("feature").asc,
        col("threshold").asc, col("polarity").asc)
      .limit(1)
  }

  /** K-FOLD CROSS-VALIDATION of the decision stump — the measure-twice
    * discipline [[trainStump]]'s single split can't give: the train
    * accuracy of a model selected ON the training set is optimistically
    * biased, and CV is the standard estimate of the real one. Folds are
    * the deterministic id hash (reproducible membership, the
    * [[splitAssignments]] contract); per fold, the stump trains on the
    * other k−1 folds and scores the held-out fold with the EXACT
    * bp-accuracy lane. A stable gap between train_acc_bp and test_acc_bp
    * across folds is the overfit signal; fold-to-fold variance of
    * test_acc_bp is the error bar.
    *
    * Scale shape: the featurized frame materializes once (lazy persist —
    * 2k passes read it); each fold is the trainStump aggregate (value-
    * domain grain) plus one test-fold aggregate, and the per-fold model
    * is a 1-row collect (driver-state bounded class). Eval rows with a
    * NULL chosen-feature or label drop, mirroring training's per-feature
    * null filter. */
  def crossValidateStump(df: DataFrame, idCol: String,
                         featureCols: Seq[String], labelCol: String,
                         folds: Int): DataFrame = {
    require(folds >= 2 && folds <= 10, s"folds=$folds")
    val withFold = df
      .withColumn("__fold", knuthHash(col(idCol), folds.toLong))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rows = (0 until folds).map { f =>
      val stump = trainStump(withFold.filter(col("__fold") =!= f),
        featureCols, labelCol).collect()(0)
      val (feat, thr, pol) =
        (stump.getString(0), stump.getLong(1), stump.getString(2))
      val pred =
        if (pol == "le_pos") col(feat).cast("long") <= thr
        else col(feat).cast("long") > thr
      val m = withFold.filter(col("__fold") === f)
        .filter(col(feat).isNotNull && col(labelCol).isNotNull)
        .agg(count(lit(1)),
          sum(when(pred === col(labelCol).cast("boolean"), 1L)
            .otherwise(0L)))
        .collect()(0)
      val nTest = m.getLong(0)
      (f.toLong, feat, thr, pol, stump.getLong(3), nTest,
        if (nTest > 0) m.getLong(1) * 10000L / nTest else 0L)
    }
    withFold.unpersist()
    import df.sparkSession.implicits._
    rows.toDF("fold", "feature", "threshold", "polarity",
      "train_acc_bp", "n_test", "test_acc_bp")
  }

  /** GROUP-atomic split: like [[splitAssignments]], but membership hashes
    * the GROUP key, so every row of a group lands in the same split —
    * the GroupKFold hygiene rule that stops near-duplicate families,
    * multi-chunk documents, or per-user event histories from straddling
    * train/eval (the leakage [[splitLeakage]]-style audits detect, closed
    * off at assignment time instead). Same stability contract as the id
    * hash: pure function of the group key, immune to growth. */
  def groupSplitAssignments(df: DataFrame, groupCol: String,
                            splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percentages must sum to 100: $splits")
    require(splits.forall(_._2 > 0), s"every split needs a positive share: $splits")
    // group keys may be strings — hash to a stable long first (the md5
    // oracle lane, engine-identical in DuckDB), then the Knuth bucket
    val h = knuthHash(graft.operators.Sketches.md5Hash32(col(groupCol)), 100L)
    val cum = splits.scanLeft(0)(_ + _._2).tail
    val expr0 = splits.zip(cum).init.foldRight(lit(splits.last._1)) {
      case (((name, _), bound), rest) => when(h < bound, name).otherwise(rest)
    }
    val guarded = when(col(groupCol).isNull,
      raise_error(lit(s"groupSplitAssignments: null $groupCol — split " +
        "membership must be a pure function of a non-null group")))
      .otherwise(expr0)
    df.withColumn("split", guarded)
  }

  /** Time-based split with an EMBARGO gap — the leakage-free eval recipe
    * for temporally correlated data: rows strictly before `trainEnd`
    * train; rows inside [trainEnd, trainEnd + embargo) are discarded as
    * "embargo" (temporal near-duplicates of late-train rows would
    * otherwise leak into eval); rows at or beyond the embargo boundary
    * test. Pure scan-side projection. */
  def timeSplit(df: DataFrame, tsCol: String, trainEnd: String,
                embargo: String): DataFrame = {
    val end = lit(trainEnd).cast("timestamp")
    val gap = end + expr(s"INTERVAL $embargo")
    df.withColumn("split",
      when(col(tsCol).isNull, raise_error(lit(
        s"timeSplit: null $tsCol — split membership must be a pure " +
          "function of a non-null timestamp")))
        .when(col(tsCol) < end, "train")
        .when(col(tsCol) < gap, "embargo")
        .otherwise("test"))
  }

  /** Curriculum sharding: rank documents by a difficulty proxy WITHIN each
    * group (descending, id tie-break) and deal them round-robin across
    * `numShards` — every shard receives a stratified difficulty mix from
    * every group, so a trainer consuming shards in any order sees the same
    * curriculum distribution (contrast [[graft.operators.Outputs]]'
    * hash sharding, which stratifies by nothing). Output:
    * (id, group, rank, shard).
    *
    * Scale shape: the window partitions by `groupCol` — per-partition
    * state is one group's documents, never global. If one group dwarfs
    * the rest, pre-split it (salt the group id by a difficulty band) —
    * round-robin within each sub-band preserves the stratification
    * guarantee. */
  def curriculumShards(df: DataFrame, idCol: String, scoreCol: String,
                       groupCol: String, numShards: Int): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1: $numShards")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol).desc, col(idCol))
    df.select(col(idCol), col(groupCol), col(scoreCol))
      .withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("shard", ((col("rank") - 1) % numShards).cast("long"))
  }

  /** THE keep rule every percentage sampler applies (batch and streaming):
    * a row survives when its id hash lands below the keep percentage.
    * Centralized so the comparison (`<`, mod 100) can never drift between
    * the sampler family members and their oracle twins. */
  private[graft] def keepsAtPct(id: org.apache.spark.sql.Column,
                                pct: org.apache.spark.sql.Column) =
    knuthHash(id, 100L) < pct

  /** Basis-point-grain keep rule — the executor of [[tokenBudget]]'s
    * `rate_bp` allocations (percentage grain would quantize a 10000-way
    * plan down to 100 steps). Same hash, same comparison shape. */
  private[graft] def keepsAtBp(id: org.apache.spark.sql.Column,
                               bp: org.apache.spark.sql.Column) =
    knuthHash(id, 10000L) < bp

  /** Execute a mixture plan: keep each document with its source's
    * `rate_bp` from an allocation relation (the [[tokenBudget]] output —
    * plan and execution compose LAZILY: corpus → avail counts →
    * water-fill → rate filter, with nothing running until the caller's
    * first action — the water-fill rounds chain through lazy
    * localCheckpoints that truncate lineage when that action
    * materializes them). Sources
    * absent from the plan drop (rate 0 — an unplanned source has no
    * budget). The keep decision is the shared deterministic id hash at
    * bp grain: reruns, engines, and partitionings agree row for row,
    * and the realized token count lands within hash noise of
    * `alloc_tokens` (the plan's rate is exact; the sample is the same
    * Bernoulli-by-hash every sampler here uses).
    *
    * Scale shape: the allocation relation is sources-sized and attaches
    * BROADCAST; the corpus scans once through a codegen filter. */
  def allocationSample(docs: DataFrame, idCol: String, domainCol: String,
                       alloc: DataFrame, allocSourceCol: String,
                       rateBpCol: String): DataFrame =
    docs.join(broadcast(alloc.select(col(allocSourceCol).as("__src"),
        col(rateBpCol).cast("long").as("__bp"))),
        docs(domainCol) === col("__src"), "inner")
      .filter(keepsAtBp(col(idCol), col("__bp")))
      .drop("__src", "__bp")

  /** FRACTIONAL-EPOCH UPSAMPLING — the other half of mixture execution:
    * [[allocationSample]] downsamples a source to a keep rate ≤ 1; this
    * REPEATS documents to hit a rate ≥ 1 (e.g. rate_bp 27000 = "2.7
    * epochs": every doc appears twice, a deterministic 70% hash-slice
    * appears a third time — the multi-epoch data weighting of every
    * modern LM data recipe). The extra-copy decision is the same Knuth id
    * hash as every sampler here (bp grain), so reruns, engines, and
    * partitionings emit the identical copy multiset, and composing with
    * the downsampler is consistent: rate_bp < 10000 degenerates to
    * exactly [[allocationSample]]'s Bernoulli keep. Emits (id, domain,
    * copy_idx) with copy_idx 1..copies; sources absent from `rates` drop
    * (no budget — allocationSample's convention).
    *
    * Scale shape: rates broadcast (sources-sized); the corpus scans once
    * through a codegen projection + Generate — output rows = Σ copies,
    * which is the POINT (the training set IS bigger); no shuffle at all.
    * Shard-shuffle the result downstream if copies must not co-locate. */
  def repeatUpsample(docs: DataFrame, idCol: String, domainCol: String,
                     rates: DataFrame, rateSourceCol: String,
                     rateBpCol: String): DataFrame = {
    val copies = expr("__bp div 10000") +
      when(knuthHash(col(idCol), 10000L) < pmod(col("__bp"), lit(10000L)), 1L)
        .otherwise(0L)
    docs.join(broadcast(rates.select(col(rateSourceCol).as("__src"),
        col(rateBpCol).cast("long").as("__bp"))),
        docs(domainCol) === col("__src"), "inner")
      .withColumn("__copies", copies)
      .filter(col("__copies") >= 1L)
      .select(col(idCol), col(domainCol),
        explode(sequence(lit(1L), col("__copies"))).as("copy_idx"))
  }

  /** Concat-then-chunk sequence packing: documents are laid end-to-end in
    * deterministic (shard, id) order and cut into fixed `budgetTokens`
    * context windows. Each document reports the pack it STARTS in and its
    * token offset inside that pack — the exact placement a training-batch
    * writer needs.
    *
    * Scale shape: packing is inherently sequential PER STREAM, so the shard
    * column is the parallelism unit (source, date bucket, …) — one window
    * shuffle partitioned by shard, running sums within. No global order, no
    * driver involvement; 100 TB packs as wide as the shard count. The
    * running sum stays in LONG (exact) and pack ids come from integer
    * division — no double rounding at any scale. */
  def packSequences(docs: DataFrame, textCol: String, idCol: String,
                    shardCol: String, budgetTokens: Int): DataFrame = {
    require(budgetTokens > 0, s"budgetTokens must be positive: $budgetTokens")
    val w = Window.partitionBy("shard").orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .select(col(idCol), col(shardCol).as("shard"),
        graft.functions.TextFunctions.tokenCount(col(textCol)).as("n_tokens"))
      .withColumn("start_off", coalesce(sum("n_tokens").over(w), lit(0L)))
      .select(col(idCol), col("shard"), col("n_tokens"),
        expr(s"start_off div $budgetTokens").as("pack_id"),
        pmod(col("start_off"), lit(budgetTokens.toLong)).as("offset_in_pack"))
  }

  /** Per-domain mixture sampling: each domain keeps a target percentage of
    * its documents, chosen by a deterministic content-independent hash of
    * the id (reproducible across runs and engines — same Knuth
    * multiplicative hash as the stratified sampler — see `knuthHash` for
    * the overflow-safety contract). Domains absent from `rates` fall back
    * to `defaultPct`.
    *
    * Scale shape: the rate table is domain-cardinality (tiny) and
    * broadcasts; the corpus side is scan → broadcast-hash-join → filter,
    * zero shuffle of the corpus. Returns the kept rows with their target
    * rate attached; aggregate downstream for the realized mix. */
  def domainMixSample(docs: DataFrame, idCol: String, domainCol: String,
                      rates: Map[String, Int], defaultPct: Int = 0): DataFrame = {
    require(rates.values.forall(p => p >= 0 && p <= 100) &&
      defaultPct >= 0 && defaultPct <= 100, "rates must be percentages in [0,100]")
    val spark = docs.sparkSession
    import spark.implicits._
    val ratesDf = rates.toSeq.toDF("__domain", "__pct")
    docs
      .join(broadcast(ratesDf), docs(domainCol) === col("__domain"), "left")
      .withColumn("target_pct", coalesce(col("__pct"), lit(defaultPct)).cast("long"))
      .filter(keepsAtPct(col(idCol), col("target_pct")))
      .drop("__domain", "__pct")
  }

  /** Temperature-based mixture sampling: per-domain keep percentages
    * derived from corpus counts — weight w_d ∝ N_d^alpha (alpha in (0,1]
    * flattens the mix toward uniform, the standard multilingual
    * rebalancing rule), target kept count n_d = targetTotal·w_d/Σw,
    * keep percentage pct_d = min(100, round(100·n_d/N_d)). Rows are then
    * kept by the same deterministic `knuthHash` filter as the other
    * samplers, so the realized sample is reproducible across runs and
    * engines.
    *
    * Scale shape: the domain-count agg is map-side combinable and
    * domain-cardinality small; the Σw normalization is a 1-row broadcast
    * (no window, no driver collect); the per-domain pct table broadcasts
    * back over the scan. The corpus never shuffles.
    *
    * Determinism: each weight N^α rounds to an exact integer micro-unit
    * PER DOMAIN before the Σw sum — so the only cross-row sum is over
    * integers (order-invariant, engine-identical), and pct_d is computed
    * from identical exact integers in both engines before its own integer
    * rounding. A raw double Σw would be partition-order dependent and
    * ulp-divergent from the oracle's pow/sum at .5 pct boundaries — the
    * same reasoning as `corpusStats`' entropy terms.
    *
    * Rows with a NULL domain are excluded from BOTH the normalization and
    * the output (an equi-join could never keep them, and counting their
    * weight in Σw would silently deflate every real domain's rate); route
    * them through `domainMixSample`'s `defaultPct` path if they should be
    * sampled. Returns kept rows with their domain's pct attached. */
  def temperatureSample(docs: DataFrame, idCol: String, domainCol: String,
                        alpha: Double, targetTotal: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1]: $alpha")
    val nonNull = docs.filter(col(domainCol).isNotNull)
    val counts = nonNull.groupBy(col(domainCol).as("__dom"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__w", round(pow(col("__n"), lit(alpha)) * 1e6, 0).cast("long"))
    val z = counts.select(sum("__w").as("__z"))
    val pcts = counts.crossJoin(broadcast(z))
      .select(col("__dom"),
        least(lit(100L),
          round(lit(100.0) * targetTotal * (col("__w") / col("__z")) / col("__n"), 0)
            .cast("long")).as("keep_pct"))
    nonNull.join(broadcast(pcts), nonNull(domainCol) === col("__dom"))
      .filter(keepsAtPct(col(idCol), col("keep_pct")))
      .drop("__dom")
  }

  /** Exact-size deterministic sample: exactly `n` documents per group
    * (all of them if the group is smaller), chosen by ranking a
    * content-independent hash of the id — reproducible across runs,
    * partitionings, and engines, unlike `TABLESAMPLE`/`rand()`.
    * `domainMixSample` keeps a PERCENTAGE; this keeps a COUNT — the form a
    * fixed token-budget mix ("exactly 1M docs per language") needs.
    *
    * Scale shape: the per-group ranking is NOT a window sort (which would
    * shuffle and sort every row) but the bounded `TopKHits` aggregate —
    * map-side combinable with ≤ n elements of state per (task, group), so
    * the shuffle carries tasks × groups × n rows regardless of corpus
    * size. Hash ties (rare) break by the smaller id, exactly like the
    * oracle's ORDER BY. */
  def fixedSizeSample(docs: DataFrame, idCol: String, groupCol: String,
                      n: Int): DataFrame = {
    val topn = udaf(new graft.functions.TopKHits(n), graft.functions.TopKHits.hitEncoder)
    // the shared Knuth hash, NEGATED so the max-first top-k aggregate keeps
    // the n SMALLEST hash values — matching the oracle's ascending
    // row_number order.
    val h = knuthHash(col(idCol), 1000000007L)
    docs.select(col(groupCol).as("grp"), col(idCol))
      .withColumn("__negh", -h.cast("double"))
      .groupBy("grp").agg(topn(col("__negh"), col(idCol)).as("hits"))
      .select(col("grp"), explode(col("hits.id")).as(idCol))
  }

  /** Weighted sampling without replacement via SEQUENTIAL POISSON SAMPLING
    * (Ohlsson 1998, the order-sampling scheme statistics agencies use for
    * approximate probability-proportional-to-size draws): each row gets
    * priority key u/w — u a deterministic uniform from the shared Knuth id
    * hash, w its weight — and the sample is the `n` smallest keys. A
    * heavier row divides its uniform by more, so it floats toward the
    * front with probability ≈ proportional to its weight; weight 0 means
    * "never sampled" and such rows are excluded by contract (a length-0
    * document has no tokens to contribute to a token-budget draw).
    *
    * Determinism across engines, runs, and partitionings: u and w are
    * integers and the key is ONE double division — IEEE 754 requires
    * correctly-rounded division, so both engines produce the identical
    * bit pattern (no ln/pow, whose last-ulp freedom could flip an
    * ordering; this is why Sequential Poisson over the classic
    * Efraimidis–Spirakis u^(1/w) key). Key ties break by the smaller id
    * on both sides.
    *
    * Scale shape: the key is a scan-side codegen projection; selection is
    * the bounded `TopKHits` aggregate (≤ n elements of map-side state,
    * shuffle carries tasks × n rows), then one broadcast self-join of the
    * n-row winner list back to the input re-attaches the weight column.
    * No window sort, no full-corpus shuffle. */
  def weightedSample(docs: DataFrame, idCol: String, weightCol: String,
                     n: Int): DataFrame = {
    require(n > 0, s"sample size must be positive: $n")
    val topn = udaf(new graft.functions.TopKHits(n), graft.functions.TopKHits.hitEncoder)
    val u = (knuthHash(col(idCol), 1000000007L) + 1).cast("double")
    val scored = docs
      .filter(col(idCol).isNotNull && col(weightCol) > 0)
      .select(col(idCol).cast("long").as("__id"),
        col(weightCol).cast("long").as("__w"),
        (u / col(weightCol)).as("sel_key"))
    val winners = scored
      .agg(topn(-col("sel_key"), col("__id")).as("hits"))
      .select(explode(col("hits.id")).as("__id"))
    scored.join(broadcast(winners), "__id")
      .select(col("__id").as(idCol), col("__w").as("weight"), col("sel_key"))
  }

  /** Fixed-size token chunking with overlap: each document splits into
    * windows of `chunkTokens` tokens whose starts advance by `stride`
    * (stride < chunkTokens ⇒ overlapping context windows, the standard
    * long-document preprocessing for training and retrieval). The last
    * chunk is the first one reaching the end of the document, so every
    * token lands in ≥ 1 chunk and no chunk is fully contained in its
    * predecessor; chunk count = ceil(max(n−chunk,0)/stride) + 1 — computed
    * in INTEGER arithmetic ((a + stride − 1) div stride), so both engines
    * agree exactly at any length.
    *
    * Scale shape: tokenize → sequence → posexplode → slice, all inside one
    * codegen'd projection chain — zero shuffle, output rows ≈ input tokens
    * / stride. 100 TB chunks as wide as the scan. */
  def chunkDocuments(docs: DataFrame, textCol: String, idCol: String,
                     chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      s"need 0 < stride <= chunkTokens: stride=$stride chunk=$chunkTokens")
    docs
      .select(col(idCol), tokens(col(textCol)).as("__toks"))
      .withColumn("__k",
        expr(s"(greatest(size(__toks) - $chunkTokens, 0) + $stride - 1) div $stride"))
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), col("__k").cast("int"))).as("chunk_id"))
      .select(col(idCol), col("chunk_id").cast("long").as("chunk_id"),
        (col("chunk_id") * stride).cast("long").as("start_tok"),
        size(slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens)))
          .cast("long").as("n_tok"),
        array_join(slice(col("__toks"), col("chunk_id") * stride + 1, lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** CONTENT-DEFINED chunking (Rabin/CDC shape): a chunk boundary falls
    * wherever a rolling hash of the last `window` tokens lands on
    * 0 mod `avgTokens`, so an edit re-frames only the chunks it touches —
    * fixed-size chunking ([[chunkDocuments]]) shifts EVERY later window
    * after an insertion, which defeats chunk-level dedup between crawl
    * snapshots of the same page. Expected chunk length ≈ avgTokens; the
    * boundary decision is purely local (the canonical stateless Rabin
    * form — production min/max clamps are a sequential refinement layered
    * on top when needed).
    *
    * Exact cross-engine arithmetic: token hash = the md5 32-bit lane
    * ([[Sketches.md5Hash32]] / `kmvHash32Sql`), rolling combo =
    * Σ_{j<window} th(pos−j)·31^j with missing lags as 0 (≤ 2^32·31^3 —
    * exact BIGINT), boundary at pos > 0 where combo % avgTokens = 0.
    * Output per (doc, chunk): start_pos, n_tokens and tok_hash_sum — an
    * order-free exact content signature, so identical chunk content ⇒
    * identical signature on any engine (the chunk-store dedup key).
    *
    * Scale shape: tokenize + hash are scan-side codegen projections; ONE
    * exchange on doc id feeds both window passes (the lag combo and the
    * running boundary sum share the same (doc, pos) sort); the final agg
    * is map-side combinable. Per-doc state is the document's own tokens —
    * the per-doc window convention of the text suite. */
  def cdcChunks(docs: DataFrame, textCol: String, idCol: String,
                window: Int = 4, avgTokens: Int = 32): DataFrame = {
    require(window >= 1 && window <= 12 && avgTokens >= 2,
      s"need 1 <= window <= 12 (31^w must fit a long) and avgTokens >= 2: " +
        s"window=$window avgTokens=$avgTokens")
    val w = Window.partitionBy("doc").orderBy("pos")
    val combo = (0 until window).map(j =>
      coalesce(lag(col("__th"), j).over(w), lit(0L)) *
        lit(BigInt(31).pow(j).toLong)).reduce(_ + _)
    docs
      .select(col(idCol).as("doc"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "__t")))
      .select(col("doc"), col("pos").cast("long").as("pos"),
        Sketches.md5Hash32(col("__t")).as("__th"))
      .withColumn("__b",
        when(col("pos") > 0 && (combo % avgTokens) === 0, 1L).otherwise(0L))
      .withColumn("chunk_id", sum(col("__b")).over(w))
      .groupBy(col("doc"), col("chunk_id"))
      .agg(min("pos").as("start_pos"),
        count(lit(1)).as("n_tokens"),
        sum(col("__th")).as("tok_hash_sum"))
  }

  /** Per-group quality-percentile cut: keep each group's documents at or
    * above its own `pct` quality percentile — "top 25% per language"-style
    * curation where a single global threshold would drown low-resource
    * domains.
    *
    * Scale shape: quality is a scan-side projection (zero shuffle); the
    * threshold agg shuffles only (group, quality) pairs and yields one row
    * per group, which broadcasts back over the corpus — the corpus itself
    * never shuffles. The threshold uses EXACT `percentile` (holds a
    * per-group value multiset) for oracle parity; at 100 TB swap in
    * `approx_percentile(..., accuracy)` — same plan shape, bounded state
    * (the exact-vs-sketch accuracy trade is pinned in SketchSpec). */
  def qualityPercentileCut(docs: DataFrame, textCol: String, idCol: String,
                           groupCol: String, pct: Double): DataFrame = {
    require(pct > 0 && pct < 1, s"pct must be in (0,1): $pct")
    // group col rides through the quality projection (keepCols) — one
    // corpus scan, no self-join back for the grouping column
    val q = TextAnalysis.qualityScore(docs, textCol, idCol, keepCols = Seq(groupCol))
      .select(col(idCol), col(groupCol).as("grp"), col("quality"))
    val thresh = q.groupBy("grp")
      .agg((round(expr(s"percentile(quality, $pct)"), 4) + lit(0.0)).as("q_thresh"))
    q.join(broadcast(thresh), "grp")
      .filter(col("quality") >= col("q_thresh"))
      .select(col(idCol), col("grp"), col("quality"), col("q_thresh"))
  }

  /** Per-group decile binning of the quality score — curriculum ordering /
    * difficulty bucketing ("train on bins 8–10 first") as a first-class
    * op. The textbook `ntile(10) OVER (PARTITION BY grp ORDER BY quality)`
    * pays a full window sort of the corpus; this computes the nine
    * per-group decile THRESHOLDS in one agg, broadcasts that ≤ 9·|groups|
    * relation back over the scan, and assigns
    * `decile = 1 + Σ_i [quality ≥ t_i]` scan-side — same
    * threshold-broadcast shape as [[qualityPercentileCut]], generalized
    * from one cut to nine. Ties sit in the HIGHER bin (≥, matching the
    * cut's keep-side convention); thresholds round to 4 dp before the
    * compare so both engines bin from identical values.
    *
    * Scale: exact `percentile` holds each group's values for the sort —
    * fine while a group fits an executor (quality is one double per doc);
    * at 100 TB swap `approx_percentile(quality, p, err)` into the same
    * plan shape — the broadcast-assign half is already scale-free. */
  def qualityDecileBins(docs: DataFrame, textCol: String, idCol: String,
                        groupCol: String): DataFrame = {
    val q = TextAnalysis.qualityScore(docs, textCol, idCol, keepCols = Seq(groupCol))
      .select(col(idCol), col(groupCol).as("grp"), col("quality"))
    // ONE array-form percentile: nine scalar percentile() calls would each
    // buffer the group's full value multiset independently — 9× the
    // aggregation state for identical thresholds
    val ps = (1 to 9).map(i => s"0.$i").mkString("array(", ", ", ")")
    val th = q.groupBy("grp")
      .agg(expr(s"percentile(quality, $ps)").as("__ts"))
      .select(col("grp") +: (1 to 9).map(i =>
        (round(element_at(col("__ts"), i), 4) + lit(0.0)).as(s"t$i")): _*)
    val decile = (1 to 9)
      .map(i => when(col("quality") >= col(s"t$i"), 1L).otherwise(0L))
      .reduce(_ + _) + lit(1L)
    q.join(broadcast(th), "grp")
      .select(col(idCol), col("grp"), col("quality"), decile.as("decile"))
  }

  /** Adjacent-symbol pair counts over the corpus word-frequency table —
    * the counting kernel of one BPE (byte-pair-encoding) merge iteration:
    * tokenizer training IS this aggregate, repeated with the winning pair
    * merged into the symbol table each round. Returns
    * (left_sym, right_sym, pair_count) with pair_count = Σ word_freq over
    * every adjacent occurrence, cut at `minCount`.
    *
    * Scale shape — the reason this is cheap at 100 TB: the corpus-sized
    * work is ONE word-count aggregate (map-side combined, Zipf-small
    * result). The pair explode then runs over the VOCABULARY (distinct
    * words × word length), orders of magnitude below corpus token count;
    * frequencies ride along as weights. Iterating merges re-runs only the
    * vocabulary-sized half. */
  def bpePairCounts(docs: DataFrame, textCol: String,
                    minCount: Long = 1L): DataFrame = {
    val words = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
    words
      .filter(length(col("word")) >= 2)
      .select(col("word"), col("n"),
        explode(sequence(lit(1), length(col("word")) - 1)).as("i"))
      .select(col("word").substr(col("i"), lit(1)).as("left_sym"),
        col("word").substr(col("i") + 1, lit(1)).as("right_sym"),
        col("n"))
      .groupBy("left_sym", "right_sym")
      .agg(sum(col("n")).as("pair_count"))
      .filter(col("pair_count") >= minCount)
  }

  /** The merge decision of a BPE round: the highest-count pair, ties to
    * the lexicographically smallest (deterministic across partitionings) —
    * one map-side-combinable argmax over the pair table. */
  def bpeTopPair(pairCounts: DataFrame): DataFrame =
    pairCounts
      .orderBy(col("pair_count").desc, col("left_sym").asc, col("right_sym").asc)
      .limit(1)

  /** Full BPE tokenizer TRAINING: `numMerges` rounds of count-adjacent-
    * pairs → pick the argmax pair (ties lexicographic — deterministic
    * across partitionings) → greedily merge its occurrences left-to-right
    * in every word's symbol sequence. Returns the ordered merge list —
    * the tokenizer artifact (apply = replay the merges in order).
    *
    * Scale shape — the property that makes tokenizer training feasible on
    * a 100 TB corpus: the corpus-sized work is ONE word-frequency
    * aggregate, paid before round 1. Every merge round then operates on
    * the VOCABULARY relation (distinct words × counts — Zipf-small, ~1e6
    * rows for open-web text), so N rounds cost N vocabulary passes, not N
    * corpus scans. Per round: one map-side-combinable pair agg, a 1-row
    * argmax collect (bounded driver state, same class as the CC fixpoint
    * scalar), and a codegen'd fold over the symbol arrays;
    * `localCheckpoint` truncates the per-round plan growth exactly as in
    * `kmeansCentroids`. Stops early when no pair clears `minCount`. */
  def bpeTrain(docs: DataFrame, textCol: String, numMerges: Int,
               minCount: Long = 1L): Seq[(String, String)] =
    bpeTrainDetailed(docs, textCol, numMerges, minCount)
      .map { case (l, r, _) => (l, r) }

  /** [[bpeTrain]] with each round's winning pair COUNT kept — the
    * training-curve record (count trajectories are how you pick the merge
    * budget). Same loop, same scale shape. */
  def bpeTrainDetailed(docs: DataFrame, textCol: String, numMerges: Int,
                       minCount: Long = 1L): Seq[(String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1: $numMerges")
    var vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .select(split(col("word"), "").as("syms"), col("n"))
      // ckpt: one-shot — initial vocab; every loop round goes through flatCk
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    var exhausted = false
    for (_ <- 0 until numMerges if !exhausted) {
      val top = vocab
        .filter(size(col("syms")) >= 2)
        .select(col("n"), explode(expr(
          "transform(sequence(0, size(syms)-2), i -> struct(syms[i] as l, syms[i+1] as r))")).as("p"))
        .groupBy("p.l", "p.r").agg(sum("n").as("c"))
        .filter(col("c") >= minCount)
        .orderBy(col("c").desc, col("l").asc, col("r").asc)
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, r, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((l, r, c))
        vocab = flatCk(vocab.select(mergeFold(l, r).as("syms"), col("n")))
      }
    }
    merges.toSeq
  }

  /** The merge list as a relation — (round, left_sym, right_sym, merged,
    * pair_count) — the persistable tokenizer artifact the oracle pins. */
  def bpeMergeTable(docs: DataFrame, textCol: String, numMerges: Int,
                    minCount: Long = 1L): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    bpeTrainDetailed(docs, textCol, numMerges, minCount)
      .zipWithIndex
      .map { case ((l, r, c), i) => (i + 1L, l, r, l + r, c) }
      .toDF("round", "left_sym", "right_sym", "merged", "pair_count")
  }

  /** Tokenizer APPLY: segment every distinct word by replaying a trained
    * merge list in order. Same vocabulary-relation shape as training —
    * the corpus contributes one distinct-words pass; each merge is a
    * codegen'd fold over the Zipf-small vocab. Join the result back on
    * the word column to tokenize a corpus (the vocab broadcast is the
    * standard dictionary-apply join). */
  def bpeSegments(docs: DataFrame, textCol: String,
                  merges: Seq[(String, String)]): DataFrame = {
    var vocab = docs
      .select(explode(graft.functions.TextFunctions.tokens(col(textCol))).as("word"))
      .distinct()
      .select(col("word"), split(col("word"), "").as("syms"))
      // ckpt: one-shot — initial vocab; every loop round goes through flatCk
      .localCheckpoint()
    for ((l, r) <- merges)
      vocab = flatCk(vocab.select(col("word"), mergeFold(l, r).as("syms")))
    vocab
  }

  /** Greedy left-to-right merge of (l, r) occurrences in a symbol array:
    * fold, joining x onto the accumulator's tail when tail = l and x = r
    * (a just-created l+r can't re-consume — it no longer equals l). The
    * ONE merge-application definition train and apply both use. */
  private def mergeFold(l: String, r: String) = expr(
    s"""aggregate(syms, cast(array() as array<string>), (acc, x) ->
       |  if (size(acc) > 0 AND element_at(acc, -1) = ${sqlStr(l)} AND x = ${sqlStr(r)},
       |      concat(slice(acc, 1, size(acc) - 1), array(${sqlStr(l + r)})),
       |      concat(acc, array(x))))""".stripMargin)

  private def sqlStr(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Per-group winsorization: clamp a numeric column to its group's
    * [loPct, hiPct] percentile band — the outlier-robust alternative to
    * dropping rows (feature pipelines keep the row, cap the value). The
    * complement of [[qualityPercentileCut]] (filter) and the z-score
    * normalize (shift): same percentile kernel, clamp as the action.
    *
    * Percentiles are rounded to 4 decimals BEFORE the clamp comparison on
    * both engines, so the keep-or-clamp decision is bit-identical; an
    * unclamped value passes through as its original parquet double.
    *
    * Scale shape: one (group, value) aggregate — exact `percentile` here
    * for oracle parity, `approx_percentile` at 100 TB (same plan, bounded
    * state) — broadcast back over the scan; the corpus never shuffles. */
  def winsorize(df: DataFrame, valCol: String, groupCols: Seq[String],
                loPct: Double = 0.05, hiPct: Double = 0.95): DataFrame = {
    require(loPct >= 0 && hiPct <= 1 && loPct < hiPct,
      s"need 0 <= loPct < hiPct <= 1: $loPct $hiPct")
    val keys = groupCols.map(col)
    val bands = df.groupBy(keys: _*)
      .agg((round(expr(s"percentile($valCol, $loPct)"), 4) + lit(0.0)).as("__lo"),
        (round(expr(s"percentile($valCol, $hiPct)"), 4) + lit(0.0)).as("__hi"))
      // rename the keys so the null-safe join condition below is unambiguous
      .select(groupCols.map(c => col(c).as(s"__k_$c")) ++
        Seq(col("__lo"), col("__hi")): _*)
    // NULL-SAFE key equality (<=>): a null group gets its own percentile
    // band from the groupBy, and a plain equi-join would silently DROP all
    // its rows (null never equals null) — violating the keep-the-row
    // contract this operator exists for.
    val cond = groupCols.map(c => col(c) <=> col(s"__k_$c")).reduce(_ && _)
    df.join(broadcast(bands), cond)
      .withColumn("clamped",
        least(greatest(col(valCol), col("__lo")), col("__hi")))
      .withColumn("was_clamped", col("clamped") =!= col(valCol))
      .drop(groupCols.map(c => s"__k_$c") ++ Seq("__lo", "__hi"): _*)
  }

  /** Eval-split LEAKAGE audit: near-dup clusters whose members landed in
    * more than one holdout split — the contamination mode that survives a
    * perfect document-level split (the test copy of a near-duplicated
    * training document is still a leak), and the measured argument for
    * running dedup BEFORE splitting. Consumes any (id, cluster) label
    * relation (inline kernel or the stored cluster table) and any
    * (id, split) assignment ([[splitAssignments]]); emits only the
    * leaking clusters with their size, split count, and the sorted split
    * list (engine-portable string, the postingLists convention).
    *
    * Scale shape: one equi-join keyed on the id + one cluster-keyed agg
    * with map-side partials; the split list per cluster is bounded by the
    * number of SPLITS (3-5), never by cluster size. Output is leaking-
    * clusters-sized — usually tiny, and every row is actionable. */
  def splitLeakage(labels: DataFrame, idCol: String, clusterCol: String,
                   splits: DataFrame): DataFrame =
    labels.join(splits, idCol)
      .groupBy(col(clusterCol))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("split")).as("n_splits"),
        array_join(array_sort(collect_set(col("split"))), ",").as("splits"))
      .filter(col("n_splits") > 1)

  /** Deterministic GLOBAL shuffle order: every row gets a unique 0-based
    * position in a reproducible pseudo-random permutation of the corpus —
    * the epoch-shuffle every training run needs, as a pure function of the
    * id ([[knuthHash]], the sampler family's hash): re-runs, engines, and
    * restarts agree on the exact order, and a resumed job can slice
    * positions [a, b) without replaying the permutation.
    *
    * The naive form — `row_number() OVER (ORDER BY hash)` — is THE
    * classic scale trap: a global window means ONE task sorts the corpus.
    * This is the two-phase form: the hash space splits into `buckets`
    * contiguous spans (bucket = hash div span, MONOTONE in the hash, so
    * bucket-major order IS global order); per-bucket counts (a
    * buckets-sized agg) prefix-sum into start offsets over a
    * buckets-sized window (tiny), broadcast back, and each row's position
    * is its bucket offset plus its rank WITHIN the bucket — a partitioned
    * window, one exchange on the bucket id, per-bucket sorts of n/buckets
    * rows each. Set `buckets` ≈ corpus partitions at scale: the plan is
    * then exactly one shuffle plus parallel sorted scans.
    *
    * Ties: hash collisions order by id — total order, no nondeterminism. */
  def globalShuffleOrder(df: DataFrame, idCol: String,
                         buckets: Int = 256): DataFrame = {
    require(buckets >= 1 && buckets <= (1 << 20), s"buckets: $buckets")
    val P = 1000000007L
    val span = (P + buckets - 1) / buckets
    val keyed = df.select(col(idCol), knuthHash(col(idCol), P).as("__h"))
      .withColumn("__b", expr(s"__h div $span"))
    val offs = keyed.groupBy("__b").agg(count(lit(1)).as("__n"))
      .withColumn("__off", coalesce(
        sum("__n").over(org.apache.spark.sql.expressions.Window
          .orderBy("__b").rowsBetween(Long.MinValue, -1)), lit(0L)))
      .select("__b", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__b").orderBy(col("__h"), col(idCol))
    keyed.join(broadcast(offs), "__b")
      .select(col(idCol),
        (col("__off") + row_number().over(w) - 1).cast("long").as("pos"))
  }

  /** Per-group quantile calibration: each row's score becomes its
    * within-group percentile rank in floored basis points —
    * `(10000·(rank−1)) div (n−1)` with tie-aware `rank()` (equal scores
    * calibrate equal, the property that makes the output a SCORE, not a
    * permutation). The cross-source comparability fix: a "0.7 quality"
    * from a lenient scorer and a strict one mean different things; their
    * 70th percentiles mean the same. Single-member groups calibrate to 0
    * (no distribution to place them in — pinned, not NULL, so downstream
    * threshold filters keep them). Exact integers end to end.
    *
    * Scale shape: ONE exchange on the group + per-partition sort shared
    * by rank() and count(); nothing leaves row grain. The per-group sort
    * is the cost — for a 100 TB calibration pass swap the exact rank for
    * the broadcast percentile-grid interpolation of
    * [[qualityPercentileCut]] (same trade as documented there; the exact
    * form is the oracle anchor). */
  def calibrateScores(df: DataFrame, groupCol: String, scoreCol: String,
                      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(col(scoreCol))
    df.select(col(idCol), col(groupCol), col(scoreCol),
        rank().over(w).as("__rk"),
        count(lit(1)).over(Window.partitionBy(col(groupCol))).as("__n"))
      .select(col(idCol), col(groupCol),
        when(col("__n") > 1,
          expr("(10000 * (__rk - 1)) div (__n - 1)"))
          .otherwise(lit(0L)).cast("long").as("calib_bp"))
  }

  /** The 100 TB form of [[calibrateScores]]: per-group percentile GRID
    * (approx_percentile, groups-sized) broadcast back over the scan, each
    * row calibrated to the floored grid cell its score falls in —
    * `(10000·cells_below) div gridSize`. No per-group sort of the corpus:
    * one grid agg + one broadcast join + a projection. Within ±(10000/
    * gridSize) bp of the exact rank wherever the sketch is exact, and the
    * sketch error band otherwise (spec-bounded against the exact op); the
    * exact form stays the oracle anchor — this is the documented swap
    * made real. */
  def calibrateScoresApprox(df: DataFrame, groupCol: String,
                            scoreCol: String, idCol: String,
                            gridSize: Int = 100): DataFrame = {
    require(gridSize >= 2 && gridSize <= 10000, s"gridSize: $gridSize")
    val probs = typedLit((0 to gridSize).map(_.toDouble / gridSize))
    val grid = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(scoreCol), probs, lit(10000)).as("__grid"))
    df.join(broadcast(grid), groupCol)
      .withColumn("__below", aggregate(col("__grid"), lit(0),
        (acc, g) => acc + when(g < col(scoreCol), 1).otherwise(0)))
      .select(col(idCol), col(groupCol),
        expr(s"(10000 * least(__below, $gridSize)) div $gridSize")
          .cast("long").as("calib_bp"))
  }

  /** Token-budget allocation across sources with WATER-FILLING: the
    * training-mix allocator. Each source wants the budget share of its
    * mixture weight; a source whose share exceeds its available tokens is
    * CAPPED at availability and its unused demand redistributes to the
    * uncapped sources in proportion to their weights — `rounds` fixed
    * synchronous redistribution rounds (the fixed-round determinism
    * contract of [[Graphs.pageRank]]: the trajectory is a pure function
    * of the inputs; callers pick rounds ≥ the cap-cascade depth, ≤
    * |sources| always suffices). Zero- or negative-weight and
    * zero-availability sources allocate 0. All arithmetic is exact
    * integers — shares are floored `(remaining·w) div W_uncapped` with
    * DECIMAL(38,0) products (budget×weight at web scale wraps a LONG) —
    * so any engine and any partitioning produces the identical
    * allocation. The floored shares under-spend by < |sources| tokens per
    * round; that dust stays unspent by contract (deterministic) rather
    * than being heuristically topped up.
    *
    * Returns (source, avail_tokens, weight_bp, alloc_tokens, capped,
    * rate_bp) where rate_bp = the sampling rate `(10000·alloc) div
    * avail` a downstream sampler applies per source.
    *
    * Scale shape: the relation is sources-sized (domains at web scale —
    * millions of rows, still tiny); each round is one 1-row aggregate
    * broadcast back over it plus a projection, localCheckpoint per round.
    * The corpus itself is never touched — pair this with per-source
    * counts from [[TextAnalysis.corpusStats]]. */
  def tokenBudget(avail: DataFrame, sourceCol: String, availCol: String,
                  weights: DataFrame, weightSourceCol: String,
                  weightCol: String, budget: Long,
                  rounds: Int = 3): DataFrame = {
    require(budget >= 0, s"budget: $budget")
    require(rounds >= 1 && rounds <= 64, s"rounds: $rounds")
    val d38 = "decimal(38,0)"
    var st = avail
      .select(col(sourceCol).as("source"),
        col(availCol).cast("long").as("avail_tokens"))
      .join(weights.select(col(weightSourceCol).as("source"),
        col(weightCol).cast("long").as("weight_bp")), Seq("source"), "left")
      .select(col("source"), col("avail_tokens"),
        coalesce(col("weight_bp"), lit(0L)).as("weight_bp"))
      .withColumn("capped",
        col("weight_bp") <= 0 || col("avail_tokens") <= 0)
      .withColumn("alloc_tokens",
        when(col("weight_bp") <= 0 || col("avail_tokens") <= 0, lit(0L)))
      // ckpt: one-shot — initial state; every loop round goes through flatCk
      .localCheckpoint(eager = false)
    for (_ <- 0 until rounds) {
      val tot = st.agg(
        sum(when(col("capped"), coalesce(col("alloc_tokens"), lit(0L)))
          .otherwise(lit(0L))).as("__spent"),
        sum(when(!col("capped"), col("weight_bp")).otherwise(lit(0L)))
          .as("__wun"))
      st = st.crossJoin(broadcast(tot))
        .withColumn("__demand",
          when(!col("capped") && col("__wun") > 0,
            expr(s"(CAST($budget - coalesce(__spent, 0) AS $d38) * weight_bp)" +
              " div CAST(__wun AS DECIMAL(38,0))").cast("long")))
        .select(col("source"), col("avail_tokens"), col("weight_bp"),
          when(col("capped"), col("alloc_tokens"))
            .when(col("__demand") >= col("avail_tokens"), col("avail_tokens"))
            .otherwise(col("__demand")).as("alloc_tokens"),
          (col("capped") || col("__demand") >= col("avail_tokens"))
            .as("capped"))
        .transform(flatCk) // stats-flat per round (sources-sized job)
    }
    st.select(col("source"), col("avail_tokens"), col("weight_bp"),
      coalesce(col("alloc_tokens"), lit(0L)).as("alloc_tokens"),
      col("capped"),
      when(col("avail_tokens") > 0,
        expr("(10000 * coalesce(alloc_tokens, CAST(0 AS BIGINT)))" +
          " div avail_tokens")).otherwise(lit(0L)).cast("long").as("rate_bp"))
  }

  // ------------------------------------------------------ classifier evals

  /** EXACT ROC-AUC of a score against a boolean label, by the rank-sum
    * (Mann–Whitney U) identity with the standard ½-credit for score ties —
    * the gate that grades any quality/filter classifier before its
    * threshold ships. Computed on SCORE GROUPS, not rows: one groupBy score
    * → (n_pos, n_neg) per distinct score, then a window over the score
    * groups for the cumulative negatives below. The corpus is touched by
    * exactly one map-side-combinable aggregation; the only sort is over
    * DISTINCT scores — bounded by score cardinality (a quality score has
    * thousands of values, not 10¹¹), never a corpus sort. Exact integers:
    * doubled U (so tie halves stay integral) → floored ppm via `div`.
    * Returns one row (n_pos, n_neg, auc_ppm); degenerate single-class
    * input yields auc_ppm = 0 rather than a division blow-up. */
  def aucExact(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val byScore = df.groupBy(col(scoreCol).as("__s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("__p"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("__g"))
    // single-partition sort bound: distinct scores (the value domain the
    // scaladoc sizes at thousands), never the corpus
    val w = Window.orderBy("__s").rowsBetween(Window.unboundedPreceding, -1)
    byScore
      .withColumn("__negBelow", coalesce(sum(col("__g")).over(w), lit(0L)))
      // per-term and doubled-U products ride decimal(38,0): at 10^11 rows a
      // single p·(2·negBelow+g) term already wraps a LONG (the centsMoments
      // convention; DuckDB's HUGEINT sums mirror it); div still emits LONG
      .agg(sum(col("__p")).as("n_pos"), sum(col("__g")).as("n_neg"),
        sum(col("__p").cast("decimal(19,0)") *
            (lit(2L) * col("__negBelow") + col("__g")).cast("decimal(19,0)"))
          .as("__u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          expr("(CAST(500000 AS DECIMAL(38,0)) * __u2)" +
            " div (CAST(n_pos AS DECIMAL(19,0)) * n_neg)"))
          .otherwise(lit(0L)).cast("long").as("auc_ppm"))
  }

  /** Cohen's kappa between two categorical rater columns — chance-corrected
    * agreement, the standard inter-annotator (or model-vs-gold) signal for
    * label quality audits. One groupBy over the (a, b) confusion cells
    * (map-side combinable; the corpus never re-shuffles), marginals and the
    * chance term derived from the cells relation (confusion-matrix-sized).
    * κ = (n·agree − Σₖ aₖbₖ) / (n² − Σₖ aₖbₖ) in exact floored ppm; the
    * degenerate n² = Σ aₖbₖ case (both raters constant) reports 0.
    * NULL ratings count as their own category (two NULLs agree) — dropping
    * them silently would overstate agreement on sparsely-labeled data. */
  def cohenKappa(df: DataFrame, raterA: String, raterB: String): DataFrame = {
    val cells = df.groupBy(
        coalesce(col(raterA).cast("string"), lit("\u0000null")).as("__a"),
        coalesce(col(raterB).cast("string"), lit("\u0000null")).as("__b"))
      .agg(count(lit(1)).as("__c"))
    val margA = cells.groupBy("__a").agg(sum("__c").as("__ca"))
    val margB = cells.groupBy("__b").agg(sum("__c").as("__cb"))
    // marginal products and n² wrap a LONG at web scale — decimal(38,0)
    // lane throughout (≡ DuckDB's HUGEINT sums); div emits LONG
    val chance = margA.join(margB, col("__a") === col("__b"))
      .agg(coalesce(
        sum(col("__ca").cast("decimal(19,0)") * col("__cb").cast("decimal(19,0)")),
        lit(0L).cast("decimal(38,0)")).as("__pe"))
    cells
      .agg(sum("__c").as("n"),
        sum(when(col("__a") === col("__b"), col("__c")).otherwise(0L))
          .as("n_agree"))
      .crossJoin(chance)
      .select(col("n"), col("n_agree"),
        when(col("n").cast("decimal(19,0)") * col("n") =!= col("__pe"),
          expr("(CAST(1000000 AS DECIMAL(38,0)) *" +
            " (CAST(n AS DECIMAL(19,0)) * n_agree - __pe))" +
            " div (CAST(n AS DECIMAL(19,0)) * n - __pe)"))
          .otherwise(lit(0L)).cast("long").as("kappa_ppm"))
  }
}
