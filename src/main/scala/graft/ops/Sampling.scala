package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines
  * (north-star extension; the reference exposes no sampling surface).
  *
  * Both samplers are pure functions of row content — NOT `rand()` or
  * `TABLESAMPLE`, whose output depends on partition layout, task retries,
  * and per-partition RNG state. That determinism is what makes a 100 TB
  * sample reproducible across reruns, engine versions, and cluster sizes,
  * and lets an oracle check the exact row set.
  *
  * Scale design:
  *   - [[hashSample]] is a scan-local predicate on an md5-derived bucket:
  *     no shuffle, no state, combines with column pruning, and subsumes
  *     percentage sampling (keep/buckets). The same bucket function also
  *     yields disjoint train/validation/test splits (different keep
  *     ranges of one bucketing).
  *   - [[stratifiedSample]] needs the per-stratum quota, so it shuffles
  *     once on the stratum key; the count window and the rank window
  *     share that single exchange (same partitioning). Skewed strata are
  *     the axis to watch — a giant stratum serializes into one partition
  *     for ranking; cap it by pre-filtering with [[hashSample]] when a
  *     stratum exceeds executor memory.
  */
object Sampling {

  /** Stable bucket in [0, buckets) from the md5 of the key column —
    * identical in DuckDB as `('0x' || substring(md5(key), 1, 8))::BIGINT
    * % buckets`.
    */
  def hashBucket(key: Column, buckets: Int): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % buckets

  /** Keep rows whose hash bucket falls below `keep`: a deterministic
    * keep/buckets sample (e.g. 5/100 = 5%).
    */
  def hashSample(df: DataFrame, keyCol: String, buckets: Int, keep: Int): DataFrame =
    df.filter(hashBucket(col(keyCol), buckets) < keep)

  /** Exact-quota stratified sample: ceil(n_stratum * num / den) rows per
    * stratum, chosen in md5-of-id order (deterministic, unbiased w.r.t.
    * any natural ordering of the data). Quota arithmetic stays in longs —
    * ceil(n*num/den) = (n*num + den - 1) div den — so there is no float
    * rounding to disagree on.
    */
  def stratifiedSample(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      num: Int,
      den: Int): DataFrame = {
    val ord = md5(col(idCol).cast("string"))
    val rankW = Window.partitionBy(col(stratumCol)).orderBy(ord, col(idCol))
    val countW = Window.partitionBy(col(stratumCol))
    df.withColumn("_rn", row_number().over(rankW).cast("long"))
      .withColumn("_n", count(lit(1)).over(countW))
      // DIV, not "/": Spark's / on longs is double division.
      .filter(col("_rn") <= expr(s"(_n * $num + ${den - 1}) DIV $den"))
      .drop("_rn", "_n")
  }

  /** Per-row weighted Bernoulli sample: keep a row with probability
    * `rate(row)` (clamped to [0,1]) using a deterministic md5 coin —
    * `hash32(id) / 2^32 < rate`. The training-data use is
    * quality-weighted downsampling (keep probability proportional to a
    * per-document quality/importance score) with none of `rand()`'s
    * layout/retry nondeterminism: the kept set is a pure function of row
    * content, reproducible across reruns, cluster sizes, and engines
    * (the coin and the rate are both engine-bit-identical).
    *
    * Scale shape: scan-local predicate — no shuffle, no RNG state,
    * composes with column pruning and partition pruning.
    */
  def weightedSample(df: DataFrame, idCol: String, rate: Column): DataFrame =
    df.filter(
      TextOps.hash32(col(idCol).cast("string")).cast("double") / lit(4294967296.0) <
        least(greatest(rate, lit(0.0)), lit(1.0)))

  /** Leakage-free train/test split: the split coin is flipped on the
    * NEAR-DUP CLUSTER id, not the document id, so near-duplicate documents
    * can never straddle the boundary — the train/test contamination that a
    * per-document split silently bakes into evaluation (the dedup
    * literature's canonical reason to dedup before splitting, enforced
    * here by construction even for pairs you chose not to collapse).
    *
    * `pairs` is any near-dup pair set ([[Dedup.minhashPairs]],
    * [[Dedup.ngramJaccardPairs]], ...); unpaired documents are their own
    * cluster. Output: (idCol, cluster_id, split) over the whole corpus,
    * split ∈ {train, test} with P(test) = testFrac via the same md5 coin
    * as [[weightedSample]] — deterministic across engines and reruns.
    *
    * Scale shape: [[Dedup.connectedComponents]] on the pair graph plus ONE
    * left join of the corpus against the O(paired-docs) membership table;
    * the coin is a scan-local predicate.
    */
  def leakageFreeSplit(
      df: DataFrame,
      idCol: String,
      pairs: DataFrame,
      aCol: String,
      bCol: String,
      testFrac: Double): DataFrame = {
    require(testFrac >= 0.0 && testFrac <= 1.0, s"bad testFrac $testFrac")
    val members = Dedup.connectedComponents(pairs, aCol, bCol)
      .withColumnRenamed("doc_id", "__did")
    val withCluster = df
      .select(col(idCol).cast("long").as("__did"))
      .join(members, Seq("__did"), "left")
      .select(
        col("__did").as(idCol),
        coalesce(col("cluster_id"), col("__did")).as("cluster_id"))
    withCluster.select(
      col(idCol),
      col("cluster_id"),
      when(
        TextOps.hash32(col("cluster_id").cast("string")).cast("double") /
          lit(4294967296.0) < lit(testFrac),
        lit("test")).otherwise(lit("train")).as("split"))
  }

  /** Largest exact-mixture sample: draw groups in the integer proportions
    * `weights` (e.g. en:2, de:1, es:1 → a 2:1:1 corpus mix), scaled to
    * the biggest whole multiple every group can actually supply —
    * K = min over groups of (n_group DIV w_group), quota_group = w_group
    * × K. Domain/language mixing for a training corpus, with the mixture
    * exact by construction (integer arithmetic only) and row choice
    * deterministic (md5-of-id order, like [[stratifiedSample]]).
    * Groups absent from `weights` are dropped.
    *
    * Scale shape: one count aggregation and one rank window, both
    * partitioned on the group key (shared exchange); the quota table is
    * one row per group — broadcast by construction. Same hot-stratum
    * caveat as [[stratifiedSample]].
    */
  def mixtureSample(
      df: DataFrame,
      groupCol: String,
      idCol: String,
      weights: Seq[(String, Long)]): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0), "weights must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val wdf = weights.toDF(groupCol, "_w")
    val counts = df
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("_n"))
      .join(wdf, groupCol)
    // Scalar K via aggregate + broadcast cross join (a global window here
    // would funnel the counts into one partition and warn).
    val k = counts.agg(min(expr("_n DIV _w")).as("_k"))
    val quotas = counts
      .crossJoin(broadcast(k))
      .select(col(groupCol), (col("_w") * col("_k")).as("_quota"))
    val ord = md5(col(idCol).cast("string"))
    val rankW = Window.partitionBy(col(groupCol)).orderBy(ord, col(idCol))
    df.join(broadcast(quotas), Seq(groupCol))
      .withColumn("_rn", row_number().over(rankW).cast("long"))
      .filter(col("_rn") <= col("_quota"))
      .drop("_rn", "_quota")
  }

  /** Temperature-based group rebalancing (the mT5/CCNet "alpha sampling"
    * rule at α = 0.5): downsample each group so the EXPECTED kept count is
    * proportional to sqrt(n_group) — large languages/domains are flattened
    * toward the small ones without ever upsampling. The keep rate is
    * `sqrt(n_min / n_group)` (the rarest group keeps everything), applied
    * per row with [[weightedSample]]'s deterministic md5 coin.
    *
    * α is fixed at 0.5 deliberately: `sqrt` and one division are the only
    * IEEE operations involved, both correctly rounded on every engine, so
    * the kept SET is bit-reproducible across reruns, cluster sizes, and
    * the DuckDB oracle — a general `pow(x, 1-α)` carries no such
    * cross-engine guarantee. Other temperatures = compose [[mixtureSample]]
    * with caller-computed integer weights.
    *
    * Scale shape: one map-side-combined count per group, a one-row global
    * min broadcast, the ≤|groups|-row rate table broadcast back, and a
    * scan-local coin — no shuffle ever touches the corpus rows.
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("_n"))
    val mn = counts.agg(min(col("_n")).as("_mn"))
    val rates = counts
      .crossJoin(broadcast(mn))
      .select(
        col(groupCol),
        sqrt(col("_mn").cast("double") / col("_n").cast("double")).as("_rate"))
    weightedSample(df.join(broadcast(rates), Seq(groupCol)), idCol, col("_rate"))
      .drop("_rate")
  }

  /** PURGED temporal split (time-series train/test with an embargo):
    * rows at or before the q-quantile timestamp minus the embargo are
    * TRAIN, rows strictly after the quantile timestamp are TEST, and the
    * embargo band between them is DROPPED — the leakage control
    * financial-ML splits require (an autocorrelated feature computed at
    * t leaks label information for horizons past t; the embargo is the
    * horizon).
    *
    * The cut timestamp is the lower inverted-CDF order statistic of the
    * timestamps themselves (`cum·qDen ≥ qNum·n`, exact integers — no
    * float boundary), so the split is reproducible bit-for-bit and the
    * TEST fraction is within one distinct-timestamp of 1 − q by
    * construction.
    *
    * Scale shape: one distinct-timestamp count pass (map-side combined)
    * + a [[Prefix.runningSum]] two-phase prefix scan over that compressed
    * frame to find the cut (range-partitioned — for event data the
    * distinct-timestamp dim is O(rows), so an unpartitioned window here
    * would be a single-task sort), then ONE scan-local label projection —
    * the cut rides in as a one-row broadcast join, no collect.
    *
    * Output: the labeled rows (idCol, split ∈ {train, test}) — embargo
    * rows are absent.
    */
  def temporalSplit(
      df: DataFrame,
      tsCol: String,
      idCol: String,
      qNum: Long,
      qDen: Long,
      embargoSec: Long): DataFrame = {
    require(qDen >= 1 && qNum >= 1 && qNum < qDen, s"q out of (0,1): $qNum/$qDen")
    require(embargoSec >= 0, "negative embargo")
    val ts = df.select(unix_micros(col(tsCol)).as("_t"))
      .groupBy("_t").agg(count(lit(1)).as("_c"))
    val total = ts.agg(sum("_c").as("_n"))
    val cut = Prefix.runningSum(ts, "_t", "_c", "_cum")
      .crossJoin(broadcast(total))
      .where(col("_cum") * qDen >= col("_n") * qNum)
      .agg(min("_t").as("_cut"))
    df.select(col(idCol), unix_micros(col(tsCol)).as("_t"))
      .crossJoin(broadcast(cut))
      .withColumn("split",
        when(col("_t") <= col("_cut") - embargoSec * 1000000L, "train")
          .when(col("_t") > col("_cut"), "test"))
      .where(col("split").isNotNull)
      .select(col(idCol), col("split"))
  }

  /** EXACT proportional test-set allocation (largest-remainder /
    * Hamilton apportionment): split a `k`-row budget across strata so
    * every stratum gets floor(c·k/N) rows and the leftover seats go to
    * the largest remainders (ties → smaller stratum key) — quotas sum to
    * EXACTLY k by construction, where independent per-row sampling only
    * hits k in expectation (the off-by-a-few that breaks "eval set is
    * exactly 10k rows" contracts). Rows are then picked per stratum by
    * md5 rank (ties on the id tiebreak) — deterministic, reproducible,
    * order-independent.
    *
    * Scale shape: one stratum count (map-side combined), the
    * apportionment over the |strata|-row table (one window), then one
    * per-stratum md5-rank window over the data — the stratifiedSample
    * skeleton; the usual hot-stratum sort caveat applies.
    *
    * Output: the PICKED rows (stratum, id) plus each stratum's quota.
    */
  def proportionalAllocation(
      df: DataFrame,
      stratumCol: String,
      idCol: String,
      k: Long): DataFrame = {
    require(k >= 0, "negative budget")
    val rows = df.select(col(stratumCol).as("stratum"), col(idCol).as("id"))
    val counts = rows.groupBy("stratum").agg(count(lit(1)).as("c"))
    val withTotal = counts.withColumn("n", sum("c").over(Window.partitionBy()))
    val seats = withTotal
      .withColumn("base", expr(s"(c * $k) div n"))
      .withColumn("rem", (col("c") * k) % col("n"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("rem").desc, col("stratum"))))
      .withColumn("extra_n", lit(k) - sum("base").over(Window.partitionBy()))
      .withColumn("quota", col("base") + when(col("rk") <= col("extra_n"), 1L).otherwise(0L))
      .select("stratum", "c", "quota")
    val ranked = rows.withColumn("pick_rk", row_number().over(
      Window.partitionBy("stratum")
        .orderBy(md5(concat(col("stratum").cast("string"), lit("|"), col("id").cast("string"))),
          col("id"))))
    ranked.join(seats, "stratum")
      .where(col("pick_rk") <= col("quota"))
      .select(col("stratum"), col("id"), col("quota"))
  }

  /** Per-group cap ("at most n documents per source/domain"): keep the
    * first n rows of each group under a caller-chosen deterministic
    * ordering — the crawl-pipeline domain cap. One shuffle on the group
    * key; a pathologically hot group ranks inside one partition, so
    * pre-thin such groups with [[hashSample]] when the domain allows
    * them.
    */
  def capPerGroup(
      df: DataFrame,
      groupCol: String,
      orderCols: Seq[Column],
      n: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol)).orderBy(orderCols: _*)
    df.withColumn("_rn", row_number().over(w)).filter(col("_rn") <= n).drop("_rn")
  }

  /** Cluster-balanced diversity sampling: partition the embedding space
    * with the bit-reproducible integer k-means ([[Clustering.kmeansInt]]
    * over int8-quantized vectors) and keep at most `perCluster` vectors
    * per cell, chosen in md5-of-id order — the cluster-based data-pruning
    * recipe (keep semantic coverage, cut redundancy: a uniform sample
    * over-represents dense regions; a per-cluster cap cannot).
    *
    * Output: `(idCol, cluster, sampled)` — one row per input vector, the
    * verdict on all of them (filter on `sampled` for the subset).
    *
    * Determinism: cluster assignment is a pure function of the input
    * (integer Lloyd, ties to the lowest cid); the within-cell order is
    * (md5(id), id) — unbiased w.r.t. any natural data order, stable
    * across engines, partitionings, and retries.
    *
    * Scale shape: one shuffle on the cluster id for the per-cell window
    * (each cell ranks inside one partition — k chosen so cells fit, the
    * same contract as [[stratifiedSample]]); the Lloyd fit shuffles at
    * most k·d rows per partition per round; no vector payload moves after
    * assignment (the window sees (id, cluster, hash) only).
    */
  def diversityClusterSample(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iterations: Int,
      perCluster: Int): DataFrame = {
    require(perCluster >= 0, "perCluster must be non-negative")
    val qz = Quantize.quantizeInt8(df, idCol, vecCol)
    val assigned = Clustering
      .kmeansInt(qz, idCol, "qvec", k, iterations)
      .select(col(idCol).cast("long").as("_id"), col("cluster"))
    val w = Window
      .partitionBy(col("cluster"))
      .orderBy(md5(col("_id").cast("string")), col("_id"))
    assigned
      .withColumn("_rn", row_number().over(w))
      .select(
        col("_id").as(idCol),
        col("cluster"),
        (col("_rn") <= perCluster).as("sampled"))
  }

  /** Deterministic SYSTEMATIC PPS sample (Madow 1949: probability
    * proportional to size, zero RNG): items are laid out on a weight
    * line in md5-of-id order, and every multiple of `W/n` (exact
    * integer arithmetic — multiples counted via `⌊cum·n/W⌋` deltas)
    * picks the item covering it. Heavy items (weight > W/n) are picked
    * MULTIPLE times — `n_picks` reports the multiplicity, per classic
    * PPS-with-replacement semantics; expected picks are exactly
    * `n·w_i/W` and the total over all rows is exactly `n`.
    *
    * The weight-quality story of [[weightedSample]] with a HARD total
    * (per-row Bernoulli hits n only in expectation) and none of the
    * per-stratum machinery of [[proportionalAllocation]].
    *
    * Scale shape: the cumulative weight rides [[Prefix.runningSum]]'s
    * two-phase range-partitioned scan over the md5 order key — no
    * single-task sort; W joins back as a one-row broadcast.
    *
    * Output: `(idCol, weightCol, n_picks ≥ 1)`.
    */
  def systematicPps(
      df: DataFrame,
      idCol: String,
      weightCol: String,
      n: Long): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val rows = df
      .select(col(idCol).as("_id"), col(weightCol).cast("long").as("_w"))
      .where(col("_w") > 0)
      .withColumn("_h",
        conv(substring(md5(col("_id").cast("string")), 1, 15), 16, 10).cast("long"))
    val total = rows.agg(sum("_w").as("_tw"))
    // integer `div`, never float floor: ⌊cum·n/W⌋ must be exact at any
    // magnitude (the skill's ns20 lesson — a double divide then round
    // diverges cross-engine on large operands)
    Prefix.runningSum(rows, "_h", "_w", "_cum")
      .crossJoin(broadcast(total))
      .withColumn("n_picks",
        expr(s"(_cum * $n) div _tw") - expr(s"((_cum - _w) * $n) div _tw"))
      .where(col("n_picks") > 0)
      .select(col("_id").as(idCol), col("_w").as(weightCol), col("n_picks"))
  }

  /** Corpus mixture plan: given per-source mixing weights and a total
    * token budget, how many tokens each source owes the training mix and
    * how many epochs (full passes, possibly fractional) of that source
    * realize it — the Pile/Llama-style "data mixing table" computed from
    * the corpus itself instead of hand-maintained. A source with fewer
    * tokens than its share repeats (`epochs_ceil` > 1, the up-sampled
    * case); one with more gets a sub-1 sampling fraction.
    *
    * Exact arithmetic: target tokens = `budget·w div Σw` and the epoch
    * ceiling `(target + n − 1) div n` are integer; `sample_frac` is the
    * single IEEE division target/n. Scale shape: one map-side-combined
    * per-source token aggregate (the source dim is catalog-bounded), a
    * one-row Σw frame broadcast back — nothing here touches row data
    * twice.
    *
    * `weightOf` maps the source column to an integral weight and must be
    * deterministic (the caller's policy — a literal map, a hash-derived
    * default, a priority tier). `budget` is the total token budget: a
    * literal for an absolute compute budget, or an expression over
    * `total_corpus_tokens` (in scope — the corpus token total) for a
    * relative one ("train for 2 epochs worth": `col("total_corpus_tokens")
    * * 2`), which keeps the plan scale-free.
    */
  def mixturePlan(
      df: DataFrame,
      sourceCol: String,
      tokCol: String,
      budget: Column,
      weightOf: Column => Column): DataFrame = {
    val bySource = df
      .groupBy(col(sourceCol).as("source"))
      .agg(sum(col(tokCol).cast("long")).as("n_tokens"))
      .withColumn("weight", weightOf(col("source")).cast("long"))
    val wSum = bySource.agg(
      sum("weight").as("_wsum"),
      sum("n_tokens").as("total_corpus_tokens"))
    bySource
      .crossJoin(broadcast(wSum))
      .withColumn("_budget", budget.cast("long"))
      .withColumn("target_tokens", expr("(_budget * weight) div _wsum"))
      .withColumn("epochs_ceil",
        expr("CASE WHEN n_tokens > 0 THEN (target_tokens + n_tokens - 1) div n_tokens END"))
      .withColumn("sample_frac",
        col("target_tokens").cast("double") / col("n_tokens").cast("double"))
      .select("source", "n_tokens", "weight", "target_tokens", "epochs_ceil", "sample_frac")
  }
}
