package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classification-evaluation tables (north-star extension): the metrics a
  * training pipeline runs over every model-labeled column — a confusion
  * matrix, the per-class precision/recall/F1 report, and Cohen's kappa
  * for rater/heuristic agreement. All counts are exact longs; every
  * derived metric is a single IEEE division (or one fixed chain) on
  * exact integers, so the tables hash-gate cross-engine.
  *
  * Scale shape: everything reduces to ONE map-side-combined (actual,
  * predicted) count pass over the labeled rows; the metric arithmetic
  * runs on the |classes|² cell table, never the row volume.
  */
object Eval {

  /** Confusion matrix: one row per observed (actual, predicted) cell with
    * its exact count. Cells never observed are absent (dense-ify against
    * a class dim if a downstream consumer needs zeros).
    */
  def confusionMatrix(df: DataFrame, actualCol: String, predCol: String): DataFrame =
    df.groupBy(col(actualCol).as("actual"), col(predCol).as("predicted"))
      .agg(count(lit(1)).as("n"))

  /** Per-class precision / recall / F1 from exact tp/fp/fn counts. The
    * class list is the union of observed actual and predicted labels.
    * F1 uses the single-division spelling `2·tp / (2·tp + fp + fn)` —
    * one IEEE op on exact longs (and well-defined 0 when the class was
    * never seen on either side of a tp). Classes with zero denominator
    * anywhere report NULL for that metric, SQL-style.
    */
  def classificationReport(df: DataFrame, actualCol: String, predCol: String): DataFrame = {
    val cells = confusionMatrix(df, actualCol, predCol)
    val classes = cells.select(col("actual").as("cls"))
      .unionByName(cells.select(col("predicted").as("cls"))).distinct()
    val tp = cells.where(col("actual") === col("predicted"))
      .select(col("actual").as("cls"), col("n").as("tp"))
    val actualTot = cells.groupBy(col("actual").as("cls")).agg(sum("n").as("n_actual"))
    val predTot = cells.groupBy(col("predicted").as("cls")).agg(sum("n").as("n_pred"))
    classes
      .join(tp, Seq("cls"), "left")
      .join(actualTot, Seq("cls"), "left")
      .join(predTot, Seq("cls"), "left")
      .select(
        col("cls"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("n_pred"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("n_actual"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
      .select(
        col("cls"), col("tp"), col("fp"), col("fn"),
        when(col("tp") + col("fp") > 0,
          col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
          .as("precision"),
        when(col("tp") + col("fn") > 0,
          col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
          .as("recall"),
        when(lit(2L) * col("tp") + col("fp") + col("fn") > 0,
          (lit(2L) * col("tp")).cast("double") /
            (lit(2L) * col("tp") + col("fp") + col("fn")).cast("double"))
          .as("f1"))
  }

  /** Cohen's kappa between two label columns — chance-corrected
    * agreement, the standard rater/heuristic-consistency statistic.
    * Exact integer spelling: `κ = (n·Σ_c tp_c − Σ_c row_c·col_c) /
    * (n² − Σ_c row_c·col_c)` — every term a long, ONE division.
    * Output: one row (n, n_agree, sum_marginal, kappa).
    */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = confusionMatrix(df, aCol, bCol)
    val rows = cells.groupBy(col("actual").as("cls")).agg(sum("n").as("rn"))
    val cols_ = cells.groupBy(col("predicted").as("cls")).agg(sum("n").as("cn"))
    val marg = rows.join(cols_, Seq("cls"))
      .agg(sum(col("rn") * col("cn")).as("sum_marginal"))
    cells
      .agg(sum("n").as("n"),
        sum(when(col("actual") === col("predicted"), col("n")).otherwise(0L))
          .as("n_agree"))
      .crossJoin(marg)
      .select(
        col("n"), col("n_agree"), col("sum_marginal"),
        ((col("n") * col("n_agree") - col("sum_marginal")).cast("double") /
          (col("n") * col("n") - col("sum_marginal")).cast("double")).as("kappa"))
  }

  /** AUC-ROC by the rank statistic (Mann–Whitney U), EXACT under ties:
    * `AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻)`, computed on the
    * DISTINCT-score dim as the all-integer doubled sum
    * `(2·Σ_s pos_s·neg_{<s} + Σ_s pos_s·neg_s) / (2·P·N)` — one IEEE
    * division at the end, bit-reproducible. No per-row global rank
    * window: scores collapse to (score, pos, neg) counts scan-locally
    * and the cumulative ride is [[Prefix]]'s two-phase range-partitioned
    * scan, so the metric survives any row volume. `scoreCol` must be
    * integral (quantize floats to cents upstream, the repo convention).
    * Output: one row `(n_pos, n_neg, auc)` (NULL auc if a class is
    * empty).
    */
  def aucRank(df: DataFrame, labelCol: String, scoreCol: String): DataFrame = {
    val cells = df
      .groupBy(col(scoreCol).as("s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    Prefix.runningSum(cells, "s", "neg", "_cumneg")
      .agg(
        sum("pos").as("n_pos"),
        sum("neg").as("n_neg"),
        sum(col("pos") * (lit(2L) * (col("_cumneg") - col("neg")) + col("neg")))
          .as("_num2"))
      .select(
        col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("_num2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Per-group [[aucRank]] — the cumulative negative count rides a
    * GROUP-partitioned window over the per-group distinct-score dim
    * (never a global sort). Output: one row per group
    * `(group, n_pos, n_neg, auc)`.
    */
  def groupedAucRank(
      df: DataFrame,
      groupCol: String,
      labelCol: String,
      scoreCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = df
      .groupBy(col(groupCol).as("g"), col(scoreCol).as("s"))
      .agg(
        sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
    val w = Window.partitionBy("g").orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells
      .withColumn("_cumneg", sum("neg").over(w))
      .groupBy("g")
      .agg(
        sum("pos").as("n_pos"),
        sum("neg").as("n_neg"),
        sum(col("pos") * (lit(2L) * (col("_cumneg") - col("neg")) + col("neg")))
          .as("_num2"))
      .select(
        col("g").as(groupCol), col("n_pos"), col("n_neg"),
        when(col("n_pos") > 0 && col("n_neg") > 0,
          col("_num2").cast("double") /
            (lit(2L) * col("n_pos") * col("n_neg")).cast("double"))
          .as("auc"))
  }

  /** Calibration (reliability) table for a discrete-confidence classifier:
    * group predictions by their integer confidence numerator (for a k-NN
    * vote, `votes` out of `k`) and report how often each confidence level
    * is actually right. A well-calibrated classifier's `accuracy` tracks
    * `confidence`; the gap per bin is what ECE-style summaries integrate.
    * The discrete vote domain needs no binning policy — every confidence
    * level IS a bin (bounded by k+1 rows), which keeps the whole table
    * exact: counts are longs, `confidence` = votes/k and `accuracy` =
    * n_correct/n are each ONE IEEE division of exact integers.
    *
    * Scale shape: one map-side-combined count over the (votes, correct)
    * pairs — nothing downstream of the classifier's own cost.
    */
  def voteCalibration(df: DataFrame, voteCol: String, k: Int, correctCol: String): DataFrame = {
    require(k > 0, "k must be positive")
    df
      .groupBy(col(voteCol).cast("long").as("votes"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(correctCol), 1L).otherwise(0L)).as("n_correct"))
      .select(
        col("votes"),
        (col("votes").cast("double") / k.toDouble).as("confidence"),
        col("n"), col("n_correct"),
        (col("n_correct").cast("double") / col("n").cast("double")).as("accuracy"))
  }

  /** Four-fifths-rule fairness audit (the EEOC adverse-impact standard):
    * per group, the positive-outcome rate and whether it falls below 4/5
    * of the BEST group's rate — the screening table a model's predictions
    * pass before deployment. Every comparison is EXACT integer
    * cross-multiplication (`5·pos_g·n_best < 4·pos_best·n_g`), never a
    * float rate compare that a last-ulp could flip; the best group is
    * selected the same way (no other group strictly better by
    * cross-multiplication; rate ties break to the smallest group key).
    * `rate` and `impact_ratio` are single IEEE divisions for human eyes.
    *
    * Scale shape: one map-side-combined (group, outcome) count, then
    * |groups|²-bounded dim arithmetic — nothing past the aggregate
    * scales with rows.
    */
  def fairnessAudit(df: DataFrame, groupCol: String, positiveCol: String): DataFrame = {
    val g = df
      .groupBy(col(groupCol).as("grp"))
      .agg(
        count(lit(1)).as("n"),
        sum(when(col(positiveCol), 1L).otherwise(0L)).as("pos"))
    // best = no other group strictly better (exact fraction compare);
    // among rate-ties the smallest key wins the reference slot.
    val beaten = g.alias("a")
      .join(g.alias("h"),
        col("h.pos") * col("a.n") > col("a.pos") * col("h.n") ||
          (col("h.pos") * col("a.n") === col("a.pos") * col("h.n") &&
            col("h.grp") < col("a.grp")),
        "left_semi")
      .select(col("grp"))
    val best = g.join(beaten, Seq("grp"), "left_anti")
      .select(col("grp").as("_bg"), col("n").as("_bn"), col("pos").as("_bpos"))
    g.crossJoin(broadcast(best))
      .select(
        col("grp").as(groupCol), col("n"), col("pos"),
        (col("pos").cast("double") / col("n").cast("double")).as("rate"),
        col("_bg").as("best_group"),
        when(col("_bpos") > 0,
          (col("pos") * col("_bn")).cast("double") /
            (col("_bpos") * col("n")).cast("double")).as("impact_ratio"),
        (lit(5L) * col("pos") * col("_bn") < lit(4L) * col("_bpos") * col("n"))
          .as("adverse_impact"))
  }

  /** Decile gains/lift table — the model-evaluation standard: rank rows
    * by score descending, split into `buckets` equal-population tiers,
    * and report each tier's response rate, lift over the base rate, and
    * cumulative capture share. The ranking is scale-safe: a composite
    * order key `(maxScore − score)·2³² + hash32(id)` rides
    * [[graft.ops.Prefix.runningSum]] (range-partitioned, never a global
    * row_number sort), and the tier index is the exact integer
    * `(rank−1)·buckets div n`. Lift is `pos·N / (n_tier·P)` — exact
    * longs, ONE division; same for rate and capture.
    *
    * Contracts: `scoreCol` must fit 31 bits after shifting (cents-scale
    * money and counts do); rows tying on BOTH score and id-hash share a
    * rank (and hence a tier) — a 2⁻³² event per same-score pair.
    */
  def gainsTable(
      df: DataFrame, scoreCol: String, idCol: String, positiveCol: String,
      buckets: Int = 10): DataFrame = {
    require(buckets >= 2, "need at least 2 buckets")
    val base = df.select(
      col(scoreCol).cast("long").as("_s"),
      graft.ops.TextOps.hash32(col(idCol).cast("string")).as("_h"),
      when(col(positiveCol), 1L).otherwise(0L).as("_p"))
    val mx = base.agg(max("_s").as("_mx"), count(lit(1)).as("_n"), sum("_p").as("_tp"))
    // Truncate before the prefix kernel (r16): runningSum executes its
    // input subtree twice (range-partitioner sampling + the real pass),
    // and this subtree re-scans the source and re-runs one md5 per row
    // (hash32) each time. One localCheckpoint of the five needed columns
    // makes both passes read the materialized rows instead — and gives
    // rangeWidth exact LogicalRDD stats instead of crossJoin guesses.
    val keyed = graft.ops.Checkpoints.truncate(
      base
        .crossJoin(broadcast(mx))
        .select(
          ((col("_mx") - col("_s")) * lit(4294967296L) + col("_h")).as("_k"),
          col("_p"), lit(1L).as("_one"), col("_n"), col("_tp")))
    val tiered = graft.ops.Prefix.runningSum(keyed, "_k", "_one", "_rk")
      .withColumn("bucket", expr(s"((_rk - 1) * $buckets) div _n"))
      .groupBy("bucket")
      .agg(
        count(lit(1)).as("n"), sum("_p").as("pos"),
        max("_n").as("_n"), max("_tp").as("_tp"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy("bucket") // buckets-dim window (≤ `buckets` rows) — bounded
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    tiered
      .withColumn("cum_pos", sum("pos").over(w))
      .select(
        col("bucket"), col("n"), col("pos"),
        (col("pos").cast("double") / col("n").cast("double")).as("rate"),
        when(col("_tp") > 0,
          (col("pos") * col("_n")).cast("double") /
            (col("n") * col("_tp")).cast("double")).as("lift"),
        when(col("_tp") > 0,
          col("cum_pos").cast("double") / col("_tp").cast("double")).as("capture"))
  }

  /** Murphy decomposition of the Brier score over a DISCRETE confidence
    * domain (the [[voteCalibration]] companion scalar summary):
    * reliability (calibration gap mass), resolution (how much the bins
    * separate outcomes), uncertainty (base-rate variance), and the Brier
    * score itself — each a fixed-order fold over the ≤(k+1)-bin dim of
    * per-bin fixed IEEE chains on exact longs (confidence = votes/k, one
    * division per bin). Emitted from independent folds; the textbook
    * identity brier = rel − res + unc holds up to the folds' last ulps.
    */
  def brierDecomposition(
      df: DataFrame, voteCol: String, k: Int, correctCol: String): DataFrame = {
    require(k > 0, "k must be positive")
    val bins = df
      .groupBy(col(voteCol).cast("long").as("v"))
      .agg(count(lit(1)).as("nb"),
        sum(when(col(correctCol), 1L).otherwise(0L)).as("pb"))
    val tot = bins.agg(sum("nb").as("_n"), sum("pb").as("_p"))
    def fold(term: Column, out: String) =
      aggregate(
        sort_array(collect_list(struct(col("v"), term))),
        lit(0.0), (acc, x) => acc + x.getField("col2")).as(out)
    val conf = col("v").cast("double") / k.toDouble
    val acc = col("pb").cast("double") / col("nb").cast("double")
    val ybar = col("_p").cast("double") / col("_n").cast("double")
    bins
      .crossJoin(broadcast(tot))
      .agg(
        max(col("_n")).as("n"),
        fold(
          (col("pb").cast("double") * (conf - 1.0) * (conf - 1.0) +
            (col("nb") - col("pb")).cast("double") * conf * conf) / col("_n").cast("double"),
          "brier"),
        fold(
          col("nb").cast("double") * (conf - acc) * (conf - acc) / col("_n").cast("double"),
          "reliability"),
        fold(
          col("nb").cast("double") * (acc - ybar) * (acc - ybar) / col("_n").cast("double"),
          "resolution"),
        max(ybar * (lit(1.0) - ybar)).as("uncertainty"))
  }

  /** COEC — clicks over expected clicks, the position-bias-corrected CTR
    * (the search/ads relevance readout: raw CTR rewards items shown at
    * position 1; COEC divides by what an AVERAGE item would have earned
    * in the same slots). Expected clicks per item = Σ_p n_ip · ctr_p over
    * the BOUNDED position dim; each per-position term is one fixed IEEE
    * chain `(n_ip·clicks_p)/imps_p`, and the per-item sum folds in
    * ascending-position order (`aggregate(sort_array(...))` ≡ DuckDB
    * `list_reduce(list(... ORDER BY pos))` — the ewma fixed-order
    * convention), so the float accumulation is bit-reproducible.
    *
    * Scale shape: one (item, pos) count (map-side combined), the
    * positions dim broadcast back, a per-item fold over ≤|positions|
    * terms. Output: (item, imps, clicks, expected, coec).
    */
  def coec(df: DataFrame, itemCol: String, posCol: String, clickCol: String): DataFrame = {
    val posTab = df
      .groupBy(col(posCol).as("_p"))
      .agg(count(lit(1)).as("_imps_p"),
        sum(when(col(clickCol), 1L).otherwise(0L)).as("_clicks_p"))
    val itemPos = df
      .groupBy(col(itemCol).as("item"), col(posCol).as("_p"))
      .agg(count(lit(1)).as("_n_ip"),
        sum(when(col(clickCol), 1L).otherwise(0L)).as("_clk_ip"))
    itemPos
      .join(broadcast(posTab), "_p")
      .withColumn("_term",
        col("_n_ip").cast("double") * col("_clicks_p").cast("double") /
          col("_imps_p").cast("double"))
      .groupBy("item")
      .agg(
        sum("_n_ip").as("imps"),
        sum("_clk_ip").as("clicks"),
        aggregate(
          sort_array(collect_list(struct(col("_p"), col("_term")))),
          lit(0.0),
          (acc, x) => acc + x.getField("_term")).as("expected"))
      .withColumn("coec",
        when(col("expected") > 0.0, col("clicks").cast("double") / col("expected")))
  }

  /** Split-conformal calibration threshold (Vovk; Angelopoulos & Bates
    * 2023 tutorial): the ⌈(n+1)(1−α)⌉-th smallest calibration
    * nonconformity score — predictions whose score stays ≤ this
    * threshold form prediction sets with ≥ 1−α marginal coverage. The
    * rank is EXACT integer arithmetic (α as the rational num/den;
    * ceiling by `(x + den − 1) div den`, clamped to n), and the order
    * statistic resolves through the distinct-value counting skeleton on
    * [[graft.ops.Prefix.runningSum]] — never a global sort.
    *
    * Output: one row (n_cal, target_rank, threshold).
    */
  def conformalThreshold(
      cal: DataFrame, scoreCol: String, alphaNum: Int, alphaDen: Int): DataFrame = {
    require(alphaDen > 0 && alphaNum > 0 && alphaNum < alphaDen, "need 0 < alpha < 1")
    val cells = cal.groupBy(col(scoreCol).cast("long").as("v")).agg(count(lit(1)).as("nv"))
    val n = cal.agg(count(lit(1)).as("n"))
    graft.ops.Prefix.runningSum(cells, "v", "nv", "cum")
      .crossJoin(broadcast(n))
      .withColumn("_k",
        least(expr(s"((n + 1) * ${alphaDen - alphaNum} + $alphaDen - 1) div $alphaDen"),
          col("n")))
      .where(col("cum") >= col("_k"))
      .agg(max(col("n")).as("n_cal"), max(col("_k")).as("target_rank"),
        min(col("v")).as("threshold"))
  }

  /** Mean reciprocal rank of a ranked candidate list against a relevance
    * flag — the first-relevant-hit retrieval metric (MRR@k). The rank sum
    * is EXACT for k ≤ 20: each query contributes `lcm(1..20) / first_rank`
    * (lcm(1..20) = 232792560, integral for every rank ≤ 20), a miss
    * contributes 0, and the final MRR is ONE division by `lcm·n_queries`.
    * Never a float Σ(1/rank), whose value depends on accumulation order.
    * (Ranks beyond 20 would truncate; retrieval MRR is conventionally
    * MRR@10 — cap candidate lists at 20.)
    *
    * `ranked` is any (qid, rank, relevant) frame — [[Similarity]] top-k
    * output joined to ground truth. Queries present in `ranked` with no
    * relevant candidate count as misses; `hit_rate` is the companion
    * fraction with ANY relevant hit in the list.
    *
    * Scale shape: one min-aggregate per query, one global aggregate —
    * all map-side combined.
    */
  def meanReciprocalRank(
      ranked: DataFrame, qidCol: String, rankCol: String, relevantCol: String): DataFrame = {
    val firstHit = ranked
      .groupBy(col(qidCol).as("qid"))
      .agg(
        min(when(col(relevantCol), col(rankCol).cast("long"))).as("first_rank"))
    firstHit
      .agg(
        count(lit(1)).as("n_queries"),
        sum(when(col("first_rank").isNotNull, 1L).otherwise(0L)).as("n_hits"),
        sum(when(col("first_rank").isNotNull,
          expr("CAST(232792560 AS BIGINT) div first_rank")).otherwise(0L)).as("_rrsum"))
      .select(
        col("n_queries"), col("n_hits"),
        (col("n_hits").cast("double") / col("n_queries").cast("double")).as("hit_rate"),
        (col("_rrsum").cast("double") /
          (lit(232792560L) * col("n_queries")).cast("double")).as("mrr"))
  }
}
