package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Experiment analysis (north-star extension): the A/B readout layer an
  * analytics engine serves after the funnel — unit-level conversion,
  * per-variant rates, and the two-proportion z statistic for every
  * variant pair.
  *
  * Determinism contract: conversions collapse to exact integers at the
  * UNIT level first (a unit converts once no matter how many events it
  * emits); rates, the pooled p̂, and the z score are then FIXED chains of
  * correctly-rounded IEEE ops on exact-integer-derived operands — the
  * `1/n_a + 1/n_b` term enters as the exact rational
  * `(n_a+n_b)/(n_a·n_b)` (one division), so the whole statistic is
  * bit-reproducible against a SQL replay. No normal-CDF p-value on
  * purpose: erf is libm territory (the ln rule); callers compare |z|
  * against their critical value, which is how dashboards consume it
  * anyway.
  *
  * Scale shape: one unit-level aggregation (map-side combined), a
  * |variants|-row reduce, and a |variants|²-row pair join of that dim —
  * nothing past the first aggregation scales with event volume.
  */
object Experiment {

  /** @param isConversion row-level predicate; a unit converts if ANY of
    *                     its rows satisfies it.
    * @return one row per ordered variant pair (variant_a < variant_b):
    *         counts, rates, relative lift (NULL when the baseline rate
    *         is 0), and z (NULL when the pooled rate is degenerate).
    */
  def abProportionTest(
      df: DataFrame,
      unitCol: String,
      variantCol: String,
      isConversion: Column): DataFrame = {
    val per = df
      .groupBy(col(unitCol).as("u"), col(variantCol).as("variant"))
      .agg(max(isConversion.cast("long")).as("conv"))
    val g = per.groupBy("variant").agg(count(lit(1)).as("n"), sum("conv").as("c"))
    val a = g.select(col("variant").as("variant_a"), col("n").as("n_a"), col("c").as("c_a"))
    val b = g.select(col("variant").as("variant_b"), col("n").as("n_b"), col("c").as("c_b"))
    val pA = col("c_a").cast("double") / col("n_a").cast("double")
    val pB = col("c_b").cast("double") / col("n_b").cast("double")
    val pHat = (col("c_a") + col("c_b")).cast("double") / (col("n_a") + col("n_b")).cast("double")
    val varTerm = pHat * (lit(1.0) - pHat) *
      ((col("n_a") + col("n_b")).cast("double") / (col("n_a") * col("n_b")).cast("double"))
    a.join(b, col("variant_a") < col("variant_b"))
      .select(
        col("variant_a"), col("variant_b"),
        col("n_a"), col("c_a"), col("n_b"), col("c_b"),
        pA.as("p_a"), pB.as("p_b"),
        when(col("c_b") > 0L, (pA - pB) / pB).as("rel_lift"),
        when(col("c_a") + col("c_b") > 0L && col("c_a") + col("c_b") < col("n_a") + col("n_b"),
          (pA - pB) / sqrt(varTerm)).as("z"))
  }

  /** CUPED variance reduction (Deng et al., WSDM'13 — the production
    * experiment-sensitivity standard): adjust each variant's post-period
    * mean by the pooled pre-period covariate,
    * `mean_adj = ȳ_v − θ·(x̄_v − x̄)` with
    * `θ = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)`. Every moment is an exact
    * long over unit-level cents; θ and the adjusted means are fixed IEEE
    * chains — bit-reproducible. Zero pre-period variance degrades to
    * θ = 0 (adjusted = raw), never a division blow-up.
    *
    * Moment budget: `n·Σxy` and `n·Σx²` must stay under 2⁶³ — the same
    * documented re-unit contract as the z-score/Mahalanobis ops (and the
    * same reason this op sits off the 10× up-screen at cents units).
    *
    * Scale shape: one unit-level aggregation, one 1-row pooled-moment
    * broadcast, \|variants\|-dim arithmetic.
    */
  def cuped(
      units: DataFrame,
      variantCol: String,
      preCol: String,
      postCol: String): DataFrame = {
    val pooled = units.agg(
      count(lit(1)).as("pn"),
      sum(col(preCol)).as("psx"), sum(col(postCol)).as("psy"),
      sum(col(preCol) * col(postCol)).as("psxy"),
      sum(col(preCol) * col(preCol)).as("psx2"))
    val thetaNum = (col("pn") * col("psxy") - col("psx") * col("psy")).cast("double")
    val thetaDen = (col("pn") * col("psx2") - col("psx") * col("psx")).cast("double")
    val theta = when(thetaDen > 0.0, thetaNum / thetaDen).otherwise(lit(0.0))
    val xBarAll = col("psx").cast("double") / col("pn").cast("double")
    units
      .groupBy(variantCol)
      .agg(
        count(lit(1)).as("n"),
        sum(col(postCol)).as("sum_y"),
        sum(col(preCol)).as("sum_x"))
      .crossJoin(pooled)
      .select(
        col(variantCol), col("n"), col("sum_y"), col("sum_x"),
        theta.as("theta"),
        (col("sum_y").cast("double") / col("n").cast("double")).as("mean_y"),
        (col("sum_y").cast("double") / col("n").cast("double") -
          theta * (col("sum_x").cast("double") / col("n").cast("double") - xBarAll))
          .as("mean_adj"))
  }

  /** Simpson's-paradox screen: the two-variant comparison computed
    * OVERALL and within every stratum, with the effect direction as the
    * EXACT integer sign of `c_a·n_b − c_b·n_a` (cross-multiplied rates —
    * no float compare can flip it) and a `reversed` flag wherever a
    * stratum's direction contradicts the overall — the aggregation-bias
    * alarm every experiment readout should run before anyone trusts the
    * topline. Exactly two variants by contract (the A/B shape); the
    * overall row rides along as stratum `__overall`.
    *
    * Scale shape: unit-level conversion collapse first (as
    * [[abProportionTest]]), then \|strata\|-dim arithmetic; the 1-row
    * overall sign broadcasts onto the strata.
    */
  def simpsonScreen(
      df: DataFrame,
      unitCol: String,
      variantCol: String,
      stratumCol: String,
      isConversion: Column): DataFrame = {
    val per = df
      .groupBy(col(unitCol).as("u"), col(variantCol).as("variant"),
        col(stratumCol).cast("string").as("stratum"))
      .agg(max(isConversion.cast("long")).as("conv"))
    def pair(grouped: DataFrame): DataFrame = {
      val g = grouped
      val a = g.select(col("stratum"), col("variant").as("variant_a"),
        col("n").as("n_a"), col("c").as("c_a"))
      val b = g.select(col("stratum").as("_s2"), col("variant").as("variant_b"),
        col("n").as("n_b"), col("c").as("c_b"))
      a.join(b, col("stratum") === col("_s2") && col("variant_a") < col("variant_b"))
        .drop("_s2")
    }
    val strata = pair(per.groupBy("stratum", "variant")
      .agg(count(lit(1)).as("n"), sum("conv").as("c")))
    val overall = pair(per.groupBy("variant")
      .agg(count(lit(1)).as("n"), sum("conv").as("c"))
      .withColumn("stratum", lit("__overall")))
    val diffSign = signum((col("c_a") * col("n_b") - col("c_b") * col("n_a")).cast("double"))
      .cast("long")
    val all = strata.unionByName(overall)
      .withColumn("diff_sign", diffSign)
      .withColumn("p_a", col("c_a").cast("double") / col("n_a").cast("double"))
      .withColumn("p_b", col("c_b").cast("double") / col("n_b").cast("double"))
    val oSign = all.where(col("stratum") === "__overall")
      .select(col("diff_sign").as("overall_sign"))
    all.crossJoin(oSign)
      .withColumn(
        "reversed",
        col("stratum") =!= "__overall" && col("diff_sign") =!= 0L &&
          col("overall_sign") =!= 0L && col("diff_sign") =!= col("overall_sign"))
      .select("stratum", "variant_a", "variant_b", "n_a", "c_a", "n_b", "c_b",
        "p_a", "p_b", "diff_sign", "overall_sign", "reversed")
  }

  /** z = 1.96 to the last ulp, parsed from a string so both engines land
    * the identical double (the ns193 convention — DuckDB's DECIMAL→DOUBLE
    * literal path is not correctly rounded).
    */
  private val Z975 = java.lang.Double.parseDouble("1.959963984540054")

  /** Per-group mean with a normal-approximation 95% CI — the everyday
    * metric readout ("revenue per order by segment, with error bars").
    * All moments are EXACT integer sums over cents-scaled longs (the
    * n·Σv² budget rule: re-unit if n·Σv² can reach 2⁶³); the mean,
    * sample variance `(n·Σv² − (Σv)²)/(n(n−1))`, and half-width
    * `z·√(s²/n)` are fixed IEEE chains on those exact operands.
    * Output: `(group, n, mean, ci_lo, ci_hi)` — single-row groups get
    * NULL bounds (no variance estimate), SQL-style.
    */
  def groupedMeanCI(df: DataFrame, groupCol: String, valueCol: String): DataFrame =
    df.select(col(groupCol).as("g"), col(valueCol).cast("long").as("v"))
      .groupBy("g")
      .agg(count(lit(1)).as("n"), sum("v").as("s1"), sum(col("v") * col("v")).as("s2"))
      .select(
        col("g").as(groupCol), col("n"),
        (col("s1").cast("double") / col("n").cast("double")).as("mean"),
        when(col("n") >= 2,
          sqrt(((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
            (col("n") * (col("n") - 1)).cast("double")) / col("n").cast("double"))
            * Z975).as("_hw"))
      .select(
        col(groupCol), col("n"), col("mean"),
        (col("mean") - col("_hw")).as("ci_lo"),
        (col("mean") + col("_hw")).as("ci_hi"))

  /** Difference-in-differences readout (the quasi-experimental workhorse
    * when randomization wasn't possible: did the treated group's
    * post-period change EXCEED the control group's?): the four
    * (treated, post) cell means from exact cents sums, and
    * `DiD = (m_t1 − m_t0) − (m_c1 − m_c0)` as a fixed IEEE chain.
    * One map-side-combined pass; output is ONE row with every cell
    * count/mean plus the estimate.
    */
  def diffInDiff(
      df: DataFrame,
      treatedCol: String,
      postCol: String,
      valueCol: String): DataFrame = {
    def cell(t: Boolean, p: Boolean, out: String): Seq[Column] = {
      val m = col(treatedCol) === t && col(postCol) === p
      Seq(
        sum(when(m, 1L).otherwise(0L)).as(s"n_$out"),
        sum(when(m, col(valueCol).cast("long")).otherwise(0L)).as(s"s_$out"))
    }
    val cells = cell(false, false, "c0") ++ cell(false, true, "c1") ++
      cell(true, false, "t0") ++ cell(true, true, "t1")
    df.agg(cells.head, cells.tail: _*)
      .select(
        Seq(col("n_c0"), col("n_c1"), col("n_t0"), col("n_t1")) ++
          Seq("c0", "c1", "t0", "t1").map(c =>
            // NULL mean on an empty cell (a design with a missing cell has
            // no DiD), never a divide-by-zero under ANSI mode
            when(col(s"n_$c") > 0,
              col(s"s_$c").cast("double") / col(s"n_$c").cast("double"))
              .as(s"m_$c")): _*)
      .withColumn("did",
        (col("m_t1") - col("m_t0")) - (col("m_c1") - col("m_c0")))
  }

  /** Poisson-bootstrap confidence interval for a mean — the
    * large-corpus resampling standard (each row enters replicate `b`
    * with a Poisson(1) weight instead of true multinomial resampling, so
    * replicates stream in ONE pass with no per-replicate shuffles; the
    * classic big-data bootstrap). Weights are DETERMINISTIC: ONE 32-bit
    * md5 per row fans out through the MinHash affine family
    * (`(base·(2b+1) + b·12345 + 67891) mod 2³² mod 1000` — one md5 per
    * ITEM, arithmetic per replicate: the C2 discipline; a per-(row, b)
    * md5 was measured at 24 s for 30M digests at sf0.1) and maps through
    * a fixed 1000-cell cumulative Poisson(1) table (368/736/920/981/
    * 996/999 — the documented discretization), so both engines replay
    * the identical resample. Each replicate mean is one division of
    * exact longs; the CI bounds are order statistics over the B-row
    * replicate dim.
    *
    * Scale shape: a constant B-fold explode (linear), one (replicate)
    * aggregate map-side combined, a B-row sort. Weight ≤ 6 keeps the
    * Σw·x budget at 6× the plain sum's.
    */
  def poissonBootstrapCI(
      df: DataFrame, idCol: String, valueCol: String,
      b: Int = 200, loPct: Int = 5, hiPct: Int = 95): DataFrame = {
    require(b >= 10 && loPct > 0 && hiPct < 100 && loPct < hiPct, "bad bootstrap params")
    // B-fold fan-out per row: spread a narrow scan first or all B
    // replicates of every row serialize in one task ([[Par.spread]]).
    // fanout: B exploded rows per input row, a hash + weight lookup
    // each — ~2 scan-equivalent bytes of work per replicate byte.
    val weighted = Par.spread(df, fanout = 2.0 * b)
      .select(
        conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long")
          .as("_base"),
        col(valueCol).cast("long").as("_v"))
      .withColumn("_b", explode(sequence(lit(0L), lit(b - 1L))))
      .withColumn("_h",
        (col("_base") * (lit(2L) * col("_b") + 1L) + col("_b") * 12345L + 67891L)
          % 4294967296L % 1000L)
      .withColumn("_w",
        when(col("_h") < 368, 0L).when(col("_h") < 736, 1L).when(col("_h") < 920, 2L)
          .when(col("_h") < 981, 3L).when(col("_h") < 996, 4L)
          .when(col("_h") < 999, 5L).otherwise(6L))
    val reps = weighted
      .groupBy("_b")
      .agg(sum(col("_w") * col("_v")).as("_ws"), sum(col("_w")).as("_wn"))
      .where(col("_wn") > 0)
      .select((col("_ws").cast("double") / col("_wn").cast("double")).as("_m"))
    // ONE pass: both CI bounds are order statistics over the B-row
    // replicate dim, read from one sorted array — a rank-window spelling
    // would re-execute the B× explode pipeline once per bound (measured
    // 24.6 s → this shape at sf0.1).
    val bounds = reps
      .agg(count(lit(1)).as("_nb"), sort_array(collect_list(col("_m"))).as("_ms"))
      .select(
        element_at(col("_ms"),
          expr(s"CAST((_nb * $loPct + 99) div 100 AS INT)")).as("ci_lo"),
        element_at(col("_ms"),
          expr(s"CAST((_nb * $hiPct + 99) div 100 AS INT)")).as("ci_hi"))
    df.agg(
        count(lit(1)).as("n"),
        (sum(col(valueCol).cast("long")).cast("double") / count(lit(1))).as("mean"))
      .crossJoin(broadcast(bounds))
  }

  /** Mantel–Haenszel pooled odds ratio across strata — the stratified
    * 2×2 standard (the pooled effect [[simpsonScreen]] only flags the
    * need for): OR_MH = Σ_i a·d/n / Σ_i b·c/n. Per-stratum cells are
    * exact longs; the two fraction sums fold in fixed stratum order (the
    * ewma convention) over the bounded strata dim; ONE final division.
    * NULL when either fold is zero (no discordant mass).
    */
  def mantelHaenszel(
      df: DataFrame, stratumCol: String, treatedCol: String, outcomeCol: String): DataFrame = {
    val cells = df
      .groupBy(col(stratumCol).as("stratum"))
      .agg(
        sum(when(col(treatedCol) && col(outcomeCol), 1L).otherwise(0L)).as("a"),
        sum(when(col(treatedCol) && !col(outcomeCol), 1L).otherwise(0L)).as("b"),
        sum(when(!col(treatedCol) && col(outcomeCol), 1L).otherwise(0L)).as("c"),
        sum(when(!col(treatedCol) && !col(outcomeCol), 1L).otherwise(0L)).as("d"))
      .withColumn("n", col("a") + col("b") + col("c") + col("d"))
    cells.agg(
      count(lit(1)).as("n_strata"),
      sum("a").as("sum_a"), sum("b").as("sum_b"),
      sum("c").as("sum_c"), sum("d").as("sum_d"),
      aggregate(
        sort_array(collect_list(struct(col("stratum"),
          (col("a") * col("d")).cast("double") / col("n").cast("double")))),
        lit(0.0), (acc, x) => acc + x.getField("col2")).as("sum_ad_n"),
      aggregate(
        sort_array(collect_list(struct(col("stratum"),
          (col("b") * col("c")).cast("double") / col("n").cast("double")))),
        lit(0.0), (acc, x) => acc + x.getField("col2")).as("sum_bc_n"))
      .withColumn("or_mh",
        when(col("sum_bc_n") > 0.0 && col("sum_ad_n") > 0.0,
          col("sum_ad_n") / col("sum_bc_n")))
  }

  /** Covariate-shift importance weights over a BOUNDED bucket covariate
    * (the DSIR-style density-ratio reweighting that aligns a source
    * corpus to a target distribution): per bucket, the normalized ratio
    * `w_b = (n_tgt_b · N_src) / (n_src_b · N_tgt)` — exact longs, ONE
    * division — under which the weighted source bucket masses match the
    * target mix exactly (Σ n_src_b·w_b = N_src identically). `uncovered`
    * flags target mass the source cannot represent (n_src_b = 0 — no
    * reweighting fixes that; the shift is unfixable there).
    *
    * `ess` (Kish effective sample size of the weighted source) collapses
    * exactly on the bucket dim: (Σw)²/Σw² = N_tgt_cov² / Σ_b
    * n_tgt_b²/n_src_b (covered buckets; ≤ N_src by Cauchy–Schwarz). The
    * denominator is the only float accumulation and rides a fixed
    * bucket-order fold (the ewma convention), bit-reproducible; it
    * answers "how much data do the weights effectively keep?".
    *
    * Scale shape: two map-side-combined bucket counts, a 1-row totals
    * broadcast, a fold over the bounded bucket dim.
    */
  def covariateShiftWeights(
      src: DataFrame, tgt: DataFrame, bucketCol: String): DataFrame = {
    val sb = src.groupBy(col(bucketCol).as("bucket")).agg(count(lit(1)).as("n_src"))
    val tb = tgt.groupBy(col(bucketCol).as("bucket")).agg(count(lit(1)).as("n_tgt"))
    val joined = sb.join(tb, Seq("bucket"), "full_outer")
      .select(
        col("bucket"),
        coalesce(col("n_src"), lit(0L)).as("n_src"),
        coalesce(col("n_tgt"), lit(0L)).as("n_tgt"))
    val totals = joined.agg(
      sum("n_src").as("_ns"), sum("n_tgt").as("_nt"),
      sum(when(col("n_src") > 0, col("n_tgt")).otherwise(0L)).as("_ntc"),
      // Σ_b n_tgt_b²/n_src_b over covered buckets, folded in ascending
      // bucket order — the ESS denominator's only float accumulation.
      aggregate(
        sort_array(collect_list(
          when(col("n_src") > 0,
            struct(col("bucket"),
              (col("n_tgt") * col("n_tgt")).cast("double") / col("n_src").cast("double")))
            .otherwise(null))),
        lit(0.0),
        (acc, x) => acc + x.getField("col2")).as("_d"))
    joined
      .crossJoin(broadcast(totals))
      .select(
        col("bucket"), col("n_src"), col("n_tgt"),
        when(col("n_src") > 0,
          (col("n_tgt") * col("_ns")).cast("double") /
            (col("n_src") * col("_nt")).cast("double")).as("weight"),
        (col("n_src") === 0L && col("n_tgt") > 0L).as("uncovered"),
        when(col("_d") > 0.0,
          (col("_ntc") * col("_ntc")).cast("double") / col("_d")).as("ess"))
  }
}
