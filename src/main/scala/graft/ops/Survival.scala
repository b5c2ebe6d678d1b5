package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Survival analysis (north-star extension): the Kaplan–Meier estimator —
  * `S(t) = Π_{tᵢ ≤ t} (1 − dᵢ/nᵢ)` over event times, with right-censored
  * units leaving the risk set at their censor time — the
  * time-to-churn / time-to-convert curve product analytics reads.
  *
  * Determinism contract: risk-set sizes and event counts are EXACT
  * integers from the ns64 counting skeleton; each factor is one IEEE
  * division; and the survival product folds the factors in EXPLICIT
  * ascending-time order (Spark `aggregate` over the sorted factor array ≡
  * DuckDB `list_reduce` over `list(factor ORDER BY t)` — the ewma
  * fixed-order-fold precedent), so every S(t) is bit-reproducible. The
  * prefix folds cost O(T²) over the DISTINCT-TIME dim — callers bucket
  * durations (days, not micros) so T stays a dim, which is also what
  * makes the curve readable.
  *
  * Scale shape: units collapse to duration counts scan-locally; the
  * at-risk/event tables and the fold all run on the T-row dim. Nothing
  * past the first aggregation touches unit volume.
  */
object Survival {

  /** @param units one row per subject: `durationCol` (long, bucketed
    *              time-to-event-or-censor) and `observedCol` (boolean —
    *              true = the event happened, false = right-censored).
    * @return one row per distinct OBSERVED event time: `t`, `n_risk`,
    *         `d` (events at t), `factor` (1 − d/n), `survival` (the
    *         running product through t).
    */
  def kaplanMeier(
      units: DataFrame,
      durationCol: String,
      observedCol: String,
      boundedDomain: Boolean = true): DataFrame = {
    val u = units.select(
      col(durationCol).cast("long").as("dur"),
      col(observedCol).cast("boolean").as("obs"))
    val total = u.agg(count(lit(1)).as("n_total"))
    // risk set at t = units with dur >= t = total − (# with dur < t):
    // cumulative counts over the distinct-duration dim. Durations here
    // are BUCKETED by contract (days/weeks — the dim is bounded by
    // domain arithmetic), so the default is a plain window OVER THE
    // AGGREGATED dim (the PlanSpec-sanctioned shape); pass
    // boundedDomain = false for raw continuous durations (dim O(rows))
    // to ride Prefix.runningSum's two-phase scan instead of a
    // single-task sort. Inclusive total minus own count = strictly-
    // before count either way.
    val durCounts = u.groupBy("dur").agg(
      count(lit(1)).as("c_all"),
      sum(when(col("obs"), 1L).otherwise(0L)).as("d"))
    val cum =
      if (boundedDomain)
        durCounts.withColumn("_cum",
          sum("c_all").over(
            org.apache.spark.sql.expressions.Window.orderBy("dur")
              .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
                org.apache.spark.sql.expressions.Window.currentRow)))
      else graft.ops.Prefix.runningSum(durCounts, "dur", "c_all", "_cum")
    val times = cum
      .withColumn("c_before", col("_cum") - col("c_all"))
      .drop("_cum")
      .crossJoin(total)
      .withColumn("n_risk", col("n_total") - col("c_before"))
      .where(col("d") > 0L)
      .select(col("dur").as("t"), col("n_risk"), col("d"),
        (lit(1.0) - col("d").cast("double") / col("n_risk").cast("double")).as("factor"))
    // fixed-order prefix products over the sorted factor list (T-row dim)
    val folded = times
      .agg(sort_array(collect_list(struct(col("t"), col("factor")))).as("l"))
      .select(explode(expr(
        """transform(l, (x, i) -> struct(
          |  x.t AS t,
          |  aggregate(slice(l, 1, i + 1), CAST(1.0 AS DOUBLE),
          |    (acc, y) -> acc * y.factor) AS survival))""".stripMargin)).as("r"))
      .select(col("r.t").as("t"), col("r.survival").as("survival"))
    times.join(folded, Seq("t"))
      .select("t", "n_risk", "d", "factor", "survival")
  }
}
