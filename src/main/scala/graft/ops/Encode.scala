package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Supervised feature encoding (north-star extension): the
  * category → statistic encoders an ML feature pipeline derives from
  * labeled data. First member: smoothed LEAVE-ONE-OUT target encoding —
  * replace a high-cardinality categorical with the target mean of the
  * OTHER rows in its category, shrunk toward the global prior
  * (`(Σ_cat − y_i + m·prior) / (n_cat − 1 + m)`), the standard
  * leakage-resistant form (excluding the row's own target keeps the
  * encoding from memorizing its label; the m-weighted prior keeps rare
  * categories from overfitting).
  *
  * Determinism contract: targets arrive as exact scaled longs (the repo's
  * cents convention), so Σ_cat, Σ_all, and every count are exact
  * integers; the encoding is then a FIXED chain of IEEE ops —
  * `(CAST(s−y AS DOUBLE) + m·(CAST(S AS DOUBLE)/N)) / (n−1+m)` — each
  * correctly rounded on identical operands in both engines, hence
  * bit-reproducible (the same one-final-division discipline as the
  * repo's favg/z-score ops).
  *
  * Scale shape: one map-side-combined category aggregation (|categories|
  * rows), one global aggregate (1 row, broadcast by AQE), one join back
  * on the category key. Payload columns never shuffle; the fact table is
  * read once. Singleton categories (n=1) fall back to the pure prior via
  * the same formula (numerator keeps only m·prior) — no special case, no
  * NULLs.
  */
object Encode {

  /** @param df        input; `targetCol` must be an exact LONG (cents).
    * @param smoothing the prior weight m (rows of pseudo-evidence).
    * @return df's id/category columns + `enc` (double) — and the exact
    *         integer intermediates (`cat_sum`, `cat_n`) for auditability.
    */
  def targetEncodeLoo(
      df: DataFrame,
      idCol: String,
      catCol: String,
      targetCol: String,
      smoothing: Int): DataFrame = {
    require(smoothing >= 1, "target encoding needs m >= 1 (n=1 categories divide by m)")
    val cat = df.groupBy(catCol).agg(
      sum(col(targetCol)).as("cat_sum"),
      count(lit(1)).as("cat_n"))
    val glob = df.agg(
      sum(col(targetCol)).as("_g_sum"),
      count(lit(1)).as("_g_n"))
    df.select(col(idCol), col(catCol), col(targetCol))
      .join(cat, Seq(catCol))
      .crossJoin(glob)
      .select(
        col(idCol),
        col(catCol),
        col("cat_sum"),
        col("cat_n"),
        (((col("cat_sum") - col(targetCol)).cast("double") +
          lit(smoothing.toDouble) * (col("_g_sum").cast("double") / col("_g_n").cast("double"))) /
          (col("cat_n") - 1L + smoothing.toLong).cast("double")).as("enc"))
  }

  /** Modal-value imputation: fill NULLs of `valCol` with the most
    * frequent non-null value of the row's group — the categorical
    * imputer of an ML feature pipeline ("missing language ← the source's
    * dominant language"). Tie convention: equal counts break toward the
    * LARGER value (the max-struct aggregate's natural order, documented
    * so the SQL replay pins it); groups whose every value is null keep
    * their NULLs.
    *
    * Scale shape: one (group, value) map-side-combined count, one
    * max-struct reduce to \|groups\| modal rows (an AQE-broadcast dim),
    * one scan-local coalesce — payloads never shuffle.
    */
  def modeImpute(
      df: DataFrame,
      groupCol: String,
      valCol: String,
      outCol: String): DataFrame = {
    val mode = df
      .where(col(valCol).isNotNull)
      .groupBy(groupCol, valCol)
      .agg(count(lit(1)).as("_cnt"))
      .groupBy(groupCol)
      .agg(max(struct(col("_cnt"), col(valCol).as("_v"))).as("_m"))
      .select(col(groupCol), col("_m._v").as("_mode"))
    df.join(mode, Seq(groupCol), "left")
      .withColumn(outCol, coalesce(col(valCol), col("_mode")))
      .drop("_mode")
  }
}
