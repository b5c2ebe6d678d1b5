package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-set assembly (north-star extension): POINT-IN-TIME-correct
  * feature retrieval — for every label row, attach each feature's value
  * as of the label's timestamp, never after it. This is THE feature-store
  * contract (Feast/Tecton's `get_historical_features`): a model trained
  * with post-label feature values is silently leaky, the ML sibling of
  * the purged-split rule (C158).
  *
  * Mechanics, composed from audited pieces: each feature table first
  * DEDUPES to one row per (key, ts) — equal-timestamp observations keep
  * the MINIMUM value (a documented deterministic tie, mirrored by the
  * oracle) — then [[AsofJoin.backward]] finds the latest feature
  * timestamp at or before the label (one key-partitioned window pass),
  * and the value rejoins on the exact (key, matched-ts) pair. Features
  * fold left-to-right, so every feature sees the full label frame;
  * labels with no prior observation keep NULL.
  *
  * Scale shape per feature: the as-of union shuffles once on the entity
  * key (the AsofJoin plan, PlanSpec-pinned); the value rejoin moves only
  * matched (key, ts) pairs against the deduped feature dim. k features =
  * k such passes — the production layout precomputes feature snapshots,
  * which is exactly what the deduped (key, ts, value) frame is.
  */
object FeatureStore {

  /** One feature to attach: `df`'s `valCol` as of the label time, keyed
    * by `keyCol`/`tsCol`, emitted under `name`.
    */
  final case class Feature(
      name: String,
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valCol: String)

  def pointInTimeJoin(
      labels: DataFrame,
      keyCol: String,
      tsCol: String,
      features: Seq[Feature]): DataFrame = {
    require(features.nonEmpty, "no features to attach")
    require(features.map(_.name).distinct.size == features.size, "duplicate feature names")
    features.foldLeft(labels) { (acc, f) =>
      val asofName = s"__asof_${f.name}"
      val snap = f.df
        .groupBy(col(f.keyCol).as(keyCol), col(f.tsCol).as(tsCol))
        .agg(min(col(f.valCol)).as(f.name))
      val matched = AsofJoin.backward(
        acc, snap.select(col(keyCol), col(tsCol)),
        key = keyCol, leftTs = tsCol, rightTs = tsCol, asofTsName = asofName)
      matched
        .join(
          snap.select(col(keyCol), col(tsCol).as(asofName), col(f.name)),
          Seq(keyCol, asofName), "left")
        .drop(asofName)
    }
  }
}
