package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-aggregate maintenance (north-star pipeline
  * substrate): keep a per-key aggregate of a managed table current by
  * folding in the CDC change feed ([[graft.sinks.ManagedWriter.changes]])
  * instead of rescanning the table — the O(changeset) refresh that makes a
  * maintained aggregate viable over a 100 TB base table.
  *
  * Exactness: sums are scaled-long cents (the repo's standard exact-money
  * representation), so delta application is integer arithmetic — the
  * incrementally maintained state is BIT-identical to a full recompute,
  * not approximately equal. That identity is what `ns104_incremental_agg`
  * gates: the Spark side answers from state ⊕ changes, the oracle
  * recomputes the final table from scratch.
  *
  * Scale shape: the delta aggregate shuffles only the changeset (map-side
  * combined to ≤ |changed keys| rows); the state merge is one full-outer
  * join keyed on the group key — O(|state| + |changed keys|), with the
  * delta side AQE-broadcast when the changeset is small.
  */
object Incremental {

  /** Per-key (n_rows, sum_cents) aggregate state of a snapshot — the
    * stored materialized view this module maintains.
    */
  def aggState(df: DataFrame, keyCol: String, valCol: String): DataFrame =
    df.groupBy(col(keyCol))
      .agg(
        count(lit(1)).cast("long").as("n_rows"),
        sum(round(col(valCol) * 100).cast("long")).as("sum_cents"))

  /** Fold a CDC change feed into an existing aggregate state WITHOUT
    * touching the base table: inserts and update post-images contribute
    * (+1, +cents), deletes and update pre-images (−1, −cents). Keys whose
    * count reaches zero vanish; keys never seen before appear.
    *
    * Pre-image cancellation is exact: the pre-image rows carry the same
    * doubles the state was built from, so their cents cancel bit-for-bit.
    */
  def applyChanges(
      state: DataFrame,
      changes: DataFrame,
      keyCol: String,
      valCol: String): DataFrame = {
    val sign = when(
      col("_change_type").isin("insert", "update_postimage"), lit(1L))
      .otherwise(lit(-1L))
    val delta = changes.groupBy(col(keyCol))
      .agg(
        sum(sign).as("d_rows"),
        sum(sign * round(col(valCol) * 100).cast("long")).as("d_cents"))
    state.join(delta, Seq(keyCol), "full_outer")
      .select(
        col(keyCol),
        (coalesce(col("n_rows"), lit(0L)) + coalesce(col("d_rows"), lit(0L)))
          .as("n_rows"),
        (coalesce(col("sum_cents"), lit(0L)) + coalesce(col("d_cents"), lit(0L)))
          .as("sum_cents"))
      .where(col("n_rows") > 0)
  }
}
