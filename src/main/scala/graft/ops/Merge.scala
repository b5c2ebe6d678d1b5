package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC merge (north-star extension): apply a changeset to a base table with
  * Delta-style MERGE semantics — the incremental-maintenance primitive that
  * turns the managed warehouse (`sinks.ManagedWriter` + manifest time
  * travel) into an updatable table without rewriting unaffected rows'
  * values.
  *
  * Semantics, per base key:
  *   - change op `D` (delete) — the base row is dropped;
  *   - any other op (canonically `U`) — upsert: the change row replaces the
  *     base row, or is inserted if the key is absent (upsert-style
  *     `WHEN [NOT] MATCHED`). Non-delete ops — INCLUDING a NULL op —
  *     deliberately all upsert: a typo'd or missing op tag must not
  *     silently DELETE the base row (which is what an exact `op = 'U'`
  *     filter would do — the key is already anti-joined out of the kept
  *     side, and `op <> 'D'` is NULL, not true, for a NULL op);
  *   - keys without a change row pass through untouched.
  * The changeset must carry at most one row per key (CDC compaction — keep
  * the latest — is the caller's `Dedup.keepFirstPerKey`-shaped step);
  * `applyChanges` verifies nothing about it, matching MERGE's "multiple
  * matches is caller error" contract.
  *
  * Scale shape: ONE co-partitioned shuffle — the anti-join of base against
  * change keys and the insert union both hash by the merge key, and the
  * changeset side is AQE-sized (broadcast when small, shuffle when it is a
  * full-table restatement — never hint-forced: CDC batches range from a
  * handful of rows to corpus-scale backfills). No full-table rewrite: rows
  * stream through untouched unless their key appears in the changeset.
  */
object Merge {

  /** Apply `changes` (base schema + an op column valued 'U' or 'D') to
    * `base`, returning the merged table.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keyCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "empty merge key")
    val touched = changes.select(keyCols.map(col): _*)
    val kept = base.join(touched, keyCols, "left_anti")
    val upserts = changes.where(!(col(opCol) <=> "D")).drop(opCol)
    kept.unionByName(upserts)
  }
}
