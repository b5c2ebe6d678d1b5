package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto frontier (skyline) over two minimized objectives — "no other row
  * is at least as good on both axes and strictly better on one": the
  * multi-objective shortlist primitive (cheapest-vs-smallest part,
  * latency-vs-cost config, price-vs-distance listing).
  *
  * Dominance (minimize x, minimize y):
  *   dominated(p) ⟺ ∃q: q.x ≤ p.x ∧ q.y ≤ p.y ∧ (q.x < p.x ∨ q.y < p.y).
  * Exact duplicates dominate nothing and survive together.
  *
  * The 2-D case needs no O(n²) self-join: sort by x, then p survives iff
  *   - min(y) over rows with STRICTLY smaller x (m1) is null or > p.y, and
  *   - min(y) over rows with EQUAL x (m2) equals p.y
  * (m1 ≤ p.y ⇒ a better-or-equal-y row at smaller x dominates; m2 < p.y ⇒
  * a smaller-y row at the same x dominates). Both are RANGE-frame window
  * minima over ONE sort — and the cross-partition half of m1 goes through
  * [[Prefix.runningMinBefore]]'s two-phase range-partitioned scan, so no
  * single-task global window ever materializes. m2 is the peers frame
  * (RANGE 0..0) of the SAME sort: zero extra exchanges.
  *
  * Both objective columns must be integral (exact comparisons; callers
  * scale money through cents first). Output: the input columns of the
  * surviving rows.
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val withMins = Prefix.runningMinBeforeWithPeers(df, xCol, yCol, "__m1", "__m2")
    withMins
      .where((col("__m1").isNull || col("__m1") > col(yCol)) && col("__m2") === col(yCol))
      .drop("__m1", "__m2")
  }
}
