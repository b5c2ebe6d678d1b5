package graft.plans

import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HyperLogLogPlusPlus}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf

/** OPT-IN optimizer rule: rewrite `COUNT(DISTINCT x)` into
  * `approx_count_distinct(x)` (HyperLogLog++) — the "approximate mode"
  * switch warehouse dashboards flip when exact distinct counts stop
  * being worth their shuffle.
  *
  * Why this is a planner service at 100 TB: COUNT(DISTINCT) forces
  * either Spark's Expand-based multi-phase plan or a per-group distinct
  * set; the HLL aggregate is ONE pass with O(sketch) state per group and
  * map-side partial merging — the same answer class every interactive
  * engine (BigQuery `APPROX_COUNT_DISTINCT`, Druid, Presto `approx_
  * distinct`) ships as a first-class function, offered here as a REWRITE
  * so existing SQL can opt in without edits.
  *
  * The rule CHANGES RESULTS (bounded relative error, default 5%), so
  * unlike [[TopKRewrite]] it is OFF by default and gated on
  * `spark.graft.rewrite.approxDistinct=true`. Scope guards: only inside
  * `Aggregate` (window COUNT(DISTINCT) is left alone), only the
  * single-argument form, FILTER clauses preserved (they apply before
  * either aggregate), non-deterministic children left alone. Both
  * functions return BIGINT, so the swap is schema-invariant.
  */
class ApproxDistinctRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rewrite.approxDistinct", "false") == "true"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform { case a: Aggregate =>
      a.transformExpressions {
        case agg @ AggregateExpression(Count(Seq(child)), _, true, _, _)
            if child.deterministic =>
          agg.copy(
            aggregateFunction = new HyperLogLogPlusPlus(child),
            isDistinct = false)
      }
    }
}
