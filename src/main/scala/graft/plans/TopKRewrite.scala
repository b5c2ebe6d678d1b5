package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Expression, Literal, Slice, SortArray}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, CollectList}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.TopKAgg

/** Optimizer rule: rewrite the per-group top-k ANTIPATTERN
  *
  *   `slice(sort_array(collect_list(v), false), 1, k)`
  *
  * into the native O(k)-state heap aggregate `graft_topk(v, k)`
  * ([[graft.functions.TopKAgg]]) whenever the two are semantically
  * identical — v is BIGINT (value-sorted ties make both arrays equal),
  * the sort is DESCENDING, the slice starts at 1, and k is a positive
  * integer literal.
  *
  * Why a Rule and not a lint: the antipattern buffers EVERY group member
  * in the collect_list buffer before sorting — the 10⁹-row-group OOM —
  * while the heap aggregate's state is k longs per group with map-side
  * partial merging. The rewrite turns the natural way users WRITE the
  * query into the plan they meant, exactly like Spark's own
  * RewriteDistinctAggregates / physical TakeOrdered do for their shapes.
  *
  * Scope guards: only inside `Aggregate` operators (a windowed
  * collect_list has per-frame semantics this aggregate does not model),
  * only Complete/Partial-free whole-expression matches (the
  * AggregateExpression is replaced wholesale, keeping its filter —
  * collect_list and graft_topk both ignore nulls, and a FILTER clause
  * applies before either), never when the collect_list is DISTINCT.
  * Opt-out: `spark.graft.rewrite.topk=false`.
  */
class TopKRewrite extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    SQLConf.get.getConfString("spark.graft.rewrite.topk", "true") == "true"

  private object TopKShape {
    def unapply(e: Expression): Option[(AggregateExpression, Expression, Int)] = e match {
      case Slice(
            SortArray(
              agg @ AggregateExpression(CollectList(child, _, _), _, false, _, _),
              Literal(false, _)),
            Literal(1, IntegerType),
            Literal(k: Int, IntegerType))
          if child.dataType == LongType && k >= 1 =>
        Some((agg, child, k))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform { case a: Aggregate =>
      a.transformExpressions { case TopKShape(agg, child, k) =>
        agg.copy(aggregateFunction = TopKAgg(child, Literal(k)))
      }
    }
}
