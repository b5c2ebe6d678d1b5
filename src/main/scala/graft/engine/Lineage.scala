package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-level lineage extracted from the ANALYZED Catalyst plan — the
  * governance answer to "which physical columns feed this output column?"
  * (impact analysis, PII propagation audits, deprecation checks), computed
  * from the same tree the optimizer consumes rather than by re-parsing SQL
  * text.
  *
  * Attribution walks the plan bottom-up over expression ids: an alias's
  * lineage is the union of its referenced attributes' lineages; a
  * [[SubqueryAlias]] names any attribute that reaches it unattributed (the
  * nearest enclosing alias wins, so nested views attribute to the
  * innermost relation name — the physical table, not the view stack);
  * [[Union]] merges positionally across branches; [[Generate]] (explode)
  * attributes generator output to the generator's inputs. Plan shapes with
  * no column-introducing role (joins, filters, sorts, limits) pass lineage
  * through untouched.
  *
  * This is plan metadata, not data: the result is a tiny local frame, and
  * nothing here executes the query.
  */
object Lineage {

  /** One row per (output column, source table, source column); an output
    * with NO physical source (literals, `count(*)`) yields a single row
    * with NULL source columns, so every output column appears.
    */
  def columnLineage(df: DataFrame): DataFrame = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    val rows = plan.output.flatMap { a =>
      val srcs = m.getOrElse(a.exprId, Set.empty[(String, String)])
      if (srcs.isEmpty) Seq((a.name, null: String, null: String))
      else srcs.toSeq.sorted.map { case (t, c) => (a.name, t, c) }
    }
    df.sparkSession
      .createDataFrame(rows)
      .toDF("output_col", "source_table", "source_col")
  }

  private type Src = Map[ExprId, Set[(String, String)]]

  private def refs(e: Expression, base: Src): Set[(String, String)] =
    e.references.toSeq.flatMap(a => base.getOrElse(a.exprId, Set.empty[(String, String)])).toSet

  private def walk(plan: LogicalPlan): Src = {
    val base: Src = plan.children.map(walk).foldLeft(Map.empty: Src)(_ ++ _)
    plan match {
      case s: SubqueryAlias =>
        base ++ s.output.map { a =>
          val cur = base.getOrElse(a.exprId, Set.empty[(String, String)])
          a.exprId -> (if (cur.isEmpty) Set((s.alias, a.name)) else cur)
        }
      case p: Project =>
        base ++ p.projectList.collect { case al: Alias => al.exprId -> refs(al.child, base) }
      case ag: Aggregate =>
        base ++ ag.aggregateExpressions.collect {
          case al: Alias => al.exprId -> refs(al.child, base)
        }
      case w: Window =>
        base ++ w.windowExpressions.collect { case al: Alias => al.exprId -> refs(al.child, base) }
      case g: Generate =>
        base ++ g.generatorOutput.map(a => a.exprId -> refs(g.generator, base))
      case u: Union =>
        base ++ u.output.zipWithIndex.map { case (a, i) =>
          a.exprId ->
            u.children.flatMap(c => base.getOrElse(c.output(i).exprId, Set.empty)).toSet
        }
      case _ => base
    }
  }
}
