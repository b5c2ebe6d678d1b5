package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative table-constraint validation (north-star pipeline substrate;
  * the AWS-Deequ / Great-Expectations shape): a set of named constraints
  * evaluated over a table in as few passes as the constraint mix allows,
  * returning one `(check, violations, pass)` row per constraint. The
  * data-quality gate a pipeline runs before promoting an ingest — the
  * reference has no validation surface at all (rows flow through
  * `bigquack.go:114-141` unchecked).
  *
  * Pass structure, by constraint class:
  *   - [[Validate.NotNull]] / [[Validate.InRange]] / [[Validate.InSet]]
  *     (row-local predicates) all fold into ONE aggregation pass — one
  *     conditional-sum per check inside a single `agg`, map-side combined
  *     to one row, then unpivoted scan-locally. Adding a tenth row-local
  *     check costs one more column in the same pass, not another scan.
  *   - [[Validate.Unique]] costs its own key-grouped count (the
  *     constraint is inherently non-row-local); violations = Σ (dupes−1),
  *     i.e. rows beyond the first per duplicated key.
  *   - [[Validate.RefIntegrity]] is one left-anti join of the non-null
  *     child keys against the parent key column (broadcast when the
  *     parent side is a dimension — the usual case).
  *   - [[Validate.KAnonymity]] is one quasi-identifier-grouped count
  *     (map-side combined to ≤ combo-cardinality rows) summed where the
  *     group is smaller than k.
  *
  * Violations count ROWS (null rows for NotNull; non-null out-of-range /
  * out-of-set rows; orphan child rows), so numbers stay meaningful under
  * exact integer semantics and replay identically in any SQL engine.
  * Nothing is collected; every check result is a distributed one-row
  * frame unioned into the report.
  */
object Validate {

  sealed trait Check { def name: String }

  /** `col` must never be NULL. */
  final case class NotNull(col: String) extends Check {
    def name = s"not_null_$col"
  }

  /** Non-null values of `col` must lie in [lo, hi] (inclusive). */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    def name = s"in_range_$col"
  }

  /** Non-null values of `col` must be members of `values`. */
  final case class InSet(col: String, values: Seq[String]) extends Check {
    def name = s"in_set_$col"
  }

  /** `col` must be unique across the table (NULLs count as a key). */
  final case class Unique(col: String) extends Check {
    def name = s"unique_$col"
  }

  /** Every non-null `col` must exist in `ref`'s `refCol` (foreign key). */
  final case class RefIntegrity(col: String, ref: DataFrame, refCol: String)
      extends Check {
    def name = s"ref_integrity_$col"
  }

  /** k-anonymity over the quasi-identifier columns: every combination of
    * `cols` values must describe at least `k` rows (the privacy audit a
    * dataset passes before release — a combo rarer than k re-identifies
    * its members). Violations count the ROWS sitting in under-k groups
    * (the population at risk), not the groups.
    */
  final case class KAnonymity(cols: Seq[String], k: Long) extends Check {
    require(cols.nonEmpty && k >= 2, s"need quasi-identifiers and k >= 2")
    def name = s"k_anonymity_${cols.mkString("_")}"
  }

  private def violationPredicate(c: Check): Column = c match {
    case NotNull(col) => col_(col).isNull
    case InRange(col, lo, hi) =>
      col_(col).isNotNull && (col_(col) < lo || col_(col) > hi)
    case InSet(col, vs) =>
      col_(col).isNotNull && !col_(col).isin(vs: _*)
    case _ => throw new IllegalArgumentException(s"not row-local: $c")
  }

  private def col_(name: String): Column = col(name)

  /** Evaluate `checks` over `df`: one `(check, violations, pass)` row per
    * constraint, `pass = violations == 0`. Row-local checks share a
    * single aggregation pass; see the object doc for the full pass
    * structure.
    */
  def validate(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    require(checks.map(_.name).distinct.size == checks.size,
      "duplicate check names — one constraint per (kind, column)")
    val rowLocal = checks.filter {
      case _: NotNull | _: InRange | _: InSet => true
      case _ => false
    }
    val frames = Seq.newBuilder[DataFrame]
    if (rowLocal.nonEmpty) {
      val counted = df.agg(
        sum(when(violationPredicate(rowLocal.head), 1L).otherwise(0L))
          .as(rowLocal.head.name),
        rowLocal.tail.map(c =>
          sum(when(violationPredicate(c), 1L).otherwise(0L)).as(c.name)): _*)
      // Unpivot the one aggregate row scan-locally (no extra pass).
      frames += counted.select(explode(array(rowLocal.map(c =>
        struct(
          lit(c.name).as("check"),
          coalesce(col(c.name), lit(0L)).as("violations"))): _*)).as("r"))
        .select(col("r.check"), col("r.violations"))
    }
    checks.foreach {
      case u: Unique =>
        frames += df.groupBy(col(u.col))
          .agg(count(lit(1)).as("_c"))
          .where(col("_c") > 1)
          .agg(coalesce(sum(col("_c") - 1), lit(0L)).as("violations"))
          .select(lit(u.name).as("check"), col("violations"))
      case r: RefIntegrity =>
        frames += df.select(col(r.col).as("_k"))
          .where(col("_k").isNotNull)
          .join(r.ref.select(col(r.refCol).as("_k")).distinct(), Seq("_k"), "left_anti")
          .agg(count(lit(1)).as("violations"))
          .select(lit(r.name).as("check"), col("violations"))
      case a: KAnonymity =>
        frames += df.groupBy(a.cols.map(col): _*)
          .agg(count(lit(1)).as("_c"))
          .where(col("_c") < a.k)
          .agg(coalesce(sum(col("_c")), lit(0L)).as("violations"))
          .select(lit(a.name).as("check"), col("violations"))
      case _ => () // row-local, already counted
    }
    frames.result()
      .reduce(_ unionByName _)
      .select(col("check"), col("violations"), (col("violations") === 0L).as("pass"))
  }
}
