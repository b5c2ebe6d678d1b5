package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** l-diversity over the quasi-identifier columns with respect to a
    * sensitive column: every quasi-identifier group must contain at least
    * `l` DISTINCT sensitive values (Machanavajjhala et al. 2007 — the
    * refinement k-anonymity needs: a group of k rows all sharing one
    * sensitive value still discloses it). Violations count the ROWS in
    * under-diverse groups, the KAnonymity convention.
    */
  final case class LDiversity(cols: Seq[String], sensitive: String, l: Long) extends Check {
    require(cols.nonEmpty && l >= 2, "need quasi-identifiers and l >= 2")
    require(!cols.contains(sensitive), "sensitive column cannot be a quasi-identifier")
    def name = s"l_diversity_${cols.mkString("_")}_$sensitive"
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
      case d: LDiversity =>
        frames += df.groupBy(d.cols.map(col): _*)
          .agg(count(lit(1)).as("_c"), countDistinct(col(d.sensitive)).as("_l"))
          .where(col("_l") < d.l)
          .agg(coalesce(sum(col("_c")), lit(0L)).as("violations"))
          .select(lit(d.name).as("check"), col("violations"))
      case _ => () // row-local, already counted
    }
    frames.result()
      .reduce(_ unionByName _)
      .select(col("check"), col("violations"), (col("violations") === 0L).as("pass"))
  }

  /** Per-group l-diversity profile — the audit table behind an
    * [[LDiversity]] release gate: for every quasi-identifier group, its
    * population, its distinct sensitive-value count, and whether it is
    * strictly LESS diverse than the best-diversified group (`weakest` —
    * a data-derived flag, so the interesting branch fires at any scale
    * where diversity varies; an absolute threshold is the [[LDiversity]]
    * check's job).
    *
    * Scale shape: one grouped count-distinct over the quasi-identifier
    * dim, a 1-row max broadcast — nothing past the group aggregate
    * scales with rows.
    */
  def lDiversityProfile(
      df: DataFrame, quasiCols: Seq[String], sensitiveCol: String): DataFrame = {
    require(quasiCols.nonEmpty && !quasiCols.contains(sensitiveCol),
      "need quasi-identifiers excluding the sensitive column")
    val groups = df
      .groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n"), countDistinct(col(sensitiveCol)).as("l_distinct"))
    val best = groups.agg(max(col("l_distinct")).as("_best"))
    groups
      .crossJoin(broadcast(best))
      .withColumn("weakest", col("l_distinct") < col("_best"))
      .drop("_best")
  }

  /** Benford first-digit conformance profile over an exact scaled-long
    * (cents) amount column — the classic fabricated-data screen for
    * financial columns. The leading significant digit is taken from the
    * DECIMAL STRING of the positive cents value (`v·100` is exact, so
    * its leading digit IS the value's leading significant digit) — never
    * via `log10`, whose last ulp is libm-dependent. The Benford masses
    * `log10(1+1/d)` enter as 17-digit LITERALS (literal parsing is
    * correctly rounded in both engines), so observed share, expected
    * share, and their difference are all bit-reproducible.
    *
    * Output: one row per digit 1–9 — `n_obs`, `n`, `obs_share`,
    * `benford_share`, `dev` (obs − expected, signed).
    *
    * Scale shape: one scan-local digit projection + a 9-row aggregate;
    * the digit table broadcast-joins the expectation literals.
    */
  def benfordProfile(df: DataFrame, centsCol: String): DataFrame = {
    val benford = Seq(
      1 -> 0.30102999566398120, 2 -> 0.17609125905568124, 3 -> 0.12493873660829993,
      4 -> 0.09691001300805642, 5 -> 0.07918124604762482, 6 -> 0.06694678963061322,
      7 -> 0.05799194697768673, 8 -> 0.05115252244738129, 9 -> 0.04575749056067514)
    val spark = df.sparkSession
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}
    val dim = spark.createDataFrame(
      java.util.Arrays.asList(benford.map(kv => Row(kv._1.toLong, kv._2)): _*),
      StructType(Seq(
        StructField("digit", LongType, nullable = false),
        StructField("benford_share", DoubleType, nullable = false))))
    val digits = df
      .where(col(centsCol) > 0L)
      .select(substring(col(centsCol).cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n_obs"))
    // no broadcast hint: the 9-row dim is the LEFT (preserved) side of the
    // outer join, which Spark cannot broadcast-build; the COUNTS side is
    // tiny (≤ 9 rows) and AQE broadcast-builds it unhinted.
    val wn = Window.partitionBy()
    dim
      .join(digits, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"), col("benford_share"))
      .withColumn("n", sum("n_obs").over(wn))
      .withColumn("obs_share", col("n_obs").cast("double") / col("n").cast("double"))
      .withColumn("dev", col("obs_share") - col("benford_share"))
      .select("digit", "n_obs", "n", "obs_share", "benford_share", "dev")
  }
}
