package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table profiling: per-column row/null/distinct counts and min/max in a
  * single pass — the "what did I just ingest?" primitive of a data-movement
  * engine (north-star extension; the reference moves tables between
  * warehouses but offers no inspection surface beyond the row count it
  * logs, bigquack.go:98).
  *
  * Scale design: ONE scan; all per-column aggregates run in the same
  * aggregation. Exact distinct counts use Spark's multi-count-distinct
  * planning (an Expand that replays each row once per profiled column —
  * cost rows × columns, the same work per-column passes would do, minus
  * the extra scans). For wide tables or when a ±2% answer is fine, pass
  * `approxDistinct = true`: HLL sketches replace the Expand and the pass
  * degenerates to a plain single aggregation. min/max render through
  * `CAST(... AS STRING)` so one schema fits every column type; numeric
  * formatting is engine-exact for integers and strings (the oracle-gated
  * types) — profile floats with the approx path or dedicated queries.
  */
object Profile {

  /** One row per profiled column:
    * (col_name, n_rows, n_nulls, n_distinct, min_val, max_val).
    */
  def summarize(
      df: DataFrame,
      cols: Seq[String],
      approxDistinct: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "no columns to profile")
    val aggs = cols.flatMap { c =>
      val nd =
        if (approxDistinct) approx_count_distinct(col(c))
        else count_distinct(col(c))
      Seq(
        count(col(c)).as(s"_cnt_$c"),
        nd.as(s"_nd_$c"),
        min(col(c)).cast("string").as(s"_min_$c"),
        max(col(c)).cast("string").as(s"_max_$c"))
    }
    val onerow = df.agg(count(lit(1)).as("_rows"), aggs: _*)
    onerow
      .select(explode(array(cols.map(c =>
        struct(
          lit(c).as("col_name"),
          col("_rows").as("n_rows"),
          (col("_rows") - col(s"_cnt_$c")).as("n_nulls"),
          col(s"_nd_$c").as("n_distinct"),
          col(s"_min_$c").as("min_val"),
          col(s"_max_$c").as("max_val"))): _*)).as("p"))
      .select("p.*")
  }
}
