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

  /** Exact equi-width histogram over a money-style double column (values
    * that are exact multiples of 0.01), in INTEGER arithmetic end to end:
    * the value is scaled to cents (`round(x*100)` — exact on these inputs),
    * the bucket is a long integer division, and counts are exact — so the
    * histogram is bit-reproducible across engines and cluster sizes, unlike
    * float `width_bucket` whose boundary arithmetic can differ in the last
    * ulp exactly at bucket edges.
    *
    * Output: (bucket, lo, hi, n) — bucket = cents div widthCents, lo/hi
    * rendered back to doubles (exact: cent multiples < 2^53). Intended
    * for NON-NEGATIVE money columns: `div` truncates toward zero
    * (identically in Spark and DuckDB), so for negative values bucket 0
    * would span (-width, width) and the lo/hi labels would be shifted —
    * shift such columns into the non-negative domain first.
    *
    * Scale shape: scan-local bucket assignment + one map-side-combined
    * count aggregation — the same cost as any groupBy count; no sort, no
    * window, no driver-side min/max pre-pass (the bucket domain derives
    * from the data).
    */
  def centsHistogram(df: DataFrame, valueCol: String, widthCents: Long): DataFrame = {
    require(widthCents > 0, "non-positive bucket width")
    df.select(expr(s"CAST(ROUND($valueCol * 100) AS BIGINT) div $widthCents").as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"))
      .select(
        col("bucket"),
        (col("bucket") * widthCents).cast("double") / 100.0,
        ((col("bucket") + 1) * widthCents).cast("double") / 100.0,
        col("n"))
      .toDF("bucket", "lo", "hi", "n")
  }
}
