package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — an operator the reference's SQL surface reaches
  * only through DuckDB's native ASOF JOIN; Spark has no built-in, so this
  * composes existing operators (SURVEY §2 custom-op preference (a)):
  *
  * union the two inputs tagged by side, sort within each key partition by
  * (time, side), and carry the latest right-side value forward with a
  * running `max` window — each left row then holds the greatest right
  * timestamp ≤ its own.
  *
  * Scale: ONE shuffle of |L|+|R| rows on the join key (the same lower bound
  * a sort-merge join pays), then a linear in-partition pass. No range
  * explosion, no nested-loop: this is the shape that survives 100 TB —
  * skewed keys split via AQE exactly as any sort-merge join would.
  */
object AsofJoin {

  /** Backward as-of join: for each left row, attach the latest `rightTs`
    * from the right side with the same key and `rightTs <= leftTs`.
    * Duplicate right rows need no pre-dedup: the running `max` is
    * duplicate-insensitive, so the union goes straight into the single
    * key-partitioned window (a pre-dedup would cost one extra shuffle of
    * the right side for nothing).
    *
    * Output: left columns + `asofTsName` (nullable timestamp of the match).
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      asofTsName: String = "asof_ts"): DataFrame = {
    val lCols = left.columns
    val l = left
      .withColumn("__t", col(leftTs))
      .withColumn("__rts", lit(null).cast("timestamp"))
      .withColumn("__side", lit(1))
    val r = right
      .select(col(key), col(rightTs).as("__t"))
      .withColumn("__rts", col("__t"))
      .withColumn("__side", lit(0))
    // Align schemas: right side carries nulls for non-key left columns.
    val rAligned = l.schema.fieldNames.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df else df.withColumn(c, lit(null).cast(l.schema(c).dataType))
    }.select(l.schema.fieldNames.toIndexedSeq.map(col): _*)
    val w = Window
      .partitionBy(col(key))
      .orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(rAligned)
      .withColumn(asofTsName, max(col("__rts")).over(w))
      .filter(col("__side") === 1)
      .select(lCols.toIndexedSeq.map(col) :+ col(asofTsName): _*)
  }
}
