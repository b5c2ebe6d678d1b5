package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed prefix (running) aggregation over a GLOBAL sort order.
  *
  * A `Window.orderBy(t)` with no partition key is a single-task sort in
  * Spark — the whole input lands on one executor thread, which is exactly
  * the shape that dies first at 100 TB. The classic fix is the two-phase
  * scan: range-partition on the order key, run the window inside each
  * partition, and carry cross-partition state through a tiny per-partition
  * summary (one row per range partition) whose own prefix scan is
  * negligible (bounded by the partition count, not the data).
  *
  * Equal order-key values always co-locate (RangePartitioner maps equal
  * keys to the same partition), so "strictly earlier partition" ⇒
  * "strictly smaller key" and the per-partition offset is exact. Results
  * are partition-count-invariant: the offsets compensate wherever the
  * range cuts fall.
  *
  * Used by [[TimeSeries.peakConcurrency]] (running sum of +1/−1 session
  * boundaries) and [[Skyline.skyline2D]] (running min over strictly
  * smaller x).
  */
object Prefix {

  private val PidCol = "__graft_pid"

  /** `df` extended with `outCol` = running SUM of `valueCol` in ascending
    * `orderCol` order, where every row with the SAME `orderCol` value gets
    * the SAME running total (the "after processing all rows at t" value —
    * peers are included, matching a RANGE-frame running sum). `orderCol`
    * must be an integral column; `valueCol` a long.
    */
  def runningSum(df: DataFrame, orderCol: String, valueCol: String, outCol: String): DataFrame = {
    val ranged = df.repartitionByRange(col(orderCol)).withColumn(PidCol, spark_partition_id())
    val w = Window.partitionBy(PidCol).orderBy(col(orderCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val local = ranged.withColumn(outCol, sum(col(valueCol)).over(w))
    // One row per range partition; the exclusive prefix over it is a
    // window over ≤ #partitions rows — bounded by cluster layout, not data.
    val offsets = ranged.groupBy(col(PidCol)).agg(sum(col(valueCol)).as("__part_sum"))
      .withColumn(
        "__offset",
        coalesce(
          sum(col("__part_sum")).over(
            Window.orderBy(PidCol).rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select(col(PidCol), col("__offset"))
    local
      .join(broadcast(offsets), PidCol)
      .withColumn(outCol, col(outCol) + col("__offset"))
      .drop(PidCol, "__offset")
  }

  /** `df` extended with `beforeOut` = running MIN of `valueCol` over all
    * rows with STRICTLY smaller `orderCol` (null when no such row exists)
    * and `peersOut` = MIN of `valueCol` over the rows with EQUAL
    * `orderCol`. Both ride one range-partitioned sort (the peers frame is
    * RANGE 0..0 of the same window sort). `orderCol` must be an integral
    * column so the strict RANGE frame applies; equal order values always
    * co-locate in one range partition, so the strictly-before offset from
    * earlier partitions is exact.
    */
  def runningMinBeforeWithPeers(
      df: DataFrame, orderCol: String, valueCol: String,
      beforeOut: String, peersOut: String): DataFrame = {
    val ranged = df.repartitionByRange(col(orderCol)).withColumn(PidCol, spark_partition_id())
    val w = Window.partitionBy(PidCol).orderBy(col(orderCol))
    val local = ranged
      .withColumn(
        beforeOut,
        min(col(valueCol)).over(w.rangeBetween(Window.unboundedPreceding, -1)))
      .withColumn(peersOut, min(col(valueCol)).over(w.rangeBetween(0, 0)))
    val offsets = ranged.groupBy(col(PidCol)).agg(min(col(valueCol)).as("__part_min"))
      .withColumn(
        "__offset",
        min(col("__part_min")).over(
          Window.orderBy(PidCol).rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(PidCol), col("__offset"))
    // least() skips nulls: null local + non-null offset (first row of a
    // later partition) resolves to the offset, and vice versa.
    local
      .join(broadcast(offsets), PidCol)
      .withColumn(beforeOut, least(col(beforeOut), col("__offset")))
      .drop(PidCol, "__offset")
  }
}
