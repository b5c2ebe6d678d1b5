package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** ORC table round-trip (format parity): the third columnar wire format a
  * lake ingests besides Parquet and Arrow IPC. The reference delegates all
  * storage formats to whatever DuckDB/BigQuery can read (`duck.go:190`,
  * `bigquery.go:85-129`); Spark ships a vectorized, predicate-pushing ORC
  * reader natively, so this module is deliberately THIN — its value is the
  * layout contract (hive-partitioned directories → partition pruning) and
  * the gate/spec proving the round trip is lossless and the pushdown
  * actually reaches the ORC scan (`PushedFilters` — plan-pinned in
  * LineageSpec's ORC round-trip test; hash-gated by ns106).
  *
  * Scale shape: identical to the Parquet path — embarrassingly parallel
  * one-file-per-task writes, partition-directory pruning at plan time,
  * row-stripe/row-group statistics pruning inside each file, and the
  * vectorized columnar reader feeding whole-stage codegen. Nothing here
  * shuffles or collects.
  */
object OrcTables {

  /** Write `df` as ORC under `path`, hive-partitioned by `partitionCols`
    * (empty → unpartitioned). Partition columns become directory keys, so
    * an equality filter on one prunes whole directories at plan time —
    * the same layout contract as [[graft.ops.Layout]]'s Parquet writers.
    */
  def writeOrc(df: DataFrame, path: String, partitionCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("orc")
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .save(path)
  }

  /** Read an ORC table written by [[writeOrc]]. Filters composed on the
    * result push into the scan (`PushedFilters` in the plan) and, for
    * partition columns, prune directories before any task is planned.
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.format("orc").load(path)
}
