package graft.pipeline

import graft.engine.Engine
import graft.sources.{ScanOptions, TableSource}

/** The flagship pipeline: source → engine table, one pass.
  *
  * ≈ `BigQuack.BQ2Duck` (bigquack.go:64-141). The reference's driver-side
  * batch loop (Read → IngestCreateAppend until EOF, bigquack.go:99-133)
  * collapses into a single distributed `scan → write` job with no shuffle and
  * no driver materialization: the Spark driver plans input partitions
  * (≈ CreateReadSession) and executors pull partition data (≈ ReadRows),
  * pipelining scan into write inside each task.
  *
  * Returns total rows ingested (≈ the reference's totalIngestedRows,
  * bigquack.go:128-140).
  */
object Ingest {
  def run(
      engine: Engine,
      source: TableSource,
      sourceTable: String,
      destTable: String,
      opts: ScanOptions = ScanOptions.default): Long = {
    val df = source.read(engine.spark, sourceTable, opts)
    engine.ingestCreateAppend(df, destTable)
  }
}
