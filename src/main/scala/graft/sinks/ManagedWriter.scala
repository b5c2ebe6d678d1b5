package graft.sinks

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Stream visibility mode (≈ storagepb stream types, bigquery_write.go:384-394):
  *   - Committed: each append is immediately visible.
  *   - Pending: appends are staged invisibly; `finalizeCommit()` makes them
  *     all visible atomically (≈ FinalizeWriteStream + BatchCommitWriteStreams,
  *     bigquery_write.go:466-485).
  */
sealed trait StreamType
object StreamType {
  case object Committed extends StreamType
  case object Pending extends StreamType
}

/** Managed batch writer to a Parquet destination directory.
  *
  * ≈ `BigQueryManagedRecordWriter` (bigquery_write.go:327-485), re-expressed
  * over Spark's file-commit protocol:
  *
  *   - construction fixes the expected schema (≈ descriptor creation,
  *     bigquery_write.go:372-382);
  *   - `write(df)` schema-guards (≈ `Schema.Equal` check,
  *     bigquery_write.go:422-424) and appends — to the visible destination in
  *     Committed mode, to an invisible staging area in Pending mode
  *     (≈ AppendRows into a pending stream);
  *   - `finalizeCommit()` promotes staged files with filesystem renames and
  *     refuses further writes (≈ Finalize → BatchCommitWriteStreams).
  *
  * Each individual `write` already inherits task-level exactly-once from
  * Spark's FileCommitProtocol (task attempts write to attempt paths, the job
  * commit publishes exactly one); Pending mode adds the reference's
  * *multi-append atomic visibility* on top.
  */
final class ManagedWriter(
    spark: SparkSession,
    destDir: String,
    expectedSchema: StructType,
    streamType: StreamType = StreamType.Pending) {

  private val stagingDir = s"$destDir-staging-${UUID.randomUUID().toString.take(8)}"
  private var finalized = false
  private var appended = 0L

  private def fs = new Path(destDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Append one batch. Returns rows in the batch (offset-advance analogue,
    * bigquery_write.go:460).
    */
  def write(df: DataFrame): Long = {
    require(!finalized, "writer already finalized (bigquery_write.go:466 contract)")
    require(
      df.schema == expectedSchema,
      s"schema mismatch: got ${df.schema.simpleString}, want ${expectedSchema.simpleString}")
    val target = streamType match {
      case StreamType.Committed => destDir
      case StreamType.Pending   => s"$stagingDir/batch-$appended"
    }
    val n = df.count()
    df.write.mode("append").parquet(target)
    appended += 1
    n
  }

  /** Make all pending appends visible atomically; returns number of batches
    * committed (≈ Finalize's row-count return, bigquery_write.go:466-485).
    * Committed-mode streams have nothing to promote.
    */
  def finalizeCommit(): Long = {
    require(!finalized, "already finalized")
    finalized = true
    streamType match {
      case StreamType.Committed => appended
      case StreamType.Pending =>
        val dest = new Path(destDir)
        if (!fs.exists(dest)) fs.mkdirs(dest)
        val staging = new Path(stagingDir)
        if (fs.exists(staging)) {
          val batches = fs.listStatus(staging).filter(_.isDirectory)
          batches.foreach { b =>
            fs.listStatus(b.getPath)
              .filter(f => f.getPath.getName.startsWith("part-"))
              .foreach { f =>
                fs.rename(f.getPath, new Path(dest, f.getPath.getName))
              }
          }
          fs.delete(staging, true)
        }
        appended
    }
  }
}
