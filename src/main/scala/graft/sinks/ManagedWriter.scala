package graft.sinks

import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Stream visibility mode (≈ storagepb stream types, bigquery_write.go:384-394):
  *   - Committed: each append is immediately visible.
  *   - Pending: appends are staged invisibly; `finalizeCommit()` makes them
  *     all visible (≈ FinalizeWriteStream + BatchCommitWriteStreams,
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
  * Each individual `write` inherits task-level exactly-once from Spark's
  * FileCommitProtocol (task attempts write to attempt paths, the job commit
  * publishes exactly one). Pending mode adds multi-append deferred
  * visibility on top; the promotion is *near-atomic* — a sequence of
  * same-directory renames, each atomic on HDFS-like filesystems, so a crash
  * mid-promotion can leave a prefix of the batches visible (the reference's
  * BatchCommitWriteStreams is strictly atomic; a fully atomic equivalent
  * would need a manifest file that readers consult).
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
    *
    * The input plan is executed exactly once: the batch lands in its own
    * directory and the returned row count is read back from the *written*
    * parquet footers (metadata-only — no column data is scanned and the
    * source is not re-executed, so a non-deterministic source cannot make
    * the count diverge from what was written).
    */
  def write(df: DataFrame): Long = {
    require(!finalized, "writer already finalized (bigquery_write.go:466 contract)")
    require(
      df.schema == expectedSchema,
      s"schema mismatch: got ${df.schema.simpleString}, want ${expectedSchema.simpleString}")
    val batchDir = s"$stagingDir/batch-$appended"
    df.write.mode("errorifexists").parquet(batchDir)
    appended += 1
    val n = spark.read.parquet(batchDir).count()
    if (streamType == StreamType.Committed) promote(new Path(batchDir))
    n
  }

  /** Move every data file of one staged batch into the destination.
    * A name collision at the destination aborts the commit with the
    * staged data still intact — checked explicitly BEFORE the rename
    * (Hadoop's LocalFileSystem rename onto an existing directory silently
    * moves the source *into* it and returns true, so the return value
    * alone is not a sufficient guard), and the return value is still
    * verified for filesystems that signal failure that way (HDFS). Staged
    * files are only ever deleted by the caller after *all* renames
    * succeeded.
    */
  private def promote(batchPath: Path): Unit = {
    val dest = new Path(destDir)
    if (!fs.exists(dest)) fs.mkdirs(dest)
    fs.listStatus(batchPath)
      .filter(f => f.getPath.getName.startsWith("part-"))
      .foreach { f =>
        val to = new Path(dest, f.getPath.getName)
        if (fs.exists(to)) {
          throw new java.io.IOException(
            s"commit failed: destination $to already exists; staged data left in place")
        }
        if (!fs.rename(f.getPath, to)) {
          throw new java.io.IOException(
            s"commit failed: rename ${f.getPath} -> $to returned false; " +
              "staged data left in place")
        }
      }
  }

  /** Make all pending appends visible; returns number of batches committed
    * (≈ Finalize's return, bigquery_write.go:466-485). Committed-mode
    * streams have nothing left to promote. The staging directory is deleted
    * only after every rename has succeeded.
    */
  def finalizeCommit(): Long = {
    require(!finalized, "already finalized")
    finalized = true
    val staging = new Path(stagingDir)
    if (streamType == StreamType.Pending && fs.exists(staging)) {
      fs.listStatus(staging)
        .filter(_.isDirectory)
        .sortBy(_.getPath.getName)
        .foreach(b => promote(b.getPath))
    }
    if (fs.exists(staging)) fs.delete(staging, true)
    appended
  }
}
