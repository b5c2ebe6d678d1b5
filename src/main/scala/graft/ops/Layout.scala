package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Storage-layout operators: the data-management side of a 100 TB corpus
  * (north-star extension; the reference delegates layout entirely to its
  * warehouse — duck.go stores whatever Arrow hands it).
  *
  * Three layout levers, each mapping to a Spark-native mechanism so every
  * downstream read benefits without custom readers:
  *   - **Partitioned writes** (`partitionBy`): a filter on the partition
  *     column prunes whole directories at planning time — the scan never
  *     opens non-matching files. This is the first-order win at scale:
  *     partition on the columns queries gate on (language, date, source).
  *   - **Range clustering** (`repartitionByRange` + `sortWithinPartitions`):
  *     within each file, parquet row-group min/max stats become selective,
  *     so point/range predicates on the cluster key skip row groups
  *     (data skipping) even where directory pruning can't apply.
  *   - **Compaction**: many small files → few target-sized files. Small
  *     files are a silent scale killer (footer-open cost per file,
  *     scheduler pressure: 10 M × 1 MB files is metadata DoS); compaction
  *     reads once and writes ceil(bytes / target) files, preserving the
  *     partition directory structure when asked.
  */
object Layout {

  /** Hive-style partitioned parquet write. Returns the written path. */
  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCols: Seq[String]): String = {
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
    path
  }

  /** Range-clustered write: rows range-partitioned then sorted on
    * `clusterCols`, so each output file covers a narrow, non-overlapping
    * key range and row-group min/max stats prune aggressively.
    */
  def writeClustered(
      df: DataFrame,
      path: String,
      clusterCols: Seq[String],
      numFiles: Int): String = {
    val cols = clusterCols.map(col)
    df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write
      .mode("overwrite")
      .parquet(path)
    path
  }

  /** Total bytes and file count of the parquet data files under `path`
    * (recursive; ignores _SUCCESS/metadata).
    */
  def dataFileStats(spark: SparkSession, path: String): (Long, Int) = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var bytes = 0L
    var n = 0
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) { bytes += f.getLen; n += 1 }
    }
    (bytes, n)
  }

  /** Compact the parquet dataset at `inPath` into ceil(bytes/target)
    * files at `outPath`. One distributed read, one round-robin
    * repartition (even file sizes), one write — no driver-side data
    * movement. Returns the output file count.
    */
  def compact(
      spark: SparkSession,
      inPath: String,
      outPath: String,
      targetFileBytes: Long): Int = {
    val (bytes, _) = dataFileStats(spark, inPath)
    val nOut = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    spark.read.parquet(inPath).repartition(nOut).write.mode("overwrite").parquet(outPath)
    dataFileStats(spark, outPath)._2
  }
}
