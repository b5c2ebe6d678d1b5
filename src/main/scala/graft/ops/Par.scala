package graft.ops

import org.apache.spark.sql.DataFrame

/** Parallelism guard for fan-out-heavy kernels.
  *
  * A small or single-split scan hands the whole downstream pipeline ONE
  * task (a one-row-group parquet file is unsplittable by byte range), so
  * an operator whose work fans out far beyond its input bytes — a CMS
  * depth-explode, a per-row image decode, B bootstrap replicates per row,
  * an all-pairs cosine probe — serializes on a single core no matter how
  * many the session has (measured: ns68's 1M-row sketch build spent 2.5 s
  * in one task at sf0.1 on 32 cores).
  *
  * [[spread]] repartitions to the session's shuffle parallelism ONLY when
  * the frame's physical layout has fewer partitions. The shuffle it adds
  * is bounded by the (small) input that caused the problem; a frame
  * already at least as wide keeps its layout — at production scale the
  * scan arrives wide and this is a plan-metadata check and nothing else.
  */
object Par {

  /** `df`, repartitioned to `spark.sql.shuffle.partitions` when its
    * current physical partitioning is narrower; unchanged otherwise.
    */
  def spread(df: DataFrame): DataFrame = {
    val n = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions < n) df.repartition(n) else df
  }
}
