package graft.ops

import org.apache.spark.sql.DataFrame

/** Shared helper for the iterative operators (connected components,
  * PageRank, k-means, streaming signature accumulation): free the storage
  * blocks behind a `localCheckpoint`ed frame that no later plan
  * references. No-op on non-checkpointed plans. A FINAL round's frame must
  * never be unpersisted — the returned DataFrame reads from that RDD and a
  * truncated lineage cannot recompute it.
  */
private[graft] object Checkpoints {
  def unpersist(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false); ()
      case _ => ()
    }
}
