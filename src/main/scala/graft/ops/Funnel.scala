package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ordered-funnel analysis (north-star extension): how many users completed
  * stage k of an event funnel, where stage k must occur STRICTLY after the
  * user's first qualifying stage k-1 event.
  *
  * Semantics (matching the SQL a product analyst would write): per user,
  * `t_1 = min ts of stage-1 events`; `t_k = min ts of stage-k events with
  * ts > t_{k-1}`. A user "reaches" stage k iff `t_k` exists. Ties are
  * excluded by the strict inequality — an event at exactly `t_{k-1}` does
  * not advance the funnel — so the result is reproducible regardless of
  * event arrival order.
  *
  * Scale shape: every stage is a `groupBy(user)` min-aggregation (partial
  * before the shuffle) chained by a co-partitioned join on the SAME key, so
  * Catalyst reuses one hash-partitioning of the event stream end to end —
  * no per-user event list is ever collected (unlike a sort+fold
  * sessionization approach, this holds even for a user with 10^9 events).
  * Timestamps compare as exact `unix_micros` longs.
  */
object Funnel {

  /** Per-stage reach counts: rows `(stage, event_type, users)` with `stage`
    * 1-based in funnel order.
    */
  def reach(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "empty funnel")
    val spark = events.sparkSession
    val e = events
      .where(col(typeCol).isInCollection(stages))
      .select(
        col(userCol).cast("long").as("user_id"),
        col(typeCol).as("ty"),
        unix_micros(col(tsCol)).as("t"))
    // Stage 1: first qualifying event per user.
    var cur = e
      .where(col("ty") === stages.head)
      .groupBy("user_id")
      .agg(min(col("t")).as("tk"))
    var out = stageRow(spark, 1, stages.head, cur)
    // Stage k: first stage-k event strictly after t_{k-1}; the join and the
    // aggregation hash-partition on user_id, so the exchange is reused.
    for (k <- 1 until stages.length) {
      cur = e
        .where(col("ty") === stages(k))
        .join(cur.select(col("user_id"), col("tk").as("prev")), "user_id")
        .where(col("t") > col("prev"))
        .groupBy("user_id")
        .agg(min(col("t")).as("tk"))
      out = out.unionByName(stageRow(spark, k + 1, stages(k), cur))
    }
    out
  }

  /** Per-user stage timestamps (micros) for the given funnel — one row per
    * user per reached stage: `(user_id, stage, event_type, t_micros)`.
    */
  def userStages(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String]): DataFrame = {
    require(stages.nonEmpty, "empty funnel")
    val e = events
      .where(col(typeCol).isInCollection(stages))
      .select(
        col(userCol).cast("long").as("user_id"),
        col(typeCol).as("ty"),
        unix_micros(col(tsCol)).as("t"))
    var cur = e
      .where(col("ty") === stages.head)
      .groupBy("user_id")
      .agg(min(col("t")).as("tk"))
    var out = cur.select(
      col("user_id"),
      lit(1L).as("stage"),
      lit(stages.head).as("event_type"),
      col("tk").as("t_micros"))
    for (k <- 1 until stages.length) {
      cur = e
        .where(col("ty") === stages(k))
        .join(cur.select(col("user_id"), col("tk").as("prev")), "user_id")
        .where(col("t") > col("prev"))
        .groupBy("user_id")
        .agg(min(col("t")).as("tk"))
      out = out.unionByName(
        cur.select(
          col("user_id"),
          lit((k + 1).toLong).as("stage"),
          lit(stages(k)).as("event_type"),
          col("tk").as("t_micros")))
    }
    out
  }

  private def stageRow(
      spark: SparkSession,
      stage: Int,
      ty: String,
      reached: DataFrame): DataFrame =
    reached.agg(count(lit(1)).as("users")).select(
      lit(stage.toLong).as("stage"),
      lit(ty).as("event_type"),
      col("users"))

  /** Strict-after comparison helper exposed for tests. */
  private[ops] def strictlyAfter(t: Column, prev: Column): Column = t > prev
}
