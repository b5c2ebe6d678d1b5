package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
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
  * Scale shape: stage k costs one min-aggregation of the STAGE-k-FILTERED
  * events (partial before the shuffle — and a funnel stage's events are a
  * small slice of the log) joined co-partitioned on user_id with the
  * previous stage's per-user table. Each stage frame is checkpointed via
  * [[Checkpoints.truncate]] once it is defined, so later stages and the
  * final count union read the materialized O(users) frame instead of
  * recomputing the whole prefix chain — without this the union of K stage
  * counts re-scans the event table O(K^2) times
  * (`spark.graft.checkpoint.mode=reliable` makes the stage frames
  * executor-loss-safe on a real cluster). No per-user event list is ever collected
  * (unlike a sort+fold sessionization approach, this holds even for a
  * user with 10^9 events). Timestamps compare as exact `unix_micros`
  * longs.
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
    val frames = stageFrames(events, userCol, tsCol, typeCol, stages)
    frames.zipWithIndex
      .map { case (cur, k) =>
        cur.agg(count(lit(1)).as("users")).select(
          lit((k + 1).toLong).as("stage"),
          lit(stages(k)).as("event_type"),
          col("users"))
      }
      .reduce(_ unionByName _)
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
    val frames = stageFrames(events, userCol, tsCol, typeCol, stages)
    frames.zipWithIndex
      .map { case (cur, k) =>
        cur.select(
          col("user_id"),
          lit((k + 1).toLong).as("stage"),
          lit(stages(k)).as("event_type"),
          col("tk").as("t_micros"))
      }
      .reduce(_ unionByName _)
  }

  /** One `(user_id, tk)` frame per stage, each materialized exactly once. */
  private def stageFrames(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxGapMicros: Option[Long] = None): Seq[DataFrame] = {
    require(stages.nonEmpty, "empty funnel")
    val e = events
      .where(col(typeCol).isInCollection(stages))
      .select(
        col(userCol).cast("long").as("user_id"),
        col(typeCol).as("ty"),
        unix_micros(col(tsCol)).as("t"))
    var cur = Checkpoints.truncate(
      e.where(col("ty") === stages.head)
        .groupBy("user_id")
        .agg(min(col("t")).as("tk")))
    val frames = Seq.newBuilder[DataFrame]
    frames += cur
    for (k <- 1 until stages.length) {
      val inWindow = maxGapMicros match {
        case Some(gap) => col("t") > col("prev") && col("t") <= col("prev") + gap
        case None => col("t") > col("prev")
      }
      // toDF, not select: the checkpointed LogicalRDD preserves the
      // exprIds it inherited from `e`, and the join's left side mints
      // the same user_id exprId via its projection alias. The analyzer
      // only re-instances DUPLICATED LEAVES when deduplicating join
      // references, so that collision is unresolvable ("Conflicting
      // attributes: user_id", an AQE-off INTERNAL_ERROR — AQE-on
      // analysis happened to tolerate it). toDF re-aliases every column
      // with fresh exprIds, making the join self-contained.
      cur = Checkpoints.truncate(
        e.where(col("ty") === stages(k))
          .join(
            cur.select(col("user_id"), col("tk")).toDF("user_id", "prev"),
            "user_id")
          .where(inWindow)
          .groupBy("user_id")
          .agg(min(col("t")).as("tk")))
      frames += cur
    }
    frames.result()
  }

  /** [[reach]] with a conversion window: stage k only counts when it
    * happens within `maxGapSec` seconds of the user's stage-k−1 time —
    * the "converted within 24h of signup" funnel every growth report
    * actually ships (an unbounded funnel credits a purchase three years
    * later). Exact integer micros; same per-stage scale shape as
    * [[reach]].
    *
    * Windowing changes reachability non-monotonically ON PURPOSE: a
    * user whose first in-window stage-k event exists may still lose
    * stage k+1 because the clock now starts at that EARLIER event. That
    * is the standard windowed-funnel semantics (each stage's clock runs
    * from the previous stage's first qualifying event).
    */
  def reachWithin(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxGapSec: Long): DataFrame = {
    require(maxGapSec > 0, "conversion window must be positive")
    val frames = stageFrames(
      events, userCol, tsCol, typeCol, stages, Some(maxGapSec * 1000000L))
    frames.zipWithIndex
      .map { case (cur, k) =>
        cur.agg(count(lit(1)).as("users")).select(
          lit((k + 1).toLong).as("stage"),
          lit(stages(k)).as("event_type"),
          col("users"))
      }
      .reduce(_ unionByName _)
  }

  /** First-order event-transition matrix (the Markov-chain view of user
    * behavior next to the funnel and the retention matrix): per ordered
    * (from_type → to_type) pair, how many times a user's event of
    * `from_type` was immediately followed by one of `to_type`, plus the
    * row-conditional probability. Transition order is the exact
    * (unix_micros, id) tuple — the same deterministic tiebreak as
    * [[graft.ops.TimeSeries.ewma]] — and the probability is ONE IEEE
    * division of exact longs, so the matrix replays bit-identically.
    *
    * Scale shape: one window pass partitioned by user (bounded by the
    * per-user event count, the usual sessionize bound), then a
    * map-side-combined count into ≤ |event types|² rows; the row-total
    * join is over that same tiny matrix.
    *
    * Output: `(from_type, to_type, n, p)`.
    */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String): DataFrame = {
    val counts = events
      .select(
        col(userCol), col(typeCol).as("from_type"),
        unix_micros(col(tsCol)).as("_t"), col(idCol).as("_i"))
      .withColumn("to_type", lead(col("from_type"), 1).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col(userCol)).orderBy(col("_t"), col("_i"))))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy("from_type").agg(sum(col("n")).as("_tot"))
    counts.join(totals, Seq("from_type"))
      .select(
        col("from_type"), col("to_type"), col("n"),
        (col("n").cast("double") / col("_tot").cast("double")).as("p"))
  }

  /** Weekly cohort retention matrix — the other table every growth
    * dashboard keeps next to the funnel: users cohorted by the epoch week
    * of their FIRST event, then for each (cohort_week, week_offset) the
    * count of cohort members active in that later week. All arithmetic is
    * exact integer epoch math (`unix_micros div 86400000000 div 7` — the
    * same floor division in both engines for the always-positive fixture
    * epochs), so the matrix is bit-reproducible.
    *
    * Scale shape: the (user, week) activity table deduplicates with
    * map-side combine BEFORE anything joins (one row per user-week, never
    * per event); the first-week aggregate and the activity join both
    * co-partition on the user key (one exchange, reused); the final
    * matrix aggregate map-side combines into ≤ cohorts×offsets rows.
    * Counting rows of the deduplicated join (not COUNT DISTINCT) keeps
    * the final aggregate a cheap partial-sum.
    *
    * Output: `(cohort_week, week_offset, n_active)` — `week_offset` 0 is
    * the cohort's own week, so every cohort's offset-0 row is its size.
    */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String): DataFrame = {
    val uw = events
      .select(
        col(userCol).cast("long").as("u"),
        expr(s"unix_micros($tsCol) div 86400000000 div 7").as("w"))
      .distinct()
    val first = uw.groupBy("u").agg(min(col("w")).as("cw"))
    uw.join(first, "u")
      .groupBy(
        col("cw").as("cohort_week"),
        (col("w") - col("cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
  }

  /** Last-touch revenue attribution: each conversion credits the LATEST
    * touch event of the same user at-or-before it and within `windowSec`
    * (the marketing-analytics report next to the funnel — "which channel
    * gets the sale"); conversions with no in-window touch credit the
    * `direct` bucket.
    *
    * Composition, not new machinery: the touch lookup IS
    * [[AsofJoin.backward]] with tolerance (one key-partitioned window
    * pass), and the credited CHANNEL comes from joining the matched
    * (user, ts) back to the touch table — at an identical (user, ts) the
    * tie breaks to the smallest (channel, id) tuple, deterministically.
    *
    * Output: (channel, n_conversions, revenue_cents) — exact longs.
    *
    * Scale shape: the as-of union shuffles once on the user key; the
    * match-back join shuffles only CONVERSION rows (|conversions| ≪
    * |touches|) against the touch table on (user, ts) — AQE broadcasts
    * the conversion side when small; the final aggregate map-side
    * combines into ≤ |channels|+1 rows.
    */
  def lastTouchAttribution(
      touches: DataFrame,      // (userCol, tsCol, channelCol, idCol)
      conversions: DataFrame,  // (userCol, tsCol, idCol, revenueCentsCol)
      userCol: String,
      tsCol: String,
      idCol: String,
      channelCol: String,
      revenueCentsCol: String,
      windowSec: Long): DataFrame = {
    val matched = AsofJoin.backward(
      conversions.select(col(userCol), col(tsCol), col(idCol), col(revenueCentsCol)),
      touches.select(col(userCol), col(tsCol)),
      key = userCol, leftTs = tsCol, rightTs = tsCol,
      asofTsName = "__touch_ts", toleranceSec = Some(windowSec))
    // Recover the touch's channel; dedup identical-(user, ts) touches to
    // the smallest (channel, id) BEFORE the join so each conversion stays
    // one row.
    val touchDim = touches
      .groupBy(col(userCol).as("__tu"), col(tsCol).as("__tt"))
      .agg(min(struct(col(channelCol), col(idCol))).as("__pick"))
      .select(col("__tu"), col("__tt"), col("__pick")(channelCol).as("__channel"))
    matched
      .join(
        touchDim,
        matched(userCol) === touchDim("__tu") && matched("__touch_ts") === touchDim("__tt"),
        "left")
      .select(coalesce(col("__channel"), lit("direct")).as("channel"), col(revenueCentsCol))
      .groupBy("channel")
      .agg(
        count(lit(1)).as("n_conversions"),
        sum(col(revenueCentsCol)).as("revenue_cents"))
  }

  /** Multi-touch LINEAR attribution: every touch in the conversion's
    * lookback window shares the credit — the fairness-motivated
    * complement of [[lastTouchAttribution]] (last-touch over-credits the
    * bottom of the funnel; linear pays the whole journey).
    *
    * Exact-integer credit split: a conversion with n eligible touches
    * gives each touch `10000 div n` basis points and tops the EARLIEST
    * touch (ties to smallest id) up by the remainder `10000 mod n`, so
    * credits are exact longs that sum to exactly 10000 per converted
    * conversion — no fractional drift, fully deterministic. Revenue
    * credit accumulates as Σ rev_cents·bps (exact long, cent-basis-point
    * units); the reported `credit_c` divides by 10000 ONCE per channel.
    * Conversions with no eligible touch credit the synthetic 'direct'
    * channel with their full 10000 bps.
    *
    * Scale shape: the eligible-touch join is a per-user equi-join with
    * the time-window residual (per-user fan-out = touches within the
    * window — the as-of class bound); the per-conversion count and the
    * remainder pick ride the SAME (user, conversion) aggregation; channel
    * totals map-side combine. One user-keyed exchange dominates.
    */
  def linearAttribution(
      touches: DataFrame,      // (userCol, tsCol, channelCol, idCol)
      conversions: DataFrame,  // (userCol, tsCol, idCol, revenueCentsCol)
      userCol: String,
      tsCol: String,
      idCol: String,
      channelCol: String,
      revenueCentsCol: String,
      windowSec: Long): DataFrame = {
    val conv = conversions.select(
      col(userCol).as("_u"), unix_micros(col(tsCol)).as("_ct"),
      col(idCol).cast("long").as("_cid"),
      col(revenueCentsCol).cast("long").as("_rev"))
    val tch = touches.select(
      col(userCol).as("_u"), unix_micros(col(tsCol)).as("_tt"),
      col(idCol).cast("long").as("_tid"), col(channelCol).as("_ch"))
    val eligible = conv.join(tch, Seq("_u"))
      .where(col("_tt") <= col("_ct") &&
        col("_tt") >= col("_ct") - lit(windowSec * 1000000L))
    // Both window functions share ONE spec (same partition AND order key,
    // the count on an explicit unbounded frame), so Catalyst plans a
    // single WindowExec over a single sort — the unordered-spec spelling
    // planned a second full-data Window+Sort pass for the count alone.
    val wFirst = Window.partitionBy("_cid").orderBy(col("_tt"), col("_tid"))
    val wConv = wFirst.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val credited = eligible
      .withColumn("_n", count(lit(1)).over(wConv))
      .withColumn("_rk", row_number().over(wFirst))
      .withColumn("bps",
        expr("10000 div _n") + when(col("_rk") === 1, expr("10000 % _n")).otherwise(0L))
    val direct = conv.join(
        eligible.select(col("_cid").as("_ecid")).distinct(),
        col("_cid") === col("_ecid"), "left_anti")
      .select(lit("direct").as("_ch"), col("_cid"), col("_rev"), lit(10000L).as("bps"))
    credited.select(col("_ch"), col("_cid"), col("_rev"), col("bps"))
      .unionByName(direct)
      .groupBy(col("_ch").as("channel"))
      .agg(
        count_distinct(col("_cid")).as("n_conversions"),
        sum(col("bps")).as("credit_bps"),
        sum(col("_rev") * col("bps")).as("credit_cbps"),
        (sum(col("_rev") * col("bps")).cast("double") / 10000.0d).as("credit_c"))
  }

  /** Top user journeys: each entity's first `maxSteps` event types in
    * (ts, id) order rendered as one `a>b>c` path string, counted across
    * entities — the "what do users actually do first" report product
    * analytics ships as its flows view.
    *
    * Determinism: the per-entity sequence sorts on (ts, id) with id
    * unique, so every entity renders exactly one path; prefix truncation
    * (not sampling) keeps the path alphabet bounded — distinct paths ≤
    * |types|^maxSteps in theory, but heavy-tailed in practice, which is
    * what `minCount` prunes.
    *
    * Scale shape: one hash exchange on the entity key (map-side
    * collect_list partials; per-entity state is the entity's own events —
    * the sessionize bound); the path count is a map-side-combined string
    * groupBy. Cap an entity's event list upstream when the domain allows
    * unbounded histories — only the first maxSteps matter, so a
    * pre-window keep-earliest filter preserves the answer.
    */
  def topPaths(
      df: DataFrame,
      entityCol: String,
      tsCol: String,
      idCol: String,
      typeCol: String,
      maxSteps: Int,
      minCount: Long): DataFrame = {
    require(maxSteps >= 1, "maxSteps must be >= 1")
    val seq = sort_array(collect_list(struct(
      unix_micros(col(tsCol)).as("t"),
      col(idCol).cast("long").as("i"),
      col(typeCol).as("et"))))
    df.groupBy(col(entityCol))
      .agg(seq.as("_s"))
      .select(concat_ws(">",
        slice(transform(col("_s"), _.getField("et")), 1, maxSteps)).as("path"))
      .groupBy("path")
      .agg(count(lit(1)).as("n_entities"))
      .where(col("n_entities") >= minCount)
  }

  /** Cohort LTV curve: cumulative revenue per cohort member by account
    * age — the [[retentionCohorts]] table's revenue sibling ("what is a
    * week-N customer worth so far?"). Cohort = the user's first event
    * week; revenue lands in the (cohort, age) cell of the event's week;
    * the cumulative sum runs over exact cents longs ordered by age (an
    * exact prefix sum, order-free), and ltv = cum / cohort_size is ONE
    * IEEE division per row.
    *
    * Scale shape: one distinct-week pass + one (cohort, age) aggregation
    * (map-side combined, ≤ cohorts·ages rows); the cumulative window
    * runs over that bounded grid, never the event volume.
    */
  def ltvCurve(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      valCol: String): DataFrame = {
    val ev = events.select(
      col(userCol).cast("long").as("u"),
      expr(s"unix_micros($tsCol) div 86400000000 div 7").as("w"),
      col(valCol).cast("long").as("v"))
    val first = ev.groupBy("u").agg(min(col("w")).as("cw"))
    val sizes = first.groupBy("cw").agg(count(lit(1)).as("cohort_size"))
    val cells = ev.join(first, "u")
      .groupBy(col("cw").as("cohort_week"), (col("w") - col("cw")).as("age_weeks"))
      .agg(sum("v").as("revenue_c"))
    val cum = org.apache.spark.sql.expressions.Window
      .partitionBy("cohort_week").orderBy("age_weeks")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    cells
      .join(sizes.select(col("cw").as("cohort_week"), col("cohort_size")), Seq("cohort_week"))
      .withColumn("cum_revenue_c", sum("revenue_c").over(cum))
      .withColumn(
        "ltv_c",
        col("cum_revenue_c").cast("double") / col("cohort_size").cast("double"))
  }
}
