package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-user running aggregate emitted by [[Streams.userActivity]] — the
  * custom-state escape hatch for semantics windowed aggs can't express
  * (running event counter + last-seen timestamp + distinct event-type
  * tally per user, updated incrementally per micro-batch).
  */
final case class UserActivity(
    user_id: Long,
    n_events: Long,
    n_types: Int,
    last_seen: java.sql.Timestamp)

/** Internal `mapGroupsWithState` state record (top-level for encoder
  * codegen; `types` kept as a distinct Seq).
  */
final case class ActivityState(n: Long, types: Seq[String], lastMicros: Long)

/** Structured-Streaming surface (extension territory: the reference has no
  * streaming — its "streams" are static scan partitions, bigquery.go:138;
  * SURVEY §2.B marks streaming as Spark-native extension).
  *
  * The aggregation logic is written once as DataFrame transforms that bind
  * to BOTH a batch frame and a `readStream` frame — the Structured
  * Streaming contract. Batch runs feed the DuckDB-oracle gate; the
  * streaming path (file source → watermark → windowed state → sink) is
  * exercised in ScalaTest.
  */
object Streams {

  /** Tumbling-window counts + exact value sums per event type.
    * On a stream, pair with [[withEventTimeWatermark]] so state for closed
    * windows is dropped — bounded state at any scale.
    */
  def tumblingCounts(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(
        count(lit(1)).as("n"),
        // Scaled-long exact sum (codegen'd long add; see SparkEntry's
        // oracle-parity rules — the decimal sum path was a 10-20× CPU hit).
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0)
          .as("sum_value"))
      .select(
        col("window.start").as("ws"),
        col("event_type"),
        col("n"),
        col("sum_value"))

  /** Sliding-window event rate per type (each event lands in
    * width/slide overlapping windows).
    */
  def slidingCounts(events: DataFrame, width: String = "1 hour", slide: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

  /** Native session windows (Spark's `session_window` state operator —
    * events merge while consecutive gaps stay under `gap`). The batch form
    * of the same streaming stateful aggregation.
    * Output: (user_id, session_start, n_events).
    */
  /** Native exact-gap session windows. Perf note (round-4 "2.7×
    * regression"): session_window's first execution in a JVM pays ~0.8 s
    * of one-time codegen/exec warmup on top of ~1.2 s steady-state at
    * sf0.1 (measured 2.21 s cold vs 1.17–1.26 s with any events query
    * first). Round 4's unordered bench map ran ns18 cold; sorted bench
    * order restores the warm measurement. The plan itself is the right
    * shape: ONE user_id shuffle, sort within partitions, linear session
    * merge — warm, it beats the lag→flag→sum composition (ns16, ~1.5 s).
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"))
      .select(
        col("user_id"),
        col("session_window.start").as("session_start"),
        col("n_events"))

  /** Watermarked variant for unbounded sources. */
  def withWatermark(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay)

  /** Batch sessionization: a session breaks after `gapMinutes` of user
    * inactivity. Classic lag→flag→running-sum; ONE shuffle on user_id (the
    * window partition), linear within partitions — the batch twin of
    * `session_window`/`flatMapGroupsWithState` state logic.
    * Output: (user_id, session_id, n_events, session_start).
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    withSessionIds(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("session_start"))

  /** [[sessionize]] with the session's full span: (user_id, session_id,
    * session_start = first event, session_end = last event). The interval
    * input to [[graft.ops.TimeSeries.peakConcurrency]] — same single
    * user-partitioned window + (user, session) aggregation.
    */
  def sessionSpans(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    withSessionIds(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))

  /** Session-id assignment shared by [[sessionize]] and
    * [[sessionEpisodes]]: gap-splits per user, ids 1..n in time order.
    */
  private def withSessionIds(events: DataFrame, gapMinutes: Int): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn(
        "new_session",
        when(
          col("prev_ts").isNull ||
            (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > gapMinutes * 60L,
          1L).otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(run))
  }

  /** Sessions rendered as ordered training EPISODES (north-star
    * extension): each session becomes one row with the `>`-joined event
    * sequence in (ts, event_id) order plus count and whole-second duration
    * — the "event log → behavioral training sequence" transform an
    * LLM-on-actions pipeline runs before tokenization.
    *
    * Determinism: the sequence is assembled by an explicit
    * `array_sort(collect_list(struct(ts, event_id, type)))` — collect_list
    * order is shuffle-arrival-dependent, the sort makes it a pure function
    * of the data (same rule as bm25TopK's sorted fold). Duration is exact
    * integer seconds (`unix_timestamp` floors, matching DuckDB's
    * `date_diff('second', ...)` boundary count).
    *
    * Scale shape: the same single user-partitioned window as [[sessionize]]
    * plus one (user, session) aggregation; per-group state is bounded by
    * session length (sessions are gap-bounded by construction — a user
    * cannot have an unbounded session without an unbounded activity run).
    */
  def sessionEpisodes(events: DataFrame, gapMinutes: Int = 30): DataFrame =
    withSessionIds(events, gapMinutes)
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        (unix_timestamp(max(col("ts"))) - unix_timestamp(min(col("ts"))))
          .as("duration_secs"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"), col("event_type")))),
            s => s.getField("event_type")),
          ">").as("episode"))

  /** Custom stateful aggregation over a stream (or batch) of events:
    * `KeyValueGroupedDataset.mapGroupsWithState` with one state record per
    * user. State is O(users × event-types) — bounded, executor-distributed,
    * checkpointable; this is the Structured Streaming twin of the
    * reference-free "custom operator" tier (SURVEY §2.B UDF/state row).
    */
  def userActivity(spark: org.apache.spark.sql.SparkSession, events: DataFrame)
      : org.apache.spark.sql.Dataset[UserActivity] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val typed = events
      .select(col("user_id").cast("long"), col("event_type"), col("ts"))
      .as[(Long, String, java.sql.Timestamp)]
    typed
      .groupByKey(_._1)
      .mapGroupsWithState[ActivityState, UserActivity](GroupStateTimeout.NoTimeout()) {
        (user: Long, rows: Iterator[(Long, String, java.sql.Timestamp)],
         state: GroupState[ActivityState]) =>
          val prev = state.getOption.getOrElse(ActivityState(0L, Seq.empty, Long.MinValue))
          val next = rows.foldLeft(prev) { case (acc, (_, tpe, ts)) =>
            val micros = ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L
            ActivityState(
              acc.n + 1,
              if (acc.types.contains(tpe)) acc.types else acc.types :+ tpe,
              math.max(acc.lastMicros, micros))
          }
          state.update(next)
          UserActivity(
            user,
            next.n,
            next.types.size,
            new java.sql.Timestamp(next.lastMicros / 1000L))
      }
  }

  /** Streaming exact dedup: watermarked `dropDuplicates` on the event id —
    * duplicate events arriving across micro-batches (retries, replays) are
    * emitted once; state for ids older than the watermark is dropped, so
    * state stays bounded by the lateness window, not the stream length.
    */
  def streamingDedup(events: DataFrame, idCol: String = "event_id", delay: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", delay).dropDuplicates(idCol, "ts")

  /** Stream-static backward as-of join: each micro-batch of left rows is
    * matched against the STATIC right table with
    * [[graft.ops.AsofJoin.backward]] semantics (latest right timestamp <=
    * the left row's, per key, optional tolerance) and handed to `sink` —
    * the serving shape for "enrich a live event stream with the most
    * recent quote/dimension snapshot".
    *
    * foreachBatch, not a streaming join: the as-of match is a window over
    * the (key)-partitioned union of both sides ordered by time, which
    * streaming DataFrames cannot run incrementally — and per-row backward
    * matches against a STATIC right side depend only on the row itself,
    * so batch-at-a-time evaluation is EXACT: splitting the left stream
    * across any trigger boundaries yields byte-identical rows to the one-
    * shot batch join (spec-pinned across two triggers). Per trigger the
    * cost is the batch operator's: ONE shuffle of |batch|+|R| rows on the
    * key. A stream-STREAM as-of (right side also live) needs watermarked
    * state to bound how long a left row may wait for a better match —
    * compose the interval-join + `mapGroupsWithState` tools for that.
    *
    * Trigger retries: a re-delivered batch id is skipped, so a retried
    * trigger cannot double-append through `sink` within this query's
    * lifetime.
    */
  def streamingAsofBackward(
      leftStream: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      asofTsName: String = "asof_ts",
      toleranceSec: Option[Long] = None,
      checkpointLocation: Option[String] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var lastBatchId = -1L
    val stream = leftStream.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          sink(graft.ops.AsofJoin.backward(
            batch, right, key, leftTs, rightTs, asofTsName, toleranceSec))
        }
      }
      .start()
  }

  /** Stream-static temporal validity join — the live twin of
    * [[graft.ops.Incremental.validityJoin]] (C110): each trigger's fact
    * batch meets the STATIC dimension history (an SCD2 snapshot) and
    * picks the version valid at its own event time. Exact across any
    * trigger split for the same reason as the as-of twin above: a fact
    * row's match depends only on that row and the static dim, so
    * batch-at-a-time evaluation ≡ the one-shot batch join (spec-pinned
    * across two triggers). Per trigger: one shuffle of |batch| + |dim|
    * on the key. A live dimension (stream-STREAM) needs watermarked
    * state — rebuild the dim snapshot per version instead and restart
    * the join, the SCD2 cadence. Re-delivered batch ids are skipped.
    */
  def streamStaticValidityJoin(
      factStream: DataFrame,
      dim: DataFrame,
      keyCols: Seq[String],
      timeCol: String,
      fromCol: String = "valid_from",
      toCol: String = "valid_to",
      checkpointLocation: Option[String] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var lastBatchId = -1L
    val stream = factStream.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          sink(graft.ops.Incremental.validityJoin(
            batch, dim, keyCols, timeCol, fromCol, toCol))
        }
      }
      .start()
  }

  /** Streaming count-min accumulation: each trigger's batch is sketched
    * ([[graft.ops.Sketch.cmsCounters]]) and merged cell-wise into the
    * running counter table — the streaming twin of the batch sketch
    * build. Because sketch(A ∪ B) = sketch(A) + sketch(B) exactly,
    * per-trigger accumulation introduces NO additional error over
    * one-shot sketching the whole stream (spec-pinned cell-for-cell
    * across triggers). State is the bounded depth×width counter table —
    * O(sketch), never O(vocabulary) — rotated through
    * [[graft.ops.Checkpoints]] like the incremental-dedup signatures.
    * Re-delivered batch ids are skipped (a retried trigger must not
    * double-count its tokens); `sink` receives the accumulated counters
    * after each trigger — VALID ONLY UNTIL THE NEXT TRIGGER (the
    * superseded snapshot's blocks are then freed with truncated lineage;
    * a sink that retains frames must copy/write them inside its call).
    *
    * RESTART semantics: the accumulated counters live in driver memory,
    * NOT in the streaming checkpoint — with `checkpointLocation` set,
    * Spark resumes source offsets past already-committed batches but
    * this writer starts from an EMPTY sketch, silently undercounting
    * everything before the restart. The counter table is exactly the
    * artifact to persist each trigger (it is tiny and mergeable):
    * persist from `sink`, reload on restart, and pass it as `initial`
    * — sketch mergeability makes the resumed accumulation exact.
    */
  def streamingCmsCounts(
      newDocs: DataFrame,
      textCol: String,
      depth: Int,
      width: Int,
      checkpointLocation: Option[String] = None,
      initial: Option[DataFrame] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var counters: Option[DataFrame] =
      initial.map(graft.ops.Checkpoints.truncate(_))
    var lastBatchId = -1L
    val stream = newDocs.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          val occ = batch.select(explode(graft.ops.TextOps.tokens(col(textCol))).as("tok"))
          val batchSketch = graft.ops.Sketch.cmsCounters(occ, "tok", depth, width)
          val next = graft.ops.Checkpoints.truncate(
            counters.map(c => graft.ops.Sketch.cmsMerge(c, batchSketch)).getOrElse(batchSketch))
          counters.foreach(graft.ops.Checkpoints.unpersist)
          counters = Some(next)
          sink(next)
        }
      }
      .start()
  }

  /** Streaming Bloom accumulation: the membership twin of
    * [[streamingCmsCounts]] — each trigger's distinct tokens extend the
    * running set-bit position table (`bloom(A ∪ B) = bits(A) ∪ bits(B)`,
    * so per-trigger accumulation is EXACT), giving a live
    * no-false-negative screen over everything the stream has delivered.
    * Same contracts as the CMS twin: sink frames valid only within their
    * trigger, driver-held state with an `initial` seed for exact restart
    * resume, retried batch ids skipped.
    */
  def streamingBloomBits(
      newDocs: DataFrame,
      textCol: String,
      k: Int,
      m: Int,
      checkpointLocation: Option[String] = None,
      initial: Option[DataFrame] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var bits: Option[DataFrame] = initial.map(graft.ops.Checkpoints.truncate(_))
    var lastBatchId = -1L
    val stream = newDocs.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          val toks = batch.select(explode(graft.ops.TextOps.tokens(col(textCol))).as("tok"))
          val batchBits = graft.ops.Sketch.bloomBits(toks, "tok", k, m)
          val next = graft.ops.Checkpoints.truncate(
            bits.map(b => graft.ops.Sketch.bloomMerge(b, batchBits)).getOrElse(batchBits))
          bits.foreach(graft.ops.Checkpoints.unpersist)
          bits = Some(next)
          sink(next)
        }
      }
      .start()
  }

  /** EXACTLY-ONCE streaming append into a managed table — the Delta
    * transactional-sink shape: every trigger commits its batch as one
    * atomic manifest version carrying a (queryId, batchId) transaction
    * sidecar ([[graft.sinks.ManagedWriter.lastCommittedBatch]]), and a
    * batch id at or below the table's durable watermark is SKIPPED. That
    * closes the failure window in-memory dedup cannot: after a crash
    * between the sink's write and the checkpoint's offset commit,
    * Structured Streaming REPLAYS the last batch into a fresh process —
    * the txn watermark (bound to the published manifest's md5, so a
    * crashed commit never counts) rejects the replay instead of
    * double-appending. Combined with the manifest's single-rename
    * atomicity this is end-to-end exactly-once into the table for any
    * replayable source, the analogue of the reference's
    * offset-tracked `AppendRows` → `BatchCommitWriteStreams` contract
    * (bigquery_write.go:448-484).
    */
  def streamingManagedAppend(
      newRows: DataFrame,
      destDir: String,
      schema: org.apache.spark.sql.types.StructType,
      queryId: String,
      checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = newRows.sparkSession
    val stream = newRows.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= graft.sinks.ManagedWriter.lastCommittedBatch(spark, destDir, queryId)) ()
        else {
          val w = new graft.sinks.ManagedWriter(
            spark, destDir, schema, graft.sinks.StreamType.Pending,
            txn = Some((queryId, batchId)))
          w.write(batch)
          w.finalizeCommit(): Unit
        }
      }
      .start()
  }

  /** Streaming heavy-hitters: the frequent-keys twin of
    * [[streamingCmsCounts]] — each trigger's keys collapse to a
    * Misra–Gries summary ([[graft.ops.Sketch.heavyHitters]]: exact while
    * the batch's distinct keys fit the capacity, MG-bounded beyond) and
    * merge into the running summary via the mergeable-summaries combine
    * ([[graft.ops.Sketch.heavyHittersMerge]]), keeping the live
    * "top keys so far" table in O(capacity) state regardless of the
    * stream's key domain — the per-tenant / per-token frequency monitor
    * a quota or abuse screen watches. MG guarantees (est ≤ true,
    * true − est ≤ n/(cap+1)) hold across any trigger slicing, with the
    * per-merge error budgets adding. Same contracts as the CMS twin:
    * driver-held bounded state, `initial` seed for restart resume, sink
    * frames valid only within their trigger, retried batch ids skipped.
    */
  def streamingHeavyHitters(
      newRows: DataFrame,
      keyCol: String,
      capacity: Int,
      checkpointLocation: Option[String] = None,
      initial: Option[DataFrame] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    var summary: Option[DataFrame] = initial.map(graft.ops.Checkpoints.truncate(_))
    var lastBatchId = -1L
    val stream = newRows.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          val batchSummary = graft.ops.Sketch
            .heavyHitters(batch, Seq.empty, keyCol, capacity)
            .select(col(keyCol).as("key"), col("est"))
          val next = graft.ops.Checkpoints.truncate(
            summary
              .map(s => graft.ops.Sketch.heavyHittersMerge(s, batchSummary, capacity))
              .getOrElse(batchSummary))
          summary.foreach(graft.ops.Checkpoints.unpersist)
          summary = Some(next)
          sink(next)
        }
      }
      .start()
  }

  /** Streaming distribution-drift monitor: each trigger's rows extend a
    * running cents histogram of `valueCol` (`hist(A ∪ B) = hist(A) +
    * hist(B)` exactly — [[graft.ops.Profile.mergeHistograms]]), and the
    * accumulated histogram is drifted against the fixed `reference`
    * snapshot ([[graft.ops.Profile.driftFromHistograms]]: exact-integer
    * TVD) after every trigger — the live twin of the batch
    * `histogramDrift` (ns72), answering "has the stream's value
    * distribution walked away from the reference yet?" continuously.
    *
    * State is the bounded bucket table — O(buckets), never O(stream);
    * the reference histogram is computed ONCE and pinned. Same contracts
    * as [[streamingCmsCounts]]: re-delivered batch ids are skipped, sink
    * frames are valid only until the next trigger, restart resumes from
    * an empty running histogram unless the caller persists the bucket
    * table from `sink` and reseeds via `initial` (histogram mergeability
    * makes the resumed accumulation exact). Triggers that leave the
    * accumulated histogram EMPTY (no rows seen yet) skip the sink — the
    * drift of nothing is not zero, and `driftFromHistograms` raises on
    * empty sides by design.
    */
  def streamingHistogramDrift(
      newRows: DataFrame,
      valueCol: String,
      widthCents: Long,
      reference: DataFrame,
      checkpointLocation: Option[String] = None,
      initial: Option[DataFrame] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val refHist = graft.ops.Checkpoints.truncate(
      graft.ops.Profile.centsHistogram(reference, valueCol, widthCents).select("bucket", "n"))
    var hist: Option[DataFrame] = initial.map(graft.ops.Checkpoints.truncate(_))
    var lastBatchId = -1L
    val stream = newRows.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          val bh = graft.ops.Profile
            .centsHistogram(batch, valueCol, widthCents)
            .select("bucket", "n")
          val next = graft.ops.Checkpoints.truncate(
            hist.map(h => graft.ops.Profile.mergeHistograms(h, bh)).getOrElse(bh))
          hist.foreach(graft.ops.Checkpoints.unpersist)
          hist = Some(next)
          if (!next.isEmpty) sink(graft.ops.Profile.driftFromHistograms(refHist, next))
        }
      }
      .start()
  }

  /** Streaming KS drift monitor: the live twin of the batch
    * [[graft.ops.Profile.ksAgainstReference]] (ns128) — each trigger's
    * rows extend a running per-value exact count table (counts add across
    * triggers, so the accumulation is EXACT, not converging), and the
    * accumulated distribution is KS-tested against the fixed `reference`
    * snapshot after every trigger via
    * [[graft.ops.Profile.ksFromCounts]]'s identical integer arithmetic.
    * Complements [[streamingHistogramDrift]]: TVD needs a bucket width
    * and misses within-bucket shifts; KS is binning-free.
    *
    * State is the distinct-value count table — O(distinct values), never
    * O(stream). Same contracts as the other foreachBatch monitors:
    * re-delivered batch ids skipped, sink frames valid until the next
    * trigger, restart resumes exactly from a persisted count table via
    * `initial` (count mergeability). Empty accumulations skip the sink.
    */
  def streamingKsDrift(
      newRows: DataFrame,
      valueCol: String,
      reference: DataFrame,
      checkpointLocation: Option[String] = None,
      initial: Option[DataFrame] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    def toCounts(df: DataFrame): DataFrame = df
      .where(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n"))
    val refCounts = graft.ops.Checkpoints.truncate(
      toCounts(reference).select(col("bucket").as("v"), col("n").as("c")))
    var counts: Option[DataFrame] = initial.map(graft.ops.Checkpoints.truncate(_))
    var lastBatchId = -1L
    val stream = newRows.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          val bc = toCounts(batch)
          val next = graft.ops.Checkpoints.truncate(
            counts.map(c => graft.ops.Profile.mergeHistograms(c, bc)).getOrElse(bc))
          counts.foreach(graft.ops.Checkpoints.unpersist)
          counts = Some(next)
          if (!next.isEmpty)
            sink(graft.ops.Profile.ksFromCounts(
              next.select(col("bucket").as("v"), col("n").as("c")), refCounts))
        }
      }
      .start()
  }

  /** Streaming SLO burn-rate monitor: the live twin of the batch
    * [[graft.ops.TimeSeries.burnRate]] (ns141) — each trigger's events
    * fold into a running EXACT hourly (h, tot, err) count table (counts
    * add across triggers, so accumulation is exact, not converging), and
    * the fast/slow trailing burn windows recompute over the accumulated
    * hourly table after every trigger via
    * [[graft.ops.TimeSeries.burnRateFromHourly]]'s identical arithmetic —
    * the monitor a paging pipeline actually runs ("is the error budget
    * burning too fast RIGHT NOW, judged over both windows?").
    *
    * State is the hourly count table — O(hours observed), never
    * O(stream). Same contracts as the other foreachBatch monitors:
    * re-delivered batch ids are skipped, sink frames are valid only until
    * the next trigger, restart resumes exactly from a persisted hourly
    * table via `initial` (count mergeability), empty accumulations skip
    * the sink.
    */
  def streamingBurnRate(
      newRows: DataFrame,
      tsCol: String,
      isError: Column,
      shortHours: Int,
      longHours: Int,
      budgetPerMille: Long,
      checkpointLocation: Option[String] = None,
      initial: Option[DataFrame] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    def merge(a: DataFrame, b: DataFrame): DataFrame = a
      .unionByName(b)
      .groupBy("h")
      .agg(sum("tot").as("tot"), sum("err").as("err"))
    var hourly: Option[DataFrame] = initial.map(graft.ops.Checkpoints.truncate(_))
    var lastBatchId = -1L
    val stream = newRows.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          val bh = graft.ops.TimeSeries.hourlyErrorCounts(batch, tsCol, isError)
          val next = graft.ops.Checkpoints.truncate(
            hourly.map(h => merge(h, bh)).getOrElse(bh))
          hourly.foreach(graft.ops.Checkpoints.unpersist)
          hourly = Some(next)
          if (!next.isEmpty)
            sink(graft.ops.TimeSeries.burnRateFromHourly(
              next, shortHours, longHours, budgetPerMille))
        }
      }
      .start()
  }

  /** Streaming incremental near-dup dedup: the steady-state corpus
    * pipeline run AS A STREAM — each micro-batch of new documents is
    * LSH-probed against the accepted corpus' persisted MinHash signatures
    * ([[graft.ops.Dedup.incrementalNearDups]] semantics) and only the
    * survivors append through the managed writer.
    *
    * foreachBatch is the right tool here, not a stream-static join: a
    * document is a near-dup when ANY of its bands collides, so the
    * survivor set needs a per-document ALL-bands verdict — an aggregation
    * over the probe result that foreachBatch runs with exact batch
    * semantics per trigger, while a pure stream-static anti-join on band
    * rows would keep a document's non-colliding band rows even when
    * another band matched. Per batch the cost is exactly the batch
    * operator's: sketch-only join, candidate volume scales with the
    * increment.
    *
    * Cross-trigger duplicates ARE caught: each trigger's survivors'
    * signatures are unioned into the probe side (localCheckpoint'ed, the
    * superseded snapshot unpersisted — foreachBatch triggers run
    * sequentially, so the rotation is single-threaded), so a duplicate of
    * an earlier trigger's survivor collides against the accumulated set.
    * The accumulated state is O(accepted corpus) SIGNATURES — exactly the
    * artifact a production pipeline persists between runs; it does not
    * survive a restart here (re-derive it from the written corpus or
    * persist it alongside). Intra-batch duplicates (two near-identical
    * docs in the SAME trigger) remain the caller's composition point —
    * run [[graft.ops.Dedup.minhashPairs]] + canonical selection inside a
    * `transform` before handing batches here if that matters.
    *
    * Retry/replay semantics: foreachBatch can re-invoke a batch id — on a
    * trigger retry, or on restart from `checkpointLocation` when the last
    * trigger wrote but did not commit. Batch ids that were already
    * processed by THIS writer instance are skipped (idempotent within the
    * query's lifetime, so an in-process retry cannot double-append
    * survivors through the ManagedWriter). Across a RESTART the
    * signature state is gone regardless (it is in-memory by design — see
    * above), so the caller re-derives it from the written corpus; a
    * restart replay of the one uncommitted batch then re-evaluates
    * against that state rather than double-appending blindly.
    *
    * @param corpusSignatures static `(doc_id, sig)` — the artifact a
    *        production pipeline persists between increments; the stream
    *        probes it (plus accumulated survivors) every trigger.
    * @param checkpointLocation Structured Streaming checkpoint dir for the
    *        query's progress log (source offsets + committed batch ids);
    *        None keeps the harness-friendly ephemeral default.
    */
  def streamingIncrementalDedup(
      newDocs: DataFrame,
      corpusSignatures: DataFrame,
      writer: graft.sinks.ManagedWriter,
      idCol: String = "doc_id",
      textCol: String = "text",
      shingleLen: Int = 3,
      k: Int = 16,
      bands: Int = 4,
      rowsPerBand: Int = 4,
      minEstJaccard: Double = 0.5,
      checkpointLocation: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var sigs = graft.ops.Checkpoints.truncate(corpusSignatures)
    // Last batch id this instance processed: foreachBatch triggers run
    // sequentially, so a plain var is safe; a re-delivered id (trigger
    // retry) must not re-append its survivors.
    var lastBatchId = -1L
    val stream = newDocs.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
        lastBatchId = batchId
        val batchSigs = graft.ops.Checkpoints.truncate(
          graft.ops.Dedup.minhashSignatures(batch, idCol, textCol, shingleLen, k))
        val flagged = graft.ops.Dedup
          .incrementalNearDups(batchSigs, sigs, bands, rowsPerBand, minEstJaccard)
          .select(col("doc_id").as(idCol))
        writer.write(batch.join(flagged, Seq(idCol), "left_anti")): Unit
        val survivorSigs =
          batchSigs.join(flagged.select(col(idCol).as("doc_id")), Seq("doc_id"), "left_anti")
        val next = graft.ops.Checkpoints.truncate(sigs.unionByName(survivorSigs))
        graft.ops.Checkpoints.unpersist(sigs)
        graft.ops.Checkpoints.unpersist(batchSigs)
        sigs = next
        }
      }
      .start()
  }

  /** Streaming tumbling counts over a parquet-file source directory —
    * the end-to-end readStream → watermark → window → agg plan used by the
    * ScalaTest harness (memory sink, complete/update mode).
    */
  def streamingTumblingCounts(
      spark: org.apache.spark.sql.SparkSession,
      dir: String,
      schema: org.apache.spark.sql.types.StructType,
      width: String = "1 hour"): DataFrame =
    tumblingCounts(
      withWatermark(spark.readStream.schema(schema).parquet(dir), "10 minutes"),
      width)

  /** Streaming CDC apply: each trigger's changeset batch (rows + an op
    * column, `D` = delete, else upsert) merges into the managed table at
    * `destDir` through [[graft.sinks.ManagedWriter.mergeDV]] — the
    * streaming twin of the batch CDC merge (C48/C81): per trigger, ONE
    * O(changeset) deletion-vector commit, untouched files never
    * rewritten, and the table is a queryable consistent snapshot BETWEEN
    * triggers (each trigger is one atomic manifest version).
    *
    * Re-delivered batch ids are skipped — a retried trigger must not
    * re-apply its changeset (double-applying an upsert changes history
    * even when the final row state matches). With `checkpointLocation`
    * set, restarts resume source offsets past committed batches; the
    * lastBatchId guard is per-run, so exactly-once across restarts
    * holds when the checkpoint skips replays (Spark's normal contract).
    * `onVersion` observes each published version (e.g. to snapshot
    * metrics or trigger downstream reads).
    */
  def streamingCdcApply(
      changes: DataFrame,
      destDir: String,
      keyCols: Seq[String],
      opCol: String = "op",
      checkpointLocation: Option[String] = None,
      onVersion: Long => Unit = _ => ())
      : org.apache.spark.sql.streaming.StreamingQuery = {
    var lastBatchId = -1L
    val stream = changes.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          if (!batch.isEmpty) {
            val v = graft.sinks.ManagedWriter.mergeDV(
              batch.sparkSession, destDir, batch, keyCols, opCol)
            onVersion(v)
          }
        }
      }
      .start()
  }

  /** Streaming constraint validation: the live twin of
    * [[graft.ops.Validate.validate]] — each trigger's batch is validated
    * and its per-check violation counts FOLD into a running report
    * (row-local violations are plain sums over rows, so per-trigger
    * accumulation is EXACT: the running report always equals a one-shot
    * validate of everything delivered so far). The live data-quality
    * monitor a pipeline keeps on an ingest stream.
    *
    * Deliberately restricted to ROW-LOCAL checks (not-null / range /
    * set-membership): uniqueness, referential integrity, and k-anonymity
    * are properties of the whole corpus — per-batch counts of those do
    * NOT merge (two batches can each look unique) — so they belong on the
    * managed snapshot, not the stream. The require makes that contract
    * loud instead of silently wrong.
    *
    * Same contracts as [[streamingCmsCounts]]: sink frames are valid
    * within their trigger, state is the ≤|checks|-row report (truncated
    * per trigger), `initial` seeds an exact restart resume, retried batch
    * ids are skipped.
    */
  def streamingValidate(
      newRows: DataFrame,
      checks: Seq[graft.ops.Validate.Check],
      checkpointLocation: Option[String] = None,
      initial: Option[DataFrame] = None)(
      sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    require(checks.forall {
      case _: graft.ops.Validate.NotNull | _: graft.ops.Validate.InRange |
           _: graft.ops.Validate.InSet => true
      case _ => false
    }, "streaming validation accumulates row-local checks only; " +
      "uniqueness/FK/k-anonymity are corpus properties — run them on the snapshot")
    var report: Option[DataFrame] =
      initial.map(graft.ops.Checkpoints.truncate(_))
    var lastBatchId = -1L
    val stream = newRows.writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          val batchReport = graft.ops.Validate.validate(batch, checks)
            .select(col("check"), col("violations"))
          val merged = report.map(_.select(col("check"), col("violations"))
              .unionByName(batchReport)
              .groupBy("check").agg(sum(col("violations")).as("violations")))
            .getOrElse(batchReport)
          val next = graft.ops.Checkpoints.truncate(
            merged.select(
              col("check"), col("violations"),
              (col("violations") === 0L).as("pass")))
          report.foreach(graft.ops.Checkpoints.unpersist)
          report = Some(next)
          sink(next)
        }
      }
      .start()
  }
}
