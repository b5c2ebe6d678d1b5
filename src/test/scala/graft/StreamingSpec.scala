package graft

import java.util.UUID

import org.apache.spark.sql.functions._

import graft.streaming.Streams

/** Structured Streaming end-to-end: parquet file source → watermark →
  * tumbling window state → memory sink, checked against the batch twin of
  * the same transform (the Structured Streaming unification contract).
  */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling counts equal the batch computation") {
    val events = Tables(spark, sfDir, "events")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-stream-${UUID.randomUUID().toString.take(8)}"
    events.write.parquet(dir)

    val stream = Streams.streamingTumblingCounts(
      spark, dir, spark.read.parquet(dir).schema, "1 hour")
    val qname = s"agg_${UUID.randomUUID().toString.take(8)}"
    val q = stream.writeStream
      .format("memory")
      .queryName(qname)
      .outputMode("complete")
      .start()
    try {
      q.processAllAvailable()
      val got = spark.table(qname)
        .select("ws", "event_type", "n", "sum_value")
        .orderBy("ws", "event_type")
        .collect()
      val want = Streams.tumblingCounts(spark.read.parquet(dir), "1 hour")
        .orderBy("ws", "event_type")
        .collect()
      assert(got.length == want.length && got.length > 0)
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("session_window merges events under the gap, splits at/over it") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 10:29:59"), // < 30 min after prev -> same session
      (3L, 10L, "2024-01-01 11:00:00"), // >= 30 min after prev -> new session
      (4L, 20L, "2024-01-01 09:00:00")).toDF("event_id", "user_id", "ts_s")
      .select($"event_id", $"user_id", $"ts_s".cast("timestamp").as("ts"))
    val out = Streams.sessionWindows(df, "30 minutes")
      .orderBy("user_id", "session_start").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2L)
    assert(out(1).getAs[Long]("n_events") == 1L)
  }

  test("sliding windows place each event in width/slide windows") {
    import spark.implicits._
    val df = Seq((1L, "a", "2024-01-01 10:15:00")).toDF("event_id", "event_type", "ts_s")
      .select($"event_id", $"event_type", $"ts_s".cast("timestamp").as("ts"))
    val out = Streams.slidingCounts(df, "1 hour", "30 minutes").collect()
    assert(out.length == 2) // 09:30 and 10:00 windows both contain 10:15
  }

  test("mapGroupsWithState user activity matches the equivalent batch aggregation") {
    val events = Tables(spark, sfDir, "events")
    val got = Streams.userActivity(spark, events)
      .collect().map(u => (u.user_id, u.n_events, u.n_types.toLong)).sortBy(_._1)
    val want = events.groupBy("user_id")
      .agg(count(lit(1)).as("n"), countDistinct(col("event_type")).as("t"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(got.sameElements(want))
  }

  test("mapGroupsWithState runs as a streaming query with update mode") {
    val events = Tables(spark, sfDir, "events")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-state-${UUID.randomUUID().toString.take(8)}"
    events.write.parquet(dir)
    val stream = Streams.userActivity(
      spark, spark.readStream.schema(spark.read.parquet(dir).schema).parquet(dir))
    val qname = s"ua_${UUID.randomUUID().toString.take(8)}"
    val q = stream.writeStream.format("memory").queryName(qname).outputMode("update").start()
    try {
      q.processAllAvailable()
      assert(spark.table(qname).count() == events.select("user_id").distinct().count())
    } finally q.stop()
  }

  test("streaming dedup drops cross-batch duplicate event ids") {
    val events = Tables(spark, sfDir, "events").limit(200).cache()
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-dedup-${UUID.randomUUID().toString.take(8)}"
    // same rows written twice -> two files -> duplicates across batches
    events.write.parquet(dir)
    events.write.mode("append").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val deduped = Streams.streamingDedup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(dir))
    val qname = s"dd_${UUID.randomUUID().toString.take(8)}"
    val q = deduped.writeStream.format("memory").queryName(qname).outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table(qname).count() == events.count())
    } finally q.stop()
  }

  test("foreachBatch streams micro-batches through the ManagedWriter") {
    import graft.sinks.{ManagedWriter, StreamType}
    val events = Tables(spark, sfDir, "events").limit(100)
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-fb-src-${UUID.randomUUID().toString.take(8)}"
    events.write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val dest = s"${System.getProperty("java.io.tmpdir")}/graft-fb-dest-${UUID.randomUUID().toString.take(8)}"
    val writer = new ManagedWriter(spark, dest, schema, StreamType.Pending)
    val stream = spark.readStream.schema(schema).parquet(srcDir)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        writer.write(batch): Unit
      }
      .start()
    try q.processAllAvailable()
    finally q.stop()
    writer.finalizeCommit()
    assert(spark.read.parquet(dest).count() == events.count())
  }

  test("streaming incremental dedup drops corpus dups AND cross-trigger dups") {
    import graft.ops.Dedup
    import graft.sinks.{ManagedWriter, StreamType}
    import spark.implicits._
    val corpus = Seq(
      (100L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val corpusSigs = Dedup.minhashSignatures(corpus, "doc_id", "text", 3, 16).cache()
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-sid-src-${UUID.randomUUID().toString.take(8)}"
    // Two files with ordered modification times → two ordered triggers.
    Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),          // corpus dup → dropped
      (2L, "a brand new survivor document with plenty of original words") // novel → kept
    ).toDF("doc_id", "text").coalesce(1).write.parquet(srcDir)
    Thread.sleep(1100) // distinct mtime second for deterministic file order
    Seq(
      (3L, "a brand new survivor document with plenty of original words"), // dup of trigger-1 SURVIVOR → dropped
      (4L, "completely unrelated fresh content nothing shared here at all") // novel → kept
    ).toDF("doc_id", "text").coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val dest = s"${System.getProperty("java.io.tmpdir")}/graft-sid-dest-${UUID.randomUUID().toString.take(8)}"
    val writer = new ManagedWriter(spark, dest, schema, StreamType.Committed)
    val q = Streams.streamingIncrementalDedup(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      corpusSigs, writer)
    try q.processAllAvailable()
    finally q.stop()
    val got = spark.read.parquet(dest).select("doc_id").as[Long].collect().toSet
    assert(got == Set(2L, 4L))
  }

  test("stream-static backward as-of equals the batch as-of across two triggers") {
    import graft.ops.AsofJoin
    val events = Tables(spark, sfDir, "events")
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-asof-src-${UUID.randomUUID().toString.take(8)}"
    // Two files with ordered mtimes → two ordered triggers.
    val left = events.select("event_id", "user_id", "ts")
    left.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(srcDir)
    Thread.sleep(1100)
    left.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    // Static right side: each user's signup times.
    val right = events.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts").as("rts"))
    val schema = spark.read.parquet(srcDir).schema
    val dest = s"${System.getProperty("java.io.tmpdir")}/graft-asof-dest-${UUID.randomUUID().toString.take(8)}"
    val q = Streams.streamingAsofBackward(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      right, "user_id", "ts", "rts")(
      batch => batch.write.mode("append").parquet(dest))
    try q.processAllAvailable()
    finally q.stop()
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getTimestamp(2), Option(r.getTimestamp(3)))
    val got = spark.read.parquet(dest)
      .select("event_id", "user_id", "ts", "asof_ts").collect().map(keyOf).toSet
    val want = AsofJoin.backward(spark.read.parquet(srcDir), right, "user_id", "ts", "rts")
      .select("event_id", "user_id", "ts", "asof_ts").collect().map(keyOf).toSet
    assert(got == want && got.nonEmpty)
    assert(got.exists(_._4.isDefined), "no as-of match landed — fixture broken")
    // The stream really ran as two triggers, not one.
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
  }

  test("stream-static validity join equals the batch join across two triggers") {
    import graft.ops.Incremental
    val events = Tables(spark, sfDir, "events")
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-vj-src-${UUID.randomUUID().toString.take(8)}"
    val facts = events.select(
      col("event_id"), col("user_id").as("k"),
      unix_micros(col("ts")).as("t"))
    facts.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(srcDir)
    Thread.sleep(1100)
    facts.filter(col("event_id") % 2 === 1).coalesce(1)
      .write.mode("append").parquet(srcDir)
    // Static SCD2-shaped dim: two versions per user split at the median
    // event micros, so both windows really receive facts.
    val mid = facts.agg(expr("percentile_approx(t, 0.5)")).collect()(0).getLong(0)
    val users = events.select(col("user_id").as("k")).distinct()
    val dim = users.select(col("k"), lit("v0").as("ver"), lit(0L).as("valid_from"),
        lit(mid).as("valid_to"))
      .unionAll(users.select(col("k"), lit("v1").as("ver"), lit(mid).as("valid_from"),
        lit(null).cast("long").as("valid_to")))
    val schema = spark.read.parquet(srcDir).schema
    val dest = s"${System.getProperty("java.io.tmpdir")}/graft-vj-dest-${UUID.randomUUID().toString.take(8)}"
    val q = Streams.streamStaticValidityJoin(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      dim, Seq("k"), "t")(
      batch => batch.write.mode("append").parquet(dest))
    try q.processAllAvailable()
    finally q.stop()
    def keyOf(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3))
    val got = spark.read.parquet(dest)
      .select("event_id", "k", "t", "ver").collect().map(keyOf).toSet
    val want = Incremental.validityJoin(spark.read.parquet(srcDir), dim, Seq("k"), "t")
      .select("event_id", "k", "t", "ver").collect().map(keyOf).toSet
    assert(got == want && got.nonEmpty)
    assert(got.exists(_._4 == "v0") && got.exists(_._4 == "v1"),
      "both validity windows should receive facts — fixture broken")
    assert(q.recentProgress.count(_.numInputRows > 0) >= 2)
  }

  test("streaming CMS accumulation equals the one-shot sketch cell for cell") {
    import graft.ops.{Sketch, TextOps}
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-cms-src-${UUID.randomUUID().toString.take(8)}"
    docs.filter(col("doc_id") % 2 === 0).coalesce(1).write.parquet(srcDir)
    Thread.sleep(1100)
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val (d, w) = (4, 256)
    @volatile var last: Option[Array[((Int, Long), Long)]] = None
    @volatile var triggers = 0
    val q = Streams.streamingCmsCounts(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      "text", d, w) { counters =>
      triggers += 1
      last = Some(counters.collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))))
    }
    try q.processAllAvailable()
    finally q.stop()
    assert(triggers >= 2, "stream did not run as multiple triggers")
    val oneShot = Sketch.cmsCounters(
      spark.read.parquet(srcDir).select(explode(TextOps.tokens(col("text"))).as("tok")),
      "tok", d, w)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(last.map(_.toMap).contains(oneShot),
      "accumulated streaming sketch diverged from the one-shot sketch")
  }

  test("streaming CMS resumes exactly from a persisted initial sketch") {
    import graft.ops.{Sketch, TextOps}
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    def occOf(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(TextOps.tokens(col("text"))).as("tok"))
    val (d, w) = (4, 256)
    // "Pre-restart" half, persisted as a counter table...
    val initial = Sketch.cmsCounters(occOf(docs.filter(col("doc_id") % 2 === 0)), "tok", d, w)
    // ...then the stream delivers only the remaining half.
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-cmsr-src-${UUID.randomUUID().toString.take(8)}"
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    @volatile var last: Option[Map[(Int, Long), Long]] = None
    val q = Streams.streamingCmsCounts(
      spark.readStream.schema(schema).parquet(srcDir),
      "text", d, w, initial = Some(initial)) { counters =>
      last = Some(counters.collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap)
    }
    try q.processAllAvailable()
    finally q.stop()
    val oneShot = Sketch.cmsCounters(occOf(docs), "tok", d, w)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(last.contains(oneShot), "seeded resume diverged from the one-shot sketch")
  }

  test("streaming drift monitor converges to the batch drift across triggers") {
    import graft.ops.Profile
    val ev = Tables(spark, sfDir, "events").select("event_id", "value")
    val reference = ev.filter(col("event_id") % 3 === 0)
    val streamed = ev.filter(col("event_id") % 3 =!= 0)
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-drift-src-${UUID.randomUUID().toString.take(8)}"
    streamed.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(srcDir)
    streamed.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val width = 500L
    @volatile var last: Option[Map[Long, (Long, Long, Double)]] = None
    @volatile var triggers = 0
    val q = Streams.streamingHistogramDrift(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      "value", width, reference) { drift =>
      triggers += 1
      last = Some(drift.collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getAs[Double]("tvd")))).toMap)
    }
    try q.processAllAvailable()
    finally q.stop()
    assert(triggers >= 2, "stream did not run as multiple triggers")
    val oneShot = Profile.histogramDrift(reference, spark.read.parquet(srcDir), "value", width)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getAs[Double]("tvd")))).toMap
    assert(last.contains(oneShot),
      "accumulated streaming drift diverged from the one-shot batch drift")
  }

  test("streaming KS monitor equals the one-shot batch KS after every accumulation") {
    import graft.ops.Profile
    val ev = Tables(spark, sfDir, "events").select("event_id", "value")
    val reference = ev.filter(col("event_id") % 3 === 0)
    val streamed = ev.filter(col("event_id") % 3 =!= 0)
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-ks-src-${UUID.randomUUID().toString.take(8)}"
    streamed.filter(col("event_id") % 2 === 0).coalesce(1).write.parquet(srcDir)
    streamed.filter(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    @volatile var last: Option[(Long, Long, Long, Long, Double)] = None
    @volatile var triggers = 0
    val q = Streams.streamingKsDrift(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      "value", reference) { ks =>
      triggers += 1
      val r = ks.collect().head
      last = Some((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getAs[Double]("ks")))
    }
    try q.processAllAvailable()
    finally q.stop()
    assert(triggers >= 2, "stream did not run as multiple triggers")
    // One-shot: the SAME arithmetic through the grouped batch op.
    val both = reference.withColumn("g", lit("ref"))
      .unionByName(spark.read.parquet(srcDir).withColumn("g", lit("stream")))
      .withColumn("v", col("value").cast("long"))
    val r = Profile.ksAgainstReference(both, "g", "v", "ref").collect().head
    val oneShot = (r.getAs[Long]("n"), r.getAs[Long]("n_ref"),
      r.getAs[Long]("ks_num"), r.getAs[Long]("at_v"), r.getAs[Double]("ks"))
    assert(last.contains(oneShot),
      s"accumulated streaming KS $last diverged from the one-shot $oneShot")
  }

  test("streaming burn-rate monitor equals the one-shot batch burn after accumulation") {
    import graft.ops.TimeSeries
    val ev = Tables(spark, sfDir, "events").select("ts", "event_type")
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-burn-src-${UUID.randomUUID().toString.take(8)}"
    ev.filter(hour(col("ts")) % 2 === 0).coalesce(1).write.parquet(srcDir)
    ev.filter(hour(col("ts")) % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    @volatile var last: Option[Set[(Long, Long, Long, Long, Long, Double, Double, Boolean)]] = None
    @volatile var triggers = 0
    val q = Streams.streamingBurnRate(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      "ts", col("event_type") === "error",
      shortHours = 1, longHours = 6, budgetPerMille = 150L) { burn =>
      triggers += 1
      last = Some(burn.collect().map(r => (
        r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getAs[Double]("burn_s"), r.getAs[Double]("burn_l"),
        r.getAs[Boolean]("page"))).toSet)
    }
    try q.processAllAvailable()
    finally q.stop()
    assert(triggers >= 2, "stream did not run as multiple triggers")
    val oneShot = TimeSeries.burnRate(
        spark.read.parquet(srcDir), "ts", col("event_type") === "error", 1, 6, 150L)
      .collect().map(r => (
        r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getAs[Double]("burn_s"), r.getAs[Double]("burn_l"),
        r.getAs[Boolean]("page"))).toSet
    assert(last.contains(oneShot),
      "accumulated streaming burn diverged from the one-shot batch burn")
  }

  test("streaming Bloom accumulation equals the one-shot filter, seeded resume included") {
    import graft.ops.{Sketch, TextOps}
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "text")
    def toksOf(d: org.apache.spark.sql.DataFrame) =
      d.select(explode(TextOps.tokens(col("text"))).as("tok"))
    val (k, m) = (5, 4096)
    val initial = Sketch.bloomBits(toksOf(docs.filter(col("doc_id") % 2 === 0)), "tok", k, m)
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-blm-src-${UUID.randomUUID().toString.take(8)}"
    docs.filter(col("doc_id") % 2 === 1).coalesce(1).write.parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    @volatile var last: Option[Set[Long]] = None
    val q = Streams.streamingBloomBits(
      spark.readStream.schema(schema).parquet(srcDir),
      "text", k, m, initial = Some(initial)) { bits =>
      last = Some(bits.collect().map(_.getLong(0)).toSet)
    }
    try q.processAllAvailable()
    finally q.stop()
    val oneShot = Sketch.bloomBits(toksOf(docs), "tok", k, m)
      .collect().map(_.getLong(0)).toSet
    assert(last.contains(oneShot), "accumulated streaming bloom diverged from one-shot")
  }

  test("stream-stream interval join matches the batch join") {
    val events = Tables(spark, sfDir, "events")
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft-ssj-${UUID.randomUUID().toString.take(8)}"
    events.write.parquet(dir)
    val schema = spark.read.parquet(dir).schema
    def side(tpe: String) = spark.readStream.schema(schema).parquet(dir)
      .filter(col("event_type") === tpe)
      .withWatermark("ts", "1 hour")
    val purchases = side("purchase").select(
      col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    val signups = side("signup").select(
      col("user_id").as("s_user"), col("ts").as("s_ts"))
    val joined = purchases.join(
      signups,
      col("p_user") === col("s_user") &&
        col("s_ts") <= col("p_ts") &&
        col("s_ts") >= col("p_ts") - expr("INTERVAL 2 HOURS"))
    val qname = s"ssj_${UUID.randomUUID().toString.take(8)}"
    val q = joined.writeStream.format("memory").queryName(qname).outputMode("append").start()
    try {
      q.processAllAvailable()
      val batchEvents = spark.read.parquet(dir)
      val bp = batchEvents.filter(col("event_type") === "purchase")
      val bs = batchEvents.filter(col("event_type") === "signup")
      val want = bp.alias("p").join(
        bs.alias("s"),
        col("p.user_id") === col("s.user_id") &&
          col("s.ts") <= col("p.ts") &&
          col("s.ts") >= col("p.ts") - expr("INTERVAL 2 HOURS")).count()
      assert(spark.table(qname).count() == want && want > 0)
    } finally q.stop()
  }

  test("sessionize splits on inactivity gaps") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, "2024-01-01 10:00:00"),
      (2L, 10L, "2024-01-01 10:10:00"),
      (3L, 10L, "2024-01-01 11:30:00"), // > 30 min gap -> new session
      (4L, 20L, "2024-01-01 10:00:00")).toDF("event_id", "user_id", "ts_s")
      .select($"event_id", $"user_id", $"ts_s".cast("timestamp").as("ts"))
    val out = Streams.sessionize(df, 30).orderBy("user_id", "session_id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[Long]("n_events") == 2L) // user 10, session 1
    assert(out(1).getAs[Long]("n_events") == 1L) // user 10, session 2
    assert(out(2).getAs[Long]("n_events") == 1L) // user 20
  }

  test("streaming CDC apply: per-trigger DV merges converge to the sequential batch result") {
    import graft.sinks.{ManagedWriter, StreamType}
    import spark.implicits._
    val base = (1L to 6L).map(i => (i, i * 10L)).toDF("id", "v")
    val dest = s"${System.getProperty("java.io.tmpdir")}/graft-cdc-${UUID.randomUUID().toString.take(8)}"
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base.repartition(3)); w.finalizeCommit()
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-cdc-src-${UUID.randomUUID().toString.take(8)}"
    // two ordered triggers of changesets
    Seq((1L, 0L, "D"), (2L, 222L, "U")).toDF("id", "v", "op")
      .coalesce(1).write.parquet(srcDir)
    Thread.sleep(1100)
    Seq((2L, 0L, "D"), (7L, 70L, "U")).toDF("id", "v", "op")
      .coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val versions = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = Streams.streamingCdcApply(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      dest, Seq("id"), onVersion = versions += _)
    try q.processAllAvailable()
    finally q.stop()
    // delete 1; upsert 2 then delete it; insert 7 — sequential semantics
    val got = ManagedWriter.read(spark, dest).as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 30L), (4L, 40L), (5L, 50L), (6L, 60L), (7L, 70L)), s"got $got")
    // each trigger published exactly one new version
    assert(versions.size == 2 && versions(1) == versions(0) + 1, s"versions: $versions")
    // intermediate snapshot (after trigger 1) stays time-travelable
    val mid = ManagedWriter.readVersion(spark, dest, versions(0)).as[(Long, Long)].collect().toSet
    assert(mid == Set((2L, 222L), (3L, 30L), (4L, 40L), (5L, 50L), (6L, 60L)), s"mid $mid")
  }

  test("streaming validation accumulates exactly and rejects corpus checks") {
    import spark.implicits._
    import graft.ops.Validate
    val rows = Seq(
      (1L, Some(5.0), Some("a")), (2L, Some(500.0), Some("b")),   // trigger 1
      (3L, None, None), (4L, Some(-3.0), Some("zzz"))             // trigger 2
    ).toDF("id", "v", "s")
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-sv-src-${UUID.randomUUID().toString.take(8)}"
    rows.where(col("id") <= 2).coalesce(1).write.parquet(srcDir)
    Thread.sleep(1100)
    rows.where(col("id") > 2).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val checks = Seq(
      Validate.NotNull("s"): Validate.Check,
      Validate.InRange("v", 0.0, 100.0),
      Validate.InSet("s", Seq("a", "b")))
    @volatile var last: Option[Map[String, (Long, Boolean)]] = None
    @volatile var triggers = 0
    val q = Streams.streamingValidate(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      checks) { rep =>
      triggers += 1
      last = Some(rep.collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap)
    }
    try q.processAllAvailable()
    finally q.stop()
    assert(triggers >= 2, "stream did not run as multiple triggers")
    // The accumulated report equals a one-shot validate of everything.
    val oneShot = Validate.validate(spark.read.parquet(srcDir), checks)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(last.contains(oneShot), s"streaming $last vs one-shot $oneShot")
    assert(oneShot == Map(
      "not_null_s" -> (1L, false),
      "in_range_v" -> (2L, false),
      "in_set_s" -> (1L, false)), oneShot.toString)
    // Corpus-level checks are loudly rejected — per-batch counts of
    // uniqueness do not merge.
    intercept[IllegalArgumentException] {
      Streams.streamingValidate(
        spark.readStream.schema(schema).parquet(srcDir),
        Seq(Validate.Unique("id"))) { _ => () }
    }
  }

  test("streaming heavy hitters: exact regime equals one-shot counts; capacity bounds state") {
    import spark.implicits._
    val ev = Tables(spark, sfDir, "events").select("event_id", "user_id")
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-hh-src-${UUID.randomUUID().toString.take(8)}"
    ev.where(col("event_id") % 2 === 0).coalesce(1).write.parquet(srcDir)
    Thread.sleep(1100)
    ev.where(col("event_id") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    @volatile var last: Option[Map[Long, Long]] = None
    @volatile var triggers = 0
    // capacity 4096 >> distinct users → the summary stays EXACT across
    // triggers, so it must equal the one-shot groupBy counts.
    val q = Streams.streamingHeavyHitters(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      "user_id", capacity = 4096) { s =>
      triggers += 1
      assert(s.count() <= 4096L)
      last = Some(s.as[(Long, Long)].collect().toMap)
    }
    try q.processAllAvailable()
    finally q.stop()
    assert(triggers >= 2, "stream did not run as multiple triggers")
    val oneShot = spark.read.parquet(srcDir)
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(last.contains(oneShot), "exact-regime streaming summary diverged from groupBy counts")
  }

  test("streamingManagedAppend is exactly-once across a from-scratch replay") {
    import graft.sinks.ManagedWriter
    val sup = Tables(spark, sfDir, "supplier")
    val srcDir = s"${System.getProperty("java.io.tmpdir")}/graft-eo-src-${UUID.randomUUID().toString.take(8)}"
    val dest = s"${System.getProperty("java.io.tmpdir")}/graft-eo-dst-${UUID.randomUUID().toString.take(8)}"
    sup.where(col("s_suppkey") % 2 === 0).coalesce(1).write.parquet(srcDir)
    Thread.sleep(1100)
    sup.where(col("s_suppkey") % 2 === 1).coalesce(1).write.mode("append").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val q1 = Streams.streamingManagedAppend(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      dest, schema, queryId = "eo-test")
    try q1.processAllAvailable()
    finally q1.stop()
    val n = sup.count()
    assert(ManagedWriter.read(spark, dest).count() == n)
    assert(ManagedWriter.lastCommittedBatch(spark, dest, "eo-test") >= 1L)
    // Replay from scratch: a FRESH checkpoint restarts batch ids at 0 —
    // the in-memory guard is gone, only the durable txn watermark stands.
    val q2 = Streams.streamingManagedAppend(
      spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(srcDir),
      dest, schema, queryId = "eo-test")
    try q2.processAllAvailable()
    finally q2.stop()
    assert(ManagedWriter.read(spark, dest).count() == n,
      "replayed batches double-appended despite the txn watermark")
    // a DIFFERENT query id is a different ledger — it may append
    assert(ManagedWriter.lastCommittedBatch(spark, dest, "someone-else") == -1L)
  }

  test("heavyHittersMerge keeps MG bounds and capacity under adversarial splits") {
    import spark.implicits._
    // summary A: {1:10, 2:8, 3:5}; summary B: {2:4, 4:7, 5:6}; cap 3
    val a = Seq((1L, 10L), (2L, 8L), (3L, 5L)).toDF("key", "est")
    val b = Seq((2L, 4L), (4L, 7L), (5L, 6L)).toDF("key", "est")
    val got = graft.ops.Sketch.heavyHittersMerge(a, b, capacity = 3)
      .as[(Long, Long)].collect().toMap
    // merged: {1:10, 2:12, 3:5, 4:7, 5:6}; 4th largest = 6 → subtract,
    // keep strictly positive: {2:6, 1:4, 4:1}
    assert(got == Map(2L -> 6L, 1L -> 4L, 4L -> 1L), got.toString)
    assert(got.size <= 3)
  }
}
