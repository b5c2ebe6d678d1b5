package graft

import java.util.UUID

import graft.engine.Engine
import graft.sources.{ParquetTableSource, RetryPolicy, ScanOptions}

/** Engine SQL surface + ingest semantics (≈ duck_test.go:54-130 inline
  * goldens and duck.go:217-252 create-vs-append).
  */
class EngineSpec extends SparkSpec {

  test("exec + query: CREATE/SELECT with inline golden values") {
    val eng = new Engine(spark)
    eng.exec(
      "CREATE OR REPLACE TEMP VIEW t_people AS SELECT * FROM VALUES " +
        "(1,'Alice',95.5),(2,'Bob',87.2) AS t(id,name,score)")
    val rows = eng.query("SELECT id, name, score FROM t_people ORDER BY id").collect()
    assert(rows.length == 2)
    assert(rows(0).getInt(0) == 1 && rows(0).getString(1) == "Alice")
    assert(math.abs(rows(0).getAs[java.math.BigDecimal](2).doubleValue() - 95.5) < 1e-9)
  }

  test("tableSchema is None for absent tables (nil-schema convention, duck.go:224)") {
    val eng = new Engine(spark)
    assert(eng.tableSchema(s"no_such_${UUID.randomUUID().toString.take(8)}").isEmpty)
  }

  test("ingestCreateAppend: create then append doubles rows (duck_test.go:189)") {
    val eng = new Engine(spark)
    val df = Tables(spark, sfDir, "nation")
    val t = s"ing_${UUID.randomUUID().toString.replace("-", "")}"
    val n1 = eng.ingestCreateAppend(df, t)
    val n2 = eng.ingestCreateAppend(df, t)
    assert(n1 == df.count() && n2 == df.count())
    assert(spark.table(t).count() == 2 * df.count())
    assert(eng.tableSchema(t).contains(df.schema))
    eng.exec(s"DROP TABLE $t")
  }

  test("scan pushdown reaches the parquet reader (PushedFilters + pruned ReadSchema)") {
    val src = new ParquetTableSource(sfDir)
    val df = src.read(
      spark,
      "supplier",
      ScanOptions(
        selectedFields = Seq("s_suppkey", "s_name"),
        rowRestriction = Some("s_suppkey > 10")))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(s_suppkey,10)"),
      s"filter not pushed:\n$plan")
    assert(!plan.contains("s_acctbal"), s"column prune failed:\n$plan")
  }

  test("queryProto: descriptor + one message per row (duck.go:274-317 surface)") {
    val eng = new Engine(spark)
    eng.exec(
      "CREATE OR REPLACE TEMP VIEW qp_t AS SELECT * FROM VALUES " +
        "(CAST(1 AS BIGINT),'x'),(CAST(2 AS BIGINT),'y'),(CAST(3 AS BIGINT),'z') AS t(id,name)")
    val (descriptor, messages, n) = eng.queryProto("SELECT id, name FROM qp_t ORDER BY id")
    assert(n == 3 && messages.length == 3) // 3 rows -> 3 messages (duck_test.go:232)
    assert(descriptor.nonEmpty)
    val first = graft.proto.RowCodec.decodeMessage(messages(0))
    assert(first(1) == Seq(1L))
  }

  test("exec reports rows-affected from plan metrics (0 for resultless DDL)") {
    // Spark 4 command results always carry a numOutputRows metric, so the
    // reference's -1 no-count fallback (duck.go:182-184) is rarely hit:
    // resultless DDL reports 0 affected rows.
    val eng = new Engine(spark)
    assert(eng.exec("CREATE OR REPLACE TEMP VIEW exec_rc AS SELECT 1 AS x") == 0L)
  }

  test("asof backward join picks the max among duplicate right timestamps") {
    import spark.implicits._
    import graft.ops.AsofJoin
    val left = Seq((1L, 5L, "2024-01-01 12:00:00")).toDF("event_id", "user_id", "ts_s")
      .select($"event_id", $"user_id", $"ts_s".cast("timestamp").as("ts"))
    // duplicate right rows at the same instant plus an earlier one
    val right = Seq((5L, "2024-01-01 10:00:00"), (5L, "2024-01-01 11:00:00"),
      (5L, "2024-01-01 11:00:00")).toDF("user_id", "ts_s")
      .select($"user_id", $"ts_s".cast("timestamp").as("ts"))
    val out = AsofJoin.backward(left, right, "user_id", "ts", "ts", "m").collect()
    assert(out.length == 1)
    assert(out(0).getTimestamp(3).toString.startsWith("2024-01-01 11:00"))
  }

  test("metrics listener captures output rows and durations per action (A21)") {
    val listener = new graft.engine.MetricsListener
    spark.listenerManager.register(listener)
    try {
      val eng = new Engine(spark)
      val t = s"mx_${UUID.randomUUID().toString.replace("-", "")}"
      eng.ingestCreateAppend(Tables(spark, sfDir, "nation"), t)
      // listener events are delivered asynchronously
      val deadline = System.nanoTime() + 10e9.toLong
      while (listener.snapshot.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      val m = listener.snapshot
      assert(m.nonEmpty)
      assert(m.forall(_.durationNs >= 0))
      eng.exec(s"DROP TABLE $t")
    } finally spark.listenerManager.unregister(listener)
  }

  test("maxStreamCount raises parallelism floor for small scans") {
    val src = new ParquetTableSource(sfDir)
    val df = src.read(spark, "nation", ScanOptions(maxStreamCount = Some(4)))
    assert(df.rdd.getNumPartitions >= 4)
  }

  test("RetryPolicy: gax schedule, code gating, attempt cap, deadline (bigquery.go:35-62)") {
    // the exact gax curve: 100ms ×1.30 capped at 60s
    val p = RetryPolicy.createReadSession
    assert(p.backoffMs(0) == 100L && p.backoffMs(1) == 130L && p.backoffMs(2) == 169L)
    assert(p.backoffMs(40) == 60000L, "cap applies")
    assert(ScanOptions.default.rowsRetry.retryableCodes == Set("UNAVAILABLE"))

    // retryable code: succeeds on attempt 3 after sleeping the schedule
    var calls = 0
    val slept = scala.collection.mutable.Buffer.empty[Long]
    val got = p.run[Int](
      () => { calls += 1; if (calls < 3) throw new RuntimeException("UNAVAILABLE") else 42 },
      codeOf = _.getMessage, sleep = slept.append(_))
    assert(got == 42 && calls == 3 && slept.toSeq == Seq(100L, 130L))

    // non-retryable code fails immediately
    calls = 0
    intercept[RuntimeException] {
      p.run[Int](() => { calls += 1; throw new RuntimeException("NOT_FOUND") },
        codeOf = _.getMessage, sleep = _ => ())
    }
    assert(calls == 1)

    // attempt cap: maxAttempts total tries, then the last error propagates
    calls = 0
    intercept[RuntimeException] {
      p.run[Int](() => { calls += 1; throw new RuntimeException("UNAVAILABLE") },
        codeOf = _.getMessage, maxAttempts = 4, sleep = _ => ())
    }
    assert(calls == 4)

    // deadline: total backoff is bounded by timeoutMs — 250ms admits
    // 100+130 of sleep and refuses the 169ms third wait
    val tight = p.copy(timeoutMs = Some(250L))
    calls = 0
    val sleptTight = scala.collection.mutable.Buffer.empty[Long]
    intercept[RuntimeException] {
      tight.run[Int](() => { calls += 1; throw new RuntimeException("UNAVAILABLE") },
        codeOf = _.getMessage, maxAttempts = 99, sleep = sleptTight.append(_))
    }
    assert(calls == 3 && sleptTight.toSeq == Seq(100L, 130L))
  }

  test("RetryPolicy: fatal errors propagate immediately — never classified or slept on") {
    // The round-12 ADVICE closure (TableSource.scala:82): the retry loop
    // catches NonFatal ONLY. An InterruptedException (cancellation) or a
    // VirtualMachineError must escape on the FIRST throw even when the
    // classifier would call it retryable — classifying-and-sleeping on a
    // cancellation turns task kills into 60 s hangs.
    val p = RetryPolicy.createReadSession
    var calls = 0
    var sleptAny = false
    intercept[InterruptedException] {
      p.run[Int](
        () => { calls += 1; throw new InterruptedException("UNAVAILABLE") },
        codeOf = _.getMessage, maxAttempts = 99, sleep = _ => sleptAny = true)
    }
    assert(calls == 1 && !sleptAny, "InterruptedException was retried or slept on")
    calls = 0
    intercept[OutOfMemoryError] {
      p.run[Int](
        () => { calls += 1; throw new OutOfMemoryError("UNAVAILABLE") },
        codeOf = _.getMessage, maxAttempts = 99, sleep = _ => sleptAny = true)
    }
    assert(calls == 1 && !sleptAny, "fatal VM error was retried or slept on")
  }
}
