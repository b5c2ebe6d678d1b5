package graft

import graft.proto.ArrowInterchange

/** Arrow IPC round-trip (≈ the reference's Arrow-batches-out contract,
  * duck.go:190-206 consumed at duck_test.go:93-97).
  */
class ArrowInterchangeSpec extends SparkSpec {

  test("query → Arrow IPC → decode round-trips values and schema") {
    val df = Tables(spark, sfDir, "supplier")
      .select("s_suppkey", "s_name", "s_acctbal")
      .orderBy("s_suppkey")
      .limit(10)
    val bytes = ArrowInterchange.queryArrow(df)
    val (names, rows) = ArrowInterchange.fromIpcStream(bytes)
    assert(names == Seq("s_suppkey", "s_name", "s_acctbal"))
    val want = df.collect()
    assert(rows.length == want.length)
    rows.zip(want).foreach { case (got, w) =>
      assert(got(0) == w.getLong(0))
      assert(got(1) == w.getString(1))
      assert(got(2) == w.getDouble(2))
    }
  }

  test("small batch size produces multiple record batches, same rows") {
    val df = Tables(spark, sfDir, "nation").select("n_nationkey", "n_name")
    val bytes = ArrowInterchange.toIpcStream(df.collect().iterator, df.schema, batchSize = 7)
    val (_, rows) = ArrowInterchange.fromIpcStream(bytes)
    assert(rows.length == df.count())
  }

  test("queryArrowStream: batch-at-a-time encode with one fetch job per partition") {
    val df = spark.range(0, 100)
      .selectExpr("id", "CAST(id AS STRING) AS s")
      .repartition(4)
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = jobs += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    spark.sparkContext.addSparkListener(listener)
    val n =
      try {
        val n0 = ArrowInterchange.queryArrowStream(df, out, batchSize = 5)
        org.apache.spark.GraftListenerBridge
          .waitUntilListenerBusEmpty(spark.sparkContext, 30000L)
        n0
      } finally spark.sparkContext.removeSparkListener(listener)
    // toLocalIterator fetches ONE partition per job — the O(one partition
    // + one batch) driver-memory contract. A collect-based encode (the
    // queryArrow twin) is a single job; seeing >= 4 result-fetch jobs
    // proves the full result was never resident at once.
    assert(jobs >= 4, s"expected >= 4 partition-fetch jobs, saw $jobs")
    assert(n == 100L)
    val bytes = out.toByteArray
    val (names, rows) = ArrowInterchange.fromIpcStream(bytes)
    assert(names == Seq("id", "s"))
    assert(rows.length == 100)
    // Same row multiset as the collecting twin (partition order may differ)
    val viaCollect =
      ArrowInterchange.fromIpcStream(ArrowInterchange.queryArrow(df))._2
    assert(rows.toSet == viaCollect.toSet)
    // And the stream really is batched: 100 rows at batchSize=5 must have
    // been written as many record batches, not one materialized batch.
    val alloc = new org.apache.arrow.memory.RootAllocator()
    val rdr = new org.apache.arrow.vector.ipc.ArrowStreamReader(
      new java.io.ByteArrayInputStream(bytes), alloc)
    var batches = 0
    try { while (rdr.loadNextBatch()) batches += 1 }
    finally { rdr.close(); alloc.close() }
    assert(batches >= 20, s"expected >= 20 record batches, saw $batches")
  }

  test("distributed encodePartitions yields one stream per partition covering all rows") {
    val df = Tables(spark, sfDir, "supplier").repartition(3)
    val streams = ArrowInterchange.encodePartitions(df).collect().map(_.getAs[Array[Byte]](0))
    assert(streams.length == 3)
    val total = streams.map(b => ArrowInterchange.fromIpcStream(b)._2.length).sum
    assert(total == df.count())
  }

  test("non-ASCII strings and binary survive both codec round trips") {
    import spark.implicits._
    import graft.proto.RowCodec
    val s = "héllo 世界 🙂 ımñ"
    val df = Seq((1L, s)).toDF("id", "s")
    // Arrow IPC
    val (_, rows) = ArrowInterchange.fromIpcStream(ArrowInterchange.queryArrow(df))
    assert(rows.head(1) == s)
    // protobuf wire
    val m = RowCodec.decodeMessage(RowCodec.encodeRow(df.head(), df.schema))
    assert(new String(m(2).head.asInstanceOf[Array[Byte]], "UTF-8") == s)
  }

  test("nulls and timestamps survive the round trip") {
    import spark.implicits._
    val df = Seq(
      (1L, Some("a"), Some("2024-03-01 10:30:00")),
      (2L, None, None)).toDF("id", "s", "ts_s")
      .selectExpr("id", "s", "CAST(ts_s AS TIMESTAMP) AS ts")
    val (_, rows) = ArrowInterchange.fromIpcStream(ArrowInterchange.queryArrow(df))
    assert(rows(0)(1) == "a" && rows(1)(1) == null)
    assert(rows(1)(2) == null && rows(0)(2) != null)
  }
}
