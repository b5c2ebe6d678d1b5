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
