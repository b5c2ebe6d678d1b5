package graft

import java.util.UUID

import org.apache.spark.sql.types._

import graft.engine.Engine
import graft.proto.RowCodec
import graft.sinks.{ManagedWriter, StreamType}

/** The reference's own test fixtures reproduced verbatim (FIXTURES.md §1)
  * for behavioral parity.
  */
class ReferenceFixturesSpec extends SparkSpec {

  test("people: CREATE/INSERT/SELECT golden rows (duck_test.go:54-130)") {
    val eng = new Engine(spark)
    eng.exec("CREATE OR REPLACE TEMP VIEW people AS SELECT * FROM VALUES " +
      "(1,'Alice',95.5),(2,'Bob',87.2),(3,'Eve',78.9) AS t(id,name,score)")
    val rows = eng.query("SELECT id, name, CAST(score AS DOUBLE) AS score " +
      "FROM people ORDER BY id").collect()
    assert(rows.length == 3 && rows.head.length == 3) // 3 rows, 3 cols
    assert(rows(0).getInt(0) == 1 && rows(0).getString(1) == "Alice")
    assert(math.abs(rows(0).getDouble(2) - 95.5) < 0.001) // InDelta, duck_test.go:123
    assert(rows(1).getString(1) == "Bob" && math.abs(rows(1).getDouble(2) - 87.2) < 0.001)
  }

  test("people: proto round-trip with LIMIT 1 (duck_test.go:192-295)") {
    val eng = new Engine(spark)
    eng.exec("CREATE OR REPLACE TEMP VIEW people2 AS SELECT * FROM VALUES " +
      "(1,'Alice',95.5),(2,'Bob',87.2),(3,'Eve',78.9) AS t(id,name,score)")
    val (descriptor, messages, n) = eng.queryProto(
      "SELECT id, name, CAST(score AS DOUBLE) AS score FROM people2 ORDER BY id LIMIT 1")
    assert(n == 1 && messages.length == 1) // one row -> one message
    assert(descriptor.nonEmpty)
    val m = RowCodec.decodeMessage(messages(0))
    assert(m(1) == Seq(1L))
    assert(new String(m(2).head.asInstanceOf[Array[Byte]], "UTF-8") == "Alice")
    assert(m(3) == Seq(95.5))
  }

  test("people: wrapper-types proto round-trip unwraps to golden values " +
      "(duck_test.go:217-267, arrowpb ConvertConfig UseWrapperTypes)") {
    val eng = new Engine(spark)
    eng.exec("CREATE OR REPLACE TEMP VIEW people3 AS SELECT * FROM VALUES " +
      "(1,'Alice',95.5),(2,'Bob',87.2),(3,'Eve',78.9) AS t(id,name,score)")
    val (descriptor, messages, n) = eng.queryProto(
      "SELECT id, name, CAST(score AS DOUBLE) AS score, " +
        "TIMESTAMP '2024-03-01 12:34:56.789' AS created " +
        "FROM people3 ORDER BY id LIMIT 1",
      graft.proto.CodecConfig(useWrapperTypes = true))
    assert(n == 1 && messages.length == 1)
    // descriptor declares the well-known dependencies and message-typed fields
    val fd = RowCodec.decodeMessage(descriptor)
    val deps = fd(3).map(b => new String(b.asInstanceOf[Array[Byte]], "UTF-8"))
    assert(deps.contains("google/protobuf/wrappers.proto"), deps)
    assert(deps.contains("google/protobuf/timestamp.proto"), deps)
    val msg = RowCodec.decodeMessage(fd(4).head.asInstanceOf[Array[Byte]])
    val fields = msg(2).map(b => RowCodec.decodeMessage(b.asInstanceOf[Array[Byte]]))
    val typeNames = fields.map(f => new String(f(6).head.asInstanceOf[Array[Byte]], "UTF-8"))
    assert(typeNames == Seq(
      ".google.protobuf.Int64Value", ".google.protobuf.StringValue",
      ".google.protobuf.DoubleValue", ".google.protobuf.Timestamp"))
    assert(fields.forall(_(5) == Seq(11L))) // every field TYPE_MESSAGE
    // every field arrives as a wrapper sub-message; unwrap field 1 (value)
    val m = RowCodec.decodeMessage(messages(0))
    val idWrap = RowCodec.decodeMessage(m(1).head.asInstanceOf[Array[Byte]])
    assert(idWrap(1) == Seq(1L))
    val nameWrap = RowCodec.decodeMessage(m(2).head.asInstanceOf[Array[Byte]])
    assert(new String(nameWrap(1).head.asInstanceOf[Array[Byte]], "UTF-8") == "Alice")
    val scoreWrap = RowCodec.decodeMessage(m(3).head.asInstanceOf[Array[Byte]])
    assert(scoreWrap(1) == Seq(95.5))
    // Timestamp: seconds + nanos reassemble to the literal's micros
    val tsWrap = RowCodec.decodeMessage(m(4).head.asInstanceOf[Array[Byte]])
    val micros = tsWrap(1).head.asInstanceOf[Long] * 1000000L +
      tsWrap(2).head.asInstanceOf[Long] / 1000L
    assert(micros == java.time.Instant.parse("2024-03-01T12:34:56.789Z")
      .toEpochMilli * 1000L)
  }

  test("users: create-then-append ingest doubles to 4 rows (duck_test.go:132-190)") {
    import spark.implicits._
    val eng = new Engine(spark)
    val users = Seq((10L, "Kiki"), (11L, "Lala")).toDF("uid", "uname")
    val t = s"users_${UUID.randomUUID().toString.replace("-", "")}"
    eng.ingestCreateAppend(users, t) // create
    eng.ingestCreateAppend(users, t) // append
    val got = spark.table(t).orderBy("uid", "uname").collect()
    assert(got.length == 4) // duck_test.go:189
    assert(got.map(_.getString(1)).toSeq == Seq("Kiki", "Kiki", "Lala", "Lala"))
    eng.exec(s"DROP TABLE $t")
  }

  test("write-path: single nullable string column, one 'Alice' row " +
    "(bigquery_write_integration_test.go:41-52)") {
    import spark.implicits._
    val df = Seq("Alice").toDF("i")
    val dest = s"${System.getProperty("java.io.tmpdir")}/graft-ref-${UUID.randomUUID().toString.take(8)}"
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Committed)
    assert(w.write(df) == 1L)
    val back = spark.read.parquet(dest).collect()
    assert(back.length == 1 && back(0).getString(0) == "Alice")
    // schema guard: mismatched record rejected (bigquery_write.go:422-424)
    assertThrows[IllegalArgumentException] {
      w.write(Seq((1, "x")).toDF("a", "b"))
    }
  }

  test("nation read to EOF and supplier read->ingest->select (bigquery_test.go)") {
    val eng = new Engine(spark)
    val src = new graft.sources.ParquetTableSource(sfDir)
    // nation, MaxStreamCount=1 (bigquery_test.go:23-26): full drain
    val nation = src.read(spark, "nation",
      graft.sources.ScanOptions(maxStreamCount = Some(1)))
    assert(nation.count() == 25)
    // supplier -> ingest -> SELECT * (bigquery_test.go:63-87)
    val t = s"supp_${UUID.randomUUID().toString.replace("-", "")}"
    val n = eng.ingestCreateAppend(src.read(spark, "supplier"), t)
    assert(eng.query(s"SELECT * FROM $t").count() == n)
    eng.exec(s"DROP TABLE $t")
  }
}
