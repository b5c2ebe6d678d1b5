package graft

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.proto.RowCodec

/** Round-trip tests mirroring the reference's proto tests
  * (duck_test.go:192-295: rows → serialized messages → decode → field
  * compare).
  */
class RowCodecSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("score", DoubleType),
    StructField("ok", BooleanType)))

  test("encodeRow round-trips scalar fields through the wire format") {
    val bytes = RowCodec.encodeRow(Row(42L, "Alice", 95.5, true), schema)
    val m = RowCodec.decodeMessage(bytes)
    assert(m(1) == Seq(42L))
    assert(new String(m(2).head.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8) == "Alice")
    assert(m(3) == Seq(95.5))
    assert(m(4) == Seq(1L))
  }

  test("null fields are absent (proto3 semantics)") {
    val bytes = RowCodec.encodeRow(Row(7L, null, 1.0, false), schema)
    val m = RowCodec.decodeMessage(bytes)
    assert(!m.contains(2))
    assert(m(1) == Seq(7L))
  }

  test("repeated (array) fields emit one tagged value per element") {
    val s = StructType(Seq(StructField("xs", ArrayType(LongType))))
    val m = RowCodec.decodeMessage(RowCodec.encodeRow(Row(Seq(1L, 2L, 3L)), s))
    assert(m(1) == Seq(1L, 2L, 3L))
  }

  test("nested structs encode as length-delimited sub-messages") {
    val s = StructType(Seq(
      StructField("id", LongType),
      StructField("inner", StructType(Seq(StructField("v", LongType))))))
    val m = RowCodec.decodeMessage(RowCodec.encodeRow(Row(1L, Row(9L)), s))
    val inner = RowCodec.decodeMessage(m(2).head.asInstanceOf[Array[Byte]])
    assert(inner(1) == Seq(9L))
  }

  test("one message per row, distributed encode matches driver-side encode") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val dist = RowCodec.encode(df).collect().map(_.getAs[Array[Byte]](0))
    val drv = RowCodec.encodeCollect(df)
    assert(dist.length == 3 && drv.length == 3) // 3 rows -> 3 messages (duck_test.go:232)
    assert(dist.map(_.mkString(",")).sorted.sameElements(drv.map(_.mkString(",")).sorted))
  }

  test("file descriptor is itself parseable protobuf with expected fields") {
    val fd = RowCodec.decodeMessage(RowCodec.fileDescriptor(schema))
    assert(new String(fd(2).head.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8) == "graft")
    val msg = RowCodec.decodeMessage(fd(4).head.asInstanceOf[Array[Byte]])
    assert(new String(msg(1).head.asInstanceOf[Array[Byte]], StandardCharsets.UTF_8) == "Row")
    assert(msg(2).size == schema.fields.length) // one FieldDescriptorProto per column
  }
}
