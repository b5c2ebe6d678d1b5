package graft

import org.apache.spark.sql.types._
import org.scalacheck.Gen

import graft.proto.{ArrowInterchange, RowCodec}

/** Property tests for the schema converters (SURVEY §5: round-trip
  * StructType → external schema → StructType over the supported type
  * lattice). Generator-driven sampling (100 random schemas per property).
  */
class SchemaPropertySpec extends SparkSpec {

  private val scalarTypes: Gen[DataType] = Gen.oneOf(
    LongType, IntegerType, ShortType, DoubleType, FloatType,
    StringType, BooleanType, BinaryType, TimestampType, TimestampNTZType,
    DateType)

  private val fieldName: Gen[String] =
    for {
      head <- Gen.alphaChar
      tail <- Gen.listOfN(5, Gen.alphaNumChar)
    } yield (head :: tail).mkString

  private val schemaGen: Gen[StructType] =
    for {
      n <- Gen.choose(1, 8)
      names <- Gen.listOfN(n, fieldName).suchThat(l => l.distinct.size == l.size)
      types <- Gen.listOfN(n, scalarTypes)
    } yield StructType(names.zip(types).map { case (nm, t) => StructField(nm, t) })

  // Nested lattice for the Arrow converter: decimals plus recursive
  // LIST/STRUCT to bounded depth (the reference's read path is fully
  // nested, bigquery_write.go:205-211).
  private val decimalGen: Gen[DataType] =
    for { p <- Gen.choose(1, 38); s <- Gen.choose(0, p) } yield DecimalType(p, s)

  private def typeGen(depth: Int): Gen[DataType] =
    if (depth == 0) Gen.oneOf(scalarTypes, decimalGen)
    else
      Gen.frequency(
        6 -> scalarTypes,
        1 -> decimalGen,
        1 -> Gen.lzy(typeGen(depth - 1).map(t => ArrayType(t))),
        1 -> Gen.lzy(nestedStructGen(depth - 1).map(t => t: DataType)))

  private def nestedStructGen(depth: Int): Gen[StructType] =
    for {
      n <- Gen.choose(1, 4)
      names <- Gen.listOfN(n, fieldName).suchThat(l => l.distinct.size == l.size)
      types <- Gen.listOfN(n, typeGen(depth))
    } yield StructType(names.zip(types).map { case (nm, t) => StructField(nm, t) })

  private def samples(n: Int): Seq[StructType] =
    Iterator.continually(schemaGen.sample).flatten.take(n).toSeq

  test("StructType -> Arrow schema -> StructType is the identity") {
    samples(100).foreach { schema =>
      val arrow = ArrowInterchange.toArrowSchema(schema)
      val back = graft.sources.ArrowIpcSource.roundTripSchema(arrow)
      assert(back == schema, s"round-trip mismatch for ${schema.simpleString}")
    }
  }

  test("nested/decimal StructType -> Arrow schema -> StructType is the identity") {
    Iterator.continually(nestedStructGen(2).sample).flatten.take(100).foreach { schema =>
      val arrow = ArrowInterchange.toArrowSchema(schema)
      val back = graft.sources.ArrowIpcSource.roundTripSchema(arrow)
      assert(back == schema, s"round-trip mismatch for ${schema.simpleString}")
    }
  }

  test("proto descriptor carries one field per column with stable numbering") {
    samples(100).foreach { schema =>
      val fd = RowCodec.decodeMessage(RowCodec.fileDescriptor(schema))
      val msg = RowCodec.decodeMessage(fd(4).head.asInstanceOf[Array[Byte]])
      val fields = msg(2).map(b => RowCodec.decodeMessage(b.asInstanceOf[Array[Byte]]))
      assert(fields.size == schema.fields.length)
      fields.zipWithIndex.foreach { case (f, i) =>
        assert(new String(f(1).head.asInstanceOf[Array[Byte]], "UTF-8") == schema.fields(i).name)
        assert(f(3) == Seq((i + 1).toLong)) // field number = ordinal + 1
      }
    }
  }
}
