package graft

import org.apache.spark.sql.types._

import graft.sources.TypeMapping
import graft.sources.TypeMapping._

/** The SURVEY §1.3 lossy-corner mapping policy as executable facts
  * (reference type enumeration bigquery_write.go:160-211).
  */
class TypeMappingSpec extends SparkSpec {

  test("scalar mappings and modes follow the documented policy") {
    val schema = toSparkSchema(Seq(
      SourceField("s", SString, Required),
      SourceField("n", SNumeric),
      SourceField("t", STime),
      SourceField("dt", SDatetime),
      SourceField("geo", SGeography),
      SourceField("tags", SString, Repeated),
      SourceField("r", SRange(SDate)),
      SourceField("rec", SRecord(Seq(
        SourceField("a", SInteger, Required),
        SourceField("b", SBigNumeric))))))
    assert(schema("s") == StructField("s", StringType, nullable = false))
    assert(schema("n").dataType == DecimalType(38, 9))
    assert(schema("t").dataType == LongType)
    assert(schema("dt").dataType == TimestampNTZType)
    assert(schema("geo").dataType == StringType)
    assert(schema("tags").dataType == ArrayType(StringType, containsNull = false))
    assert(schema("r").dataType == StructType(Seq(
      StructField("start", DateType), StructField("end", DateType))))
    val rec = schema("rec").dataType.asInstanceOf[StructType]
    assert(rec("a") == StructField("a", LongType, nullable = false))
    assert(rec("b").dataType == StringType) // BIGNUMERIC lossless default
  }

  test("BIGNUMERIC: lossless string by default, documented-lossy decimal opt-in") {
    assert(toSparkField(SourceField("x", SBigNumeric)).dataType == StringType)
    assert(
      toSparkField(SourceField("x", SBigNumeric), Policy(bignumericAsDecimal = true))
        .dataType == DecimalType(38, 19))
  }

  test("TIME codec round-trips micros-since-midnight") {
    assert(timeToMicros("00:00:00") == 0L)
    assert(timeToMicros("12:34:56.789012") == 45296789012L)
    assert(microsToTime(45296789012L) == "12:34:56.789012")
    assert(microsToTime(timeToMicros("23:59:59.999999")) == "23:59:59.999999")
    intercept[IllegalArgumentException](microsToTime(86400000000L))
    // the mapped column type is usable in a real plan
    import spark.implicits._
    val df = Seq("09:30:00", "18:45:15.5").map(TypeMapping.timeToMicros).toDF("t_micros")
    val back = df.orderBy("t_micros").collect().map(_.getLong(0))
    assert(back.sameElements(Array(timeToMicros("09:30:00"), timeToMicros("18:45:15.5"))))
  }
}
