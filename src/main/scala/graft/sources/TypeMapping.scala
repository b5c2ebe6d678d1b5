package graft.sources

import org.apache.spark.sql.types._

/** Source-type → Spark-type mapping policy for the full BigQuery-style type
  * enumeration the reference's schema converter handles
  * (bigquery_write.go:160-193, modes :196-202, recursion :205-211) —
  * SURVEY §1.3/§7.3 asked for the lossy corners (TIME / GEOGRAPHY / RANGE /
  * BIGNUMERIC) to be an explicit, tested policy rather than prose:
  *
  *   - NUMERIC → DecimalType(38, 9) (exact; BigQuery NUMERIC is (38, 9)).
  *   - BIGNUMERIC is (76, 38); Spark decimals cap at precision 38, so the
  *     DEFAULT mapping is lossless-as-string (plain decimal text). The
  *     opt-in `Policy(bignumericAsDecimal = true)` maps to
  *     DecimalType(38, 19) and is documented LOSSY (drops 38 integer and
  *     19 fractional digits of headroom).
  *   - TIME has no Spark type → LongType micros-since-midnight
  *     ([[TypeMapping.timeToMicros]] / [[TypeMapping.microsToTime]] are the
  *     value codecs).
  *   - DATETIME (no zone) → TimestampNTZType.
  *   - GEOGRAPHY → StringType carrying WKT.
  *   - RANGE<T> → StructType(start T, end T), both nullable (unbounded
  *     ends are NULL — BigQuery range semantics).
  *   - JSON → StringType (query via from_json/get_json_object; VariantType
  *     is the Spark-4 alternative, not the default here).
  *   - mode REPEATED → ArrayType(elem, containsNull = false); REQUIRED →
  *     nullable = false; NULLABLE → nullable = true.
  */
object TypeMapping {

  sealed trait SourceType
  case object SString extends SourceType
  case object SBytes extends SourceType
  case object SInteger extends SourceType
  case object SFloat extends SourceType
  case object SBool extends SourceType
  case object STimestamp extends SourceType
  case object SDate extends SourceType
  case object STime extends SourceType
  case object SDatetime extends SourceType
  case object SNumeric extends SourceType
  case object SBigNumeric extends SourceType
  case object SGeography extends SourceType
  case object SJson extends SourceType
  final case class SRange(element: SourceType) extends SourceType
  final case class SRecord(fields: Seq[SourceField]) extends SourceType

  sealed trait Mode
  case object Nullable extends Mode
  case object Required extends Mode
  case object Repeated extends Mode

  final case class SourceField(name: String, tpe: SourceType, mode: Mode = Nullable)

  final case class Policy(bignumericAsDecimal: Boolean = false)

  def toSparkSchema(fields: Seq[SourceField], policy: Policy = Policy()): StructType =
    StructType(fields.map(f => toSparkField(f, policy)))

  def toSparkField(f: SourceField, policy: Policy = Policy()): StructField = {
    val elem = scalarType(f.tpe, policy)
    f.mode match {
      case Repeated =>
        StructField(f.name, ArrayType(elem, containsNull = false), nullable = true)
      case Required => StructField(f.name, elem, nullable = false)
      case Nullable => StructField(f.name, elem, nullable = true)
    }
  }

  private def scalarType(t: SourceType, policy: Policy): DataType = t match {
    case SString => StringType
    case SBytes => BinaryType
    case SInteger => LongType
    case SFloat => DoubleType
    case SBool => BooleanType
    case STimestamp => TimestampType
    case SDate => DateType
    case STime => LongType // micros since midnight; see timeToMicros
    case SDatetime => TimestampNTZType
    case SNumeric => DecimalType(38, 9)
    case SBigNumeric =>
      if (policy.bignumericAsDecimal) DecimalType(38, 19) // documented LOSSY
      else StringType // lossless decimal text (default)
    case SGeography => StringType // WKT
    case SJson => StringType
    case SRange(el) =>
      StructType(Seq(
        StructField("start", scalarType(el, policy), nullable = true),
        StructField("end", scalarType(el, policy), nullable = true)))
    case SRecord(fields) => toSparkSchema(fields, policy)
  }

  /** TIME value codec: "HH:MM:SS[.ffffff]" ↔ micros since midnight. */
  def timeToMicros(time: String): Long = {
    val t = java.time.LocalTime.parse(time)
    t.toNanoOfDay / 1000L
  }

  def microsToTime(micros: Long): String = {
    require(micros >= 0 && micros < 86400000000L, s"out of day range: $micros")
    java.time.LocalTime.ofNanoOfDay(micros * 1000L)
      .format(java.time.format.DateTimeFormatter.ISO_LOCAL_TIME)
  }
}
