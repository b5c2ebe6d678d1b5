package graft.proto

import java.io.ByteArrayOutputStream
import java.nio.channels.Channels
import java.nio.charset.StandardCharsets

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.{DateUnit, FloatingPointPrecision, TimeUnit}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field, FieldType, Schema => ArrowSchema}
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Arrow IPC interchange for query results — the Spark twin of the
  * reference's Arrow-everywhere surface: `Query` returns Arrow record
  * batches (duck.go:190-206) and the write path serializes records to
  * Arrow IPC (bigquery_write.go:426-440). Spark's internal format is
  * Tungsten rows, so parity is provided at the API boundary: a
  * `DataFrame` → Arrow IPC stream encoder (and a decoder for round-trip
  * tests), built on the arrow-vector public API shipped with Spark.
  *
  * Scale note: `toIpcStream` is driver-side (API parity with the
  * reference's in-process RecordReader loop, bigquack.go:99-133);
  * `encodePartitions` keeps the conversion distributed — one IPC stream
  * per partition, no driver materialization.
  */
object ArrowInterchange {

  /** Recursive StructType → Arrow schema: nested STRUCT/LIST and DECIMAL
    * covered to match the reference's fully-recursive read path
    * (bigquery_write.go:205-211; type enumeration :160-193) — round 2
    * shipped flat scalars only while the sibling RowCodec already nested.
    */
  def toArrowSchema(schema: StructType): ArrowSchema =
    new ArrowSchema(
      schema.fields.map(f => toArrowField(f.name, f.dataType)).toSeq.asJava)

  private def toArrowField(name: String, dt: DataType): Field = dt match {
    case ArrayType(elem, _) =>
      new Field(
        name,
        FieldType.nullable(ArrowType.List.INSTANCE),
        Seq(toArrowField("element", elem)).asJava)
    case StructType(fields) =>
      new Field(
        name,
        FieldType.nullable(ArrowType.Struct.INSTANCE),
        fields.map(f => toArrowField(f.name, f.dataType)).toSeq.asJava)
    case d: DecimalType =>
      new Field(
        name,
        FieldType.nullable(new ArrowType.Decimal(d.precision, d.scale, 128)),
        null)
    case scalar =>
      val t: ArrowType = scalar match {
        case LongType => new ArrowType.Int(64, true)
        case IntegerType => new ArrowType.Int(32, true)
        case ShortType => new ArrowType.Int(16, true)
        case DoubleType => new ArrowType.FloatingPoint(FloatingPointPrecision.DOUBLE)
        case FloatType => new ArrowType.FloatingPoint(FloatingPointPrecision.SINGLE)
        case StringType => ArrowType.Utf8.INSTANCE
        case BooleanType => ArrowType.Bool.INSTANCE
        case BinaryType => ArrowType.Binary.INSTANCE
        case TimestampType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, "UTC")
        // zone-less DATETIME (the reference's DATETIME; TypeMapping §1.3)
        case TimestampNTZType => new ArrowType.Timestamp(TimeUnit.MICROSECOND, null)
        case DateType => new ArrowType.Date(DateUnit.DAY)
        case other => throw new IllegalArgumentException(s"unsupported type $other")
      }
      new Field(name, FieldType.nullable(t), null)
  }

  /** External (Row-API) value → Arrow slot, recursing through LIST/STRUCT. */
  private def setValue(vec: FieldVector, i: Int, dt: DataType, v: Any): Unit = (vec, dt) match {
    case (x: BigIntVector, LongType) => x.setSafe(i, v.asInstanceOf[Long])
    case (x: IntVector, IntegerType) => x.setSafe(i, v.asInstanceOf[Int])
    case (x: SmallIntVector, ShortType) => x.setSafe(i, v.asInstanceOf[Short])
    case (x: Float8Vector, DoubleType) => x.setSafe(i, v.asInstanceOf[Double])
    case (x: Float4Vector, FloatType) => x.setSafe(i, v.asInstanceOf[Float])
    case (x: VarCharVector, StringType) =>
      x.setSafe(i, v.asInstanceOf[String].getBytes(StandardCharsets.UTF_8))
    case (x: BitVector, BooleanType) => x.setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
    case (x: VarBinaryVector, BinaryType) => x.setSafe(i, v.asInstanceOf[Array[Byte]])
    case (x: TimeStampMicroTZVector, TimestampType) =>
      val ts = v.asInstanceOf[java.sql.Timestamp]
      x.setSafe(i, ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L)
    case (x: TimeStampMicroVector, TimestampNTZType) =>
      val ldt = v.asInstanceOf[java.time.LocalDateTime]
      x.setSafe(
        i,
        ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L)
    case (x: DateDayVector, DateType) =>
      x.setSafe(i, v.asInstanceOf[java.sql.Date].toLocalDate.toEpochDay.toInt)
    case (x: DecimalVector, d: DecimalType) =>
      val bd = v match {
        case b: java.math.BigDecimal => b
        case b: scala.math.BigDecimal => b.bigDecimal
        case other => throw new IllegalArgumentException(s"not a decimal: $other")
      }
      x.setSafe(i, bd.setScale(d.scale))
    case (x: org.apache.arrow.vector.complex.ListVector, ArrayType(et, _)) =>
      val elems: scala.collection.Seq[Any] = v match {
        case s: scala.collection.Seq[_] => s // incl. mutable.ArraySeq from Row
        case a: Array[_] => a.toSeq
        case l: java.util.List[_] => l.asScala
        case other => throw new IllegalArgumentException(s"not an array value: $other")
      }
      val start = x.startNewValue(i)
      val dv = x.getDataVector.asInstanceOf[FieldVector]
      elems.zipWithIndex.foreach { case (e, k) =>
        if (e == null) dv.setNull(start + k) else setValue(dv, start + k, et, e)
      }
      x.endValue(i, elems.size)
    case (x: org.apache.arrow.vector.complex.StructVector, st: StructType) =>
      val row = v.asInstanceOf[Row]
      x.setIndexDefined(i)
      st.fields.zipWithIndex.foreach { case (f, k) =>
        val child = x.getChildByOrdinal(k).asInstanceOf[FieldVector]
        val cv = row.get(k)
        if (cv == null) child.setNull(i) else setValue(child, i, f.dataType, cv)
      }
    case (other, t) => throw new IllegalArgumentException(s"unsupported ($other, $t)")
  }

  /** Encode rows as one Arrow IPC stream (schema message + record batches
    * of `batchSize` rows — the reference's batch-at-a-time granularity,
    * bigquack.go:113-132).
    */
  def toIpcStream(rows: Iterator[Row], schema: StructType, batchSize: Int = 4096): Array[Byte] = {
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(toArrowSchema(schema), allocator)
    val out = new ByteArrayOutputStream()
    val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
    try {
      writer.start()
      writeBatches(rows, schema, root, writer, batchSize)
      writer.end()
      out.toByteArray
    } finally {
      writer.close()
      root.close()
      allocator.close()
    }
  }

  /** Shared batch-encode loop: fill `root` with up to `batchSize` rows at
    * a time and write each batch immediately, so the only resident Arrow
    * state is one batch regardless of result size. Returns rows written.
    */
  private def writeBatches(
      rows: Iterator[Row],
      schema: StructType,
      root: VectorSchemaRoot,
      writer: ArrowStreamWriter,
      batchSize: Int): Long = {
    var written = 0L
    rows.grouped(batchSize).foreach { batch =>
      root.allocateNew()
      batch.zipWithIndex.foreach { case (row, i) =>
        schema.fields.zipWithIndex.foreach { case (f, j) =>
          val vec = root.getVector(j)
          val v = row.get(j)
          if (v == null) vec.setNull(i) else setValue(vec, i, f.dataType, v)
        }
      }
      root.setRowCount(batch.size)
      writer.writeBatch()
      written += batch.size
    }
    written
  }

  /** Driver-side query → Arrow IPC (≈ Query + consumer loop,
    * duck_test.go:93-97). Tests / small results only — materializes the
    * whole result; use [[queryArrowStream]] for large results.
    */
  def queryArrow(df: DataFrame): Array[Byte] =
    toIpcStream(df.collect().iterator, df.schema)

  /** STREAMING driver-side query → Arrow IPC: the shape of the
    * reference's `Query`, which hands back an ITERATING RecordReader the
    * caller drains batch by batch (duck.go:190-206) rather than a
    * materialized result. Rows are pulled through `toLocalIterator` —
    * Spark fetches one partition at a time, running one job per
    * partition — and encoded straight into `out` per `batchSize` group,
    * so driver memory is O(one partition + one Arrow batch) at any
    * result size (the [[queryArrow]] twin collects everything first).
    * Returns the number of rows written. The caller owns `out`.
    */
  def queryArrowStream(
      df: DataFrame,
      out: java.io.OutputStream,
      batchSize: Int = 4096): Long = {
    val schema = df.schema
    val allocator = new RootAllocator()
    val root = VectorSchemaRoot.create(toArrowSchema(schema), allocator)
    val writer = new ArrowStreamWriter(root, null, Channels.newChannel(out))
    try {
      writer.start()
      val n = writeBatches(df.toLocalIterator().asScala, schema, root, writer, batchSize)
      writer.end()
      n
    } finally {
      writer.close()
      root.close()
      allocator.close()
    }
  }

  /** Distributed encode: one IPC stream per partition (binary column). */
  def encodePartitions(df: DataFrame, batchSize: Int = 4096): DataFrame = {
    val schema = df.schema
    val spark = df.sparkSession
    import spark.implicits._
    df.mapPartitions(it => Iterator.single(toIpcStream(it, schema, batchSize)))(
        org.apache.spark.sql.Encoders.BINARY)
      .toDF("arrow_ipc")
  }

  /** Materialize a DataFrame as a directory of Arrow IPC stream files
    * (one per partition) — the fixture side of the
    * [[graft.sources.ArrowIpcSource]] DSv2 read path. Driver-side writer
    * (test/fixture harness); the scale-relevant half is the distributed
    * DSv2 scan that reads these files back.
    */
  def writeIpcDir(df: DataFrame, dir: String, batchSize: Int = 4096): Unit = {
    val parts = encodePartitions(df, batchSize).collect()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
    parts.zipWithIndex.foreach { case (r, i) =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir, f"part-$i%05d.arrow"),
        r.getAs[Array[Byte]](0))
    }
  }

  /** Decode an IPC stream back to (columnNames, rows) for round-trip
    * tests. Values come back as Arrow java objects (Long/Int/Double/Text…).
    */
  def fromIpcStream(bytes: Array[Byte]): (Seq[String], Seq[Seq[Any]]) = {
    val allocator = new RootAllocator()
    val reader = new ArrowStreamReader(new java.io.ByteArrayInputStream(bytes), allocator)
    try {
      val root = reader.getVectorSchemaRoot
      val names = root.getSchema.getFields.asScala.map(_.getName).toSeq
      val rows = scala.collection.mutable.ArrayBuffer.empty[Seq[Any]]
      while (reader.loadNextBatch()) {
        (0 until root.getRowCount).foreach { i =>
          rows += root.getFieldVectors.asScala.map { v =>
            val o = v.getObject(i)
            o match {
              case t: org.apache.arrow.vector.util.Text => t.toString
              case other => other
            }
          }.toSeq
        }
      }
      (names, rows.toSeq)
    } finally {
      reader.close()
      allocator.close()
    }
  }
}
