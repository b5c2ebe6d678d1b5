package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.arrow.memory.RootAllocator
import org.apache.arrow.vector._
import org.apache.arrow.vector.ipc.{ArrowStreamReader, ArrowStreamWriter}
import org.apache.arrow.vector.types.pojo.{ArrowType, Field => ArrowField}
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.SerializableConfiguration

/** DataSource V2 connector over directories of Arrow IPC stream files —
  * the faithful Spark-native re-architecture of the reference's
  * partitioned Arrow scan (SURVEY §2 A2-A5):
  *
  *   - schema comes from the stream's own schema message (≈ the session's
  *     serialized Arrow schema, bigquery.go:105-115);
  *   - one `InputPartition` per file ≈ one read stream; Spark schedules
  *     ALL partitions across executors — fixing the reference's
  *     consume-only-streams[0] bug (bigquery.go:191) by construction;
  *   - each partition reader drains IPC record batches row-by-row
  *     (≈ `Read()` + `processRecordBatch`, bigquery.go:152-239);
  *   - `SupportsPushDownRequiredColumns` prunes the projected columns at
  *     the source (≈ SelectedFields, A6) — only required vectors are
  *     converted (IPC batches are monolithic on disk, so the saving is
  *     decode-side, stated honestly).
  *
  * Usage: `spark.read.format("graft.sources.ArrowIpcSource").load(dir)`.
  */
class ArrowIpcSource extends TableProvider {

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val files = ArrowIpcSource.listFiles(options.get("path"))
    // Empty (write-target) directories have no stream to infer from; the
    // write path supplies the query schema via getTable.
    if (files.isEmpty) new StructType()
    else ArrowIpcSource.readSchema(files.head)
  }

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ArrowIpcTable(schema, properties.get("path"))

  override def supportsExternalMetadata(): Boolean = true
}

object ArrowIpcSource {

  private[sources] def listFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val fs = FileSystem.get(
      p.toUri, SparkSession.active.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) Seq.empty
    else
      fs.listStatus(p)
        .filter(s => s.isFile && s.getPath.getName.endsWith(".arrow"))
        .map(_.getPath.toString)
        .sorted
        .toSeq
  }

  private[sources] def readSchema(file: String): StructType = {
    val allocator = new RootAllocator()
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, SparkSession.active.sparkContext.hadoopConfiguration)
    val in = fs.open(p)
    try {
      val reader = new ArrowStreamReader(in, allocator)
      roundTripSchema(reader.getVectorSchemaRoot.getSchema)
    } finally {
      in.close()
      allocator.close()
    }
  }

  /** Arrow schema → StructType (public for the converter property tests). */
  def roundTripSchema(s: org.apache.arrow.vector.types.pojo.Schema): StructType =
    StructType(s.getFields.asScala.map(toSparkField).toSeq)

  /** The session's Hadoop conf, serializable for task closures — executor
    * readers/writers previously built bare `new Configuration()`s, losing
    * every spark.hadoop.* setting (S3/GCS credentials, custom fs impls) in
    * tasks while the driver planned fine (round-2 ADVICE).
    */
  private[sources] def sessionConf(): SerializableConfiguration =
    new SerializableConfiguration(
      SparkSession.active.sessionState.newHadoopConf())

  /** Arrow field → Spark field, recursing through LIST/STRUCT (the
    * reference's read path is fully nested, bigquery_write.go:205-211).
    */
  private[sources] def toSparkField(f: ArrowField): StructField = {
    val dt: DataType = f.getType match {
      case t: ArrowType.Int if t.getBitWidth == 64 => LongType
      case t: ArrowType.Int if t.getBitWidth == 32 => IntegerType
      case t: ArrowType.Int if t.getBitWidth == 16 => ShortType
      case t: ArrowType.FloatingPoint
          if t.getPrecision == org.apache.arrow.vector.types.FloatingPointPrecision.DOUBLE =>
        DoubleType
      case _: ArrowType.FloatingPoint => FloatType
      case _: ArrowType.Utf8 => StringType
      case _: ArrowType.Bool => BooleanType
      case _: ArrowType.Binary => BinaryType
      case t: ArrowType.Timestamp if t.getTimezone == null => TimestampNTZType
      case _: ArrowType.Timestamp => TimestampType
      case _: ArrowType.Date => DateType
      case t: ArrowType.Decimal => DecimalType(t.getPrecision, t.getScale)
      case _: ArrowType.List =>
        ArrayType(toSparkField(f.getChildren.get(0)).dataType)
      case _: ArrowType.Struct =>
        StructType(f.getChildren.asScala.map(toSparkField).toSeq)
      case other => throw new IllegalArgumentException(s"unsupported arrow type $other")
    }
    StructField(f.getName, dt)
  }

  /** Catalyst internal value → Arrow vector slot (write path). */
  private[sources] def setFromCatalyst(
      vec: FieldVector, i: Int, dt: DataType, row: InternalRow, ord: Int): Unit =
    setCatalyst(vec, i, dt, row.get(ord, dt))

  /** Recursive Catalyst-internal-value writer (LIST/STRUCT/DECIMAL aware). */
  private[sources] def setCatalyst(vec: FieldVector, i: Int, dt: DataType, v: Any): Unit =
    (vec, dt) match {
      case (x: BigIntVector, LongType) => x.setSafe(i, v.asInstanceOf[Long])
      case (x: IntVector, IntegerType) => x.setSafe(i, v.asInstanceOf[Int])
      case (x: SmallIntVector, ShortType) => x.setSafe(i, v.asInstanceOf[Short])
      case (x: Float8Vector, DoubleType) => x.setSafe(i, v.asInstanceOf[Double])
      case (x: Float4Vector, FloatType) => x.setSafe(i, v.asInstanceOf[Float])
      case (x: VarCharVector, StringType) => x.setSafe(i, v.asInstanceOf[UTF8String].getBytes)
      case (x: BitVector, BooleanType) => x.setSafe(i, if (v.asInstanceOf[Boolean]) 1 else 0)
      case (x: VarBinaryVector, BinaryType) => x.setSafe(i, v.asInstanceOf[Array[Byte]])
      case (x: TimeStampMicroTZVector, TimestampType) => x.setSafe(i, v.asInstanceOf[Long])
      case (x: TimeStampMicroVector, TimestampNTZType) => x.setSafe(i, v.asInstanceOf[Long])
      case (x: DateDayVector, DateType) => x.setSafe(i, v.asInstanceOf[Int])
      case (x: DecimalVector, d: DecimalType) =>
        x.setSafe(
          i,
          v.asInstanceOf[org.apache.spark.sql.types.Decimal]
            .toJavaBigDecimal.setScale(d.scale))
      case (x: org.apache.arrow.vector.complex.ListVector, ArrayType(et, _)) =>
        val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        val start = x.startNewValue(i)
        val dv = x.getDataVector.asInstanceOf[FieldVector]
        var k = 0
        while (k < arr.numElements()) {
          if (arr.isNullAt(k)) dv.setNull(start + k)
          else setCatalyst(dv, start + k, et, arr.get(k, et))
          k += 1
        }
        x.endValue(i, arr.numElements())
      case (x: org.apache.arrow.vector.complex.StructVector, st: StructType) =>
        val r = v.asInstanceOf[InternalRow]
        x.setIndexDefined(i)
        var k = 0
        while (k < st.fields.length) {
          val child = x.getChildByOrdinal(k).asInstanceOf[FieldVector]
          if (r.isNullAt(k)) child.setNull(i)
          else setCatalyst(child, i, st.fields(k).dataType, r.get(k, st.fields(k).dataType))
          k += 1
        }
      case (other, t) => throw new IllegalArgumentException(s"unsupported write ($other, $t)")
    }

  /** Arrow vector value → Catalyst internal value (recursive). */
  private[sources] def catalystValue(vec: FieldVector, i: Int): Any =
    if (vec.isNull(i)) null
    else
      vec match {
        case v: BigIntVector => v.get(i)
        case v: IntVector => v.get(i)
        case v: SmallIntVector => v.get(i)
        case v: Float8Vector => v.get(i)
        case v: Float4Vector => v.get(i)
        case v: VarCharVector => UTF8String.fromBytes(v.get(i))
        case v: BitVector => v.get(i) == 1
        case v: VarBinaryVector => v.get(i)
        case v: TimeStampMicroTZVector => v.get(i) // micros == catalyst timestamp
        case v: TimeStampMicroVector => v.get(i)
        case v: DateDayVector => v.get(i) // days == catalyst date
        case v: DecimalVector =>
          org.apache.spark.sql.types.Decimal(v.getObject(i))
        case v: org.apache.arrow.vector.complex.ListVector =>
          val start = v.getElementStartIndex(i)
          val end = v.getElementEndIndex(i)
          val dv = v.getDataVector.asInstanceOf[FieldVector]
          new org.apache.spark.sql.catalyst.util.GenericArrayData(
            Array.tabulate[Any](end - start)(k => catalystValue(dv, start + k)))
        case v: org.apache.arrow.vector.complex.StructVector =>
          new GenericInternalRow(
            v.getChildrenFromFields.asScala.map(c => catalystValue(c, i)).toArray)
        case other => throw new IllegalArgumentException(s"unsupported vector $other")
      }
}

private class ArrowIpcTable(schema: StructType, path: String)
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"arrow-ipc:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ArrowIpcScanBuilder(schema, path)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new ArrowIpcWriteBuilder(info.schema(), path, info.queryId())
}

private class ArrowIpcScanBuilder(fullSchema: StructType, path: String)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema

  override def pruneColumns(requiredSchema: StructType): Unit =
    // preserve file column order for stable vector lookup
    required = StructType(
      fullSchema.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan = new ArrowIpcScan(fullSchema, required, path)
}

private class ArrowIpcScan(fullSchema: StructType, required: StructType, path: String)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def description(): String = s"ArrowIpcScan($path, cols=${required.fieldNames.mkString(",")})"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] =
    ArrowIpcSource.listFiles(path).map(f => ArrowIpcInputPartition(f)).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ArrowIpcReaderFactory(required, ArrowIpcSource.sessionConf())
}

private case class ArrowIpcInputPartition(file: String) extends InputPartition

private class ArrowIpcReaderFactory(
    required: StructType,
    conf: SerializableConfiguration)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new ArrowIpcPartitionReader(
      partition.asInstanceOf[ArrowIpcInputPartition].file, required, conf)
}

/** Drains one IPC file: batch-at-a-time, row-at-a-time within a batch —
  * the `Read()`/EOF protocol of bigquery.go:152-182 in DSv2 clothing.
  */
private class ArrowIpcPartitionReader(
    file: String,
    required: StructType,
    conf: SerializableConfiguration)
    extends PartitionReader[InternalRow] {

  private val allocator = new RootAllocator()
  private val in = {
    val p = new Path(file)
    val fs = FileSystem.get(p.toUri, conf.value)
    fs.open(p)
  }
  private val reader = new ArrowStreamReader(in, allocator)
  private val root = reader.getVectorSchemaRoot
  // Required-column ordinals resolved BY NAME against this file's own
  // stream schema (files in a directory may order — or miss — columns
  // differently; positional lookup against the first file's schema
  // silently transposed values, round-2 ADVICE). Missing fields and
  // Arrow-type drift fail fast with the file named.
  private val ordinals = {
    val fileFields = root.getSchema.getFields.asScala.toSeq
    required.fields.map { f =>
      val idx = fileFields.indexWhere(_.getName == f.name)
      if (idx < 0) {
        throw new IllegalArgumentException(
          s"arrow-ipc: column '${f.name}' missing in $file " +
            s"(file has: ${fileFields.map(_.getName).mkString(", ")})")
      }
      val fileDt = ArrowIpcSource.toSparkField(fileFields(idx)).dataType
      if (fileDt.catalogString != f.dataType.catalogString) {
        throw new IllegalArgumentException(
          s"arrow-ipc: column '${f.name}' in $file has type " +
            s"${fileDt.simpleString}, table schema expects ${f.dataType.simpleString}")
      }
      idx
    }
  }

  private var rowInBatch = 0
  private var batchRows = 0

  override def next(): Boolean = {
    if (rowInBatch < batchRows) true
    else if (reader.loadNextBatch()) {
      rowInBatch = 0
      batchRows = root.getRowCount
      batchRows > 0 || next()
    } else false
  }

  override def get(): InternalRow = {
    val values = new Array[Any](ordinals.length)
    var j = 0
    while (j < ordinals.length) {
      values(j) = ArrowIpcSource.catalystValue(root.getVector(ordinals(j)), rowInBatch)
      j += 1
    }
    rowInBatch += 1
    new GenericInternalRow(values)
  }

  override def close(): Unit = {
    reader.close()
    in.close()
    allocator.close()
  }
}

// ---------------------------------------------------------------- write path
//
// The DSv2 batch-write protocol IS the reference's managed-write shape
// (SURVEY §3.3): createBatchWriterFactory ≈ CreateWriteStream, each task's
// DataWriter appends batches to an invisible staged stream file
// (≈ AppendRows into a PENDING stream), DataWriter.commit returns the staged
// path as its WriterCommitMessage (≈ FinalizeWriteStream), and
// BatchWrite.commit promotes every staged file at once
// (≈ BatchCommitWriteStreams) — readers never observe a partial job.

private class ArrowIpcWriteBuilder(schema: StructType, path: String, queryId: String)
    extends WriteBuilder {
  override def build(): Write = new Write {
    override def toBatch: BatchWrite =
      new ArrowIpcBatchWrite(schema, path, queryId, ArrowIpcSource.sessionConf())
  }
}

private case class ArrowIpcCommitMessage(stagedPath: String) extends WriterCommitMessage

private class ArrowIpcBatchWrite(
    schema: StructType,
    path: String,
    queryId: String,
    conf: SerializableConfiguration)
    extends BatchWrite {
  private val stagingDir = s"$path/_staging-$queryId"

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    new ArrowIpcWriterFactory(schema, stagingDir, conf)

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val dest = new Path(path)
    val fs = dest.getFileSystem(conf.value)
    if (!fs.exists(dest)) fs.mkdirs(dest)
    messages.foreach { case ArrowIpcCommitMessage(staged) =>
      val from = new Path(staged)
      val to = new Path(dest, from.getName)
      if (fs.exists(to) || !fs.rename(from, to)) {
        throw new java.io.IOException(s"arrow-ipc commit failed: $from -> $to")
      }
    }
    fs.delete(new Path(stagingDir), true)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val fs = new Path(stagingDir).getFileSystem(conf.value)
    fs.delete(new Path(stagingDir), true)
  }
}

private class ArrowIpcWriterFactory(
    schema: StructType,
    stagingDir: String,
    conf: SerializableConfiguration)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new ArrowIpcDataWriter(schema, stagingDir, partitionId, taskId, conf)
}

/** Executor-side writer: buffers rows into Arrow batches of `batchSize`,
  * streams them into one staged `.arrow` file per task attempt (task-id in
  * the name keeps attempts from colliding — task-level exactly-once).
  */
private class ArrowIpcDataWriter(
    schema: StructType,
    stagingDir: String,
    partitionId: Int,
    taskId: Long,
    conf: SerializableConfiguration,
    batchSize: Int = 4096)
    extends DataWriter[InternalRow] {

  private val stagedPath = new Path(f"$stagingDir/part-$partitionId%05d-$taskId.arrow")
  private val allocator = new RootAllocator()
  private val root = VectorSchemaRoot.create(
    graft.proto.ArrowInterchange.toArrowSchema(schema), allocator)
  private val out = {
    val fs = stagedPath.getFileSystem(conf.value)
    fs.create(stagedPath, true)
  }
  private val writer = new ArrowStreamWriter(root, null, out)
  private var started = false
  private var rowInBatch = 0

  override def write(row: InternalRow): Unit = {
    if (!started) { writer.start(); root.allocateNew(); started = true }
    var j = 0
    while (j < schema.fields.length) {
      val vec = root.getVector(j)
      if (row.isNullAt(j)) vec.setNull(rowInBatch)
      else ArrowIpcSource.setFromCatalyst(vec, rowInBatch, schema.fields(j).dataType, row, j)
      j += 1
    }
    rowInBatch += 1
    if (rowInBatch == batchSize) flush()
  }

  private def flush(): Unit = {
    if (rowInBatch > 0) {
      root.setRowCount(rowInBatch)
      writer.writeBatch()
      root.allocateNew()
      rowInBatch = 0
    }
  }

  override def commit(): WriterCommitMessage = {
    if (!started) writer.start()
    flush()
    writer.end()
    close()
    ArrowIpcCommitMessage(stagedPath.toString)
  }

  override def abort(): Unit = {
    close()
    val fs = stagedPath.getFileSystem(conf.value)
    fs.delete(stagedPath, false)
  }

  override def close(): Unit = {
    try writer.close() finally {
      try out.close() finally {
        root.close()
        allocator.close()
      }
    }
  }
}
