package graft.sources

import java.util.UUID

import graft.SparkSpec

/** Write-protocol unit tests at the DSv2 layer: task abort leaves no
  * staged residue; job abort cleans the staging dir (≈ the pending-stream
  * cancellation path of the reference's managed writer).
  */
class ArrowWriterProtocolSpec extends SparkSpec {

  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.types._
  import org.apache.spark.unsafe.types.UTF8String

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType)))

  private def stagingDir =
    s"${System.getProperty("java.io.tmpdir")}/graft-wp-${UUID.randomUUID().toString.take(8)}/_staging-q1"

  test("task abort deletes the staged file") {
    val dir = stagingDir
    val w = new ArrowIpcDataWriter(schema, dir, partitionId = 0, taskId = 7L, ArrowIpcSource.sessionConf())
    w.write(InternalRow(1L, UTF8String.fromString("a")))
    w.abort()
    val staged = new java.io.File(dir)
    assert(!staged.exists() || staged.list().isEmpty)
  }

  test("task commit stages exactly one file; job commit promotes and cleans") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-wp-${UUID.randomUUID().toString.take(8)}"
    val write = new ArrowIpcBatchWrite(schema, base, "q42", ArrowIpcSource.sessionConf())
    val factory = write.createBatchWriterFactory(null)
    val w1 = factory.createWriter(0, 100L)
    val w2 = factory.createWriter(1, 101L)
    w1.write(InternalRow(1L, UTF8String.fromString("a")))
    w2.write(InternalRow(2L, UTF8String.fromString("b")))
    val messages = Array(w1.commit(), w2.commit())
    assert(new java.io.File(s"$base/_staging-q42").list().count(_.endsWith(".arrow")) == 2)
    write.commit(messages)
    assert(!new java.io.File(s"$base/_staging-q42").exists())
    val back = spark.read.format("graft.sources.ArrowIpcSource").load(base)
    assert(back.count() == 2)
  }

  test("job abort removes all staged files") {
    val base = s"${System.getProperty("java.io.tmpdir")}/graft-wp-${UUID.randomUUID().toString.take(8)}"
    val write = new ArrowIpcBatchWrite(schema, base, "q43", ArrowIpcSource.sessionConf())
    val factory = write.createBatchWriterFactory(null)
    val w = factory.createWriter(0, 200L)
    w.write(InternalRow(9L, UTF8String.fromString("z")))
    val msg = w.commit()
    write.abort(Array(msg))
    assert(!new java.io.File(s"$base/_staging-q43").exists())
  }
}
