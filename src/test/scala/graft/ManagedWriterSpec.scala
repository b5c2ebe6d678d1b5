package graft

import java.util.UUID

import graft.sinks.{ManagedWriter, StreamType}

/** Pending/committed stream semantics (≈ bigquery_write.go:384-394 modes and
  * the Finalize contract at :466-485, plus duck_test.go:158-189's
  * create+append ⇒ doubled rows).
  */
class ManagedWriterSpec extends SparkSpec {

  private def tmp(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-test-${UUID.randomUUID().toString.take(8)}"

  test("pending appends are invisible until finalizeCommit, then all visible") {
    val df = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    val n1 = w.write(df)
    val n2 = w.write(df)
    assert(n1 == n2 && n1 == df.count())
    assert(!new java.io.File(dest).exists() ||
      spark.read.parquet(dest).count() == 0) // staged, not visible
    w.finalizeCommit()
    assert(spark.read.parquet(dest).count() == n1 + n2)
  }

  test("committed mode makes each append immediately visible") {
    val df = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Committed)
    w.write(df)
    assert(spark.read.parquet(dest).count() == df.count())
    w.write(df)
    assert(spark.read.parquet(dest).count() == 2 * df.count())
  }

  test("schema guard rejects mismatched batches (bigquery_write.go:422-424)") {
    val df = Tables(spark, sfDir, "supplier")
    val w = new ManagedWriter(spark, tmp(), df.schema, StreamType.Pending)
    assertThrows[IllegalArgumentException] {
      w.write(df.drop("s_acctbal"))
    }
  }

  test("commit aborts on rename collision and preserves the staged data") {
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w.write(df)
    // Sabotage: pre-place a directory at the destination with the same
    // name as a staged part file -> rename returns false mid-commit.
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = fs.globStatus(new org.apache.hadoop.fs.Path(s"$dest-staging-*/batch-0/part-*"))
    assert(staged.nonEmpty)
    val victim = staged.head.getPath.getName
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"$dest/$victim/blocker"))
    assertThrows[java.io.IOException] { w.finalizeCommit() }
    // staged data must still exist (not deleted on failure)
    assert(fs.globStatus(new org.apache.hadoop.fs.Path(s"$dest-staging-*/batch-0/part-*")).nonEmpty)
  }

  test("writer refuses appends after finalize (bigquery_write.go:466 contract)") {
    val df = Tables(spark, sfDir, "supplier")
    val w = new ManagedWriter(spark, tmp(), df.schema, StreamType.Pending)
    w.write(df)
    w.finalizeCommit()
    assertThrows[IllegalArgumentException] { w.write(df) }
  }
}
