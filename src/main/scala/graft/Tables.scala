package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Fixture-table loader over the driver-generated parquet dirs
  * (TESTDATA.md). One parquet directory per table: `$dir/$name.parquet`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark has no native
      // type for. Read it as raw nanos (legacy conf) and truncate to
      // microseconds — exactly what DuckDB does when it reads the same
      // file, so both engines see identical values. The conf is a
      // session-build setting (Engine/Bench/Verify/SparkSpec all set it):
      // mutating it per-read here was racy and silently changed how later
      // NANOS parquet reads decode (round-2 ADVICE), so fail fast instead.
      require(
        spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
        "events.ts is TIMESTAMP(NANOS): set spark.sql.legacy.parquet.nanosAsLong=true " +
          "when building the session (Graft session builders do)")
      spark.read
        .parquet(s"$dir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))"))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
