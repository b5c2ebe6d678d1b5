package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture-table loader over the driver-generated parquet dirs
  * (TESTDATA.md). One parquet directory per table: `$dir/$name.parquet`.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register every fixture table as a temp view (for the SQL surface). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    all.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
