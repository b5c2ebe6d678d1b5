package graft

import java.util.UUID

import graft.sources.PartitionedArrow
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Storage-partitioned joins over the key=value Arrow layout: with V2
  * bucketing on, a join of two co-laid-out tables must plan with ZERO
  * exchanges — and the rows must equal the plain parquet join whether or
  * not the optimization fires (reporting is advisory).
  */
class StoragePartitionedJoinSpec extends SparkSpec {

  private def tmp(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-spj-${UUID.randomUUID().toString.take(8)}"

  private def readPartitioned(dir: String, key: String): DataFrame =
    spark.read.format("graft.sources.PartitionedArrowSource")
      .option("partitionCol", key).load(dir)

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("co-laid-out tables join with zero exchanges, rows match the parquet join") {
    val cust = Tables(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val supp = Tables(spark, sfDir, "supplier").select("s_suppkey", "s_nationkey")
    val (dirA, dirB) = (tmp(), tmp())
    PartitionedArrow.write(cust, dirA, "c_nationkey")
    PartitionedArrow.write(supp, dirB, "s_nationkey")

    val expected = rows(
      cust.join(supp, col("c_nationkey") === col("s_nationkey")))

    val prev = spark.conf.getOption("spark.sql.sources.v2.bucketing.enabled")
    spark.conf.set("spark.sql.sources.v2.bucketing.enabled", "true")
    try {
      val a = readPartitioned(dirA, "c_nationkey")
      val b = readPartitioned(dirB, "s_nationkey")
      val joined = a.join(b, col("c_nationkey") === col("s_nationkey"))
      assert(rows(joined) == expected)
      val p = joined.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange"),
        s"storage-partitioned join still shuffles:\n$p")
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.sources.v2.bucketing.enabled", v)
        case None => spark.conf.unset("spark.sql.sources.v2.bucketing.enabled")
      }
    }
  }

  test("with the conf off the same layout still answers correctly (shuffled)") {
    val cust = Tables(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val dir = tmp()
    PartitionedArrow.write(cust, dir, "c_nationkey")
    val back = readPartitioned(dir, "c_nationkey")
    assert(rows(back) == rows(cust))
    // grouped count per nation equals the parquet-side group-by
    val g = back.groupBy("c_nationkey").count()
    val e = cust.groupBy("c_nationkey").count()
    assert(rows(g) == rows(e))
  }

  test("column pruning still reaches the partitioned reader") {
    val cust = Tables(spark, sfDir, "customer").select("c_custkey", "c_nationkey")
    val dir = tmp()
    PartitionedArrow.write(cust, dir, "c_nationkey")
    val keys = readPartitioned(dir, "c_nationkey").select("c_custkey")
    assert(keys.count() == cust.count())
    assert(keys.queryExecution.executedPlan.toString.contains("c_custkey"))
  }

  test("null partition keys are rejected at write") {
    import spark.implicits._
    val df = Seq((1L, Some(2L)), (2L, None: Option[Long])).toDF("id", "k")
    assertThrows[IllegalArgumentException] {
      PartitionedArrow.write(df, tmp(), "k")
    }
  }
}
