package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Throwaway profiling main (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, _) = args
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.range(1).selectExpr("upper('a')").collect()
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val li = Tables(spark, sfDir, "lineitem")
    val cents = (c: org.apache.spark.sql.Column) => round(c * 100).cast("long")
    val w = Window
      .partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    time("scan 4cols") {
      noop(li.select("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber"))
    }
    time("repartition+groupBy only") {
      noop(li.repartition(col("l_suppkey"))
        .groupBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
        .agg(sum(cents(col("l_quantity"))).as("q")))
    }
    time("full current b13") {
      noop(li.repartition(col("l_suppkey"))
        .groupBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
        .agg(sum(cents(col("l_quantity"))).as("q"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          (sum("q").over(w).cast("double") / 100.0).as("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber"))
    }
    time("no final orderBy") {
      noop(li.repartition(col("l_suppkey"))
        .groupBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
        .agg(sum(cents(col("l_quantity"))).as("q"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          (sum("q").over(w).cast("double") / 100.0).as("running_qty")))
    }
    time("plain 2-exchange") {
      noop(li
        .groupBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
        .agg(sum(cents(col("l_quantity"))).as("q"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          (sum("q").over(w).cast("double") / 100.0).as("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber"))
    }
    time("full current b13 (2nd)") {
      noop(li.repartition(col("l_suppkey"))
        .groupBy("l_suppkey", "l_shipdate", "l_orderkey", "l_linenumber")
        .agg(sum(cents(col("l_quantity"))).as("q"))
        .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          (sum("q").over(w).cast("double") / 100.0).as("running_qty"))
        .orderBy("l_suppkey", "l_orderkey", "l_linenumber"))
    }
    spark.stop()
  }
}
