package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** BENCHMARK-ONLY derived dataset one ladder rung ABOVE the largest
  * driver-generated fixture: 10 key-shifted replicas of sf0.1, written
  * once to a scratch directory and reused by [[Bench]]'s scale-up pass.
  *
  * This is NOT a correctness fixture — every oracle gate runs exclusively
  * on the driver-generated `/root/testdata` parquet. The scale-up data
  * exists so the superlinear screen gets a 10x step at meaningful size
  * (~6M lineitem rows), where a quadratic candidate generation or a
  * broadcast-gone-shuffle is unmissable, instead of topping out at sf0.1.
  *
  * Replication preserves the shapes the relational screen measures:
  *   - primary keys shift by `replica * (max+1)` so uniqueness holds;
  *   - foreign keys shift by the SAME base, so join fan-out per key is
  *     IDENTICAL to sf0.1 (10x groups, never 10x-deep groups);
  *   - tiny dims (region, nation) stay fixed, like real star schemas;
  *   - document text gets a per-replica suffix token so cross-replica
  *     rows are NOT exact/near duplicates — naive copying would hand
  *     every pairwise-similarity query a quadratic output blow-up that
  *     reads as (and would falsely flag as) a superlinear plan.
  */
object ScaleUp {

  /** Build the scaled dataset under `dstDir` unless a complete one is
    * already there. Returns true when the dataset is ready. Generation is
    * a handful of scan→shift→write jobs (~1 min at sf0.1); the
    * `_COMPLETE` marker lands last, so a crashed half-write is never
    * mistaken for a dataset.
    */
  def ensure(
      spark: SparkSession,
      srcDir: String,
      dstDir: String,
      replicas: Int = 10): Boolean = {
    val marker = new java.io.File(dstDir, "_COMPLETE")
    if (marker.exists()) return true
    val dstPath = new org.apache.hadoop.fs.Path(dstDir)
    val fs = dstPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(dstPath)) fs.delete(dstPath, true)
    fs.mkdirs(dstPath)

    def t(name: String): DataFrame = Tables(spark, srcDir, name)
    def base(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).head().getLong(0) + 1L
    val cB = base(t("customer"), "c_custkey")
    val sB = base(t("supplier"), "s_suppkey")
    val pB = base(t("part"), "p_partkey")
    val oB = base(t("orders"), "o_orderkey")
    val eB = base(t("events"), "event_id")
    val uB = base(t("events"), "user_id")
    val dB = base(t("documents"), "doc_id")

    // 10-row replica frame; the crossJoin broadcasts it, so replication
    // is a scan-local projection — no shuffle to build the big table.
    val r = spark.range(replicas).select(col("id").as("_r"))
    def replicate(df: DataFrame, shifts: Map[String, Long],
        extra: DataFrame => DataFrame = identity): DataFrame = {
      val shifted = df.crossJoin(broadcast(r))
      val cols = df.columns.map { c =>
        shifts.get(c) match {
          case Some(b) => (col(c) + col("_r") * lit(b)).as(c)
          case None => col(c)
        }
      }
      extra(shifted.select((cols :+ col("_r")): _*)).drop("_r")
    }

    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$dstDir/$name.parquet")

    write(t("region"), "region")
    write(t("nation"), "nation")
    write(replicate(t("customer"), Map("c_custkey" -> cB)), "customer")
    write(replicate(t("supplier"), Map("s_suppkey" -> sB)), "supplier")
    write(replicate(t("part"), Map("p_partkey" -> pB)), "part")
    write(replicate(t("orders"), Map("o_orderkey" -> oB, "o_custkey" -> cB)), "orders")
    write(replicate(t("lineitem"),
      Map("l_orderkey" -> oB, "l_partkey" -> pB, "l_suppkey" -> sB)), "lineitem")
    write(replicate(t("events"), Map("event_id" -> eB, "user_id" -> uB)), "events")
    // distinct text per replica — see the class doc on similarity blow-up
    write(replicate(t("documents"), Map("doc_id" -> dB),
      extra = df => df.withColumn("text",
        concat(col("text"), lit(" zscaleup"), col("_r")))), "documents")
    marker.createNewFile()
    true
  }
}
