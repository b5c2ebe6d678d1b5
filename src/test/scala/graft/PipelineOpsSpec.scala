package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Layout, Sampling, TimeSeries}

/** Round-4 pipeline operators: dedup clustering, deterministic sampling,
  * time-series gap-fill, and storage layout.
  */
class PipelineOpsSpec extends SparkSpec {

  import spark.implicits._

  // ----------------------------------------------------- connected components

  test("connected components merges chains across pairs") {
    // 1-2, 2-3 (one chain), 5-6: clusters {1,2,3}->1 and {5,6}->5.
    val pairs = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(out.toSeq == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 5L -> 5L, 6L -> 5L))
  }

  test("connected components converges on a long path (diameter > 2)") {
    // Path 10-11-12-...-18: worst case for propagation depth.
    val pairs = (10L until 18L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs, "doc_a", "doc_b").collect()
    assert(out.length == 9)
    assert(out.forall(_.getLong(1) == 10L))
  }

  test("connected components keeps disjoint cliques separate") {
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (7L, 9L)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs, "doc_a", "doc_b")
      .groupBy("cluster_id").count().orderBy("cluster_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq(1L -> 3L, 7L -> 2L))
  }

  // ----------------------------------------------------------------- sampling

  test("hash sample is deterministic and bucket-disjoint (train/test split)") {
    val df = spark.range(1000).toDF("id")
    val a = Sampling.hashSample(df, "id", 100, 10).collect().map(_.getLong(0)).toSet
    val b = Sampling.hashSample(df, "id", 100, 10).collect().map(_.getLong(0)).toSet
    assert(a == b, "same predicate, same rows")
    // Complementary keep ranges partition the data.
    val rest = df.filter(Sampling.hashBucket(col("id"), 100) >= 10)
      .collect().map(_.getLong(0)).toSet
    assert((a & rest).isEmpty && (a | rest).size == 1000)
    // ~10% with hash-uniform spread.
    assert(a.size > 50 && a.size < 200, s"unexpected sample size ${a.size}")
  }

  test("stratified sample takes exactly ceil(frac * n) of each stratum") {
    // Strata sizes: a=7, b=20, c=1 -> ceil(10%) quotas 1, 2, 1.
    val df = ((1 to 7).map(i => ("a", i.toLong)) ++
      (1 to 20).map(i => ("b", 100L + i)) ++
      Seq(("c", 999L))).toDF("stratum", "id")
    val got = Sampling.stratifiedSample(df, "stratum", "id", 10, 100)
      .groupBy("stratum").count().orderBy("stratum").collect()
      .map(r => r.getString(0) -> r.getLong(1))
    assert(got.toSeq == Seq("a" -> 1L, "b" -> 2L, "c" -> 1L))
  }

  // --------------------------------------------------------------- gap fill

  test("gap fill emits every bucket and carries values forward") {
    val df = Seq(
      (1L, "2024-01-01 00:10:00", 1L, 5.0),
      (1L, "2024-01-01 03:20:00", 2L, 9.0), // 2 empty hours between
      (2L, "2024-01-01 00:00:00", 3L, 7.0))
      .toDF("user_id", "ts", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = TimeSeries.gapFillForward(df, "user_id", "ts", "event_id", "value", 3600L)
      .orderBy("user_id", "bucket_ts").collect()
    // user 1: buckets 00,01,02,03 -> 4 rows; user 2: 1 row.
    assert(out.length == 5)
    val u1 = out.filter(_.getLong(0) == 1L)
    assert(u1.map(_.getLong(2)).toSeq == Seq(1L, 0L, 0L, 1L), "bucket counts")
    assert(u1.map(_.getDouble(4)).toSeq == Seq(5.0, 5.0, 5.0, 9.0), "forward fill")
    assert(u1(1).isNullAt(3) && u1(2).isNullAt(3), "empty buckets have NULL last_value")
  }

  test("gap fill last_value picks the latest (ts, id) within a bucket") {
    val df = Seq(
      (1L, "2024-01-01 00:10:00", 1L, 5.0),
      (1L, "2024-01-01 00:50:00", 2L, 8.0), // same bucket, later ts wins
      (1L, "2024-01-01 00:50:00", 3L, 6.0)) // tie on ts: higher id wins
      .toDF("user_id", "ts", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = TimeSeries.gapFillForward(df, "user_id", "ts", "event_id", "value", 3600L)
      .collect()
    assert(out.length == 1)
    assert(out(0).getLong(2) == 3L && out(0).getDouble(3) == 6.0)
  }

  // ----------------------------------------------------------------- layout

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  test("partitioned write prunes non-matching partitions at scan time") {
    val df = Seq((1L, "en"), (2L, "de"), (3L, "en"), (4L, "fr"))
      .toDF("doc_id", "lang")
    val path = tmp("graft-part")
    Layout.writePartitioned(df, path, Seq("lang"))
    val back = spark.read.parquet(path).filter(col("lang") === "en")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
    // Only the lang=en directory's files are actually read.
    val scanned = back.select(input_file_name()).distinct().count()
    val all = spark.read.parquet(path).select(input_file_name()).distinct().count()
    assert(scanned < all, s"no file pruning: $scanned vs $all")
    assert(back.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))
  }

  test("clustered write produces non-overlapping sorted files") {
    val df = spark.range(1000).select(col("id").as("doc_id"), (col("id") % 97).as("k"))
    val path = tmp("graft-clust")
    Layout.writeClustered(df, path, Seq("k"), numFiles = 4)
    val (_, n) = Layout.dataFileStats(spark, path)
    assert(n == 4, s"expected 4 clustered files, got $n")
    // Range partitioning: per-file k-ranges must not overlap.
    val perFile = spark.read.parquet(path)
      .select(input_file_name().as("f"), col("k"))
      .groupBy("f").agg(min("k").as("lo"), max("k").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    perFile.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, perFile.mkString(","))
      case _ => ()
    }
  }

  test("compaction rewrites many small files into the target count") {
    val path = tmp("graft-frag")
    // 64 tiny files.
    spark.range(10000).repartition(64).write.mode("overwrite").parquet(path)
    assert(Layout.dataFileStats(spark, path)._2 == 64)
    val out = tmp("graft-compact")
    val (bytes, _) = Layout.dataFileStats(spark, path)
    val nOut = Layout.compact(spark, path, out, targetFileBytes = bytes) // 1 target file
    assert(nOut == 1, s"expected 1 compacted file, got $nOut")
    // Content preserved.
    assert(spark.read.parquet(out).count() == 10000)
  }
}
