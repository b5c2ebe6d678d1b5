package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, Layout, Profile, Sampling, TextOps, TimeSeries}

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

  test("connected components labels a 200-vertex path within maxIter (pointer doubling)") {
    // Diameter 199 >> maxIter 20: plain min-label propagation CANNOT
    // converge here (20 hops of front travel), pointer doubling covers
    // 2^k hops after k rounds — this pins the r16 doubling step.
    val pairs = (1000L until 1199L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val out = Dedup.connectedComponents(pairs, "doc_a", "doc_b").collect()
    assert(out.length == 200)
    assert(out.forall(_.getLong(1) == 1000L))
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

  test("per-group cap keeps exactly n rows per group with deterministic ties") {
    val df = Seq(
      ("s1", 1L, 10L), ("s1", 2L, 10L), ("s1", 3L, 30L),
      ("s2", 4L, 5L))
      .toDF("source", "doc_id", "n_chars")
    val out = Sampling.capPerGroup(df, "source",
        Seq(col("n_chars").desc, col("doc_id")), 2)
      .orderBy("doc_id").collect().map(_.getLong(1))
    // s1 keeps 3 (30 chars) then 1 (tie at 10, lower id); s2 keeps 4.
    assert(out.toSeq == Seq(1L, 3L, 4L))
  }

  test("mixture sample hits the exact weight ratios at the largest K") {
    // en: 5 rows, de: 3, fr: 3; weights 2:1:1 -> K = min(5 div 2, 3, 3) = 2
    // -> quotas en 4, de 2, fr 2.
    val df = (1L to 5L).map(i => ("en", i)) ++
      (6L to 8L).map(i => ("de", i)) ++ (9L to 11L).map(i => ("fr", i))
    val out = Sampling.mixtureSample(
        df.toDF("lang", "doc_id"), "lang", "doc_id",
        Seq("en" -> 2L, "de" -> 1L, "fr" -> 1L))
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("en" -> 4L, "de" -> 2L, "fr" -> 2L))
    // Deterministic: the same call returns the same ids.
    val ids = Sampling.mixtureSample(
        df.toDF("lang", "doc_id"), "lang", "doc_id",
        Seq("en" -> 2L, "de" -> 1L, "fr" -> 1L))
      .collect().map(_.getLong(1)).toSet
    val again = Sampling.mixtureSample(
        df.toDF("lang", "doc_id"), "lang", "doc_id",
        Seq("en" -> 2L, "de" -> 1L, "fr" -> 1L))
      .collect().map(_.getLong(1)).toSet
    assert(ids == again)
  }

  test("temperature sample flattens toward sqrt-proportional, keeps the min group") {
    // en: 400 rows, de: 4 → rates sqrt(4/400)=0.1 and 1.0: de keeps ALL
    // rows, en keeps ≈40 (md5 coin, deterministic).
    val df = ((1L to 400L).map(i => ("en", i)) ++ (401L to 404L).map(i => ("de", i)))
      .toDF("lang", "doc_id")
    val out = Sampling.temperatureSample(df, "lang", "doc_id")
    val byLang = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byLang("de") == 4L, byLang.toString)
    // Bernoulli at 0.1 over 400 rows: expect ~40; accept a wide band but
    // reject un-flattened (400) or over-thinned (<10) outcomes.
    assert(byLang("en") >= 10L && byLang("en") <= 80L, byLang.toString)
    // Deterministic: same call, same kept set; schema passes through.
    assert(out.columns.toSeq == Seq("lang", "doc_id"))
    val ids = out.collect().map(_.getLong(1)).toSet
    assert(Sampling.temperatureSample(df, "lang", "doc_id")
      .collect().map(_.getLong(1)).toSet == ids)
    // Scan-local coin: the corpus rows never shuffle — the only exchanges
    // in the plan feed the ≤|groups|-row count/rate tables.
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("contamination tag counts shared distinct grams and zero-fills") {
    val corpus = Seq(
      (1L, "a b c d e"), // shares grams "a b c","b c d","c d e" with bench
      (2L, "q r s t u"), // disjoint
      (3L, "a b c x y")) // shares only "a b c"
      .toDF("doc_id", "text")
    val bench = Seq((100L, "a b c d e f")).toDF("doc_id", "text")
    val out = TextOps.contaminationTag(corpus, bench, "doc_id", "text", n = 3, minOverlap = 2)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(out.toSeq == Seq((1L, 3L, true), (2L, 0L, false), (3L, 1L, false)))
  }

  test("budget pack slices sequential prefix sums into budget-sized packs") {
    val df = Seq(
      ("s1", 1L, 100L), ("s1", 2L, 100L), ("s1", 3L, 100L), ("s1", 4L, 300L),
      ("s2", 5L, 50L))
      .toDF("source", "doc_id", "n_tok")
    val out = TextOps.budgetPack(df, "source", "doc_id", "n_tok", budget = 256L)
      .orderBy("doc_id").collect().map(r => (r.getLong(1), r.getLong(3)))
    // s1 exclusive prefix sums: 0, 100, 200, 300 -> packs 0, 0, 0, 1; s2: 0.
    assert(out.toSeq == Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 1L), (5L, 0L)))
  }

  test("profile counts rows, nulls, distincts, and stringifies min/max") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(2L), Some("b")), (Some(2L), None), (None, Some("a")))
      .toDF("id", "tag")
    val out = Profile.summarize(df, Seq("id", "tag")).orderBy("col_name").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getString(5)))
    assert(out(0) == (("id", 4L, 1L, 2L, "1", "2")))
    assert(out(1) == (("tag", 4L, 1L, 2L, "a", "b")))
    // Approx path agrees on these tiny cardinalities and keeps the schema.
    val approx = Profile.summarize(df, Seq("id", "tag"), approxDistinct = true)
      .orderBy("col_name").collect().map(r => (r.getString(0), r.getLong(3)))
    assert(approx.toSeq == Seq(("id", 2L), ("tag", 2L)))
  }

  // ------------------------------------------------------------ text chunks

  test("token chunks overlap by width - stride and cover every token") {
    val df = Seq((1L, "a b c d e f g h i j")).toDF("doc_id", "text")
    val out = TextOps.chunkTokens(df, "doc_id", "text", width = 6, stride = 4)
      .orderBy("chunk_idx").collect()
    assert(out.map(_.getString(2)).toSeq ==
      Seq("a b c d e f", "e f g h i j", "i j"))
    assert(out.map(_.getLong(3)).toSeq == Seq(6L, 6L, 2L))
  }

  test("redaction masks digit runs and emails, counting replacements") {
    val df = Seq((1L, "call 12345 or mail bob@x.com now")).toDF("id", "t")
    val out = df.select(
      TextOps.redact(col("t")).as("r"),
      size(regexp_extract_all(col("t"), lit(TextOps.RedactPattern), lit(0))).as("n"))
      .collect()(0)
    assert(out.getString(0) == "call <X> or mail <X> now")
    assert(out.getInt(1) == 2)
  }

  test("repetition ratio flags repeated shingles and zeroes short docs") {
    val df = Seq(
      (1L, "a b c a b c a b c"), // 7 grams, 3 distinct -> 4/7
      (2L, "x y")) // too short for 3-grams -> 0
      .toDF("doc_id", "text")
    val sh = call_function("graft_shingles", col("text"), lit(3))
    val out = df.select(col("doc_id"), TextOps.repetitionRatio(sh).as("r"))
      .orderBy("doc_id").collect()
    assert(math.abs(out(0).getDouble(1) - 4.0 / 7.0) < 1e-12)
    assert(out(1).getDouble(1) == 0.0)
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

  test("ewma folds in (ts, id) order with alpha = 1/2, repartition-invariant") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00", 1L, 8.0),
      (1L, "2024-01-01 01:00:00", 2L, 4.0),  // ewma 6.0
      (1L, "2024-01-01 02:00:00", 3L, 2.0),  // ewma 4.0
      (1L, "2024-01-01 02:00:00", 4L, 10.0), // ts tie: id order → ewma 7.0
      (2L, "2024-01-01 00:00:00", 5L, 3.5))  // singleton → seed value
      .toDF("user_id", "ts", "event_id", "value")
      .withColumn("ts", to_timestamp(col("ts")))
    val out = TimeSeries.ewma(df, "user_id", "ts", "event_id", "value")
      .orderBy("user_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq ==
      Seq((1L, 4L, 10.0, 7.0), (2L, 1L, 3.5, 3.5)))
    // Physical layout must not leak into the fold: same bits at any
    // partitioning (the collect_list partials merge under sort_array).
    val shuffled = TimeSeries.ewma(
        df.repartition(7, col("event_id")), "user_id", "ts", "event_id", "value")
      .orderBy("user_id").collect()
    assert(shuffled.map(_.getDouble(3)).toSeq == out.map(_.getDouble(3)).toSeq)
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

  test("partitioned compaction keeps directories and sizes files per partition") {
    import org.apache.spark.sql.functions._
    val path = tmp("graft-pfrag")
    // Skewed partitions: 'hot' has 9x the rows of 'cold'; both fragmented.
    spark.range(10000)
      .withColumn("part", when(col("id") % 10 === 0, "cold").otherwise("hot"))
      .repartition(32)
      .write.mode("overwrite").partitionBy("part").parquet(path)
    assert(Layout.dataFileStats(spark, path)._2 > 32, "fixture not fragmented")
    val out = tmp("graft-pcompact")
    val (bytes, _) = Layout.dataFileStats(spark, path)
    // Target ~ half the dataset: hot should get >=2 files, cold 1.
    Layout.compact(spark, path, out, targetFileBytes = bytes / 2, partitionCols = Seq("part"))
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/part=hot")), "partition dirs lost")
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$out/part=cold")), "partition dirs lost")
    def nFiles(p: String): Int = Layout.dataFileStats(spark, p)._2
    assert(nFiles(s"$out/part=cold") == 1, "cold partition should compact to one file")
    assert(nFiles(s"$out/part=hot") >= 2, "hot partition should split across files")
    // Content preserved, partition column readable.
    val back = spark.read.parquet(out)
    assert(back.count() == 10000)
    assert(back.filter(col("part") === "cold").count() == 1000)
  }

  test("interleaved clustering narrows per-file ranges on the second column") {
    import org.apache.spark.sql.functions._
    // Two independent uniform columns: lexicographic clustering on (x, y)
    // leaves y spanning ~the full domain in every file; Z-order must not.
    val df = spark.range(20000).select(
      (col("id") * 7919 % 20011).as("x"),
      (col("id") * 104729 % 19997).as("y"))
    def avgYSpan(path: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max("y") - min("y")).as("span"))
        .agg(avg("span")).head().getDouble(0)
    val lex = tmp("graft-lex")
    Layout.writeClustered(df, lex, clusterCols = Seq("x", "y"), numFiles = 16)
    val zo = tmp("graft-zorder")
    Layout.writeInterleaved(df, zo, colA = "x", colB = "y", numFiles = 16)
    val (lexSpan, zoSpan) = (avgYSpan(lex), avgYSpan(zo))
    assert(zoSpan < lexSpan * 0.7,
      s"z-order did not narrow second-column file ranges: $zoSpan vs $lexSpan")
    // Still a lossless rewrite.
    assert(spark.read.parquet(zo).count() == 20000)
  }

  test("3-column interleave narrows per-file ranges on ALL non-leading columns") {
    import org.apache.spark.sql.functions._
    // Three independent uniform columns: lexicographic clustering on
    // (x, y, z) leaves y and z spanning ~the full domain per file; the
    // N-column Morton interleave must narrow both trailing columns.
    val df = spark.range(20000).select(
      (col("id") * 7919 % 20011).as("x"),
      (col("id") * 104729 % 19997).as("y"),
      (col("id") * 15485863 % 19993).as("z"))
    def avgSpan(path: String, c: String): Double =
      spark.read.parquet(path)
        .groupBy(input_file_name()).agg((max(c) - min(c)).as("span"))
        .agg(avg("span")).head().getDouble(0)
    val lex = tmp("graft-lex3")
    Layout.writeClustered(df, lex, clusterCols = Seq("x", "y", "z"), numFiles = 16)
    val zo = tmp("graft-zorder3")
    Layout.writeInterleaved(df, zo, Seq("x", "y", "z"), numFiles = 16, bucketBits = 6)
    Seq("y", "z").foreach { c =>
      val (l, m) = (avgSpan(lex, c), avgSpan(zo, c))
      assert(m < l * 0.7, s"3-col interleave did not narrow '$c' file ranges: $m vs $l")
    }
    assert(spark.read.parquet(zo).count() == 20000)
  }

  test("diversity sample caps every cluster and is partition-invariant") {
    val e = Tables(spark, sfDir, "embeddings")
    val out = Sampling.diversityClusterSample(e, "vec_id", "embedding",
      k = 16, iterations = 2, perCluster = 8)
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.length == e.count(), "one verdict row per input vector")
    val perCell = rows.filter(_._3).groupBy(_._2).view.mapValues(_.length)
    assert(perCell.nonEmpty && perCell.values.forall(_ <= 8),
      s"a cluster exceeded the cap: $perCell")
    // Every non-empty cluster contributes (the point of diversity
    // sampling: a uniform sample could miss a small cluster entirely).
    val clusters = rows.map(_._2).toSet
    assert(perCell.keySet == clusters, "an occupied cluster got zero samples")
    val again = Sampling.diversityClusterSample(e.repartition(7), "vec_id", "embedding",
      k = 16, iterations = 2, perCluster = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    assert(rows.toSet == again.toSet, "sampling verdict must not depend on partitioning")
  }
}
