package graft

import java.util.UUID

import graft.sinks.{DataSkipping, ManagedWriter, StreamType}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources._

/** File-level data skipping over the managed table's manifest stats:
  * pruning must be REAL (fewer files opened on range-laid-out data) and
  * INVISIBLE (readSkipping ≡ read().where(...) on every predicate, with
  * conservative keeps wherever stats are absent).
  */
class DataSkippingSpec extends SparkSpec {

  private def tmp(): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-skip-${UUID.randomUUID().toString.take(8)}"

  /** Commit `df` through the managed writer as `parts` range-partitioned
    * files on `key` — each file then owns a contiguous key range, the
    * layout zone maps exist for.
    */
  private def commitRanged(df: DataFrame, dest: String, key: String, parts: Int): Unit = {
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w.write(df.repartitionByRange(parts, col(key)))
    w.finalizeCommit()
  }

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("range predicate prunes files on range-partitioned data, result unchanged") {
    val sup = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    commitRanged(sup, dest, "s_suppkey", 8)
    val filters = Seq[Filter](
      GreaterThanOrEqual("s_suppkey", 3L), LessThan("s_suppkey", 6L))
    val rep = DataSkipping.report(spark, dest, filters)
    assert(rep.totalFiles == 8)
    assert(rep.keptFiles.size < rep.totalFiles, s"expected pruning, kept ${rep.keptFiles}")
    val skipped = DataSkipping.readSkipping(spark, dest, filters)
    val full = ManagedWriter.read(spark, dest)
      .where(col("s_suppkey") >= 3L && col("s_suppkey") < 6L)
    assert(rows(skipped) == rows(full))
    assert(skipped.count() > 0)
  }

  test("equality and In prune; Or keeps the union of admitting files") {
    val sup = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    commitRanged(sup, dest, "s_suppkey", 5)
    val eq = DataSkipping.report(spark, dest, Seq(EqualTo("s_suppkey", 1L)))
    assert(eq.keptFiles.size == 1)
    val in = DataSkipping.report(
      spark, dest, Seq(In("s_suppkey", Array[Any](1L, 9L))))
    assert(in.keptFiles.size == 2)
    val or = DataSkipping.report(
      spark, dest,
      Seq(Or(EqualTo("s_suppkey", 1L), EqualTo("s_suppkey", 9L))))
    assert(or.keptFiles.toSet == in.keptFiles.toSet)
    val viaSkip = DataSkipping.readSkipping(
      spark, dest, Seq(In("s_suppkey", Array[Any](1L, 9L))))
    assert(viaSkip.count() == 2)
  }

  test("string bounds prune equality and prefix predicates") {
    import spark.implicits._
    val dest = tmp()
    val a = Seq(("apple", 1L), ("banana", 2L)).toDF("w", "n")
    val b = Seq(("melon", 3L), ("zebra", 4L)).toDF("w", "n")
    val w = new ManagedWriter(spark, dest, a.schema, StreamType.Pending)
    w.write(a.coalesce(1)); w.write(b.coalesce(1)); w.finalizeCommit()
    val eq = DataSkipping.report(spark, dest, Seq(EqualTo("w", "watermelon")))
    assert(eq.totalFiles == 2 && eq.keptFiles.size == 1)
    val pre = DataSkipping.report(spark, dest, Seq(StringStartsWith("w", "ba")))
    assert(pre.keptFiles.size == 1)
    assert(
      DataSkipping.readSkipping(spark, dest, Seq(StringStartsWith("w", "ba")))
        .as[(String, Long)].collect().toSet == Set(("banana", 2L)))
    // prefix longer than every string in a file's range: pruned everywhere
    val none = DataSkipping.report(spark, dest, Seq(StringStartsWith("w", "zz")))
    assert(none.keptFiles.isEmpty)
  }

  test("null-count stats drive IsNull/IsNotNull and all-null value pruning") {
    import spark.implicits._
    val dest = tmp()
    val dense = Seq((1L, Some(10L)), (2L, Some(20L))).toDF("id", "v")
    val nully = Seq((3L, None: Option[Long]), (4L, None: Option[Long])).toDF("id", "v")
    val w = new ManagedWriter(spark, dest, dense.schema, StreamType.Pending)
    w.write(dense.coalesce(1)); w.write(nully.coalesce(1)); w.finalizeCommit()
    val isNull = DataSkipping.report(spark, dest, Seq(IsNull("v")))
    assert(isNull.keptFiles.size == 1)
    val notNull = DataSkipping.report(spark, dest, Seq(IsNotNull("v")))
    assert(notNull.keptFiles.size == 1)
    assert(notNull.keptFiles != isNull.keptFiles)
    // a value comparison can never hold on the all-null file
    val gt = DataSkipping.report(spark, dest, Seq(GreaterThan("v", 0L)))
    assert(gt.keptFiles == notNull.keptFiles)
    assert(rows(DataSkipping.readSkipping(spark, dest, Seq(IsNull("v")))) ==
      rows(ManagedWriter.read(spark, dest).where(col("v").isNull)))
  }

  test("timestamp range pruning on orders dates") {
    val ord = Tables(spark, sfDir, "orders")
    val dest = tmp()
    commitRanged(ord, dest, "o_orderdate", 6)
    val cut = java.sql.Timestamp.valueOf("1998-06-01 00:00:00")
    val filters = Seq[Filter](GreaterThanOrEqual("o_orderdate", cut))
    val rep = DataSkipping.report(spark, dest, filters)
    assert(rep.keptFiles.size < rep.totalFiles)
    assert(rows(DataSkipping.readSkipping(spark, dest, filters)) ==
      rows(ManagedWriter.read(spark, dest).where(col("o_orderdate") >= lit(cut))))
  }

  test("adopted files without stats are kept conservatively, results stay exact") {
    val nat = Tables(spark, sfDir, "nation")
    val dest = tmp()
    nat.coalesce(1).write.parquet(dest) // plain write: no manifest, no stats
    // first managed commit adopts the pre-existing file into the base manifest
    val w = new ManagedWriter(spark, dest, nat.schema, StreamType.Committed)
    w.write(nat.where(col("n_nationkey") < 0)) // empty batch, triggers adoption
    val rep = DataSkipping.report(spark, dest, Seq(EqualTo("n_nationkey", -999L)))
    assert(rep.keptFiles.nonEmpty, "stat-less adopted file must never be pruned")
    assert(DataSkipping.readSkipping(
      spark, dest, Seq(EqualTo("n_nationkey", -999L))).count() == 0)
  }

  test("skipping survives merge + vacuum; stats sidecar is compacted") {
    import spark.implicits._
    val dest = tmp()
    val base = (1L to 100L).map(i => (i, i * 10L)).toDF("id", "v")
    commitRanged(base, dest, "id", 4)
    val changes = Seq((50L, 0L, "U"), (51L, 0L, "D")).toDF("id", "v", "op")
    ManagedWriter.merge(spark, dest, changes, Seq("id"))
    ManagedWriter.vacuum(spark, dest, keepVersions = 1)
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = ManagedWriter.read(spark, dest)
    assert(live.count() == 99)
    // compacted stats reference only manifested files
    val statFiles = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/_graft_manifest"))
      .map(_.getPath.getName).filter(_.startsWith("stats-"))
    assert(statFiles.length == 1)
    val skipped = DataSkipping.readSkipping(
      spark, dest, Seq(EqualTo("id", 50L)))
    assert(skipped.as[(Long, Long)].collect().toSeq == Seq((50L, 0L)))
  }

  test("metadata count: boundary files scan, interior files count from stats") {
    val ord = Tables(spark, sfDir, "orders")
    val dest = tmp()
    commitRanged(ord, dest, "o_orderkey", 8)
    val filters = Seq[Filter](
      GreaterThanOrEqual("o_orderkey", 100L), LessThan("o_orderkey", 5000L))
    val expected = ord.where(col("o_orderkey") >= 100L && col("o_orderkey") < 5000L).count()
    assert(DataSkipping.countWhere(spark, dest, filters) == expected)
    val plan = DataSkipping.countPlan(spark, dest, filters)
    assert(plan.scanFiles.size <= 2, s"more than boundary files scanned: $plan")
    assert(plan.decidedFiles >= 1, s"no file decided from metadata: $plan")
    // a null-free column: IsNotNull decides EVERY file, zero scanned
    val nn = DataSkipping.countPlan(spark, dest, Seq(IsNotNull("o_orderkey")))
    assert(nn.scanFiles.isEmpty && nn.decidedRows == ord.count())
    assert(DataSkipping.countWhere(spark, dest, Seq(IsNotNull("o_orderkey"))) == ord.count())
  }

  test("metadata count stays exact with nulls and stat-less files") {
    import spark.implicits._
    val dest = tmp()
    val a = Seq((1L, Some(10L)), (2L, None: Option[Long])).toDF("id", "v")
    val w = new ManagedWriter(spark, dest, a.schema, StreamType.Pending)
    w.write(a.coalesce(1)); w.finalizeCommit()
    // NULL satisfies no comparison: count must be 1, not 2
    assert(DataSkipping.countWhere(spark, dest, Seq(GreaterThan("v", 0L))) == 1L)
    assert(DataSkipping.countWhere(spark, dest, Seq(IsNull("v"))) == 1L)
  }

  test("Z-order layout + backfilled stats prune on BOTH clustered dimensions") {
    val ord = Tables(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val dest = tmp()
    graft.ops.Layout.writeInterleaved(
      ord, dest, Seq("o_custkey", "o_orderkey"), numFiles = 8, bucketBits = 3)
    // adopt the z-ordered files (no stats yet: adoption never footer-scans)
    val w = new ManagedWriter(spark, dest, ord.schema, StreamType.Committed)
    w.write(ord.where(col("o_orderkey") < 0)) // empty batch triggers adoption
    val fA = Seq[Filter](LessThan("o_custkey", 15L))
    val fB = Seq[Filter](LessThan("o_orderkey", 500L))
    assert(DataSkipping.report(spark, dest, fA).skipped == 0, "stats should not exist yet")
    val indexed = DataSkipping.indexExisting(spark, dest)
    assert(indexed >= 8, s"expected the adopted z-order files indexed, got $indexed")
    assert(DataSkipping.indexExisting(spark, dest) == 0, "second backfill must be a no-op")
    // the interleaved layout bounds BOTH dimensions per file
    val repA = DataSkipping.report(spark, dest, fA)
    val repB = DataSkipping.report(spark, dest, fB)
    assert(repA.skipped > 0, s"no pruning on first z-order dim: $repA")
    assert(repB.skipped > 0, s"no pruning on second z-order dim: $repB")
    assert(rows(DataSkipping.readSkipping(spark, dest, fA)) ==
      rows(ManagedWriter.read(spark, dest).where(col("o_custkey") < 15L)))
    assert(rows(DataSkipping.readSkipping(spark, dest, fB)) ==
      rows(ManagedWriter.read(spark, dest).where(col("o_orderkey") < 500L)))
  }

  test("bloom point-lookup prunes hash-laid-out files zone maps cannot; conservative without blooms") {
    val docs = Tables(spark, sfDir, "documents").select("doc_id", "lang", "n_chars")
    val dest = tmp()
    // Hash layout: every file spans nearly the full doc_id range, so min/max
    // zone maps admit EVERY file for a point lookup — the case blooms exist
    // for.
    val w = new ManagedWriter(spark, dest, docs.schema, StreamType.Pending,
      bloomColumns = Seq("doc_id"))
    w.write(docs.repartition(8))
    w.finalizeCommit()
    // Middle-of-range keys: every file's [min,max] admits them (round-robin
    // interleaving), so zone maps alone keep everything.
    val sortedIds = docs.orderBy("doc_id").collect().map(_.getLong(0))
    val key = sortedIds(sortedIds.length / 2)
    val filters = Seq[Filter](EqualTo("doc_id", key))
    val zone = DataSkipping.report(spark, dest, filters)
    val n = zone.totalFiles
    assert(n >= 6, s"expected a multi-file layout, got $n files")
    assert(zone.keptFiles.size == n, s"zone maps should be useless here: $zone")
    val bloom = DataSkipping.reportBloom(spark, dest, filters)
    assert(bloom.keptFiles.size < n, s"bloom should prune: $bloom")
    assert(rows(DataSkipping.readSkippingBloom(spark, dest, filters)) ==
      rows(ManagedWriter.read(spark, dest).where(col("doc_id") === key)))
    // In() probes every member; only files possibly holding SOME member stay
    val keys = sortedIds.slice(sortedIds.length / 2 - 1, sortedIds.length / 2 + 2)
    val inF = Seq[Filter](In("doc_id", keys.map(_.asInstanceOf[Any])))
    val inRep = DataSkipping.reportBloom(spark, dest, inF)
    assert(inRep.keptFiles.size < n && inRep.keptFiles.nonEmpty, inRep.toString)
    assert(rows(DataSkipping.readSkippingBloom(spark, dest, inF)) ==
      rows(ManagedWriter.read(spark, dest).where(col("doc_id").isin(keys: _*))))
    // Range terms carry no eq-term: bloom report degrades to the zone report
    val rangeRep = DataSkipping.reportBloom(spark, dest, Seq(GreaterThan("doc_id", key)))
    assert(rangeRep.keptFiles.toSet ==
      DataSkipping.report(spark, dest, Seq(GreaterThan("doc_id", key))).keptFiles.toSet)
    // A table written WITHOUT blooms keeps everything (conservative), result intact
    val dest2 = tmp()
    val w2 = new ManagedWriter(spark, dest2, docs.schema, StreamType.Pending)
    w2.write(docs.repartition(4))
    w2.finalizeCommit()
    val rep2 = DataSkipping.reportBloom(spark, dest2, filters)
    assert(rep2.keptFiles.size == rep2.totalFiles, rep2.toString)
    // String-column blooms prove absent categories
    val dest3 = tmp()
    val w3 = new ManagedWriter(spark, dest3, docs.schema, StreamType.Pending,
      bloomColumns = Seq("lang"))
    w3.write(docs.repartition(4))
    w3.finalizeCommit()
    val absent = DataSkipping.reportBloom(spark, dest3, Seq(EqualTo("lang", "zz-absent")))
    assert(absent.keptFiles.isEmpty, absent.toString)
  }

  test("unsupported residual filter throws instead of widening the result") {
    val dest = tmp()
    val sup = Tables(spark, sfDir, "supplier")
    commitRanged(sup, dest, "s_suppkey", 2)
    assertThrows[IllegalArgumentException] {
      DataSkipping.readSkipping(spark, dest, Seq(AlwaysTrue))
    }
  }
}
