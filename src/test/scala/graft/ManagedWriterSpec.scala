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

  test("mid-promotion crash leaves ZERO new rows visible to manifest readers " +
      "(bigquery_write.go:473-484 atomic BatchCommitWriteStreams)") {
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    // Commit one batch normally -> manifest v1.
    val w1 = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w1.write(df)
    w1.finalizeCommit()
    val committed = ManagedWriter.read(spark, dest).count()
    assert(committed == df.count())
    // Stage two more batches, crash after the FIRST one's files were
    // physically renamed into the destination but before the manifest
    // publish — the prefix-visibility window the old implementation had.
    val w2 = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w2.write(df)
    w2.write(df)
    w2.crashAfterBatches = 1
    assertThrows[java.io.IOException] { w2.finalizeCommit() }
    // Physically a prefix IS in the directory (one promoted batch)...
    assert(spark.read.parquet(dest).count() > committed)
    // ...but the manifest-consulting reader sees none of it: the previous
    // manifest is still the newest version, so the commit was all-or-nothing.
    assert(ManagedWriter.read(spark, dest).count() == committed)
  }

  test("committed-mode appends publish a manifest version per batch") {
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Committed)
    w.write(df)
    assert(ManagedWriter.read(spark, dest).count() == df.count())
    w.write(df)
    assert(ManagedWriter.read(spark, dest).count() == 2 * df.count())
  }

  test("manifest reader falls back to a plain directory read when no manifest exists") {
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    df.write.parquet(dest)
    assert(ManagedWriter.read(spark, dest).count() == df.count())
    // ...and a first manifest commit onto that directory adopts the
    // pre-existing files, keeping old rows visible alongside the new batch.
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w.write(df)
    w.finalizeCommit()
    assert(ManagedWriter.read(spark, dest).count() == 2 * df.count())
  }

  test("adopting a pre-existing PARTITIONED dataset keeps every row visible") {
    // Hive-partitioned layout: files live under nested n_regionkey=*/ dirs;
    // the base manifest must list them recursively and the manifest read
    // must re-derive the partition column (basePath) — a top-level-only
    // adoption would silently drop all the old rows.
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    df.write.partitionBy("n_regionkey").parquet(dest)
    val adopted = spark.read.parquet(dest) // partition col now last
    val w = new ManagedWriter(spark, dest, adopted.schema, StreamType.Pending)
    w.write(adopted)
    w.finalizeCommit()
    val got = ManagedWriter.read(spark, dest)
    assert(got.count() == 2 * df.count())
    assert(got.columns.contains("n_regionkey"))
    assert(got.groupBy("n_regionkey").count().count() ==
      df.select("n_regionkey").distinct().count())
  }

  test("crash after base manifest but before ANY promotion reads as empty, not an error") {
    // Crash window: ensureBaseManifest published the empty base manifest,
    // the process died before the first batch promotion — the destination
    // holds a manifest and zero parquet files. The table must stay
    // readable (zero rows), per the atomicity contract.
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w.write(df)
    w.crashAfterBatches = 0
    intercept[java.io.IOException](w.finalizeCommit())
    assert(ManagedWriter.read(spark, dest).count() == 0)
  }

  test("FIRST commit to a fresh destination is also all-or-nothing") {
    // Regression: before ensureBaseManifest, a crash mid-promotion on a
    // never-committed destination left no manifest at all, so the
    // plain-directory fallback exposed the promoted prefix AND the next
    // successful commit adopted the orphans. Both must not happen.
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w.write(df)
    w.write(df)
    w.crashAfterBatches = 1
    assertThrows[java.io.IOException] { w.finalizeCommit() }
    // base manifest (empty) was published before promotion, so the
    // manifest reader sees zero rows despite the orphaned prefix on disk
    assert(ManagedWriter.read(spark, dest).count() == 0)
    assert(spark.read.parquet(dest).count() > 0) // the orphaned prefix
    // a later successful commit must NOT resurrect the orphans
    val w2 = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w2.write(df)
    w2.finalizeCommit()
    assert(ManagedWriter.read(spark, dest).count() == df.count())
  }

  test("time travel: every committed manifest version stays readable") {
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    val w1 = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w1.write(df)
    w1.finalizeCommit() // v2: one batch (v1 = empty base manifest)
    val w2 = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w2.write(df)
    w2.write(df)
    w2.finalizeCommit() // v3: three batches
    // v1 is the (empty) base manifest published before the first promotion
    assert(ManagedWriter.versions(spark, dest) == Seq(1L, 2L, 3L))
    assert(ManagedWriter.readVersion(spark, dest, 1L).count() == 0)
    assert(ManagedWriter.readVersion(spark, dest, 2L).count() == df.count())
    assert(ManagedWriter.readVersion(spark, dest, 3L).count() == 3 * df.count())
    assert(ManagedWriter.read(spark, dest).count() == 3 * df.count())
    assertThrows[java.io.FileNotFoundException] {
      ManagedWriter.readVersion(spark, dest, 9L)
    }
  }

  test("versioned merge: upserts/deletes/inserts publish the next version, old version intact") {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w.write(df)
    w.finalizeCommit()
    val vBase = ManagedWriter.versions(spark, dest).last
    val changes = df.where(col("s_suppkey") % 10 === 0)
      .withColumn("s_acctbal", col("s_acctbal") + lit(100.0))
      .withColumn("op", lit("U"))
      .unionByName(df.where(col("s_suppkey") % 10 === 1).withColumn("op", lit("D")))
    val vNew = ManagedWriter.merge(spark, dest, changes, Seq("s_suppkey"))
    assert(vNew == vBase + 1)
    assert(ManagedWriter.versions(spark, dest).takeRight(2) == Seq(vBase, vNew))
    // New snapshot: deletes gone, updates applied.
    val latest = ManagedWriter.read(spark, dest)
    assert(latest.where(col("s_suppkey") % 10 === 1).count() == 0)
    val expectUpd = df.where(col("s_suppkey") % 10 === 0)
      .select(col("s_suppkey"), (col("s_acctbal") + lit(100.0)).as("b"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    val gotUpd = latest.where(col("s_suppkey") % 10 === 0)
      .select("s_suppkey", "s_acctbal")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(gotUpd == expectUpd)
    // Time travel: the pre-merge snapshot is bit-identical to the base.
    val old = ManagedWriter.readVersion(spark, dest, vBase)
    assert(old.count() == df.count())
    assert(old.where(col("s_suppkey") % 10 === 1).count() ==
      df.where(col("s_suppkey") % 10 === 1).count())
  }

  test("merge adopts a plain parquet destination (pre-manifest) before applying changes") {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    // Plain df.write.parquet — no ManagedWriter, no manifest.
    df.write.parquet(dest)
    val changes = df.where(col("n_nationkey") < 5).withColumn("op", lit("D"))
    val vNew = ManagedWriter.merge(spark, dest, changes, Seq("n_nationkey"))
    // The base manifest adopted the pre-existing files (version vNew-1),
    // and the merge applied on top of the adopted snapshot.
    assert(ManagedWriter.read(spark, dest).count() == df.count() - 5)
    assert(ManagedWriter.readVersion(spark, dest, vNew - 1).count() == df.count())
  }

  test("crash before the merge's manifest publish leaves the old version authoritative") {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, sfDir, "nation")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w.write(df)
    w.finalizeCommit()
    val versionsBefore = ManagedWriter.versions(spark, dest)
    val visibleBefore = ManagedWriter.read(spark, dest).count()
    val changes = df.limit(5).withColumn("op", lit("D"))
    assertThrows[java.io.IOException] {
      ManagedWriter.mergeImpl(spark, dest, changes, Seq("n_nationkey"), "op",
        crashBeforePublish = true)
    }
    // Merged files were physically promoted (the crash came after)...
    assert(spark.read.parquet(dest).count() > visibleBefore)
    // ...but no manifest names them: versions and visible rows unchanged.
    assert(ManagedWriter.versions(spark, dest) == versionsBefore)
    assert(ManagedWriter.read(spark, dest).count() == visibleBefore)
    // And a SUBSEQUENT merge still works off the authoritative snapshot —
    // the orphaned files are never adopted.
    val vNew = ManagedWriter.merge(spark, dest, changes, Seq("n_nationkey"))
    assert(ManagedWriter.readVersion(spark, dest, vNew).count() == visibleBefore - 5)
  }

  test("vacuum drops superseded versions' files, keeps every kept version readable") {
    import org.apache.spark.sql.functions._
    val df = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w.write(df)
    w.finalizeCommit()
    val vBase = ManagedWriter.versions(spark, dest).last
    // Merge away the %10==1 keys: the merged snapshot references only NEW
    // files, so the base version's files become vacuum-able.
    val vNew = ManagedWriter.merge(
      spark, dest, df.where(col("s_suppkey") % 10 === 1).withColumn("op", lit("D")),
      Seq("s_suppkey"))
    val latestCount = ManagedWriter.read(spark, dest).count()
    val physBefore = spark.read.parquet(dest).count()
    val (vDropped, filesDropped) = ManagedWriter.vacuum(spark, dest, keepVersions = 1)
    assert(vDropped == 2, s"expected the empty seed + base versions dropped, got $vDropped")
    assert(filesDropped >= 1, "no data files reclaimed")
    // Latest version unharmed, byte-identical row count.
    assert(ManagedWriter.versions(spark, dest) == Seq(vNew))
    assert(ManagedWriter.read(spark, dest).count() == latestCount)
    // Physical directory really shrank (old snapshot's rows gone).
    assert(spark.read.parquet(dest).count() < physBefore)
    // Time travel to the vacuumed version now fails cleanly.
    assertThrows[java.io.FileNotFoundException] {
      ManagedWriter.readVersion(spark, dest, vBase)
    }
  }

  test("writer refuses appends after finalize (bigquery_write.go:466 contract)") {
    val df = Tables(spark, sfDir, "supplier")
    val w = new ManagedWriter(spark, tmp(), df.schema, StreamType.Pending)
    w.write(df)
    w.finalizeCommit()
    assertThrows[IllegalArgumentException] { w.write(df) }
  }

  test("change feed classifies insert/delete/update pairs; unchanged keys silent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dest = tmp()
    val base = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base); w.finalizeCommit()
    val v1 = ManagedWriter.versions(spark, dest).last
    val cs = Seq((2L, "B", "U"), (3L, "c", "D"), (4L, "d", "U")).toDF("id", "v", "op")
    val v2 = ManagedWriter.merge(spark, dest, cs, Seq("id"))
    val feed = ManagedWriter.changes(spark, dest, v1, v2, Seq("id"))
      .select("id", "v", "_change_type").as[(Long, String, String)].collect().toSet
    assert(feed == Set(
      (4L, "d", "insert"),
      (3L, "c", "delete"),
      (2L, "b", "update_preimage"),
      (2L, "B", "update_postimage")), s"got $feed")
    // key 1 unchanged: absent. Feed between identical versions is empty.
    assert(ManagedWriter.changes(spark, dest, v2, v2, Seq("id")).isEmpty)
  }

  test("compact shrinks the file count, preserves rows, keeps old layout travelable") {
    val sup = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, sup.schema, StreamType.Pending)
    w.write(sup.repartition(8))
    w.finalizeCommit()
    val v1 = ManagedWriter.versions(spark, dest).last
    val before = ManagedWriter.read(spark, dest)
    val filesBefore = before.inputFiles.length
    assert(filesBefore >= 8)
    val v2 = ManagedWriter.compact(spark, dest, targetFileBytes = 1L << 30)
    assert(v2 == v1 + 1)
    val after = ManagedWriter.read(spark, dest)
    assert(after.inputFiles.length < filesBefore)
    assert(rowsOf(after) == rowsOf(before))
    // the pre-compact layout is still exactly readable
    assert(rowsOf(ManagedWriter.readVersion(spark, dest, v1)) == rowsOf(before))
    // compacted files carry fresh skipping stats (sidecar mentions them)
    val fs = new org.apache.hadoop.fs.Path(dest)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val compacted = ManagedWriter.read(spark, dest).inputFiles
      .map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    val sidecars = fs.listStatus(new org.apache.hadoop.fs.Path(s"$dest/_graft_manifest"))
      .map(_.getPath).filter(_.getName.startsWith("stats-"))
    val statLines = sidecars.flatMap { p =>
      val in = fs.open(p)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList finally in.close()
    }
    assert(compacted.exists(c => statLines.exists(_.startsWith(c))))
  }

  test("crash before the compact publish leaves the old layout authoritative") {
    val sup = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, sup.schema, StreamType.Pending)
    w.write(sup.repartition(6))
    w.finalizeCommit()
    val vsBefore = ManagedWriter.versions(spark, dest)
    assertThrows[java.io.IOException] {
      ManagedWriter.compactImpl(spark, dest, 1L << 30, crashBeforePublish = true)
    }
    assert(ManagedWriter.versions(spark, dest) == vsBefore)
    assert(ManagedWriter.read(spark, dest).count() == sup.count())
  }

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  test("schema evolution appends nullable columns; time travel replays each version's schema") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dest = tmp()
    val v1df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val w = new ManagedWriter(spark, dest, v1df.schema, StreamType.Committed,
      allowSchemaEvolution = true)
    w.write(v1df)
    val vNarrow = ManagedWriter.versions(spark, dest).last
    w.write(Seq((3L, "c", 30L)).toDF("id", "v", "extra"))
    val vWide = ManagedWriter.versions(spark, dest).last
    // the latest read is WIDE: old rows fill the new column with NULL
    val latest = ManagedWriter.read(spark, dest)
    assert(latest.columns.toSeq == Seq("id", "v", "extra"))
    assert(latest.where(col("extra").isNull).count() == 2)
    assert(latest.where(col("extra") === 30L).count() == 1)
    // time travel BEFORE the evolution replays the narrow schema
    assert(ManagedWriter.readVersion(spark, dest, vNarrow).columns.toSeq == Seq("id", "v"))
    assert(ManagedWriter.readVersion(spark, dest, vWide).columns.toSeq ==
      Seq("id", "v", "extra"))
    // retypes and drops refuse
    assertThrows[IllegalArgumentException] {
      w.write(Seq(("x", "y")).toDF("id", "v")) // id retyped to string
    }
    assertThrows[IllegalArgumentException] {
      w.write(Seq(Tuple1(9L)).toDF("id")) // drops v
    }
  }

  test("deletion-vector merge: same rows as the full merge, untouched files not rewritten") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def changeset = Seq((2L, "B", "U"), (3L, "c", "D"), (9L, "i", "U"))
      .toDF("id", "v", "op")
    val base = (1L to 5L).map(i => (i, ('a' + i - 1).toChar.toString)).toDF("id", "v")
    // full-rewrite merge
    val destFull = tmp()
    val wf = new ManagedWriter(spark, destFull, base.schema, StreamType.Pending)
    wf.write(base.repartition(4)); wf.finalizeCommit()
    ManagedWriter.merge(spark, destFull, changeset, Seq("id"))
    // DV merge
    val destDv = tmp()
    val wd = new ManagedWriter(spark, destDv, base.schema, StreamType.Pending)
    wd.write(base.repartition(4)); wd.finalizeCommit()
    val filesBefore = ManagedWriter.read(spark, destDv).inputFiles.toSet
    val vDv = ManagedWriter.mergeDV(spark, destDv, changeset, Seq("id"))
    assert(rowsOf(ManagedWriter.read(spark, destDv)) ==
      rowsOf(ManagedWriter.read(spark, destFull)))
    // every pre-merge file survives un-rewritten; only new files appended
    val after = ManagedWriter.readVersion(spark, destDv, vDv).inputFiles.toSet
    assert(filesBefore.subsetOf(after), "DV merge rewrote pre-existing files")
    // time travel to the base still shows the pre-merge rows
    val vBase = ManagedWriter.versions(spark, destDv).dropRight(1).last
    assert(ManagedWriter.readVersion(spark, destDv, vBase).count() == 5)
  }

  test("orphan deletion vector from a crashed DV merge never applies to a later commit") {
    import spark.implicits._
    val base = (1L to 6L).map(i => (i, i * 10L)).toDF("id", "v")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base); w.finalizeCommit()
    val before = rowsOf(ManagedWriter.read(spark, dest))
    // crash AFTER the dv sidecar is staged, BEFORE the manifest rename
    assertThrows[java.io.IOException] {
      ManagedWriter.mergeDVImpl(spark, dest,
        Seq((1L, 0L, "D"), (2L, 0L, "D")).toDF("id", "v", "op"),
        Seq("id"), "op", crashBeforePublish = true)
    }
    assert(rowsOf(ManagedWriter.read(spark, dest)) == before,
      "crashed DV merge changed visible rows")
    // an APPEND now claims the version the crashed merge intended: the
    // orphan dv's content binding cannot match this manifest — no row of
    // the append (or the base) may disappear
    val w2 = new ManagedWriter(spark, dest, base.schema, StreamType.Committed)
    w2.write(Seq((100L, 1000L)).toDF("id", "v"))
    val now = ManagedWriter.read(spark, dest)
    assert(now.count() == 7, s"orphan DV applied: ${rowsOf(now)}")
  }

  test("DV merges compound, compact materializes them, vacuum re-binds") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val base = (1L to 10L).map(i => (i, i)).toDF("id", "v")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base.repartition(3)); w.finalizeCommit()
    ManagedWriter.mergeDV(spark, dest,
      Seq((1L, 0L, "D")).toDF("id", "v", "op"), Seq("id"))
    ManagedWriter.mergeDV(spark, dest,
      Seq((2L, 0L, "D"), (3L, 33L, "U")).toDF("id", "v", "op"), Seq("id"))
    val expect = Set((3L, 33L)) ++ (4L to 10L).map(i => (i, i))
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.as[(Long, Long)].collect().toSet
    assert(asSet(ManagedWriter.read(spark, dest)) == expect)
    // an append AFTER the DV merges keeps the deletions (nearest-<= rule)
    val w2 = new ManagedWriter(spark, dest, base.schema, StreamType.Committed)
    w2.write(Seq((50L, 50L)).toDF("id", "v"))
    assert(asSet(ManagedWriter.read(spark, dest)) == expect + ((50L, 50L)))
    // vacuum to 1 version: the DV's own manifest goes away, but the
    // re-bound sidecar keeps the deletions in force
    ManagedWriter.vacuum(spark, dest, keepVersions = 1)
    assert(asSet(ManagedWriter.read(spark, dest)) == expect + ((50L, 50L)))
    // compact materializes: rows unchanged, snapshot is dv-free new files
    ManagedWriter.compact(spark, dest, targetFileBytes = 1L << 30)
    assert(asSet(ManagedWriter.read(spark, dest)) == expect + ((50L, 50L)))
  }

  test("history reports per-version files, bytes, and live deletions from metadata only") {
    import spark.implicits._
    val base = (1L to 8L).map(i => (i, i)).toDF("id", "v")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base.repartition(2)); w.finalizeCommit()
    ManagedWriter.mergeDV(spark, dest,
      Seq((1L, 0L, "D"), (2L, 0L, "D")).toDF("id", "v", "op"), Seq("id"))
    val h = ManagedWriter.history(spark, dest)
      .orderBy("version")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // v1 = empty base, v2 = the two-file commit, v3 = DV merge (no data appended)
    assert(h.map(_._1).toSeq == ManagedWriter.versions(spark, dest))
    assert(h.last._3 == 2L, s"expected 2 live deletions at the tip: ${h.toSeq}")
    assert(h(1)._2 == 2 && h(1)._3 == 0L, s"v2 wrong: ${h.toSeq}")
  }

  test("large DV changesets stay off the driver: positions land as an " +
    "executor-written parquet sidecar directory") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val cap = ManagedWriter.DvInlineMax
    val base = (1L to (cap * 3L)).map(i => (i, i * 2)).toDF("id", "v")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base.repartition(4)); w.finalizeCommit()
    val nDel = cap + 2000L
    val changes = (1L to nDel).map(i => (i, 0L, "D")).toDF("id", "v", "op")
    val vNew = ManagedWriter.mergeDV(spark, dest, changes, Seq("id"))
    val md = new java.io.File(dest, "_graft_manifest")
    val src = scala.io.Source.fromFile(new java.io.File(md, f"dv-v-$vNew%08d.txt"))
    val sidecar = try src.getLines().toList finally src.close()
    assert(sidecar.length == 2 && sidecar(1) == "@pos",
      s"${nDel}-position DV went through the driver sidecar (${sidecar.length} lines)")
    assert(new java.io.File(md, f"dv-v-$vNew%08d.pos").isDirectory,
      "no executor-written position directory")
    // a dense changeset (contiguous ids round-robined across 4 files, so
    // per-file positions are dense but NOT run-structured) must take the
    // bitmap-per-file encoding: one row per touched file, cardinalities
    // summing to the deletion count, zero raw position rows
    val enc = spark.read.parquet(s"$dest/_graft_manifest/" + f"dv-v-$vNew%08d.pos")
    assert(enc.where(col("bitmap").isNotNull).count() > 0, "no bitmap rows")
    assert(enc.where(col("pos").isNotNull).count() == 0,
      "dense changeset produced raw position rows")
    assert(enc.agg(sum("card")).head.getLong(0) == nDel)
    assert(ManagedWriter.read(spark, dest).count() == cap * 3L - nDel)
    // deletions persist across a later append, survive vacuum's re-bind
    // (position-directory copy), and feed history's metadata counts
    val w2 = new ManagedWriter(spark, dest, base.schema, StreamType.Committed)
    w2.write(Seq((900001L, 1L)).toDF("id", "v"))
    assert(ManagedWriter.read(spark, dest).count() == cap * 3L - nDel + 1)
    ManagedWriter.vacuum(spark, dest, keepVersions = 1)
    assert(ManagedWriter.read(spark, dest).count() == cap * 3L - nDel + 1)
    val h = ManagedWriter.history(spark, dest).orderBy("version").collect()
    assert(h.last.getLong(3) == nDel, s"history deletion count: ${h.last}")
  }

  test("sparse large DV changesets fall back to per-position rows (bitmap would out-size them)") {
    import org.apache.spark.sql.functions._
    val n = 2500000L
    val base = spark.range(1, n + 1).select(col("id"), (col("id") * 2).as("v"))
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base.coalesce(1)); w.finalizeCommit()
    // every 200th row of a 2.5M-row file: 12.5k positions (over the inline
    // cap) whose dense bitmap (~312 KB) would out-size the raw longs
    val changes = spark.range(1, n + 1).where(col("id") % 200 === 0)
      .select(col("id"), lit(0L).as("v"), lit("D").as("op"))
    val vNew = ManagedWriter.mergeDV(spark, dest, changes, Seq("id"))
    val enc = spark.read.parquet(s"$dest/_graft_manifest/" + f"dv-v-$vNew%08d.pos")
    assert(enc.where(col("pos").isNotNull).count() == n / 200)
    assert(enc.where(col("bitmap").isNotNull).count() == 0,
      "sparse changeset took the bitmap encoding")
    assert(enc.where(col("runs").isNotNull).count() == 0,
      "sparse changeset took the run encoding")
    assert(ManagedWriter.read(spark, dest).count() == n - n / 200)
  }

  test("run-structured deletes take the run-list DV: >=4x smaller than the bitmap, " +
    "same read-back; alternating deletes still pick the bitmap") {
    import org.apache.spark.sql.functions._
    val n = 1000000L
    val base = spark.range(1, n + 1).select(col("id"), (col("id") * 3).as("v"))
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base.coalesce(1)); w.finalizeCommit()
    // 8 spans of 100k deletions each (the compaction / GDPR-range shape)
    val changes = spark.range(1, n + 1)
      .where(expr("id div 100000") % 2 === 1)
      .select(col("id"), lit(0L).as("v"), lit("D").as("op"))
    val nDel = changes.count()
    val vNew = ManagedWriter.mergeDV(spark, dest, changes, Seq("id"))
    val posDir = new java.io.File(s"$dest/_graft_manifest", f"dv-v-$vNew%08d.pos")
    val enc = spark.read.parquet(posDir.toString)
    assert(enc.where(col("runs").isNotNull).count() == 1, "expected ONE run-list row")
    assert(enc.where(col("bitmap").isNotNull or col("pos").isNotNull).count() == 0)
    assert(enc.agg(sum("card")).head.getLong(0) == nDel)
    // the size pin: the run sidecar beats the dense bitmap (maxPos/8+1
    // bytes) by >=4x on disk, parquet framing included
    val sidecarBytes = posDir.listFiles().map(_.length()).sum
    val bitmapBytes = n / 8 + 1
    assert(sidecarBytes * 4 <= bitmapBytes,
      s"run sidecar $sidecarBytes B is not >=4x under the $bitmapBytes B bitmap")
    // identical read-back: deleted spans gone, survivors intact
    val live = ManagedWriter.read(spark, dest)
    assert(live.count() == n - nDel)
    assert(live.where(expr("id div 100000") % 2 === 1).count() == 0)
    assert(live.agg(sum("v")).head.getLong(0) ==
      spark.range(1, n + 1).where(expr("id div 100000") % 2 === 0)
        .agg(sum(col("id") * 3)).head.getLong(0))
    // a second merge UNIONs through the run expansion (DvRef.df) and the
    // deletions compose
    ManagedWriter.mergeDV(spark, dest,
      spark.range(1, 101).select(col("id"), lit(0L).as("v"), lit("D").as("op")),
      Seq("id"))
    assert(ManagedWriter.read(spark, dest).count() == n - nDel - 100L)

    // alternating (dense but runny-free) deletes still pick the bitmap:
    // runs would cost 16 B/position vs 1 bit
    val dest2 = tmp()
    val w2 = new ManagedWriter(spark, dest2, base.schema, StreamType.Pending)
    w2.write(spark.range(1, 100001).select(col("id"), (col("id") * 3).as("v")).coalesce(1))
    w2.finalizeCommit()
    val v2 = ManagedWriter.mergeDV(spark, dest2,
      spark.range(1, 100001).where(col("id") % 2 === 0)
        .select(col("id"), lit(0L).as("v"), lit("D").as("op")),
      Seq("id"))
    val enc2 = spark.read.parquet(s"$dest2/_graft_manifest/" + f"dv-v-$v2%08d.pos")
    assert(enc2.where(col("bitmap").isNotNull).count() > 0, "alternating lost the bitmap")
    assert(enc2.where(col("runs").isNotNull).count() == 0)
    assert(ManagedWriter.read(spark, dest2).count() == 50000L)
  }

  test("one DV version mixes all three containers per file; the composed read filter is exact") {
    import org.apache.spark.sql.functions._
    // three files with contiguous id ranges (range partitioning), so the
    // per-file deletion PATTERN is chosen by id arithmetic: file 1 gets
    // contiguous spans (runs), file 2 alternating rows (bitmap), file 3
    // every-250th row (sparse positions)
    val n = 300000L
    val base = spark.range(1, n + 1).select(col("id"), (col("id") * 7).as("v"))
    val dest = tmp()
    val third = n / 3
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Committed)
    // three committed batches = three files with EXACT id ranges (range
    // partitioning samples boundaries, which would bleed one file's
    // pattern into the next and blur the per-file container choice)
    w.write(base.where(col("id") <= third).coalesce(1))
    w.write(base.where(col("id") > third && col("id") <= 2 * third).coalesce(1))
    w.write(base.where(col("id") > 2 * third).coalesce(1))
    val delPred =
      (col("id") <= third && (expr(s"(id - 1) div 10000") % 2) === 1) ||
      (col("id") > third && col("id") <= 2 * third && col("id") % 2 === 0) ||
      (col("id") > 2 * third && col("id") % 250 === 0)
    val changes = spark.range(1, n + 1).where(delPred)
      .select(col("id"), lit(0L).as("v"), lit("D").as("op"))
    val nDel = changes.count()
    val vNew = ManagedWriter.mergeDV(spark, dest, changes, Seq("id"))
    val enc = spark.read.parquet(s"$dest/_graft_manifest/" + f"dv-v-$vNew%08d.pos")
    assert(enc.where(col("runs").isNotNull).count() == 1, "span file lost the run container")
    assert(enc.where(col("bitmap").isNotNull).count() == 1, "alternating file lost the bitmap")
    assert(enc.where(col("pos").isNotNull).count() == third / 250,
      "sparse file lost the position rows")
    assert(enc.agg(sum("card")).head.getLong(0) == nDel)
    // the read filter composes anti-join + bitmap test + span exists —
    // survivors must equal the brute predicate complement exactly
    val live = ManagedWriter.read(spark, dest)
    assert(live.count() == n - nDel)
    assert(live.where(delPred).count() == 0, "a deleted row survived")
    assert(live.agg(sum("v")).head.getLong(0) ==
      spark.range(1, n + 1).where(!delPred).agg(sum(col("id") * 7)).head.getLong(0))
    // and the mixed version still expands correctly when a LATER merge
    // unions it (DvRef.df across all three containers at once)
    ManagedWriter.mergeDV(spark, dest,
      spark.range(1, n + 1).where(!delPred).limit(50)
        .select(col("id"), lit(0L).as("v"), lit("D").as("op")),
      Seq("id"))
    assert(ManagedWriter.read(spark, dest).count() == n - nDel - 50L)
  }

  test("DV container boundaries: exact runBytes==bitmapBytes tie, one giant span, " +
    "alternating single-position runs; mixed version survives vacuum re-bind and compact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // Three committed files with exact contiguous id ranges (position p in
    // a file = id - firstId), each engineered to sit ON an encoding
    // boundary rather than comfortably inside a container's home turf:
    //   A (ids 1..130000): 999 spans of 4 at position stride 128 plus one
    //     closing span at 127992 — EXACTLY runBytes = 16*1000 = 16000 and
    //     bitmapBytes = 127995/8+1 = 16000. The tie must pick the bitmap
    //     (run selection is strict-<), pinning the boundary so a future
    //     <= can't silently flip encodings.
    //   B (ids 130001..150000): every row deleted as ONE giant span — the
    //     degenerate best case for runs (16 bytes total).
    //   C (ids 150001..180000): alternating single-position runs — the
    //     degenerate WORST case for runs (16 B/position vs 1 bit).
    val base = spark.range(1, 180001).select(col("id"), (col("id") * 5).as("v"))
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Committed)
    w.write(base.where(col("id") <= 130000).coalesce(1))
    w.write(base.where(col("id") > 130000 && col("id") <= 150000).coalesce(1))
    w.write(base.where(col("id") > 150000).coalesce(1))
    val delA: Seq[Long] =
      (0 to 998).flatMap(k => (1L to 4L).map(j => 128L * k + j)) ++ (127993L to 127996L)
    val delB: Seq[Long] = (130001L to 150000L)
    val delC: Seq[Long] = (150001L to 180000L).filter(id => (id - 150001L) % 2 == 1)
    val delIds = delA ++ delB ++ delC
    assert(delIds.size > ManagedWriter.DvInlineMax, "fixture must exceed the inline cap")
    val changes = delIds.toDF("id")
      .select(col("id"), lit(0L).as("v"), lit("D").as("op"))
    val vNew = ManagedWriter.mergeDV(spark, dest, changes, Seq("id"))
    val enc = spark.read.parquet(s"$dest/_graft_manifest/" + f"dv-v-$vNew%08d.pos")
    // B: one run row holding ONE span of the whole file
    val runRows = enc.where(col("runs").isNotNull)
      .select(col("card"), size(col("runs")).as("ns")).collect()
    assert(runRows.map(r => (r.getLong(0), r.getInt(1))).toSeq == Seq((20000L, 1)),
      s"giant span: ${runRows.mkString(",")}")
    // A tie -> bitmap; C alternating -> bitmap
    val bmCards = enc.where(col("bitmap").isNotNull).select("card")
      .as[Long].collect().sorted.toSeq
    assert(bmCards == Seq(4000L, 15000L), s"bitmap cards: $bmCards")
    assert(enc.where(col("pos").isNotNull).count() == 0, "no file is positions-sparse here")
    assert(enc.agg(sum("card")).head.getLong(0) == delIds.size.toLong)
    // exact read-back across all three containers
    val live = ManagedWriter.read(spark, dest)
    assert(live.count() == 180000L - delIds.size)
    assert(live.where(col("id").isin(delA.take(50) ++ delB.take(50) ++ delC.take(50): _*))
      .count() == 0)
    // vacuum re-binds the mixed pos dir to the surviving version
    ManagedWriter.vacuum(spark, dest, keepVersions = 1)
    assert(ManagedWriter.read(spark, dest).count() == 180000L - delIds.size)
    // a later merge UNIONs through all three expansions at once (the
    // giant span must expand lazily through the long-stepped iterator)
    ManagedWriter.mergeDV(spark, dest,
      (5L to 14L).toDF("id").select(col("id"), lit(0L).as("v"), lit("D").as("op")),
      Seq("id"))
    assert(ManagedWriter.read(spark, dest).count() == 180000L - delIds.size - 10)
    // compact materializes the mixed DV: same rows, dv-free snapshot
    ManagedWriter.compact(spark, dest, targetFileBytes = 1L << 30)
    val post = ManagedWriter.read(spark, dest)
    assert(post.count() == 180000L - delIds.size - 10)
    val allSum = (1L to 180000L).map(_ * 5L).sum
    val goneSum = delIds.map(_ * 5L).sum + (5L to 14L).map(_ * 5L).sum
    assert(post.agg(sum("v")).head.getLong(0) == allSum - goneSum)
  }

  test("manifest log is segmented: bounded deltas between full-snapshot checkpoints, " +
    "vacuum materializes kept versions") {
    import spark.implicits._
    val dest = tmp()
    val first = Seq((0L, "r0")).toDF("id", "v")
    val w = new ManagedWriter(spark, dest, first.schema, StreamType.Committed)
    (1 to 14).foreach(i => w.write(Seq((i.toLong, s"r$i")).toDF("id", "v")))
    def lines(ver: Long) = {
      val src = scala.io.Source.fromFile(
        new java.io.File(s"$dest/_graft_manifest", f"v-$ver%08d.txt"))
      try src.getLines().toList finally src.close()
    }
    val vs = ManagedWriter.versions(spark, dest)
    assert(vs == (1L to 15L), s"expected v1..v15, got $vs")
    // between checkpoints a commit writes ONLY its own changes...
    assert(lines(5).headOption.contains("#delta"), s"v5 not a delta: ${lines(5)}")
    assert(lines(15).headOption.contains("#delta"))
    assert(lines(15).length <= 4,
      s"delta commit bytes grew with table size: ${lines(15)}")
    // ...while every ManifestCheckpointEvery-th version is a full snapshot
    assert(!lines(10).headOption.contains("#delta"), "v10 checkpoint missing")
    assert(lines(10).count(_.nonEmpty) >= 9, s"v10 snapshot too small: ${lines(10)}")
    // resolution through the delta chain matches the logical history
    assert(ManagedWriter.read(spark, dest).count() == 14)
    assert(ManagedWriter.readVersion(spark, dest, 8L).count() == 7)
    assert(ManagedWriter.readVersion(spark, dest, 13L).count() == 12)
    // vacuum keeps only deltas (v13..v15): each must be materialized to a
    // full snapshot so it survives its base checkpoint's deletion
    val (dropped, _) = ManagedWriter.vacuum(spark, dest, keepVersions = 3)
    assert(dropped == 12)
    Seq(13L, 14L, 15L).foreach { v =>
      assert(!lines(v).headOption.contains("#delta"), s"v$v still a delta post-vacuum")
      assert(ManagedWriter.readVersion(spark, dest, v).count() == v - 1)
    }
    assert(ManagedWriter.read(spark, dest).count() == 14)
  }

  test("without evolution the schema guard still rejects wider batches") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("id", "v")
    val w = new ManagedWriter(spark, tmp(), df.schema, StreamType.Pending)
    assertThrows[IllegalArgumentException] {
      w.write(df.withColumn("extra", org.apache.spark.sql.functions.lit(1L)))
    }
  }

  test("concurrent merge conflict: stale writer fails loudly, no lost update, retry lands") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, i * 10L)).toDF("id", "v")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, df.schema, StreamType.Pending)
    w.write(df); w.finalizeCommit()
    val vBase = ManagedWriter.versions(spark, dest).last
    val winner = Seq((1L, 111L, "U")).toDF("id", "v", "op")
    val loser = Seq((2L, 0L, "D")).toDF("id", "v", "op")
    // The loser computes against vBase; just before its version claim a
    // competing merge publishes vBase+1 → the loser's fail-if-exists
    // commit must surface a conflict, never silently overwrite.
    val ex = intercept[java.io.IOException] {
      ManagedWriter.mergeImpl(
        spark, dest, loser, Seq("id"), "op", crashBeforePublish = false,
        beforePublish =
          () => { ManagedWriter.merge(spark, dest, winner, Seq("id")); () })
    }
    assert(ex.getMessage.contains("conflict"), ex.getMessage)
    // Winner's update is authoritative; loser's delete did NOT apply.
    val latest = ManagedWriter.read(spark, dest)
    assert(latest.where($"id" === 1L).select("v").as[Long].head() == 111L)
    assert(latest.where($"id" === 2L).count() == 1L)
    assert(ManagedWriter.versions(spark, dest).last == vBase + 1)
    // Conflict recovery contract: re-run against the NEW snapshot — both
    // effects now present, one version later.
    val vRetry = ManagedWriter.merge(spark, dest, loser, Seq("id"))
    assert(vRetry == vBase + 2)
    val after = ManagedWriter.read(spark, dest)
    assert(after.where($"id" === 2L).count() == 0L)
    assert(after.where($"id" === 1L).select("v").as[Long].head() == 111L)
  }

  test("compactWhere rewrites only the stats-matching files; rest ride untouched") {
    import org.apache.spark.sql.functions.col
    val ord = Tables(spark, sfDir, "orders")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, ord.schema, StreamType.Pending)
    w.write(ord.repartitionByRange(8, col("o_orderkey")))
    w.finalizeCommit()
    val before = ManagedWriter.read(spark, dest)
    val beforeFiles = before.inputFiles.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    val maxKey = before.agg(org.apache.spark.sql.functions.max("o_orderkey")).head().getLong(0)
    val v1 = ManagedWriter.versions(spark, dest).last
    val v2 = ManagedWriter.compactWhere(spark, dest, targetFileBytes = 1L << 30,
      Seq(org.apache.spark.sql.sources.LessThan("o_orderkey", maxKey / 2)))
    assert(v2 == v1 + 1)
    val after = ManagedWriter.read(spark, dest)
    val afterFiles = after.inputFiles.map(f => f.substring(f.lastIndexOf('/') + 1)).toSet
    val untouched = beforeFiles.intersect(afterFiles)
    // some files survived by name (out-of-range) and some were rewritten
    assert(untouched.nonEmpty, "scoped compaction rewrote everything")
    assert(afterFiles.size < beforeFiles.size, "no compaction happened")
    assert(rowsOf(after) == rowsOf(before))
    // scoping to an impossible range is a no-op version-wise
    assert(ManagedWriter.compactWhere(spark, dest, 1L << 30,
      Seq(org.apache.spark.sql.sources.GreaterThan("o_orderkey", maxKey + 1000000L))) == v2)
  }

  test("compactWhere is DV-aware: deletions materialize in scope, persist out of scope") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = (1L to 100L).map(i => (i, i * 10L)).toDF("id", "v")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base.repartitionByRange(4, col("id")))
    w.finalizeCommit()
    // delete ids 10 (low range) and 90 (high range) via DV
    ManagedWriter.mergeDV(spark, dest,
      Seq((10L, 0L, "D"), (90L, 0L, "D")).toDF("id", "v", "op"), Seq("id"), "op")
    val beforeRows = ManagedWriter.read(spark, dest).select("id").as[Long].collect().toSet
    assert(!beforeRows.contains(10L) && !beforeRows.contains(90L))
    // compact only the low half: 10's deletion materializes, 90's DV persists
    ManagedWriter.compactWhere(spark, dest, 1L << 30,
      Seq(org.apache.spark.sql.sources.LessThan("id", 50L)))
    val afterRows = ManagedWriter.read(spark, dest).select("id").as[Long].collect().toSet
    assert(afterRows == beforeRows, "scoped compaction changed the visible row set")
  }

  test("txn sidecar watermark: committed batches are durable, crashed commits invisible") {
    val sup = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    assert(ManagedWriter.lastCommittedBatch(spark, dest, "q1") == -1L)
    val w0 = new ManagedWriter(spark, dest, sup.schema, StreamType.Pending,
      txn = Some(("q1", 0L)))
    w0.write(sup); w0.finalizeCommit()
    val w1 = new ManagedWriter(spark, dest, sup.schema, StreamType.Pending,
      txn = Some(("q1", 1L)))
    w1.write(sup); w1.finalizeCommit()
    assert(ManagedWriter.lastCommittedBatch(spark, dest, "q1") == 1L)
    assert(ManagedWriter.lastCommittedBatch(spark, dest, "other") == -1L)
    // the dangerous seam: txn sidecar ON DISK, manifest never published —
    // the md5 binding must reject it and the watermark must not move
    val w2 = new ManagedWriter(spark, dest, sup.schema, StreamType.Pending,
      txn = Some(("q1", 2L)))
    w2.write(sup)
    w2.crashAfterTxn = true
    intercept[java.io.IOException](w2.finalizeCommit())
    assert(ManagedWriter.lastCommittedBatch(spark, dest, "q1") == 1L,
      "a crashed commit's txn sidecar must not advance the watermark")
  }

  test("compactZorder clusters so a 2nd-column range decides whole files; rows unchanged") {
    import org.apache.spark.sql.functions.col
    val ord = Tables(spark, sfDir, "orders")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, ord.schema, StreamType.Pending)
    w.write(ord.repartition(8)) // round-robin: every file spans every range
    w.finalizeCommit()
    val before = rowsOf(ManagedWriter.read(spark, dest))
    ManagedWriter.compactZorder(spark, dest, targetFileBytes = 64L << 10,
      clusterCols = Seq("o_custkey", "o_totalprice"))
    assert(rowsOf(ManagedWriter.read(spark, dest)) == before)
    // a narrow o_custkey range must now be DECIDABLE from stats for most
    // files (round-robin layout decides none — every file spans the range)
    val (decided, scanned) = ManagedWriter.read(spark, dest).inputFiles.length match {
      case nf if nf >= 4 =>
        val fs = new org.apache.hadoop.fs.Path(dest)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val stats = graft.sinks.DataSkipping.readStats(fs, dest)
        val files = ManagedWriter.read(spark, dest).inputFiles
          .map(f => f.substring(f.lastIndexOf('/') + 1))
        val filter = org.apache.spark.sql.sources.LessThan("o_custkey", 50L)
        val excluded = files.count(f =>
          stats.get(f).exists(st => !graft.sinks.DataSkipping.mightMatch(st, filter)))
        (excluded, files.length)
      case nf => (nf, nf)
    }
    assert(decided > 0, s"zorder layout decided no files ($scanned scanned)")
  }

  test("CHECK constraints reject a violating batch whole; clean batches commit") {
    import spark.implicits._
    val schema = Seq((1L, 5.0)).toDF("id", "v").schema
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, schema, StreamType.Pending,
      checks = Seq(graft.ops.Validate.InRange("v", 0.0, 100.0), graft.ops.Validate.NotNull("id")))
    w.write(Seq((1L, 5.0), (2L, 99.0)).toDF("id", "v"))
    val bad = intercept[IllegalArgumentException] {
      w.write(Seq((3L, 5.0), (4L, 500.0)).toDF("id", "v"))
    }
    assert(bad.getMessage.contains("in_range_v"), bad.getMessage)
    w.finalizeCommit()
    // only the clean batch landed
    assert(ManagedWriter.read(spark, dest).count() == 2L)
  }

  test("restore rolls back as a new commit; bad head stays travelable; DVs survive") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val base = (1L to 50L).map(i => (i, i * 2L)).toDF("id", "v")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w.write(base); w.finalizeCommit()
    val v1 = ManagedWriter.versions(spark, dest).last
    // delete id 7 via DV at v2, then a "bad" append at v3
    ManagedWriter.mergeDV(spark, dest,
      Seq((7L, 0L, "D")).toDF("id", "v", "op"), Seq("id"), "op")
    val v2 = ManagedWriter.versions(spark, dest).last
    val w2 = new ManagedWriter(spark, dest, base.schema, StreamType.Pending)
    w2.write(Seq((999L, 0L)).toDF("id", "v")); w2.finalizeCommit()
    assert(ManagedWriter.read(spark, dest).where(col("id") === 999L).count() == 1L)
    // restore to v2: the bad row is gone, the DV deletion still applies
    val v4 = ManagedWriter.restore(spark, dest, v2)
    val now = ManagedWriter.read(spark, dest)
    assert(now.where(col("id") === 999L).count() == 0L)
    assert(now.where(col("id") === 7L).count() == 0L, "restore dropped the deletion vector")
    assert(now.count() == 49L)
    // forward history intact: the bad head is still readable
    assert(ManagedWriter.readVersion(spark, dest, v4 - 1)
      .where(col("id") === 999L).count() == 1L)
    // restoring a never-committed version fails loudly
    intercept[IllegalArgumentException](ManagedWriter.restore(spark, dest, 9999L))
    assert(v4 > v2 && ManagedWriter.versions(spark, dest).last == v4)
    assert(ManagedWriter.readVersion(spark, dest, v1).count() == 50L)
  }

  test("partitioned managed writes: nested manifest, partition pruning, vacuum-safe") {
    import org.apache.spark.sql.functions.col
    val ord = Tables(spark, sfDir, "orders")
    val dest = tmp()
    val w = new ManagedWriter(spark, dest, ord.schema, StreamType.Pending,
      partitionCols = Seq("o_orderpriority"))
    w.write(ord)
    w.finalizeCommit()
    val read = ManagedWriter.read(spark, dest)
    assert(read.count() == ord.count())
    assert(read.inputFiles.exists(_.contains("o_orderpriority=")),
      "files did not land under partition directories")
    // the partition column survives the round trip with its values
    assert(read.select("o_orderpriority").distinct().count() ==
      ord.select("o_orderpriority").distinct().count())
    // partition PRUNING: the filter lands in PartitionFilters (plan-time
    // directory pruning), not just as a data filter
    val prunedPlan = read.filter(col("o_orderpriority") === "1-URGENT")
      .queryExecution.executedPlan.toString
    assert(prunedPlan.contains("PartitionFilters") &&
      prunedPlan.replaceAll("\\s", "").matches("(?s).*PartitionFilters:\\[[^\\]]*1-URGENT.*"),
      s"priority filter did not become a partition filter:\n$prunedPlan")
    // a second partitioned append + compact + vacuum keep the table whole
    val w2 = new ManagedWriter(spark, dest, ord.schema, StreamType.Pending,
      partitionCols = Seq("o_orderpriority"))
    w2.write(ord.limit(100)); w2.finalizeCommit()
    assert(ManagedWriter.read(spark, dest).count() == ord.count() + 100)
    ManagedWriter.compact(spark, dest, targetFileBytes = 1L << 30)
    ManagedWriter.vacuum(spark, dest, keepVersions = 1)
    assert(ManagedWriter.read(spark, dest).count() == ord.count() + 100)
  }

  test("vacuum re-anchors txn watermarks instead of silently regressing them") {
    val sup = Tables(spark, sfDir, "supplier")
    val dest = tmp()
    (0L to 2L).foreach { bid =>
      val w = new ManagedWriter(spark, dest, sup.schema, StreamType.Pending,
        txn = Some(("q1", bid)))
      w.write(sup); w.finalizeCommit()
    }
    assert(ManagedWriter.lastCommittedBatch(spark, dest, "q1") == 2L)
    // a maintenance commit AFTER the stream (no txn) moves the head, so
    // keepVersions=1 drops every version the watermarks were bound to
    ManagedWriter.compact(spark, dest, targetFileBytes = 1L << 30)
    ManagedWriter.vacuum(spark, dest, keepVersions = 1)
    assert(ManagedWriter.lastCommittedBatch(spark, dest, "q1") == 2L,
      "vacuum regressed the exactly-once watermark — replays would double-append")
    // and the table still reads
    assert(ManagedWriter.read(spark, dest).count() == sup.count() * 3)
  }

  test("versionDiff reports insert/delete/update by key and drops unchanged rows") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dest = tmp()
    val v1df = Seq((1L, "keep"), (2L, "gone"), (3L, "old")).toDF("id", "v")
    val w = new ManagedWriter(spark, dest, v1df.schema, StreamType.Committed)
    w.write(v1df)
    val v1 = ManagedWriter.versions(spark, dest).max
    val changes = Seq(
      (2L, "gone", "D"), // delete
      (3L, "new", "U"), // update
      (4L, "born", "U")) // insert (unmatched upsert)
      .toDF("id", "v", "op")
    ManagedWriter.merge(spark, dest, changes, Seq("id"))
    val v2 = ManagedWriter.versions(spark, dest).max
    val diff = ManagedWriter.versionDiff(spark, dest, v1, v2, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(diff == Map(2L -> "delete", 3L -> "update", 4L -> "insert"), s"got $diff")
    // reversed direction swaps insert/delete and keeps the update
    val rev = ManagedWriter.versionDiff(spark, dest, v2, v1, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(rev == Map(2L -> "insert", 3L -> "update", 4L -> "delete"), s"got $rev")
    // schema evolution: a version-exclusive column alone is not an update
    val w2 = new ManagedWriter(spark, dest, Seq((0L, "")).toDF("id", "v").schema,
      StreamType.Committed, allowSchemaEvolution = true)
    w2.write(Seq((5L, "wide", 1L)).toDF("id", "v", "extra"))
    val v3 = ManagedWriter.versions(spark, dest).max
    val d23 = ManagedWriter.versionDiff(spark, dest, v2, v3, Seq("id"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d23 == Map(5L -> "insert"), s"shared-column diff drifted: $d23")
  }
}
