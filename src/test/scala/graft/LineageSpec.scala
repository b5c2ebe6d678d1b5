package graft

import org.apache.spark.sql.functions._

import graft.engine.Lineage

/** Column-lineage walker: every column-introducing plan shape attributes
  * to the right physical (table, column) set, and ORC round-trips keep
  * the pushdown contract.
  */
class LineageSpec extends SparkSpec {

  import spark.implicits._

  private def lineageOf(df: org.apache.spark.sql.DataFrame): Map[String, Set[(String, String)]] =
    Lineage.columnLineage(df).collect()
      .groupBy(_.getString(0))
      .map { case (k, rows) =>
        k -> rows.flatMap(r =>
          Option(r.getString(1)).map(t => (t, r.getString(2)))).toSet
      }

  test("join + aggregate + CASE attributes every output to its physical columns") {
    Tables.registerAll(spark, sfDir)
    val q = spark.sql(
      """SELECT n.n_name AS nation, SUM(s.s_acctbal) AS bal, COUNT(*) AS n,
        |  MAX(CASE WHEN s.s_acctbal > 0 THEN n.n_regionkey ELSE s.s_suppkey END) AS mixed
        |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
        |GROUP BY n.n_name""".stripMargin)
    val got = lineageOf(q)
    assert(got("nation") == Set(("nation", "n_name")))
    assert(got("bal") == Set(("supplier", "s_acctbal")))
    assert(got("n") == Set.empty, "count(*) has no physical source")
    assert(got("mixed") == Set(
      ("nation", "n_regionkey"), ("supplier", "s_acctbal"), ("supplier", "s_suppkey")))
  }

  test("window, explode, and union shapes carry lineage through") {
    Tables.registerAll(spark, sfDir)
    val w = spark.sql(
      """SELECT s_name, rank() OVER (PARTITION BY s_nationkey ORDER BY s_acctbal) AS rk
        |FROM supplier""".stripMargin)
    val gw = lineageOf(w)
    assert(gw("rk") == Set(("supplier", "s_nationkey"), ("supplier", "s_acctbal")), gw("rk"))
    val e = spark.sql(
      "SELECT doc_id, tok FROM documents LATERAL VIEW explode(split(text, ' ')) AS tok")
    val ge = lineageOf(e)
    assert(ge("tok") == Set(("documents", "text")), ge("tok"))
    val u = spark.sql(
      """SELECT s_name AS who FROM supplier
        |UNION ALL SELECT c_name FROM customer""".stripMargin)
    val gu = lineageOf(u)
    assert(gu("who") == Set(("supplier", "s_name"), ("customer", "c_name")), gu("who"))
  }

  test("nested views attribute to the innermost relation, not the view stack") {
    Tables.registerAll(spark, sfDir)
    spark.sql("SELECT s_suppkey AS k, s_acctbal AS v FROM supplier")
      .createOrReplaceTempView("inner_view")
    val q = spark.sql("SELECT k, v * 2 AS dbl FROM inner_view")
    val g = lineageOf(q)
    assert(g("k") == Set(("supplier", "s_suppkey")), g("k"))
    assert(g("dbl") == Set(("supplier", "s_acctbal")), g("dbl"))
  }

  test("result cache: miss then hit across respelled plans; distinct plans never collide") {
    import graft.engine.ResultCache
    val sup = Tables(spark, sfDir, "supplier")
    val dir = java.nio.file.Files.createTempDirectory("graft-rc-spec").toString
    val q1 = sup.groupBy("s_nationkey").agg(count(lit(1)).as("n"))
    val (r1, hit1) = ResultCache.cached(q1, dir)
    assert(!hit1, "first run must miss")
    // same plan, different alias + fresh expression ids → canonical HIT
    val q2 = sup.groupBy("s_nationkey").agg(count(lit(1)).as("other"))
      .withColumnRenamed("other", "n")
    val (r2, hit2) = ResultCache.cached(q2, dir)
    assert(hit2, "canonically-equal plan must hit")
    assert(r1.orderBy("s_nationkey").collect().toSeq ==
      r2.orderBy("s_nationkey").collect().toSeq, "hit replayed different rows")
    // a genuinely different plan (new filter) must MISS, not collide
    val (_, hit3) = ResultCache.cached(q1.where(col("s_nationkey") > 5), dir)
    assert(!hit3, "different plan collided with the cache")
  }

  test("result cache: plans differing only past maxToStringFields never collide") {
    // TreeNode's default rendering truncates expression lists at
    // spark.sql.debug.maxToStringFields (25): two projections identical in
    // their first 25 columns but different in the 30th rendered to the
    // SAME string, so a toString-keyed cache served a false hit (ADVICE
    // r10). The key must cover the whole plan.
    import graft.engine.ResultCache
    val sup = Tables(spark, sfDir, "supplier")
    val dir = java.nio.file.Files.createTempDirectory("graft-rc-wide").toString
    def wide(last: org.apache.spark.sql.Column) = sup.select(
      (0 until 29).map(i => (col("s_suppkey") + lit(i)).as(s"c$i")) :+ last.as("c29"): _*)
    val (r1, hit1) = ResultCache.cached(wide(col("s_suppkey") * 2), dir)
    assert(!hit1)
    val (r2, hit2) = ResultCache.cached(wide(col("s_suppkey") * 3), dir)
    assert(!hit2, "plans differing only past the 25-field render limit collided")
    assert(r1.agg(sum(col("c29"))).head().getLong(0) !=
      r2.agg(sum(col("c29"))).head().getLong(0))
  }

  test("filesTable is metadata-only-consistent with the table it describes") {
    import graft.sinks.{ManagedWriter, StreamType}
    val sup = Tables(spark, sfDir, "supplier")
    val dest = java.nio.file.Files.createTempDirectory("graft-ft-spec").toString + "/t"
    val w = new ManagedWriter(spark, dest, sup.schema, StreamType.Committed)
    w.write(sup)
    val ft = ManagedWriter.filesTable(spark, dest, Some("s_suppkey")).collect()
    assert(ft.nonEmpty)
    assert(ft.map(_.getAs[Long]("row_count")).sum == sup.count())
    assert(ft.map(_.getAs[Long]("size_bytes")).forall(_ > 0))
    assert(ft.map(r => r.getString(3).toLong).min ==
      sup.agg(min("s_suppkey")).head().getLong(0))
    assert(ft.map(r => r.getString(4).toLong).max ==
      sup.agg(max("s_suppkey")).head().getLong(0))
  }

  test("ORC round-trip preserves rows and pushes filters into the ORC scan") {
    val sup = Tables(spark, sfDir, "supplier")
    val path = java.nio.file.Files.createTempDirectory("graft-orc-spec").toString
    sup.write.mode("overwrite").orc(path)
    val back = spark.read.orc(path).where(col("s_suppkey") > 10)
      .select("s_suppkey", "s_acctbal")
    val plan = back.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(s_suppkey,10)"),
      s"ORC scan did not receive the pushed filter:\n$plan")
    assert(plan.contains("ReadSchema") && !plan.contains("s_name"),
      "ORC scan did not prune unused columns")
    assert(back.count() == sup.where(col("s_suppkey") > 10).count())
    // lossless values, not just counts
    val a = spark.read.orc(path).orderBy("s_suppkey").collect().map(_.toString).toSeq
    val b = sup.orderBy("s_suppkey").collect().map(_.toString).toSeq
    assert(a == b, "ORC round-trip changed row content")
  }
}
