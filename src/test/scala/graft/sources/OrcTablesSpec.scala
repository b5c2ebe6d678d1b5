package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OrcTablesSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    s"${System.getProperty("java.io.tmpdir")}/graft-orcspec-$tag-" +
      java.util.UUID.randomUUID().toString.take(8)

  test("ORC round-trip is lossless incl. nulls and unicode") {
    val df = Seq(
      (1L, Some("héllo ✓ world"), "en", 42L),
      (2L, None, "de", 7L),
      (3L, Some("tab\tand\nnewline"), "en", 0L)
    ).toDF("id", "text", "lang", "n")
    val path = tmp("rt")
    OrcTables.writeOrc(df, path)
    val back = OrcTables.readOrc(spark, path)
    assert(back.schema.map(f => (f.name, f.dataType)).toSet ==
      df.schema.map(f => (f.name, f.dataType)).toSet)
    assert(back.orderBy("id").collect().toSeq ==
      df.orderBy("id").collect().toSeq)
  }

  test("predicate pushes into the ORC scan; partition filter prunes directories") {
    val df = (1L to 100L).map(i => (i, s"t$i", if (i % 2 == 0) "en" else "de"))
      .toDF("id", "text", "lang")
    val path = tmp("push")
    OrcTables.writeOrc(df, path, partitionCols = Seq("lang"))
    val q = OrcTables.readOrc(spark, path)
      .where(col("lang") === "en" && col("id") > 90L)
    val plan = q.queryExecution.executedPlan.toString
    // The data-column predicate reaches the ORC reader...
    assert(plan.contains("PushedFilters") && plan.contains("GreaterThan(id,90)"),
      plan)
    // ...and the partition-column predicate never appears as a row filter:
    // it resolves at planning time to the lang=en directory alone.
    assert(plan.contains("lang=en") || plan.contains("PartitionFilters"), plan)
    assert(q.count() == 5)
    assert(q.select(sum("id")).as[Long].head() == (92L to 100L by 2).sum)
  }
}
