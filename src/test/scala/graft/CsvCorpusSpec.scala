package graft

import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.CsvCorpus

/** CSV ingest + corrupt-record quarantine — the JSONL contract over the
  * other dump format (line-oriented; quoted fields round-trip within a
  * line).
  */
class CsvCorpusSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("n", LongType)))

  private def tmpDir(): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft-csv-${UUID.randomUUID().toString.take(8)}"
    Files.createDirectories(Paths.get(d))
    d
  }

  test("splits parseable rows from malformed lines, preserving both exactly") {
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/part-0.csv"),
      """1,hello world,11
        |2,"comma, quote "" inside",3
        |oops,not a long id,5
        |3,short row missing n,
        |4,ok,notanumber
        |
        |""".stripMargin)
    val (good, quarantine) = CsvCorpus.readCsv(spark, dir, schema)
    val g = good.orderBy("doc_id").collect()
    assert(g.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L), s"good: ${g.toSeq}")
    assert(g(1).getString(1) == "comma, quote \" inside",
      "quoting must round-trip within a line")
    assert(g(2).isNullAt(2), "missing trailing field parses as null, not corrupt")
    val q = quarantine.collect().map(_.getString(0))
    assert(q.length == 2, s"quarantine: ${q.toSeq}")
    assert(q.exists(_.startsWith("oops")) && q.exists(_.endsWith("notanumber")),
      "quarantine must keep the raw line byte-for-byte")
  }

  test("writeCsv -> readCsv round-trips the documents fixture exactly") {
    val docs = Tables(spark, sfDir, "documents")
    val dir = tmpDir()
    CsvCorpus.writeCsv(docs, dir)
    val (good, quarantine) = CsvCorpus.readCsv(
      spark, dir,
      StructType(Seq(
        StructField("doc_id", LongType), StructField("text", StringType),
        StructField("lang", StringType), StructField("source", StringType),
        StructField("n_chars", LongType))))
    assert(quarantine.count() == 0)
    assert(good.count() == docs.count())
    assert(
      good.orderBy("doc_id").collect().toSeq ==
        docs.orderBy("doc_id").collect().toSeq,
      "CSV round trip must be lossless for the fixture corpus")
  }

  test("streaming twin classifies identically to the batch kernel") {
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/part-0.csv"),
      "1,alpha,5\nbad id,x,1\n2,beta,4\n")
    var goodRows = Seq.empty[(Long, String)]
    var badRows = Seq.empty[String]
    val q = CsvCorpus.readCsvStream(spark, dir, schema) { (good, quarantine) =>
      goodRows = goodRows ++ good.select("doc_id", "text").as[(Long, String)].collect()
      badRows = badRows ++ quarantine.as[String].collect()
    }
    try q.processAllAvailable()
    finally q.stop()
    assert(goodRows.toSet == Set((1L, "alpha"), (2L, "beta")))
    assert(badRows == Seq("bad id,x,1"))
  }
}
