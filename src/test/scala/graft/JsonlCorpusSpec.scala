package graft

import java.nio.file.{Files, Paths}
import java.util.UUID

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.JsonlCorpus

/** JSONL ingest + corrupt-record quarantine (≈ the ingest half of the
  * pipeline contract over the format corpora actually ship as).
  */
class JsonlCorpusSpec extends SparkSpec {

  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("n", LongType)))

  private def tmpDir(): String = {
    val d = s"${System.getProperty("java.io.tmpdir")}/graft-jsonl-${UUID.randomUUID().toString.take(8)}"
    Files.createDirectories(Paths.get(d))
    d
  }

  test("splits parseable objects from malformed lines, preserving both exactly") {
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/part-0.jsonl"),
      """{"doc_id": 1, "text": "hello world", "n": 11}
        |{"doc_id": 2, "text": "quote \" and \n newline", "n": 3}
        |{"doc_id": oops not json
        |garbage line
        |null
        |
        |{"doc_id": 3, "n": 7}
        |""".stripMargin)
    val (good, quarantine) = JsonlCorpus.readJsonl(spark, dir, schema)
    val g = good.orderBy("doc_id").collect()
    assert(g.length == 3)
    assert(g(0).getLong(0) == 1L && g(0).getString(1) == "hello world")
    assert(g(1).getString(1) == "quote \" and \n newline", "escapes must round-trip")
    assert(g(2).getLong(0) == 3L && g(2).isNullAt(1), "missing field parses as null, not corrupt")
    val q = quarantine.orderBy("corrupt_record").collect().map(_.getString(0))
    assert(q.length == 3, s"quarantine: ${q.toSeq}")
    assert(q.contains("garbage line") && q.exists(_.contains("oops")),
      "quarantine must keep the raw line byte-for-byte")
    // The JSON literal `null` is a scalar, not a document — it must be
    // quarantined, never surfaced as a phantom all-null row.
    assert(q.contains("null"), "JSON literal null line must be quarantined")
  }

  test("writeJsonl → readJsonl round-trips the documents fixture exactly") {
    val docs = Tables(spark, sfDir, "documents")
    val dir = tmpDir()
    JsonlCorpus.writeJsonl(docs, dir)
    val (good, quarantine) = JsonlCorpus.readJsonl(
      spark, dir,
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType),
        StructField("source", StringType),
        StructField("n_chars", LongType))))
    assert(quarantine.count() == 0)
    val a = good.orderBy("doc_id").collect()
    val b = docs.select("doc_id", "text", "lang", "source", "n_chars").orderBy("doc_id").collect()
    assert(a.length == b.length)
    assert(a.zip(b).forall { case (x, y) => x == y }, "JSONL round trip must be lossless")
  }

  test("streaming ingest classifies every line exactly like the batch reader") {
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/a.jsonl"),
      (1 to 20).map(i =>
        if (i % 5 == 0) s"broken $i" else s"""{"doc_id": $i, "text": "t$i", "n": $i}""")
        .mkString("\n"))
    Files.writeString(Paths.get(s"$dir/b.jsonl"),
      (21 to 40).map(i =>
        if (i % 5 == 0) s"broken $i" else s"""{"doc_id": $i, "text": "t$i", "n": $i}""")
        .mkString("\n"))
    @volatile var goodIds = Set.empty[Long]
    @volatile var corrupt = Set.empty[String]
    @volatile var triggers = 0
    val q = JsonlCorpus.readJsonlStream(spark, dir, schema) { (good, quarantine) =>
      triggers += 1
      goodIds ++= good.collect().map(_.getLong(0))
      corrupt ++= quarantine.collect().map(_.getString(0))
    }
    try q.processAllAvailable()
    finally q.stop()
    assert(triggers >= 1)
    val (bGood, bQuar) = JsonlCorpus.readJsonl(spark, dir, schema)
    assert(goodIds == bGood.collect().map(_.getLong(0)).toSet,
      "streaming good split diverged from the batch reader")
    assert(corrupt == bQuar.collect().map(_.getString(0)).toSet,
      "streaming quarantine diverged from the batch reader")
    assert(goodIds.size == 32 && corrupt.size == 8)
  }

  test("quarantine split never drops a line: good + corrupt = non-blank lines") {
    val dir = tmpDir()
    Files.writeString(Paths.get(s"$dir/mix.jsonl"),
      (1 to 50).map(i =>
        if (i % 7 == 0) s"corrupt $i" else s"""{"doc_id": $i, "text": "t$i", "n": $i}""")
        .mkString("\n"))
    val (good, quarantine) = JsonlCorpus.readJsonl(spark, dir, schema)
    assert(good.count() + quarantine.count() == 50)
    assert(quarantine.count() == 7)
  }
}
