package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** JSONL (one JSON object per line) corpus ingest with corrupt-record
  * quarantine — the wire format training corpora actually ship as
  * (reference analogue: the ingest half of the pipeline contract,
  * `pipeline.go:61-89`, which assumes clean upstream rows; a crawl dump
  * has no such guarantee, so ingest must split good rows from garbage
  * without failing the job).
  *
  * Design: read the file as TEXT lines and parse each line with
  * `from_json` against the caller's explicit schema — one scan-local
  * projection, no shuffle. This deliberately avoids
  * `spark.read.json(...).filter($"_corrupt_record".isNotNull)`, which
  * Spark disallows without caching the whole frame (the referenced-
  * columns-only-include-the-corrupt-column restriction): at 100 TB,
  * "cache the corpus to find the bad lines" is not a plan. Here the good
  * split and the quarantine split are two filters over the same
  * scan-local parse, and Spark schedules each as a plain pass over the
  * text files.
  *
  * A line is quarantined when it does not parse COMPLETELY into the
  * schema: malformed JSON, a JSON scalar/array, or an object with a
  * mistyped field value — no silent per-field data loss. A valid object
  * with missing/extra fields parses with nulls for the missing fields —
  * schema drift is the caller's policy decision, not corruption (same
  * stance as the managed writer's schema guard,
  * `bigquery_write.go:149-153`).
  */
object JsonlCorpus {

  /** Write `df` as JSONL under `path` (Spark's JSON sink: one object per
    * line, proper string escaping — control chars and quotes survive the
    * round trip).
    */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Read a JSONL corpus: `(good, quarantine)`.
    *   - `good`: one row per fully-parsed line, in `schema`'s columns
    *     (an object with MISSING fields parses with nulls — schema drift,
    *     not corruption);
    *   - `quarantine`: `(corrupt_record)` — the raw text of every line
    *     that did not parse completely (malformed JSON, or a mistyped
    *     field value), preserved byte-for-byte for triage/replay.
    * Blank lines (JSON writers don't emit them, but hand-edited or
    * concatenated dumps do) are dropped, matching `spark.read.json`.
    */
  def readJsonl(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) =
    splitLines(spark.read.textFile(path).toDF("line"), schema)

  /** The shared parse kernel behind the batch and streaming readers:
    * classify raw `line` rows into (good, quarantine).
    *
    * PERMISSIVE from_json alone cannot flag bad lines (it returns an
    * all-null struct, indistinguishable from `{}`); the documented
    * detection contract is the corrupt-record column: a line that fails
    * to parse completely lands verbatim in that field. Two corrupt
    * shapes: a populated corrupt-record field (malformed object /
    * mistyped field), and a NULL struct — from_json's result for the
    * JSON literal `null`, which is a scalar, not a document, and must
    * not become a phantom all-null row.
    */
  private def splitLines(
      lines: DataFrame,
      schema: StructType): (DataFrame, DataFrame) = {
    require(!schema.fieldNames.contains(CorruptField),
      s"schema must not declare reserved field $CorruptField")
    val parseSchema = schema.add(StructField(CorruptField, StringType))
    val parsed = lines
      .filter(trim(col("line")) =!= "")
      .select(
        col("line"),
        from_json(
          col("line"),
          parseSchema,
          Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptField)
        ).as("rec"))
    val good = parsed
      .filter(col("rec").isNotNull && col("rec")(CorruptField).isNull)
      .select(schema.fieldNames.map(f => col("rec")(f).as(f)).toIndexedSeq: _*)
    val quarantine = parsed
      .filter(col("rec").isNull || col("rec")(CorruptField).isNotNull)
      .select(col("line").as("corrupt_record"))
    (good, quarantine)
  }

  /** Reserved parse-status field name (same default Spark's JSON source
    * uses; overridable there, fixed here).
    */
  val CorruptField = "_corrupt_record"

  /** Streaming twin of [[readJsonl]]: tail a directory of JSONL files and
    * deliver each trigger's good rows and quarantined raw lines to the
    * caller's sinks — live corpus ingest with the same quarantine
    * boundary as the batch path (the parse IS the batch kernel, applied
    * per micro-batch, so stream and batch classify identically —
    * spec-pinned). Re-delivered batch ids are skipped (a retried trigger
    * must not double-ingest); pass `checkpointLocation` for restartable
    * source offsets.
    */
  def readJsonlStream(
      spark: SparkSession,
      path: String,
      schema: StructType,
      checkpointLocation: Option[String] = None)(
      onBatch: (DataFrame, DataFrame) => Unit)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    require(!schema.fieldNames.contains(CorruptField),
      s"schema must not declare reserved field $CorruptField")
    var lastBatchId = -1L
    val stream = spark.readStream.text(path).writeStream
    checkpointLocation.foreach(dir => stream.option("checkpointLocation", dir))
    stream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (batchId <= lastBatchId) ()
        else {
          lastBatchId = batchId
          val (good, quarantine) = splitLines(batch.toDF("line"), schema)
          onBatch(good, quarantine)
        }
      }
      .start()
  }
}
