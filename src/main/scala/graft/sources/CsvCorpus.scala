package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Line-oriented CSV corpus ingest with corrupt-record quarantine — the
  * other wire format corpus dumps actually ship as (same ingest contract
  * as [[JsonlCorpus]]; reference analogue `pipeline.go:61-89`, which
  * assumes clean upstream rows).
  *
  * Same design as the JSONL reader: read TEXT lines, parse each with
  * `from_csv` against the caller's explicit schema — one scan-local
  * projection, no shuffle, quarantine split as a second filter over the
  * same parse. Quoted fields WITHIN a line round-trip (the writer quotes
  * as needed); embedded NEWLINES inside quoted fields are out of
  * contract — that is the standard price of splittable, line-parallel
  * CSV at scale (the same reason Hadoop text-split CSV readers make it),
  * and such records surface in the quarantine rather than silently
  * corrupting neighbors.
  *
  * A line is quarantined when it does not parse COMPLETELY into the
  * schema (mistyped field value, broken quoting, wrong arity that the
  * parser reports as malformed). Missing trailing fields parse with
  * nulls — schema drift is the caller's policy decision, matching the
  * JSONL reader's stance.
  */
object CsvCorpus {

  /** Reserved parse-status field name (Spark's CSV source default). */
  val CorruptField = "_corrupt_record"

  /** Write `df` as headerless RFC-4180 CSV under `path` (quote doubling
    * `""` rather than Spark's default backslash escape — the convention
    * every other CSV producer/consumer speaks; fields containing the
    * delimiter or quotes survive the round trip on one line).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "false")
      .option("escape", "\"")
      .csv(path)

  /** Read a CSV corpus: `(good, quarantine)` — fully-parsed rows in
    * `schema`'s columns, and the raw text of every line that did not
    * parse completely, byte-for-byte for triage/replay. Blank lines are
    * dropped.
    */
  def readCsv(
      spark: SparkSession,
      path: String,
      schema: StructType): (DataFrame, DataFrame) =
    splitLines(spark.read.textFile(path).toDF("line"), schema)

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
        from_csv(
          col("line"),
          parseSchema,
          // escape = quote → RFC-4180 "" doubling, matching writeCsv and
          // the rest of the CSV-speaking world (Spark's default is
          // backslash escape, which nothing else emits)
          Map(
            "mode" -> "PERMISSIVE",
            "columnNameOfCorruptRecord" -> CorruptField,
            "escape" -> "\"")
        ).as("rec"))
    val good = parsed
      .filter(col("rec").isNotNull && col("rec")(CorruptField).isNull)
      .select(schema.fieldNames.map(f => col("rec")(f).as(f)).toIndexedSeq: _*)
    val quarantine = parsed
      .filter(col("rec").isNull || col("rec")(CorruptField).isNotNull)
      .select(col("line").as("corrupt_record"))
    (good, quarantine)
  }

  /** Streaming twin of [[readCsv]] — per-trigger good/quarantine splits
    * from a tailed directory, same classification as batch (the parse IS
    * the batch kernel), retried batch ids skipped.
    */
  def readCsvStream(
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
