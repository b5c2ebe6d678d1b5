package graft.engine

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.types.StructType


/** Session factory with scale-aware defaults.
  *
  * ≈ the reference's engine-open path (`NewDuckDB`, duck.go:79-124): open the
  * engine against an optional storage path. Here the storage path is the Spark
  * warehouse directory and the "driver auto-detection" concern disappears —
  * Spark is on the classpath.
  *
  * Defaults are tuned for the local[32] test harness but expressed the way a
  * cluster deployment would set them: AQE on (runtime re-planning, skew-join
  * handling, partition coalescing), shuffle partitions sized to the
  * parallelism actually available rather than the 200 default.
  */
object Graft {
  def session(
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Int = 32,
      warehouse: Option[String] = None,
      appName: String = "graft"): SparkSession = {
    val b = SparkSession
      .builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      // events.ts-style TIMESTAMP(NANOS) parquet columns decode as raw
      // nanos BIGINT; a session-build setting, never mutated per-read.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // INT96 (Spark's legacy default) carries no parquet footer statistics
      // and so defeats timestamp zone maps (sinks.DataSkipping); write the
      // modern stats-bearing micros type, as Iceberg mandates.
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
    warehouse.foreach(w => b.config("spark.sql.warehouse.dir", w))
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

/** The SQL-surface engine: ≈ the reference's `duckConn`.
  *
  * The reference hands every SQL string to DuckDB unparsed
  * (`stmt.SetSqlQuery` — duck.go:180, duck.go:195); here the analogous
  * delegation target is Catalyst via `spark.sql`. The four public operations
  * mirror duck.go's surface:
  *
  *   - exec              ≈ Exec            (duck.go:173-185)
  *   - query             ≈ Query           (duck.go:190-206)
  *   - tableSchema       ≈ GetTableSchema  (duck.go:210-212)
  *   - ingestCreateAppend≈ IngestCreateAppend (duck.go:217-252)
  */
final class Engine(val spark: SparkSession) extends AutoCloseable {

  /** Rows affected by a finished execution, read synchronously from
    * executed-plan metrics (the Spark-native replacement for ADBC's
    * rows-affected). Metrics are populated once the plan has run.
    */
  private def rowsFromPlan(qe: QueryExecution): Option[Long] = {
    val hits = qe.executedPlan.collect {
      case p if p.metrics.contains("numOutputRows") => p.metrics("numOutputRows").value
    }
    hits.headOption
  }

  /** DDL/DML with no result set. Returns rows affected, or −1 when the
    * command reports no row metric (matching the reference's −1 contract,
    * duck.go:182-184).
    */
  def exec(sql: String): Long = {
    val df = spark.sql(sql)
    df.collect() // commands materialize eagerly; result is empty
    rowsFromPlan(df.queryExecution).getOrElse(-1L)
  }

  /** SQL query → DataFrame (≈ Query returning an Arrow RecordReader,
    * duck.go:190-206). The DataFrame *is* the lazy batch iterator; callers
    * needing Arrow bytes use [[graft.proto.ArrowInterchange]].
    */
  def query(sql: String): DataFrame = spark.sql(sql)

  /** Schema probe doubling as an existence test (≈ duck.go:210-212; `None`
    * ≈ the reference's nil-schema-means-absent convention, duck.go:224).
    */
  def tableSchema(name: String): Option[StructType] =
    if (spark.catalog.tableExists(name)) Some(spark.table(name).schema) else None

  /** SQL → (file descriptor bytes, one serialized protobuf message per
    * row, row count) — the reference's `QueryProto` surface
    * (duck.go:274-317). Driver-side return for API parity; use
    * [[graft.proto.RowCodec.encode]] for the distributed path.
    */
  def queryProto(
      sql: String,
      config: graft.proto.CodecConfig = graft.proto.CodecConfig())
      : (Array[Byte], Array[Array[Byte]], Long) = {
    val df = spark.sql(sql)
    val descriptor = graft.proto.RowCodec.fileDescriptor(df.schema, config = config)
    val messages = graft.proto.RowCodec.encodeCollect(df, config)
    (descriptor, messages, messages.length.toLong)
  }

  /** Create-or-append ingest (≈ duck.go:217-252): CREATE the table from the
    * DataFrame's schema when absent, APPEND otherwise. Returns rows ingested.
    *
    * Unlike the reference — which ingests one Arrow batch per call in a
    * driver-side loop (bigquack.go:99-133) — the whole DataFrame is written
    * in one distributed job: every partition streams scan→write inside an
    * executor with no driver materialization.
    */
  def ingestCreateAppend(df: DataFrame, table: String): Long = {
    val exists = spark.catalog.tableExists(table)
    // Rows ingested are observed on the write job itself (df.observe): one
    // pass over the input, no O(table) destination re-scans, and immune to
    // concurrent writers appending to the same table.
    val obs = org.apache.spark.sql.Observation(s"graft_ingest_${table}_${System.nanoTime()}")
    df.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("rows"))
      .write
      .mode(if (exists) SaveMode.Append else SaveMode.ErrorIfExists)
      .saveAsTable(table)
    obs.get("rows").asInstanceOf[Long]
  }

  override def close(): Unit = ()
}
