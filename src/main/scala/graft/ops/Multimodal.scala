package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column conventions (north-star extension): media travel as
  * opaque `BinaryType` payloads with typed metadata alongside — exactly how
  * the reference treats every column (opaque Arrow buffers, duck.go:217) but
  * with the pipeline plumbing made first-class.
  *
  * The decode step itself (image/audio libraries) is STUBBED — the container
  * has no codecs — but everything Spark-side is real: schema, partition
  * preservation, batch shape, and the executor-side `mapPartitions` path a
  * real decoder would plug into. All metadata extraction is codegen'd
  * column expressions (no decode needed).
  */
object Multimodal {

  /** Media payload schema: (bytes, mime, meta). */
  val payloadType: StructType = StructType(Seq(
    StructField("bytes", BinaryType),
    StructField("mime", StringType),
    StructField("n_bytes", LongType)))

  /** Wrap a string column as a binary media payload (the zero-codec
    * stand-in for reading real image/audio bytes).
    */
  def withPayload(df: DataFrame, srcCol: String, mime: String = "text/plain"): DataFrame =
    df.withColumn(
      "media",
      struct(
        encode(col(srcCol), "UTF-8").as("bytes"),
        lit(mime).as("mime"),
        octet_length(encode(col(srcCol), "UTF-8")).cast("long").as("n_bytes")))

  /** Byte-level metadata without decoding: size, magic (first 4 bytes, hex),
    * first/last byte values. Pure column expressions — scan-local.
    */
  def extractMeta(df: DataFrame, payload: String = "media"): DataFrame = {
    val bytes = col(s"$payload.bytes")
    // hex() already emits uppercase digits (both Spark and DuckDB) — no
    // upper() needed. That also matters operationally: Spark 4's first
    // upper()/lower() call initializes the ICU collation tables (~1.2 s
    // one-time), which made this scan-local query look 6 s slow when it
    // happened to run before any other casing query.
    df.withColumn("meta_n_bytes", octet_length(bytes).cast("long"))
      .withColumn("meta_magic", hex(substring(bytes, 1, 4)))
      .withColumn(
        "meta_first_byte",
        conv(hex(substring(bytes, 1, 1)), 16, 10).cast("long"))
  }

  /** Number of fixed-stride "frames" in the payload (the frame-sampling
    * plan shape; a video decoder would replace byte-slicing with real frame
    * extraction at the same points).
    */
  def frameCount(df: DataFrame, stride: Int, payload: String = "media"): DataFrame =
    df.withColumn(
      "n_frames",
      ceil(octet_length(col(s"$payload.bytes")).cast("double") / lit(stride.toDouble)).cast("long"))

  /** Fixed-stride frame sampling: an array of byte-slice "frames" (what a
    * video decoder would replace with real frame extraction at the same
    * offsets). Pure codegen'd expression — `transform` over the stride
    * sequence with binary `substring` — so sampling is scan-local.
    */
  def sampleFrames(df: DataFrame, stride: Int, maxFrames: Int, payload: String = "media"): DataFrame = {
    val bytes = col(s"$payload.bytes")
    val nFrames = least(
      ceil(octet_length(bytes).cast("double") / lit(stride.toDouble)).cast("int"),
      lit(maxFrames))
    df.withColumn(
      "frames",
      when(octet_length(bytes) > 0,
        transform(
          sequence(lit(0), nFrames - 1),
          i => substring(bytes, i * stride + lit(1), lit(stride))))
        .otherwise(array().cast("array<binary>")))
  }

  /** Decoded feature record produced by the (stubbed) decoder. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      checksum: Long,
      width: Int,
      height: Int)

  /** Executor-side decode via mapPartitions — the real plumbing a codec
    * plugs into: one partition in, one iterator of decoded features out,
    * no shuffle introduced, batch-at-a-time memory profile.
    *
    * STUB: `decodeFrame` fakes decode deterministically from the bytes
    * (checksum + pretend-dimensions) instead of calling an image library.
    */
  def decodeFeatures(spark: SparkSession, df: DataFrame, idCol: String, payload: String = "media")
      : Dataset[MediaFeatures] = {
    import spark.implicits._
    df.select(col(idCol).cast("long").as("id"), col(s"$payload.bytes").as("bytes"))
      .mapPartitions { rows: Iterator[Row] =>
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          decodeFrame(id, bytes)
        }
      }
  }

  /** The deterministic fake decoder (library-free stand-in). */
  private def decodeFrame(id: Long, bytes: Array[Byte]): MediaFeatures = {
    var sum = 0L
    var i = 0
    while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
    MediaFeatures(
      doc_id = id,
      n_bytes = bytes.length.toLong,
      checksum = sum,
      width = (sum % 640).toInt,
      height = (sum % 480).toInt)
  }
}
