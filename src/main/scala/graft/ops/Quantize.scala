package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding compression: symmetric per-vector int8 quantization
  * (north-star extension — the storage/shuffle-volume lever for ANN at
  * 100 TB: an int8 vector plus one float64 scale is ~4x smaller than the
  * float32 original, so candidate-join payloads, broadcast sides, and
  * at-rest embedding tables all shrink 4x; cosine ranking is
  * scale-invariant, so reranking over dequantized vectors preserves
  * ordering up to quantization noise — the recall-vs-float bound is
  * pinned in OpsSpec).
  *
  * Everything is scan-local (per-row `transform` over the vector, no
  * shuffle, no UDF): scale = max|v_i| / 127, q_i = round(v_i / scale)
  * clamped by construction to [-127, 127] (the max-|v| element maps to
  * exactly +/-127). Zero vectors quantize to all-zero with scale 0. The
  * dequantize twin is exact: q_i * scale, bit-deterministic on both
  * engines (double division, half-away-from-zero rounding, double
  * multiply — each an IEEE-exact op given identical inputs).
  */
object Quantize {

  /** Quantize `vecCol` (array<float>) to (scale: double, qvec:
    * array<tinyint>). Output: (idCol, scale, qvec).
    */
  def quantizeInt8(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), col(vecCol).as("_v"))
      .withColumn(
        "scale",
        array_max(transform(col("_v"), x => abs(x.cast("double")))) / lit(127.0))
      .withColumn(
        "qvec",
        when(col("scale") === 0.0,
          transform(col("_v"), _ => lit(0).cast("byte")))
          .otherwise(
            transform(col("_v"), x => round(x.cast("double") / col("scale")).cast("byte"))))
      .select(col(idCol), col("scale"), col("qvec"))

  /** Exact dequantize twin: q_i * scale as array<double>. */
  def dequantizeInt8(qvec: Column, scale: Column): Column =
    transform(qvec, q => q.cast("double") * scale)
}
