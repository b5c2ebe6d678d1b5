package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor / similarity search over an embedding
  * column (north-star extension — BASELINE.json `north_star`).
  *
  * Scale design (100 TB):
  *   - Brute-force top-k broadcasts the (small) query set and streams the
  *     corpus once: no corpus shuffle at all; per-query top-k via a window
  *     over (query, score) — the shuffled volume is |corpus|×|queries| score
  *     rows, which is why this is the *baseline*, not the scale path.
  *   - The scale path is random-hyperplane LSH: bucket assignment is a
  *     per-row map (no shuffle); the candidate join co-partitions both
  *     sides on the bucket key, so the shuffle is O(rows), and only
  *     within-bucket pairs pay the full cosine.
  *   - All vector math is fixed-order double folds over codegen'd
  *     higher-order functions — no UDF, no Python, deterministic across
  *     engines.
  */
object Similarity {

  /** Index-order dot product with float→double widening (exact) — the fold
    * order is fixed, so the result is bit-deterministic.
    */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Brute-force cosine top-k: for each query vector, the k nearest corpus
    * vectors (excluding itself when ids collide).
    * Output: (query_id, rank, neighbor_id, cos).
    */
  def bruteForceTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("nid"), col(vecCol).as("nvec"))
    val q = queries.select(col(idCol).as("qid"), col(vecCol).as("qvec"))
    val scored = c
      .crossJoin(broadcast(q))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"), cosine(col("qvec"), col("nvec")).as("cos"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cos"))
  }

  /** Deterministic pseudo-random hyperplane weight in [-1, 1): derived from
    * md5(plane ',' dim), so both engines (and every executor) materialize
    * the identical plane matrix without any broadcast state.
    */
  private def planeWeight(plane: Column, dim: Column): Column =
    TextOps.hash32(concat(plane.cast("string"), lit(","), dim.cast("string")))
      .cast("double") / lit(2147483648.0) - lit(1.0)

  /** Random-hyperplane LSH bucket id (`planes` sign bits packed into a
    * BIGINT). Per-row map over the corpus — the 100 TB-scale ANN path:
    * group or join on `bucket`, then rerank candidates with exact cosine.
    */
  def lshBucket(vec: Column, planes: Int, dims: Int): Column =
    aggregate(
      sequence(lit(0), lit(planes - 1)),
      lit(0L),
      (acc, p) => {
        val proj = aggregate(
          sequence(lit(0), lit(dims - 1)),
          lit(0.0),
          (s, d) => s + planeWeight(p, d) * element_at(vec, d + 1).cast("double"))
        acc + when(proj >= 0, TextOps.pow2(p)).otherwise(lit(0L))
      })

  /** LSH-bucketed ANN: exact cosine rerank *within* buckets only.
    * Output: (qid, rank, nid, cos) for the top-k within each query's bucket.
    */
  def lshTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      planes: Int,
      dims: Int,
      k: Int): DataFrame = {
    val bucketed = corpus.select(
      col(idCol).as("vid"),
      col(vecCol).as("vec"),
      lshBucket(col(vecCol), planes, dims).as("bucket"))
    val a = bucketed.alias("a")
    val b = bucketed.alias("b")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    a.join(b, col("a.bucket") === col("b.bucket") && col("a.vid") =!= col("b.vid"))
      .select(
        col("a.vid").as("qid"),
        col("b.vid").as("nid"),
        cosine(col("a.vec"), col("b.vec")).as("cos"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank").cast("long").as("rank"), col("nid"), col("cos"))
  }
}
