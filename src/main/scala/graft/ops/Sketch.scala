package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic count-min sketch (north-star extension): approximate
  * frequency counting in FIXED space — the vocabulary-stats primitive for
  * corpora where the exact (token, count) table is itself huge. The
  * sketch is `depth × width` long counters; estimates never undercount
  * and overcount by at most `N/width` with probability `1 − 2^−depth`
  * (the classic CM guarantee).
  *
  * Unlike seeded-random CMS implementations, the row hashes derive from
  * ONE md5 per item by Kirsch–Mitzenmacher double hashing over its two
  * independent 32-bit halves (`(b1 + r·b2) mod 2^32`), so the ENTIRE
  * sketch is a pure function of the input: bit-identical across engines,
  * cluster sizes, and reruns. NOTE the hash family is part of the
  * persisted-artifact format — counters/bit sets carry no version tag,
  * so sketches built under a different family must be rebuilt, never
  * probed or merged against
  * — estimates are hash-checkable against a SQL replay (`ns68`), and two
  * sketches built anywhere merge by adding counters cell-wise (the
  * streaming/distributed counting artifact a pipeline persists between
  * increments, like C49's signature table).
  *
  * Scale shape: counter build is one explode (×depth) with map-side
  * combine into AT MOST depth×width rows — the shuffle is bounded by the
  * sketch size, never the vocabulary; estimation joins the (tiny) query
  * fan-out against the bounded counter table (AQE broadcasts it).
  */
object Sketch {

  /** The 60-bit md5 base: the first 15 hex digits as one non-negative
    * long — ONE md5 + ONE conv per item, projected as a single column
    * BELOW the row explode so the expensive hash is never re-evaluated
    * per row or per derived half (two conv(substring(md5)) columns next
    * to a generator each re-run the md5 — measured 1.5x on the ns68
    * kernel).
    */
  private def baseHash(c: org.apache.spark.sql.Column) =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Row-`r` bucket by Kirsch–Mitzenmacher double hashing over two
    * DISJOINT (hence independent) bit ranges of the base:
    * `g_r = (b1 + r·b2) mod 2^32 mod width` with `b1` = the high 32 bits
    * and `b2` = the low 28 bits. Rows stay uncorrelated across items:
    * two items collide on every row only when BOTH halves collide
    * (~V²/2⁶⁰ — negligible at any vocabulary), where affine transforms
    * of a single 32-bit base collide everywhere on any base collision
    * (~V²/2³³, routine at n-gram scale). Kirsch & Mitzenmacher 2006
    * shows this family preserves the Bloom false-positive asymptotics;
    * it is the standard practical choice for CM rows as well. `base`
    * here is a cheap attribute reference (the md5 ran below the
    * explode), so referencing it twice costs two integer ops.
    */
  private def bucketOf(
      row: org.apache.spark.sql.Column,
      base: org.apache.spark.sql.Column,
      width: Int) =
    ((shiftright(base, 28) + row * base.bitwiseAND(lit(0xfffffffL))) %
      lit(TextOps.MinhashEmpty)) % width

  /** Build the counter table from one row per token OCCURRENCE.
    * Output: (r, bucket, cnt) — at most depth×width rows; absent cells
    * are zero.
    */
  def cmsCounters(
      occurrences: DataFrame,
      tokenCol: String,
      depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "need depth >= 1 and width >= 1")
    occurrences
      .select(baseHash(col(tokenCol)).as("_b"), explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .select(col("r"), bucketOf(col("r"), col("_b"), width).as("bucket"))
      .groupBy("r", "bucket")
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each query token: the min over the
    * `depth` counters the token hashes into (0 when a cell was never
    * touched). Output: (tokenCol, est).
    */
  def cmsEstimate(
      counters: DataFrame,
      queries: DataFrame,
      tokenCol: String,
      depth: Int,
      width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, "need depth >= 1 and width >= 1")
    queries
      .select(col(tokenCol), baseHash(col(tokenCol)).as("_b"),
        explode(sequence(lit(0), lit(depth - 1))).as("r"))
      .withColumn("bucket", bucketOf(col("r"), col("_b"), width))
      .join(counters, Seq("r", "bucket"), "left")
      .groupBy(tokenCol)
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Merge two counter tables cell-wise (the distributed/streaming
    * accumulation property: sketch(A ∪ B) = sketch(A) + sketch(B)).
    */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy("r", "bucket")
      .agg(sum("cnt").as("cnt"))

  // --------------------------------------------------------------- bloom

  /** Deterministic Bloom filter, represented as its SET-BIT POSITIONS
    * (one row per distinct set bit, ≤ min(k·|items|, m) rows): membership
    * screening with NO false negatives and a bounded false-positive rate
    * — the "could this benchmark n-gram appear anywhere in the corpus?"
    * pre-screen ahead of exact decontamination (C34), at a fraction of
    * the exact fingerprint table's size. Same md5 hash family as the CMS,
    * so the filter is a pure function of the input: replayable in SQL,
    * and two filters merge by POSITION-SET UNION.
    *
    * Output: (pos) — distinct positions in [0, m).
    */
  def bloomBits(items: DataFrame, itemCol: String, k: Int, m: Int): DataFrame = {
    require(k >= 1 && m >= 1, "need k >= 1 and m >= 1")
    items
      .select(baseHash(col(itemCol)).as("_b"), explode(sequence(lit(0), lit(k - 1))).as("r"))
      .select(bucketOf(col("r"), col("_b"), m).as("pos"))
      .distinct()
  }

  /** Probe each query item against the filter: `maybe_present` is true
    * iff ALL `k` of the item's positions are set — never a false
    * negative. Output: (itemCol, maybe_present).
    */
  def bloomProbe(
      bits: DataFrame,
      queries: DataFrame,
      itemCol: String,
      k: Int,
      m: Int): DataFrame = {
    require(k >= 1 && m >= 1, "need k >= 1 and m >= 1")
    queries
      .select(col(itemCol), baseHash(col(itemCol)).as("_b"),
        explode(sequence(lit(0), lit(k - 1))).as("r"))
      .withColumn("pos", bucketOf(col("r"), col("_b"), m))
      .join(bits.withColumn("_hit", lit(1L)), Seq("pos"), "left")
      .groupBy(itemCol)
      .agg((count(lit(1)) === sum(coalesce(col("_hit"), lit(0L)))).as("maybe_present"))
  }

  /** Union two filters' position sets: bloom(A ∪ B) = bits(A) ∪ bits(B). */
  def bloomMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).distinct()
}
