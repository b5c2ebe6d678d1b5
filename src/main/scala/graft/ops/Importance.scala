package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling, deterministic variant
  * (after Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling", arXiv:2302.03169): score every raw document by
  * how much its hashed n-gram feature profile looks like a TARGET corpus
  * rather than the raw corpus, then keep the top-k — the standard recipe
  * for skimming quality/domain-matched training data out of a web crawl.
  *
  * DSIR proper scores log p_target(doc) − log p_raw(doc) under hashed
  * unigram LMs. Logs of corpus ratios are not bit-reproducible across
  * engines (libm vs JVM transcendentals differ in the last ulp), so this
  * implementation uses the algebraically-equivalent-in-spirit LINEAR
  * likelihood-ratio classifier on the same hashed features, kept in exact
  * integer arithmetic end to end:
  *
  *   w_f   = t_f·S − s_f·T   (feature f's target-vs-raw preference)
  *   score = Σ_f c_f · w_f   (doc feature counts against those weights)
  *
  * where t_f/s_f are corpus feature counts and T/S the corpus totals.
  * w_f > 0 iff feature f is over-represented in the target
  * (t_f/T > s_f/S — the same sign as DSIR's per-feature log ratio), so
  * ranking by this score prefers exactly the documents DSIR's classifier
  * prefers, feature by feature, with no transcendental anywhere: every
  * product and sum is a decimal(38,0) integer, and the ONE final cast to
  * double is correctly rounded on both engines.
  *
  * Scale shape (100 TB):
  *   - per-doc feature extraction is a scan-local explode with a
  *     map-side-combined (id, bucket) count — the hashing bounds feature
  *     cardinality at `buckets` regardless of vocabulary;
  *   - both corpus feature tables collapse to ≤ `buckets` rows before any
  *     join (map-side combine), so the weight table is dimension-sized
  *     and AQE broadcasts it into the per-doc score join;
  *   - the top-k selection is a TakeOrdered (orderBy + limit), never a
  *     global single-partition window;
  *   - nothing shuffles a row set larger than the doc-feature table
  *     (O(docs × distinct buckets per doc)).
  */
object Importance {

  /** Hashed per-doc feature counts: `(_id, bucket, cnt)` — whitespace
    * tokens hashed into `buckets` md5 buckets ([[TextOps.hash32]], the
    * cross-engine-stable hash), counted with map-side combine.
    */
  private def docFeatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int): DataFrame =
    df.select(
        col(idCol).cast("long").as("_id"),
        explode(TextOps.tokens(col(textCol))).as("tok"))
      .select(col("_id"), (TextOps.hash32(col("tok")) % buckets).as("bucket"))
      .groupBy("_id", "bucket")
      .agg(count(lit(1)).as("cnt"))

  /** Per-document importance scores: `(idCol, score)` with `score` the
    * exact-integer linear likelihood-ratio classifier value, cast to
    * double once at the end. Documents with no tokens score 0.0.
    */
  def importanceScores(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    val rf = docFeatures(raw, idCol, textCol, buckets)
    val dec = "decimal(38,0)"
    val sTab = rf.groupBy("bucket").agg(sum("cnt").cast(dec).as("s_f"))
    val tTab = docFeatures(target, idCol, textCol, buckets)
      .groupBy("bucket")
      .agg(sum("cnt").cast(dec).as("t_f"))
    // One-row totals: S (raw corpus tokens), T (target corpus tokens).
    val totals = sTab
      .agg(sum("s_f").cast(dec).as("s_tot"))
      .crossJoin(tTab.agg(coalesce(sum("t_f"), lit(0)).cast(dec).as("t_tot")))
    // Weight table: ≤ `buckets` rows (every doc bucket exists in sTab by
    // construction; target-only buckets cannot appear in any raw doc).
    val weights = sTab
      .join(tTab, Seq("bucket"), "left")
      .crossJoin(broadcast(totals)) // exactly one row — justified hint
      .select(
        col("bucket"),
        (coalesce(col("t_f"), lit(0).cast(dec)) * col("s_tot") -
          col("s_f") * col("t_tot")).as("w"))
    val scored = rf
      .join(weights, "bucket")
      .groupBy("_id")
      .agg(sum(col("cnt").cast(dec) * col("w")).as("sc"))
    raw
      .select(col(idCol).cast("long").as("_id"))
      .join(scored, Seq("_id"), "left")
      .select(
        col("_id").as(idCol),
        coalesce(col("sc").cast("double"), lit(0.0)).as("score"))
  }

  /** Scores plus the selection verdict: `(idCol, score, selected)` where
    * `selected` marks the top-`k` documents by (score desc, id) —
    * resolved via a distributed TakeOrdered semi-join, not a global
    * window.
    */
  def importanceSelect(
      raw: DataFrame,
      target: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int,
      k: Int): DataFrame = {
    require(k >= 0, "k must be non-negative")
    val scores = importanceScores(raw, target, idCol, textCol, buckets)
    val top = scores
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
      .select(col(idCol), lit(true).as("_sel"))
    scores
      .join(top, Seq(idCol), "left")
      .select(
        col(idCol),
        col("score"),
        coalesce(col("_sel"), lit(false)).as("selected"))
  }
}
