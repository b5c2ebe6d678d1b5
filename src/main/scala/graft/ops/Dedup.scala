package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (north-star
  * extension — BASELINE.json `north_star`; absent from the reference, which
  * never inspects row content).
  *
  * Scale design (100 TB):
  *   - Exact dedup shuffles *one md5 key per row*, never the payload —
  *     partial aggregation (map-side combine) collapses duplicates before
  *     the shuffle.
  *   - MinHash/SimHash signatures are per-row maps (no shuffle); candidate
  *     generation shuffles only (band-key, doc-id) pairs, so the shuffled
  *     volume is O(rows × bands × 8 bytes) regardless of document size.
  *   - N-gram Jaccard joins on exploded distinct n-grams — the classic
  *     inverted-index self-join — and keys the shuffle on the n-gram, so
  *     hot n-grams are the skew axis; AQE skew-join splitting (enabled in
  *     engine defaults) handles them, and a stopword-gram filter is the
  *     standard mitigation at scale.
  */
object Dedup {

  /** Exact dedup on a text column: one row per distinct content hash,
    * keeping the smallest id. Output: (keep_id, n_copies, fp).
    */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).cast("long").as("n_copies"))
      .select("keep_id", "n_copies", "fp")

  /** Per-document MinHash signatures: (id, sig array<long>). */
  def minhashSignatures(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleLen: Int = 3,
      k: Int = 16): DataFrame =
    df.select(
      col(idCol).as("doc_id"),
      TextOps.minhashSignature(TextOps.shingles(col(textCol), shingleLen), k).as("sig"))

  /** LSH banding over MinHash signatures → candidate near-dup pairs with
    * their estimated Jaccard (fraction of equal signature components).
    *
    * `k` must equal `bands * rowsPerBand`. Pairs are emitted once
    * (doc_a < doc_b) even when they collide in several bands.
    */
  def minhashPairs(
      signatures: DataFrame,
      bands: Int,
      rowsPerBand: Int,
      minEstJaccard: Double = 0.0): DataFrame = {
    val k = bands * rowsPerBand
    // (band, band-key, id): the only shuffled payload. The band key hashes
    // the band's signature slice so the shuffle key is 1 string, not r longs.
    val banded = signatures.select(
      col("doc_id"),
      col("sig"),
      explode(
        transform(
          sequence(lit(0), lit(bands - 1)),
          b =>
            struct(
              b.as("band"),
              md5(concat_ws(
                ",",
                transform(
                  concat(
                    array(b.cast("long")),
                    slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand))),
                  x => x.cast("string")))).as("bkey")))).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        (size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y), p => p))
          .cast("double") / lit(k.toDouble)).as("est_jaccard"))
      .distinct()
      .filter(col("est_jaccard") >= minEstJaccard)
  }

  /** SimHash near-dup groups: documents sharing a 32-bit simhash. Output one
    * row per doc with its simhash and the group's size/representative —
    * hamming-radius-0 grouping; wider radii probe rotated bit-bands the same
    * way MinHash probes signature bands.
    */
  def simhashGroups(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val withSim = df.select(col(idCol).as("doc_id"), TextOps.simhash32(col(textCol)).as("simhash"))
    withSim
      .groupBy("simhash")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).cast("long").as("group_size"))
      .select("simhash", "keep_id", "group_size")
  }

  /** Exact n-gram Jaccard similarity for all pairs above `minJaccard`,
    * via inverted-index self-join on distinct word n-grams.
    * Output: (doc_a, doc_b, jaccard).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 3,
      minJaccard: Double = 0.5): DataFrame = {
    val grams = df
      .select(col(idCol).as("doc_id"),
        array_distinct(TextOps.shingles(col(textCol), n)).as("grams"))
      .select(col("doc_id"), size(col("grams")).cast("long").as("n_grams"),
        explode(col("grams")).as("gram"))
    val a = grams.alias("a")
    val b = grams.alias("b")
    a.join(b, col("a.gram") === col("b.gram") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(
        col("a.doc_id").as("doc_a"),
        col("b.doc_id").as("doc_b"),
        col("a.n_grams").as("na"),
        col("b.n_grams").as("nb"))
      .agg(count(lit(1)).as("inter"))
      .select(
        col("doc_a"),
        col("doc_b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Embedding near-dup pairs: cosine similarity above `minCosine` over all
    * id-ordered pairs. Brute-force quadratic — correct at verify scale; the
    * 100 TB path is [[Similarity.lshBuckets]] candidates + this as rerank.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      minCosine: Double): DataFrame = {
    val v = df.select(col(idCol).as("vid"), col(vecCol).as("vec"))
    val a = v.alias("a")
    val b = v.alias("b")
    a.join(b, col("a.vid") < col("b.vid"))
      .select(
        col("a.vid").as("vec_a"),
        col("b.vid").as("vec_b"),
        Similarity.cosine(col("a.vec"), col("b.vec")).as("cos"))
      .filter(col("cos") >= minCosine)
  }
}
