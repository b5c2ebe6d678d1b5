package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus retrieval scoring (north-star extension): BM25 top-k over the
  * whitespace token stream — the curation/decontamination primitive that
  * ranks corpus documents against a query term set (e.g. "find training
  * docs most similar to this eval prompt").
  *
  * Scale shape: one explode pass computes per-(doc, term) frequencies for
  * QUERY terms only (the filter is pushed below the explode's aggregation,
  * so non-query tokens never shuffle); document-frequency and corpus
  * stats are |query|-row / 1-row aggregates (bounded, broadcast-safe);
  * the per-doc score folds at most |query| partial scores in sorted term
  * order. Nothing driver-side, no UDF.
  *
  * Determinism contract (the gated query hash-matches DuckDB): the
  * default idf is the RATIONAL variant `(N - df + 0.5) / (df + 0.5)` —
  * one correctly-rounded IEEE division of exact operands — rather than
  * the classic `ln(...)` form, because `ln` is not guaranteed
  * correctly-rounded and may differ between libm implementations in the
  * last ulp. `ln` is monotonic, so single-term rankings are identical;
  * multi-term sums weight rare terms more strongly than classic BM25
  * (documented, and the classic form is available via `logIdf = true`
  * for callers that don't need cross-engine bit-stability).
  */
object Retrieval {

  /** BM25 top-k: (doc_id, rank, score) — id column renamed to `doc_id` in
    * the output — for the `k` highest-scoring documents containing at
    * least one query term.
    */
  def bm25TopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int,
      k1: Double = 1.2,
      b: Double = 0.75,
      logIdf: Boolean = false): DataFrame = {
    require(query.nonEmpty, "empty query")
    val toks = df.select(
      col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("ts"))
    val docs = toks.select(col("doc_id"), size(col("ts")).cast("long").as("dl"))
    // Corpus stats: one row (N, avgdl = exact-integer sum / exact count —
    // a single correctly-rounded division).
    val stats = docs.agg(
      count(lit(1)).as("n_docs"),
      sum(col("dl")).as("sum_dl"))
    // (doc, term) frequencies for query terms only — the explode output is
    // filtered before the aggregation, so only query-term hits shuffle.
    val qTerms = typedLit(query.distinct.sorted)
    val tf = toks
      .select(col("doc_id"), explode(col("ts")).as("term"))
      .filter(array_contains(qTerms, col("term")))
      .groupBy("doc_id", "term")
      .agg(count(lit(1)).as("tf"))
    // Document frequency per query term: at most |query| rows.
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val idf =
      if (logIdf)
        log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
      else
        (col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5))
    val perTerm = tf
      .join(dfreq, "term") // |query|-row dim — AQE broadcasts it
      .join(docs, "doc_id")
      .crossJoin(broadcast(stats)) // exactly one row — justified hint
      .withColumn("avgdl", col("sum_dl").cast("double") / col("n_docs").cast("double"))
      .withColumn(
        "s",
        idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
          (col("tf").cast("double") +
            lit(k1) * (lit(1.0 - b) + lit(b) * col("dl").cast("double") / col("avgdl"))))
    // Fixed-order fold over the (sorted-by-term) per-term scores: float
    // addition is order-sensitive, so the sum must not depend on shuffle
    // arrival order.
    val scored = perTerm
      .groupBy("doc_id")
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("s")))),
        lit(0.0),
        (acc, x) => acc + x.getField("s")).as("score"))
    // TakeOrdered top-k first; the unpartitioned rank window then runs
    // over k rows only (the WindowExec single-partition warning is about
    // those k rows, not the corpus).
    val w = Window.orderBy(col("score").desc, col("doc_id"))
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(w))
      .select(col("doc_id"), col("rank").cast("long").as("rank"), col("score"))
  }

  /** Per-document TF-IDF top terms: the `k` highest-weighted terms of every
    * document — the keyword-extraction / topic-labeling primitive.
    *
    * Determinism contract (same reasoning as bm25TopK's rational idf): the
    * weight is `(tf / dl) * ((N + 1) / (df + 1))` — three correctly-rounded
    * IEEE ops on exact integer operands in a fixed order, bit-identical in
    * Spark and DuckDB, instead of the classic `ln(N/df)` whose last ulp is
    * libm-dependent. `ln` is monotonic in the idf argument so per-term
    * RANKINGS against a fixed tf/dl are unchanged; the smoothed +1 form is
    * the standard sklearn-style variant.
    *
    * Scale shape: one explode pass → (doc, term) counts with map-side
    * combine — the doc length rides through the explode as part of the
    * group key (constant per doc), saving the join-back shuffle a
    * separate doc-length table would cost; document frequency is a
    * vocabulary-cardinality aggregate joined back AQE-sized (never
    * hint-broadcast — vocabulary grows with corpus size); the per-doc
    * top-k window partitions by doc_id, bounded by each doc's
    * distinct-term count.
    */
  def tfidfTopTerms(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int): DataFrame = {
    val toks = df.select(
      col(idCol).as("doc_id"),
      TextOps.tokens(col(textCol)).as("ts"))
    val n = toks.agg(count(lit(1)).as("n_docs"))
    // dl is functionally determined by doc_id, so widening the group key
    // with it adds no groups — it's a free carry, not a join.
    val tf = toks
      .select(
        col("doc_id"),
        size(col("ts")).cast("long").as("dl"),
        explode(col("ts")).as("term"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val weighted = tf
      .join(dfreq, "term")
      .crossJoin(broadcast(n)) // exactly one row — justified hint
      .withColumn(
        "tfidf",
        (col("tf").cast("double") / col("dl").cast("double")) *
          ((col("n_docs").cast("double") + lit(1.0)) /
            (col("df").cast("double") + lit(1.0))))
    val w = Window
      .partitionBy("doc_id")
      .orderBy(col("tfidf").desc, col("term"))
    weighted
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select(col("doc_id"), col("rank"), col("term"), col("tfidf"))
  }

  /** Raw query-term-count top-k: (doc_id, rank, ttf) — documents ranked
    * by total occurrences of the query terms. The zero-parameter lexical
    * baseline (and the classic cheap second arm for rank fusion): exact
    * integer counts, no length normalization, no idf.
    *
    * Scale shape: same as bm25TopK's tf stage — the query-term filter
    * sits below the explode's aggregation so non-query tokens never
    * shuffle; top-k is a TakeOrdered.
    */
  def termCountTopK(
      df: DataFrame,
      idCol: String,
      textCol: String,
      query: Seq[String],
      k: Int): DataFrame = {
    require(query.nonEmpty, "empty query")
    val qTerms = typedLit(query.distinct.sorted)
    val counts = df
      .select(col(idCol).as("doc_id"), explode(TextOps.tokens(col(textCol))).as("term"))
      .filter(array_contains(qTerms, col("term")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("ttf"))
    val w = Window.orderBy(col("ttf").desc, col("doc_id"))
    counts
      .orderBy(col("ttf").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col("doc_id"), col("rank"), col("ttf"))
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09): merge N rankings
    * of the same id space — e.g. a sparse BM25 list and a dense
    * cosine-ANN list — into one hybrid ranking by summing per-modality
    * reciprocal ranks `1/(kConst + rank)`. The standard hybrid-retrieval
    * combiner: needs no score calibration across modalities (only ranks),
    * and kConst (=60 in the paper and every production default) damps the
    * head so one modality's #1 can't drown broad agreement lower down.
    *
    * Determinism contract: the reciprocal is computed in INTEGER
    * arithmetic — `scale div (kConst + rank)` with truncating division,
    * identical in Spark (`div`) and DuckDB (`//`) — so the fused score is
    * an exact long (sum order never matters) instead of an IEEE
    * 1/(k+r) sum whose association order could flip ties. At
    * scale = 10^12 the quantization error vs the real reciprocal is
    * < 10^-12 — far below the 1/(k+r) − 1/(k+r+1) rank gap for any
    * plausible rank, so fused ORDER is the textbook RRF order; ties
    * break on id.
    *
    * Each input carries (idCol, rankCol); ids absent from one modality
    * simply contribute nothing there (the standard convention). Output:
    * (idCol, rrf_score, rank) — the topN fused ids.
    *
    * Scale shape: inputs are top-k lists, so everything downstream of
    * the already-computed rankings is bounded by N·k rows — one
    * map-side-combined sum groupBy and a window over ≤ N·k rows. The
    * expensive work (BM25, ANN) happens upstream in operators with their
    * own scale stories; fusion adds no corpus-sized shuffle.
    */
  def rrfFuse(
      rankings: Seq[DataFrame],
      idCol: String,
      rankCol: String,
      topN: Int,
      kConst: Int = 60,
      scale: Long = 1000000000000L): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(kConst >= 0 && scale >= 1, "need kConst >= 0 and scale >= 1")
    // Input hygiene per ranking: ranks must be >= 1 (rank <= 0 would hit
    // division by zero at rank = -kConst, silently dropped as NULL by the
    // sum) and ids must be unique (a duplicated id would double-count its
    // reciprocal). Non-positive ranks are rejected; duplicates collapse
    // to their best (minimum) rank — both checks run over top-k-bounded
    // inputs, so the per-ranking groupBy is noise.
    val contribs = rankings.map(
      _.filter(col(rankCol) >= 1)
        .groupBy(col(idCol))
        .agg(min(col(rankCol).cast("long")).as("_rank"))
        .select(
          col(idCol),
          expr(s"${scale}L div (${kConst}L + _rank)").as("_rrf")))
    val fused = contribs.reduce(_.unionByName(_))
      .groupBy(idCol)
      .agg(sum(col("_rrf")).as("rrf_score"))
    // TakeOrdered top-N first; the unpartitioned rank window then runs
    // over topN rows only (same pattern as bm25TopK).
    val w = Window.orderBy(col("rrf_score").desc, col(idCol))
    fused
      .orderBy(col("rrf_score").desc, col(idCol))
      .limit(topN)
      .withColumn("rank", row_number().over(w).cast("long"))
      .select(col(idCol), col("rrf_score"), col("rank"))
  }

  /** Exact PHRASE search over a POSITIONAL posting index — the adjacency
    * query (`"w₁ w₂ … wₖ"` as consecutive tokens) that document-level
    * term indexes (bm25TopK's shape) cannot answer: it needs positions.
    *
    * Build: tokenize with `posexplode` (whitespace tokens, same rule as
    * the BM25/TF-IDF family), KEEP ONLY the phrase's own words — the
    * posting extraction is a scan-local `isin` prune, so the index
    * materialized here is proportional to the query words' document
    * frequency, never the corpus token count. Match: chain-join word i's
    * postings on (doc, pos = pos₀ + i) — co-partitioned equi-joins on
    * the (doc, pos) key. Overlapping matches each count ("x x x"
    * contains "x x" twice), matching the sliding-window definition.
    *
    * Output: (doc_id, n_occurrences) for docs with ≥ 1 occurrence.
    *
    * Scale: k−1 equi-joins over single-word posting lists; a stop-word
    * inside the phrase inflates its own posting list (the classic phrase
    * cost) — production engines add next-word indexes for that; here the
    * rarest-word list still bounds the JOIN OUTPUT at each chain step.
    */
  def phraseOccurrences(
      docs: DataFrame, idCol: String, textCol: String, phrase: Seq[String]): DataFrame = {
    require(phrase.size >= 2, "phrase needs at least two words")
    val postings = docs
      .select(col(idCol).as("doc_id"),
        posexplode(split(trim(col(textCol)), "\\s+")).as(Seq("pos", "tok")))
      .where(col("tok").isin(phrase.distinct: _*))
    def word(w: String) = postings.where(col("tok") === w).select("doc_id", "pos")
    val first = word(phrase.head).select(col("doc_id"), col("pos").as("p0"))
    val chained = phrase.tail.zipWithIndex.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(
        word(w).select(col("doc_id"), (col("pos") - (i + 1)).as("p0")),
        Seq("doc_id", "p0"))
    }
    chained.groupBy("doc_id").agg(count(lit(1)).as("n_occurrences"))
  }

  /** Truncated rank-biased overlap (RBO@k, Webber et al. 2010) between
    * two rankings per query — the top-weighted agreement measure used to
    * compare retrieval systems (BM25 vs embeddings, ANN vs brute force):
    * RBO@k = Σ_{d=1..k} (1−p)·p^(d−1)·|A_d ∩ B_d|/d, where A_d/B_d are
    * the depth-d prefixes.
    *
    * Determinism contract: every overlap count X_d is an exact integer
    * (an item in both lists contributes to all depths ≥ max of its two
    * ranks); the geometric weights come from an EXPLICIT multiply chain
    * (w_1 = 1, w_d = w_{d−1}·p — never `pow`, whose libm rounding differs
    * across engines), and the depth terms fold in ASCENDING d order (the
    * ewma pattern) — every float op is correctly rounded on identical
    * operands, so the score is bit-identical across engines. Queries with
    * zero overlap are absent (their RBO is vacuously 0).
    *
    * Scale shape: one (qid, item) equi-join of the two ranking frames
    * (each ≤ k rows per query by contract), a ≤ k-row explode per
    * overlapping item, and a per-query fold over ≤ k terms — every stage
    * is bounded by k·|queries|, never corpus size.
    */
  def rankBiasedOverlap(
      a: DataFrame,
      b: DataFrame,
      qidCol: String,
      itemCol: String,
      rankCol: String,
      k: Int,
      p: Double): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(p > 0.0 && p < 1.0, "p must be in (0, 1)")
    val aa = a.select(col(qidCol).as("qid"), col(itemCol).as("it"),
      col(rankCol).cast("long").as("ra")).where(col("ra") <= k)
    val bb = b.select(col(qidCol).as("qid"), col(itemCol).as("it"),
      col(rankCol).cast("long").as("rb")).where(col("rb") <= k)
    val overlaps = aa.join(bb, Seq("qid", "it"))
      .select(col("qid"), greatest(col("ra"), col("rb")).as("m"))
      .select(col("qid"), explode(sequence(col("m"), lit(k.toLong))).as("d"))
      .groupBy("qid", "d")
      .agg(count(lit(1)).as("x"))
    val w = when(col("d") === 1L, lit(1.0)).otherwise(
      aggregate(sequence(lit(2L), col("d")), lit(1.0), (acc, _) => acc * lit(p)))
    val terms = overlaps.withColumn(
      "term",
      (lit(1.0) - lit(p)) * w * col("x").cast("double") / col("d").cast("double"))
    val ts = transform(
      sort_array(collect_list(struct(col("d"), col("term"), col("x")))),
      _.getField("term"))
    terms.groupBy("qid")
      .agg(
        max(when(col("d") === k.toLong, col("x"))).as("overlap_k"),
        aggregate(slice(ts, 2, k), element_at(ts, 1), _ + _).as("rbo"))
  }
}
