package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to fixed-length training context
  * windows by concat-and-chunk — the standard LM pre-training layout where
  * the shuffled corpus is conceptually concatenated into one token stream
  * and split every `contextLen` tokens. (The reference engine stops at the
  * relational surface; packing is part of the training-data tier this
  * library adds on top, like dedup and contamination screening.)
  *
  * The pack order is the repo's deterministic shuffle: ascending 60-bit
  * md5 of the document id (the [[Sampling]] hash line), which mixes
  * sources without an RNG and is reproducible across engines and runs.
  * A document whose tokens span positions [p, p+n) of the stream lands in
  * bins [p div L, (p+n-1) div L]; `straddles` marks documents cut by a bin
  * boundary (the fraction callers tune L against).
  *
  * Scale shape: the token prefix sum is the one genuinely global
  * computation, and it rides [[Prefix.runningSum]] — a range-partitioned
  * two-phase scan, never a single-task global window. Everything after it
  * is per-row arithmetic. Order-key ties (md5 collisions, ~2^-60 per
  * pair) would share a RANGE-frame prefix; with distinct ids the key is
  * unique for any realistic corpus.
  */
object Packing {

  /** One row per non-empty document: (id, n_tokens, tok_start, bin_start,
    * bin_end, straddles). `tok_start` = the document's absolute first-token
    * position in the packed stream (exclusive prefix — [[binSummary]]'s
    * input for exact per-bin token mass; added alongside the original five
    * columns, so positional consumers of the old schema must re-pin);
    * `bin_start` = the context window holding that first token under the
    * md5 pack order; empty documents (0 tokens) are dropped — they occupy
    * no stream positions.
    */
  def packBins(df: DataFrame, idCol: String, tokCol: String, contextLen: Int): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val keyed = df
      .where(col(tokCol) > 0L)
      .withColumn("__hk", conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10).cast("long"))
    val summed = Prefix.runningSum(keyed, "__hk", tokCol, "__incl")
    summed
      .withColumn("__excl", col("__incl") - col(tokCol))
      .select(
        col(idCol),
        col(tokCol).cast("long").as("n_tokens"),
        // The document's absolute first-token position in the packed
        // stream (exclusive prefix) — what [[binSummary]] needs to credit
        // a straddler's tokens to the right bins.
        col("__excl").as("tok_start"),
        // Integer `div`, never a double divide-then-truncate: exact for
        // any stream length a BIGINT can hold.
        expr(s"__excl div $contextLen").as("bin_start"),
        expr(s"(__incl - 1) div $contextLen").as("bin_end"))
      .withColumn("straddles", col("bin_end") > col("bin_start"))
  }

  /** Per-bin occupancy summary over [[packBins]]: `n_docs` documents
    * TOUCHING each context window, `n_starting` documents whose first
    * token lands in it, and `n_tokens` — the exact token mass the bin
    * holds (contextLen everywhere except the ragged last bin) — the
    * fill/waste report behind choosing L. A straddling document
    * contributes `min(end, (b+1)·L) − max(start, b·L)` tokens to bin b,
    * summed over a BOUNDED explode: a document touches at most
    * n_tokens/L + 1 bins, so the fan-out is the stream length in bins,
    * never rows × bins.
    */
  def binSummary(packed: DataFrame, contextLen: Int): DataFrame = {
    val L = lit(contextLen.toLong)
    val spans = packed
      .withColumn("__b", explode(sequence(col("bin_start"), col("bin_end"))))
    spans
      .groupBy(col("__b").as("bin"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("__b") === col("bin_start"), 1L).otherwise(0L)).as("n_starting"),
        // exact per-bin token mass: the doc's overlap with bin b is
        // min(end, (b+1)·L) − max(start, b·L); summing over the bounded
        // explode reproduces contextLen for every full bin and the ragged
        // remainder for the last one.
        sum(
          least(col("tok_start") + col("n_tokens"), (col("__b") + 1) * L) -
            greatest(col("tok_start"), col("__b") * L)).as("n_tokens"))
      .withColumn("n_docs", col("n_docs").cast("long"))
      .withColumn("n_starting", col("n_starting").cast("long"))
      .withColumn("n_tokens", col("n_tokens").cast("long"))
  }
}
