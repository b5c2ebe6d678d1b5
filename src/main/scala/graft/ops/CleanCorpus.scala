package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The flagship training-data pipeline, composed from the north-star
  * operators: language filter → quality filter → exact dedup → near-dup
  * removal. One declarative plan end-to-end — Catalyst sees the whole
  * thing, so filters push ahead of the expensive dedup joins.
  *
  * Scale shape: the two filters are scan-local; exact dedup shuffles one
  * md5 key per surviving row; near-dup pair generation runs on the
  * already-deduped survivors (the smallest set), via the inverted-index
  * join of [[Dedup.ngramJaccardPairs]]; the final removal is an anti-join
  * against the drop-list. The drop-list is O(near-dup documents) — crawl
  * corpora run 30–50% duplicates, so at scale it is billions of ids and
  * deliberately NOT hinted `broadcast()`: AQE broadcasts it when it
  * measures small and falls back to a shuffle join when it doesn't.
  */
object CleanCorpus {

  /** Returns the surviving documents: (doc_id, quality, fp).
    *
    * Removal policy (deterministic): exact dedup keeps the smallest
    * doc_id per fingerprint; near-dup removal drops every document that
    * appears as the *larger* id of a qualifying pair, so each near-dup
    * cluster keeps its canonical smallest member.
    */
  def run(
      df: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      minQuality: Double = 0.40,
      minJaccard: Double = 0.5,
      shingleLen: Int = 3): DataFrame = {
    val base = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))

    // 1+2: language + quality gates — both scan-local codegen'd kernels
    // (the language gate was an explode + broadcast join + two
    // aggregations; as a per-row kernel the whole gate stage is one
    // narrow pass over the scan).
    val gated = base
      .withColumn("lang_pred", TextOps.langIdMarkerFast(col("text")))
      .filter(col("lang_pred") === lang)
      .withColumn("quality", TextOps.qualityScoreFast(col("text")))
      .filter(col("quality") >= minQuality)
      .withColumn("fp", TextOps.fingerprintFast(col("text")))

    // 3: exact dedup — keep the smallest id per content fingerprint.
    // min-over-window instead of groupBy+self-join: the groupBy form
    // consumed the gated subtree twice (once per join side); the window
    // pays one fp exchange over a single pass and drops the join.
    val byFp = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val deduped = gated
      .withColumn("__keep", min(col("doc_id")).over(byFp))
      .filter(col("doc_id") === col("__keep"))
      .drop("__keep")

    // 4: near-dup removal among the survivors
    val dropList = Dedup
      .ngramJaccardPairs(deduped, "doc_id", "text", shingleLen, minJaccard)
      .select(col("doc_b").as("doc_id"))
      .distinct()
    deduped
      .join(dropList, Seq("doc_id"), "left_anti")
      .select("doc_id", "quality", "fp")
  }
}
