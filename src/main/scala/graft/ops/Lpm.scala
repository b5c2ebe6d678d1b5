package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Longest-prefix-match join (north-star extension): match every fact key
  * against the most specific rule whose prefix it starts with — the
  * routing-table / dialing-plan / URL-namespace shape ("this phone prefix
  * is this carrier", "this CIDR is this network", "this path prefix is
  * this service"). Cf. the reference's range-predicate pushdown surface
  * (`duck.go` delegates these to DuckDB); LPM is the variant SQL engines
  * do NOT ship natively.
  *
  * Spark-first shape: a prefix match of bounded lengths L is |L|
  * EQUI-joins, not a `LIKE`-join — each fact emits one candidate
  * `substring(key, 1, l)` per rule length present, the candidates
  * equi-join the (broadcast-sized) rule table, and one max-struct
  * aggregate keeps the longest match per fact. No theta join, no
  * cartesian, no per-rule scan: cost is O(|facts|·|L|) candidate rows
  * against a broadcast dim.
  *
  * Determinism: ties are impossible — per fact and length there is at most
  * ONE rule string (`rules` must be prefix-distinct, enforced here) — and
  * `max(struct(len, prefix))` orders first on the exact integer length.
  *
  * Scale shape: the rule table is a dim (routing tables are ~10⁶ rows at
  * the very largest — broadcast territory); candidate generation is
  * scan-local; the aggregate ships (fact-id, len, prefix) triples only for
  * facts that matched, map-side-combined to one row per fact. At 100 TB of
  * facts the plan reads the fact table once and never shuffles payload
  * columns — survivors rejoin on the fact id.
  */
object Lpm {

  /** @param facts     fact rows; `keyCol` (string) is matched against rules.
    * @param idCol     unique fact id carried through the match aggregate.
    * @param rules     prefix-distinct rule rows: `prefixCol` string.
    * @param lengths   the rule prefix lengths present (small, static —
    *                  derive from the rule build; a length with no rules
    *                  just contributes a never-matching candidate).
    * @return facts ⟕ (matched_prefix, matched_len): every fact row, with
    *         NULLs where no rule prefixes the key.
    */
  def longestPrefixJoin(
      facts: DataFrame,
      idCol: String,
      keyCol: String,
      rules: DataFrame,
      prefixCol: String,
      lengths: Seq[Int]): DataFrame = {
    require(lengths.nonEmpty, "lpm: at least one prefix length")
    val dim = rules
      .select(col(prefixCol).as("_lpm_prefix"))
      .distinct()
      .withColumn("_lpm_len", length(col("_lpm_prefix")).cast("long"))
    val cands = facts.select(
      col(idCol),
      explode(array(lengths.distinct.sorted.map(l =>
        substring(col(keyCol), 1, l)): _*)).as("_lpm_prefix"))
    val best = cands
      .join(broadcast(dim), Seq("_lpm_prefix"))
      .groupBy(idCol)
      .agg(max(struct(col("_lpm_len"), col("_lpm_prefix"))).as("_lpm_best"))
      .select(
        col(idCol),
        col("_lpm_best._lpm_prefix").as("matched_prefix"),
        col("_lpm_best._lpm_len").as("matched_len"))
    facts.join(best, Seq(idCol), "left")
  }
}
