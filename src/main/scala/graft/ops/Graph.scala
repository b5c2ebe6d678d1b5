package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Link-graph analytics (north-star extension): PageRank-style authority
  * scoring over a derived graph — the corpus-curation primitive behind
  * "weight crawl documents by the rank of their host" (the quality signal
  * both the original PageRank paper and modern crawl-filtering pipelines
  * use).
  *
  * Determinism contract: ranks are computed in FIXED-POINT INTEGER
  * arithmetic (`rank` is a long scaled by `scale`; the damping step is
  * `base + (dampNum * sum(contrib)) div dampDen`). Integer sums are exact
  * and order-independent, and integer division is identical on every
  * engine, so the result is bit-reproducible across cluster sizes, retries,
  * AND the DuckDB oracle — unlike float PageRank, whose shuffle-order-
  * dependent double sums differ run to run. Dangling mass is dropped (the
  * standard simplification; documented so the oracle matches).
  *
  * Scale shape per iteration: one co-partitioned join of the edge list with
  * the rank table on `src` (both hash-partitioned on the same key — the
  * exchange is reused) and one sum-aggregation on `dst` with map-side
  * partial combine. State per round is O(|V|); [[Checkpoints.truncate]]
  * cuts the growing lineage each round — `spark.graft.checkpoint.mode=
  * reliable` switches every round to a reliable-store checkpoint for
  * executor-loss-safe 100 TB runs.
  */
object Graph {

  /** First-touch attribution chains: for every key (e.g. a campaign or
    * content id), order users by their first event on that key and link
    * each user to the next — the "who influenced whom" edge list a growth
    * team derives from an event log. Output: distinct `(src, dst)` edges.
    *
    * Scale shape: the first-touch aggregation map-side combines to one row
    * per (key, user); the `lead` window partitions by key — bounded by the
    * per-key user count, never the event count.
    */
  def attributionEdges(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      keyCol: org.apache.spark.sql.Column): DataFrame = {
    val ft = events
      .select(
        keyCol.cast("long").as("k"),
        col(userCol).cast("long").as("u"),
        unix_micros(col(tsCol)).as("t"))
      // A NULL key (cast/extraction failure) is not a shared touchpoint:
      // without this filter every unparseable event lands in one giant
      // k=NULL window partition and fabricates edges between unrelated
      // users (plus a skew hot spot).
      .where(col("k").isNotNull)
      .groupBy("k", "u")
      .agg(min("t").as("ft"))
    val w = Window.partitionBy("k").orderBy(col("ft"), col("u"))
    ft.select(col("u").as("src"), lead(col("u"), 1).over(w).as("dst"))
      .where(col("dst").isNotNull && col("dst") =!= col("src"))
      .distinct()
  }

  /** Fixed-point integer PageRank.
    *
    * @param nodes one `node` (long) row per vertex; vertices with no edges
    *              keep the base rank `((dampDen-dampNum)*scale) div dampDen`.
    * @param edges distinct `(src, dst)` long pairs.
    * @return `(node, rank)` — rank is a long in units of `1/scale`.
    */
  def pageRankInt(
      nodes: DataFrame,
      edges: DataFrame,
      iterations: Int,
      scale: Long = 1000000L,
      dampNum: Long = 85L,
      dampDen: Long = 100L): DataFrame = {
    require(iterations >= 0, "negative iterations")
    val e = Checkpoints.truncate(
      edges.select(col("src").cast("long").as("src"), col("dst").cast("long").as("dst")))
    val outdeg = Checkpoints.truncate(e.groupBy("src").agg(count(lit(1)).as("deg")))
    val n = Checkpoints.truncate(nodes.select(col("node").cast("long").as("node")))
    val base = ((dampDen - dampNum) * scale) / dampDen
    var ranks = Checkpoints.truncate(n.select(col("node"), lit(scale).as("rank")))
    var iter = 0
    while (iter < iterations) {
      // contrib(src) = rank(src) div outdeg(src): exact integer floor; the
      // join keys are both `src`, so ranks/outdeg co-partition.
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst"), expr("rank div deg").as("c"))
        .groupBy("dst")
        .agg(sum("c").as("s"))
      val next = Checkpoints.truncate(
        n.join(contribs.withColumnRenamed("dst", "node"), Seq("node"), "left")
          .select(
            col("node"),
            (lit(base) + expr(s"($dampNum * coalesce(s, 0L)) div $dampDen"))
              .as("rank")))
      Checkpoints.unpersist(ranks)
      ranks = next
      iter += 1
    }
    // Only the returned frame must stay persisted: the final ranks are
    // checkpointed, so the iteration's inputs can release their blocks
    // (left pinned, they leak O(|E|+|V|) executor storage per call across
    // a long session).
    Checkpoints.unpersist(e)
    Checkpoints.unpersist(outdeg)
    Checkpoints.unpersist(n)
    ranks
  }
}
