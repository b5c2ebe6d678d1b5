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

  /** Per-vertex triangle counts over the UNDIRECTED simple graph induced
    * by `edges` (direction and duplicates dropped; every vertex of
    * `nodes` appears, zero-filled). Exact integer counting — each
    * triangle credits all three corners — so the result is
    * bit-reproducible against any engine's 3-way self-join.
    *
    * Plan shape is the degree-ordered orientation (the MapReduce triangle
    * literature's standard answer to the op's skew hazard): every edge is
    * directed from its lower-(degree, id) endpoint to the higher, which
    * (a) enumerates each triangle exactly once as a wedge at its
    * minimum-rank corner, and (b) bounds every vertex's OUT-degree at
    * O(√E) — a celebrity vertex with 10⁸ followers contributes wedges
    * only through the ~√E edges it ORIGINATES, not its full neighborhood,
    * so the wedge join's Σ outdeg² is O(E^1.5) worst-case instead of the
    * unoriented Σ deg². Joins co-partition on vertex keys end to end;
    * nothing is collected.
    */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges
      .select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("n"))
      .unionAll(und.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val withDeg = und
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
    // orient low-(deg, id) → high; carry the head's (deg, id) so a wedge
    // can name its closing edge's orientation without another deg join
    val aLow = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val or = withDeg.select(
      when(aLow, col("a")).otherwise(col("b")).as("s"),
      when(aLow, col("b")).otherwise(col("a")).as("t"),
      when(aLow, col("db")).otherwise(col("da")).as("td"))
    val e1 = or.select(col("s"), col("t").as("v"), col("td").as("vd"))
    val e2 = or.select(col("s"), col("t").as("w"), col("td").as("wd"))
    // wedges at the minimum-rank corner, out-neighbors ordered by rank so
    // the closing edge (v → w) has a unique oriented form to probe
    val wedges = e1.join(e2, Seq("s"))
      .where(col("vd") < col("wd") || (col("vd") === col("wd") && col("v") < col("w")))
      .select(col("s"), col("v"), col("w"))
    val closed = wedges.join(
      or.select(col("s").as("v"), col("t").as("w")), Seq("v", "w"), "left_semi")
    // One corner row per triangle vertex via a codegen'd Generate — NOT a
    // 3-way union of closed.select(...): a union references `closed`
    // three times and Spark re-executes the wedge-expansion pipeline per
    // branch (ReuseExchange dedupes shuffles, but there is no exchange
    // above `closed`, so the r16 ns173 dump showed the 2M-row BHJ probe
    // chain running 3x — once per orientation branch, serially).
    val corners = closed
      .select(explode(array(col("s"), col("v"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    nodes.select(col("node").cast("long").as("node"))
      .join(corners, Seq("node"), "left")
      .select(col("node"), coalesce(col("triangles"), lit(0L)).as("triangles"))
  }

  /** Multi-source BFS over the UNDIRECTED graph induced by `edges`:
    * exact minimum hop count from any seed, out to `maxHops`. The
    * "blast radius" primitive (which users are within k hops of a
    * flagged account; which documents within k links of a known-bad
    * domain) — exact integers, so bit-reproducible against a recursive
    * SQL replay.
    *
    * Frontier algorithm, one Spark job per level: the next frontier is
    * (frontier ⋈ edges) minus everything already labeled (left_anti) —
    * each vertex is settled exactly once at its true distance, so work
    * per level is O(frontier-adjacent edges), never O(V×levels) like the
    * naive "relax everything each round" formulation. Terminates early
    * when a frontier empties (the `isEmpty` probe is one count job over
    * the checkpoint-truncated frontier — same per-round action discipline
    * as [[pageRankInt]]).
    *
    * Scale shape: per level, one co-partitioned equi-join on the vertex
    * key plus one anti-join against the settled set (both AQE-skew-
    * splittable); settled state is O(V) distributed rows, never
    * collected. Lineage is cut per level via [[Checkpoints.truncate]]
    * (`spark.graft.checkpoint.mode=reliable` for executor-loss safety).
    *
    * @param seeds one `node` (long) row per source vertex.
    * @return `(node, hops)` for every vertex reachable within `maxHops`
    *         (seeds at 0), ready for a left join back to the corpus.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int): DataFrame = {
    require(maxHops >= 0, "negative maxHops")
    val und = Checkpoints.truncate {
      val e = edges.select(col("src").cast("long").as("u"), col("dst").cast("long").as("v"))
      e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
        .where(col("u") =!= col("v"))
        .distinct()
    }
    var settled = Checkpoints.truncate(
      seeds.select(col("node").cast("long").as("node")).distinct()
        .withColumn("hops", lit(0L)))
    var frontier = settled
    var h = 0L
    var done = maxHops == 0
    while (!done) {
      h += 1
      val next = Checkpoints.truncate(
        frontier.select(col("node").as("u"))
          .join(und, Seq("u"))
          .select(col("v").as("node"))
          .distinct()
          .join(settled, Seq("node"), "left_anti")
          .withColumn("hops", lit(h)))
      if (next.isEmpty) {
        Checkpoints.unpersist(next)
        done = true
      } else {
        val grown = Checkpoints.truncate(settled.unionAll(next))
        Checkpoints.unpersist(settled)
        if (frontier ne settled) Checkpoints.unpersist(frontier)
        settled = grown
        frontier = next
        done = h >= maxHops
      }
    }
    if (frontier ne settled) Checkpoints.unpersist(frontier)
    Checkpoints.unpersist(und)
    settled
  }

  /** Local clustering coefficient per node: `2·triangles / (d·(d−1))`
    * over the undirected simple graph — the "how clique-like is this
    * node's neighborhood" signal (spam rings and bot farms cluster; organic
    * accounts don't). Exact integer triangles and degrees from
    * [[triangleCounts]]'s oriented-wedge counting, with the coefficient as
    * ONE IEEE division of exact integers — bit-reproducible. Nodes of
    * degree < 2 report a NULL coefficient (no wedge exists).
    *
    * Scale shape: adds one map-side-combined degree aggregation and an
    * id-only join to the triangle pass — the oriented wedge join remains
    * the dominant (and bounded, Σ d_out²-capped) cost.
    */
  /** Bounded k-core peeling: `rounds` iterations of "drop every node with
    * degree < k" over the undirected simple graph — the engagement-core
    * filter crawl/social curation uses ("keep accounts embedded in a
    * mutually-active core"). A FIXED round count instead of
    * run-to-fixpoint keeps the computation exactly replayable as an
    * UNROLLED SQL chain (an aggregate-per-round recursive CTE is not
    * portable), and `converged` reports whether round `rounds` removed
    * nobody — at which point the survivors ARE the k-core (peeling is
    * monotone, so convergence is checkable, not assumed).
    *
    * Scale shape per round: one degree aggregation (map-side combined)
    * + two semi-joins filtering the edge list — all equi-key,
    * AQE-splittable; [[Checkpoints.truncate]] cuts the per-round lineage
    * like every iterative op here.
    *
    * @return survivors `(node, degree)` under the final round's degrees,
    *         with the same `converged` flag on every row.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "kCore needs k >= 1 and rounds >= 1")
    kCoreLoop(undirect(edges), k, rounds)
  }

  /** [[kCore]] with k DERIVED from the graph itself — one above the
    * minimum degree — so the peel threshold scales with the data instead
    * of a tuned constant (the fixture-scaling discipline: a fixed k that
    * peels nothing at one SF and everything at another is a vacuous
    * gate; min+1 guarantees at least the weakest node peels while the
    * bulk survives on any degree distribution). One small aggregate
    * action derives k; the SQL replay computes the identical scalar.
    */
  def kCoreAboveMinDegree(edges: DataFrame, rounds: Int): DataFrame = {
    val und = Checkpoints.truncate(undirect(edges))
    val k = und
      .select(explode(array(col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("deg"))
      .agg(min("deg")).head().getLong(0) + 1L
    kCoreLoop(und, k.toInt, rounds)
  }

  private def undirect(edges: DataFrame): DataFrame =
    edges
      .select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()

  private def kCoreLoop(und0: DataFrame, k: Int, rounds: Int): DataFrame = {
    def degrees(und: DataFrame): DataFrame =
      und.select(col("a").as("node"))
        .unionAll(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("degree"))
    var und = Checkpoints.truncate(und0)
    var removedLastRound = 0L
    var r = 0
    while (r < rounds) {
      val keep = degrees(und).where(col("degree") >= k).select("node")
      val next = Checkpoints.truncate(
        und.join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
          .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
          .select("a", "b"))
      // one count action per round, same discipline as pageRankInt
      removedLastRound = und.count() - next.count()
      Checkpoints.unpersist(und)
      und = next
      r += 1
    }
    val converged = removedLastRound == 0L
    degrees(und).where(col("degree") >= k)
      .select(col("node"), col("degree"), lit(converged).as("converged"))
  }

  def clusteringCoefficients(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val und = edges
      .select(
        least(col("src").cast("long"), col("dst").cast("long")).as("a"),
        greatest(col("src").cast("long"), col("dst").cast("long")).as("b"))
      .where(col("a") =!= col("b"))
      .distinct()
    val deg = und.select(col("a").as("node"))
      .unionAll(und.select(col("b").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    triangleCounts(nodes, edges)
      .join(deg, Seq("node"), "left")
      .select(
        col("node"),
        coalesce(col("degree"), lit(0L)).as("degree"),
        col("triangles"),
        when(coalesce(col("degree"), lit(0L)) >= 2,
          (col("triangles") * 2L).cast("double") /
            (col("degree") * (col("degree") - 1L)).cast("double"))
          .as("clustering"))
  }

  /** Time-respecting reachability (temporal BFS): the earliest arrival
    * time at which each vertex is reachable from the seed set along
    * paths whose edge timestamps never DECREASE — the temporal-network
    * question ("who could the information have reached by when?") that
    * plain BFS answers wrongly (a path using an edge that fired before
    * the walker arrived is not a path). Seeds arrive at `seedTs`;
    * round r relaxes `arrival(dst) = min(arrival(dst), min ts of an
    * edge from a reached src with ts ≥ arrival(src))`; `maxHops` rounds
    * bound the walk exactly like [[bfsHops]].
    *
    * Determinism: arrivals are exact longs under min — no float, no tie
    * ambiguity. Scale shape per round: one frontier-edge equi-join on
    * the source key + one min-aggregate (map-side combined); the
    * settled set is distributed and each improvement is monotone, so
    * total relaxation work is O(E·maxHops) worst case with the usual
    * AQE answer for hub keys.
    *
    * Output: (vertex, arrival, hops) — hops = the round that first
    * settled the vertex's final arrival; unreachable vertices are
    * absent.
    */
  def temporalReachability(
      edges: DataFrame, seeds: DataFrame, seedTs: Long, maxHops: Int): DataFrame = {
    require(maxHops >= 1, "maxHops must be >= 1")
    val e = edges.select(
      col("src").cast("long").as("src"), col("dst").cast("long").as("dst"),
      col("ts").cast("long").as("ts"))
    var reached = seeds.select(col("v").cast("long").as("v"))
      .distinct()
      .withColumn("arrival", lit(seedTs))
      .withColumn("hops", lit(0L))
    for (h <- 1 to maxHops) {
      val relaxed = reached.alias("f")
        .join(e.alias("e"), col("e.src") === col("f.v") && col("e.ts") >= col("f.arrival"))
        .groupBy(col("e.dst").as("v"))
        .agg(min(col("e.ts")).as("arrival"))
        .withColumn("hops", lit(h.toLong))
      reached = reached.unionByName(relaxed)
        .withColumn("_rk",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("v")).orderBy(col("arrival"), col("hops"))))
        .where(col("_rk") === 1)
        .drop("_rk")
      reached = Checkpoints.truncate(reached)
    }
    reached
  }
}
