package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial self-joins over integer planar coordinates.
  *
  * The reference's schema policy admits GEOGRAPHY payloads
  * (`schema.go` type mapping); the operator a pipeline actually needs at
  * scale is the RADIUS JOIN — "all pairs of points within distance R" —
  * which naive SQL expresses as an O(n²) cross join. This module runs it
  * as a GRID-BUCKETED equi-join: each point owns one R×R cell; the probe
  * side expands to its 3×3 cell neighborhood (a 9× row inflation of one
  * slim (id, x, y) projection — constant, independent of n); candidates
  * meet through a plain hash equi-join on the cell key; the exact
  * distance test re-filters row-wise. Any pair within R shares adjacent
  * cells, so the candidate set provably covers the answer; the exact
  * filter makes false candidates cost time, never rows.
  *
  * All arithmetic is exact BIGINT (squared distances compared against
  * R² — no sqrt, no float trig), so results are bit-identical in any
  * engine: the cross-engine-stable analogue of a haversine join, which
  * would drift in the last ulp of `sin`/`atan2` between engines.
  *
  * Scale shape: one shuffle of each (id, x, y) projection on the cell
  * key (probe side ×9); join fan-out is bounded by cell occupancy — cell
  * size R keeps occupancy at the data's R-neighborhood density, the same
  * quantity that bounds the OUTPUT, so the join is within a constant of
  * output-optimal. Dense hot cells are ordinary join skew (AQE splits
  * them); no cartesian anywhere (plan-asserted in OpsSpec).
  */
object Spatial {

  /** All unordered point pairs within `radius` (squared distance ≤
    * radius²): (id1, id2, d2), id1 < id2, exact longs. Coordinates must
    * be non-negative integers (the floor-div cell key assumes it;
    * shift-before-join for signed domains).
    */
  def radiusPairs(
      df: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Long): DataFrame = {
    require(radius > 0, "non-positive radius")
    val pts = df.select(
      col(idCol).cast("long").as("sp_id"),
      col(xCol).cast("long").as("sp_x"),
      col(yCol).cast("long").as("sp_y"))
    // IEEE division is exact for coords < 2^52 (the documented domain);
    // non-negative inputs make floor == integer div.
    def cellOf(c: Column): Column = floor(c / lit(radius)).cast("long")
    val build = pts.select(
      col("sp_id").as("b_id"), col("sp_x").as("b_x"), col("sp_y").as("b_y"),
      cellOf(col("sp_x")).as("b_cx"), cellOf(col("sp_y")).as("b_cy"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    val probe = pts
      .withColumn("o", explode(offsets))
      .select(
        col("sp_id").as("a_id"), col("sp_x").as("a_x"), col("sp_y").as("a_y"),
        (cellOf(col("sp_x")) + col("o.dx")).as("a_cx"),
        (cellOf(col("sp_y")) + col("o.dy")).as("a_cy"))
    val d2 = (col("a_x") - col("b_x")) * (col("a_x") - col("b_x")) +
      (col("a_y") - col("b_y")) * (col("a_y") - col("b_y"))
    probe
      .join(build, col("a_cx") === col("b_cx") && col("a_cy") === col("b_cy"))
      .where(col("a_id") < col("b_id") && d2 <= lit(radius * radius))
      .select(col("a_id").as("id1"), col("b_id").as("id2"), d2.as("d2"))
  }

  /** Each point's nearest other point within `radius` (ties broken by
    * smaller neighbor id): (id, nn_id, d2). Points with no neighbor in
    * range are absent — a radius-bounded nearest-neighbor join (the
    * unbounded variant is a different operator: it needs ring-growing or
    * a global structure; bounding by R is what keeps the join
    * output-proportional at scale).
    */
  def nearestWithin(
      df: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      radius: Long): DataFrame = {
    val pairs = radiusPairs(df, idCol, xCol, yCol, radius)
    // both orientations, then one min_by per point
    val sym = pairs.select(col("id1").as("id"), col("id2").as("nn"), col("d2"))
      .unionAll(pairs.select(col("id2").as("id"), col("id1").as("nn"), col("d2")))
    sym.groupBy("id")
      .agg(min(struct(col("d2"), col("nn"))).as("best"))
      .select(col("id"), col("best.nn").as("nn_id"), col("best.d2").as("d2"))
  }

  /** Grid-density clustering (the STING/GRIDCLUS family, the scalable
    * cousin of DBSCAN): cells with at least `minPts` points are DENSE;
    * dense cells that touch (8-neighborhood) merge into one cluster;
    * every point in a dense cell gets its cluster's label (the minimum
    * member cell key — deterministic); points in sparse cells are noise
    * and absent from the output.
    *
    * This is exactly DBSCAN's density reachability quantized to the
    * grid: one groupBy replaces the per-point ε-neighborhood queries,
    * which is what makes it run at corpus scale. The quantization is the
    * documented trade — border points within ε of a dense region but
    * hashed to a sparse cell count as noise.
    *
    * Scale shape: the density pass is ONE map-side-combined cell count
    * (cells, not points, flow onward — everything after is bounded by
    * |dense cells|, which the grid caps at area/cell²); adjacency is an
    * equi-join of each dense cell's 9 neighbor keys against the dense
    * set; labels come from [[graft.ops.Dedup.connectedComponents]]'s
    * hash-min rounds over that cell graph (diameter-bounded, 2–4 rounds
    * on blob-shaped data). The final point labeling joins points back on
    * their own cell key — the only point-volume join, and it reuses the
    * density pass's partitioning. Cell keys encode as cx·2²¹ + cy:
    * coordinates must stay below 2²¹·cellSize (documented domain, same
    * class as radiusPairs' 2⁵² bound).
    */
  def gridDensityClusters(
      df: DataFrame,
      idCol: String,
      xCol: String,
      yCol: String,
      cellSize: Long,
      minPts: Long): DataFrame = {
    require(cellSize > 0, "non-positive cellSize")
    require(minPts >= 1, "minPts must be >= 1")
    val enc = 1L << 21
    val pts = df.select(
      col(idCol).cast("long").as("gd_id"),
      floor(col(xCol).cast("long") / lit(cellSize)).cast("long").as("cx"),
      floor(col(yCol).cast("long") / lit(cellSize)).cast("long").as("cy"))
    val dense = pts.groupBy("cx", "cy").agg(count(lit(1)).as("n"))
      .where(col("n") >= minPts)
      .select(col("cx"), col("cy"), (col("cx") * enc + col("cy")).as("ck"))
    val offsets = array((-1 to 1).flatMap(dx => (-1 to 1).map(dy =>
      struct(lit(dx.toLong).as("dx"), lit(dy.toLong).as("dy")))): _*)
    // Every dense cell probes its 9-neighborhood (self included: the
    // dx=dy=0 offset is the self-loop that keeps ISOLATED dense cells —
    // clusters of one cell — present in the component graph).
    val probe = dense
      .withColumn("o", explode(offsets))
      .select(col("ck").as("a"),
        ((col("cx") + col("o.dx")) * enc + (col("cy") + col("o.dy"))).as("b"))
    val edges = probe
      .join(dense.select(col("ck").as("b")), "b")
      .where(col("a") <= col("b"))
    val labels = Dedup.connectedComponents(edges, "a", "b")
      .select(col("doc_id").as("ck"), col("cluster_id"))
    pts
      .join(dense.select("cx", "cy", "ck"), Seq("cx", "cy"))
      .join(labels, "ck")
      .select(col("gd_id").as("id"), col("cluster_id"))
  }
}
