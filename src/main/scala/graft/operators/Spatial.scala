package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Spatial predicates for the analytics surface (reference exposes no
  * geo engine; this is the beyond-reference spatial join the pipeline
  * queries need). Integer-only arithmetic throughout: the ray-casting
  * parity test is the cross-multiplied half-open form — no division,
  * so containment is exact on any engine PROVIDED |coord| ≤ 2^30: each
  * cross-product factor is then a difference of two such values
  * (magnitude ≤ 2^31), each product ≤ 2^62, and the difference of two
  * products stays within int64 — no silent wraparound in non-ANSI
  * mode. (2^31-range coordinates would NOT be safe: factor differences
  * reach 2^32 and a product ~2^64 exceeds int64.) The cross product is
  * computed in LongType explicitly — int-typed point/edge columns
  * would otherwise multiply in int32 and wrap at coordinates as small
  * as ~50k. Callers with coordinates beyond 2^30 must rescale or
  * switch the cross product to decimal(38,0).
  *
  * Scale shape: the naive points×edges relation is |P|·Σ|edges|; the
  * grid prefilter below cuts it to the points that land in a polygon's
  * bbox cells, an equi-join on (cx, cy) against a broadcast cell
  * relation — at 100 TB the point relation streams through one
  * broadcast hash join instead of an 18× scan multiplier, and only
  * bbox survivors reach the edge test.
  */
object Spatial {

  /** Per-polygon integer bbox, exploded to the covered grid cells.
    * Edge relation: (pid, x1, y1, x2, y2). Output: one row per
    * (pid, cx, cy) covered cell, carrying the exact bbox for the
    * residual point-level test. Cell count per polygon is
    * ceil(w/cell)·ceil(h/cell) — tiny for any sane cellSize, and the
    * whole relation is |polygons|-bounded, so it broadcasts.
    */
  private[graft] def polygonCells(edges: DataFrame, cellSize: Int): DataFrame = {
    require(cellSize > 0, s"Spatial: cellSize must be > 0, got $cellSize")
    edges
      .groupBy("pid")
      .agg(
        least(min("x1"), min("x2")).cast("long").as("xmin"),
        greatest(max("x1"), max("x2")).cast("long").as("xmax"),
        least(min("y1"), min("y2")).cast("long").as("ymin"),
        greatest(max("y1"), max("y2")).cast("long").as("ymax"))
      .withColumn("cx",
        explode(sequence(floor(col("xmin") / cellSize).cast("long"),
          floor(col("xmax") / cellSize).cast("long"))))
      .withColumn("cy",
        explode(sequence(floor(col("ymin") / cellSize).cast("long"),
          floor(col("ymax") / cellSize).cast("long"))))
  }

  /** Grid-cell bbox prefilter: candidate (point, polygon) pairs whose
    * point lands inside the polygon's INCLUSIVE bbox. Inclusive is the
    * safe superset: any point the half-open crossing rule can classify
    * inside (including points on the boundary itself) satisfies
    * xmin ≤ px ≤ xmax ∧ ymin ≤ py ≤ ymax, and every non-candidate has
    * even crossing parity, so dropping it never changes a containment
    * count. Points: (idCol, px, py) with integer coordinates.
    */
  private[graft] def bboxCandidates(
      pts: DataFrame, edges: DataFrame, idCol: String, cellSize: Int): DataFrame = {
    val cells = broadcast(polygonCells(edges, cellSize))
    pts
      .withColumn("cx", floor(col("px") / cellSize).cast("long"))
      .withColumn("cy", floor(col("py") / cellSize).cast("long"))
      .join(cells, Seq("cx", "cy"))
      .filter(col("px").between(col("xmin"), col("xmax")) &&
        col("py").between(col("ymin"), col("ymax")))
      .select(col(idCol), col("px"), col("py"), col("pid"))
  }

  /** Exact point-in-polygon containment counts by ray-casting crossing
    * parity, prefiltered by [[bboxCandidates]]. Per polygon: number of
    * contained points and the contained-id checksum; a polygon whose
    * bbox catches no points still emits a zero row. The per-edge test
    * is sign((py−y1)(x2−x1) − (px−x1)(y2−y1)) against the half-open
    * vertical rule (y1>py) ≠ (y2>py) — integer cross-products only.
    */
  def pointInPolygonCounts(
      pts: DataFrame, edges: DataFrame,
      idCol: String = "event_id", cellSize: Int = 250): DataFrame = {
    require(cellSize > 0, s"Spatial: cellSize must be > 0, got $cellSize")
    val cand = bboxCandidates(pts, edges, idCol, cellSize)
    // Long arithmetic explicitly: with int-typed coordinate columns the
    // products would evaluate in int32 and wrap (see the object doc).
    val cross =
      (col("py").cast("long") - col("y1").cast("long")) *
        (col("x2").cast("long") - col("x1").cast("long")) -
      (col("px").cast("long") - col("x1").cast("long")) *
        (col("y2").cast("long") - col("y1").cast("long"))
    val crossings = cand
      .join(broadcast(edges), Seq("pid"))
      .groupBy(col(idCol), col("pid"))
      .agg(sum(
        when((col("y1") > col("py")) =!= (col("y2") > col("py")),
          when(col("y2") > col("y1"), when(cross > 0, 1L).otherwise(0L))
            .otherwise(when(cross < 0, 1L).otherwise(0L)))
          .otherwise(0L)).as("crossings"))
    val perPoly = crossings
      .groupBy("pid")
      .agg(
        sum(col("crossings") % 2).as("n_inside"),
        sum(when(col("crossings") % 2 === 1, col(idCol)).otherwise(0L)).as("id_sum"))
    edges.select("pid").distinct()
      .join(perPoly, Seq("pid"), "left")
      .select(col("pid").as("polygon_id"),
        coalesce(col("n_inside"), lit(0L)).cast("long").as("n_inside"),
        coalesce(col("id_sum"), lit(0L)).cast("long").as("id_sum"))
      .orderBy("polygon_id")
  }
}
