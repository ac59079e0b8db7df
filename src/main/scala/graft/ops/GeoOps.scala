package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Spatial operators: grid-cell blocking for proximity joins.
  *
  * The radius join is the spatial sibling of the dedup family's candidate
  * geometries: a naive "all points within ε of each query" is a cartesian
  * product; blocking each point into a ⌊coord/g⌋ grid cell with g ≥ ε turns
  * it into ONE equi-join — any true pair lies in the same or an adjacent
  * cell, so probing the 3×3 neighborhood (a 9-row explode on the QUERY
  * side, constant fanout) has full recall by construction. Cell population
  * tracks spatial density, the same way d13's segment keys track textual
  * repetition — no content-blind quadratic blowup.
  *
  * The verification metric here is planar squared-degree distance —
  * pure +,×,≤ arithmetic, bit-identical across engines. A production
  * deployment verifies with haversine in the SAME plan shape; the grid
  * just needs g sized for the worst-case latitude scale. (Transcendental
  * sin/cos/asin are correctly-rounded in neither Java nor libm, so an
  * engine-vs-oracle gate pins the geometry with the planar metric.)
  */
object GeoOps {

  /** All (query, point) pairs with (Δlat)² + (Δlon)² ≤ eps², excluding
    * self-pairs by id. Requires gridSize ≥ eps (checked): coarser cells
    * are still exact, just with more false candidates to verify.
    *
    * @return (query_id, point_id, d2) with d2 the exact squared distance. */
  def gridRadiusJoin(points: DataFrame, queries: DataFrame, idCol: String,
                     latCol: String, lonCol: String, eps: Double,
                     gridSize: Double): DataFrame = {
    require(gridSize >= eps, "gridSize must be >= eps for 3x3-neighborhood recall")
    def cellI(c: Column) = floor(c / gridSize).cast("long")
    val pts = points.select(col(idCol).as("point_id"),
      col(latCol).as("plat"), col(lonCol).as("plon"),
      cellI(col(latCol)).as("ci"), cellI(col(lonCol)).as("cj"))
    val qs = queries.select(col(idCol).as("query_id"),
        col(latCol).as("qlat"), col(lonCol).as("qlon"),
        cellI(col(latCol)).as("qi"), cellI(col(lonCol)).as("qj"))
      .withColumn("di", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dj", explode(sequence(lit(-1L), lit(1L))))
      .select(col("query_id"), col("qlat"), col("qlon"),
        (col("qi") + col("di")).as("ci"), (col("qj") + col("dj")).as("cj"))
    val dlat = col("qlat") - col("plat")
    val dlon = col("qlon") - col("plon")
    qs.join(pts, Seq("ci", "cj"))
      .filter(col("query_id") =!= col("point_id"))
      .withColumn("d2", dlat * dlat + dlon * dlon)
      .filter(col("d2") <= eps * eps)
      .select(col("query_id"), col("point_id"), col("d2"))
  }

  /** Grid-density clustering (the grid/cell-based DBSCAN family, e.g.
    * GriDBSCAN): points land in fixed cells; a cell is CORE when it holds
    * ≥ minPts points; clusters are connected components over 8-adjacent
    * core cells. k-means (s8) needs k and finds convex cells; the dup-graph
    * CC (d6) needs a pairwise predicate; this is the third clustering
    * family — density thresholding with arbitrary-shape clusters — at grid
    * resolution, which is exactly the trade a 100 TB pipeline makes
    * (point-level DBSCAN is quadratic-adjacent; cell-level is one shuffle).
    *
    * minPts derives from the corpus: max(2, ⌊3N/2C⌋+1), ~1.5× the mean
    * OCCUPIED-cell load — a fixed absolute threshold would flip between
    * all-core and none-core across scale factors. All-integer derivation,
    * mirrored by the oracle.
    *
    * Scale shape: one shuffle keys the cell counts; everything downstream
    * (core filter, 8-neighbor expansion, CC, labeling) is CELL-SPACE-sized
    * — bounded by the grid, not the corpus. Neighbor ids guard the x range
    * (0 ≤ cx+dx < nx) so row-major ids cannot alias across row ends;
    * out-of-range y neighbors produce ids no core cell holds (harmless).
    *
    * @param nx row width of the row-major cell id (cy·nx + cx)
    * @return (cy, cx, n_pts, cluster_id) for CORE cells only; cluster_id
    *         is the component's min cell id (isolated core cell → itself) */
  def gridDbscan(points: DataFrame, latCol: String, lonCol: String,
                 cellSize: Double, latOrigin: Double, lonOrigin: Double,
                 nx: Long): DataFrame = {
    require(cellSize > 0 && nx > 0)
    val cells = points.select(
        floor((col(latCol) - latOrigin) / cellSize).cast("long").as("cy"),
        floor((col(lonCol) - lonOrigin) / cellSize).cast("long").as("cx"))
      .groupBy(col("cy"), col("cx")).agg(count(lit(1)).as("n_pts"))
    val stats = cells.agg(sum(col("n_pts")).as("n_total"),
      count(lit(1)).as("n_cells"))
    val core = cells.crossJoin(broadcast(stats))
      .filter(col("n_pts") >=
        greatest(lit(2L), expr("3 * n_total div (2 * n_cells) + 1")))
      .select(col("cy"), col("cx"), col("n_pts"),
        (col("cy") * nx + col("cx")).as("cell_id"))
    val nbrs = core.select(col("cell_id").as("id_a"), col("cy"), col("cx"))
      .withColumn("dy", explode(sequence(lit(-1L), lit(1L))))
      .withColumn("dx", explode(sequence(lit(-1L), lit(1L))))
      .filter(!(col("dy") === 0 && col("dx") === 0))
      .filter(col("cx") + col("dx") >= 0 && col("cx") + col("dx") < nx)
      .select(col("id_a"),
        ((col("cy") + col("dy")) * nx + col("cx") + col("dx")).as("id_b"))
    val pairs = nbrs.join(core.select(col("cell_id").as("id_b")), "id_b")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val labeled = DedupOps.connectedComponents(pairs)
    core.join(labeled.select(col("id").as("cell_id"), col("cluster_id")),
        Seq("cell_id"), "left")
      .select(col("cy"), col("cx"), col("n_pts"),
        coalesce(col("cluster_id"), col("cell_id")).as("cluster_id"))
  }
}
