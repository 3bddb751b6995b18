package graft.api

import graft.ops.Geo
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Geospatial analytics as a public, staged API — the sixth pipeline
  * alongside [[DedupPipeline]]/[[CorpusPipeline]]/[[RetrievalPipeline]]/
  * [[AuditPipeline]]/[[MaintenancePipeline]], bundling the spatial
  * primitives a location-carrying corpus needs: grid-blocked radius
  * joins, certified exact kNN, density rasters and DBSCAN-style cell
  * clustering, geohash hot cells, exact point-in-polygon containment,
  * and great-circle distances. Each stage returns the SAME DataFrame the
  * gated query produces (PipelineSpec pins this), so the API inherits
  * every oracle guarantee — including the brute-force-equality proofs
  * behind the blocking and certification claims.
  *
  * Scale census: every pair-forming operator is grid-blocked (cell
  * equi-joins, never cross products); kNN certifies exactness from the
  * ring bound and falls back only for the rare uncertified query;
  * clustering runs on cells, not points; the only corpus-scale work
  * anywhere is one hash aggregate or one broadcast-joined scan. */
class GeoPipeline {

  /** Every point pair within the radius, via lossless cell blocking. */
  def radiusJoin(s: SparkSession, dir: String): DataFrame =
    Geo.gridRadiusJoin(s, dir)

  /** Exact k-nearest-neighbours: certified grid pruning + bounded-heap
    * aggregate, brute-force fallback for uncertified queries. */
  def knn(s: SparkSession, dir: String): DataFrame =
    Geo.knn(s, dir)

  /** Density raster: counts and exact centroids per grid cell. */
  def densityGrid(s: SparkSession, dir: String): DataFrame =
    Geo.densityGrid(s, dir)

  /** DBSCAN at cell granularity: core cells, adjacency, components. */
  def densityClusters(s: SparkSession, dir: String): DataFrame =
    Geo.densityClusters(s, dir)

  /** Geohash-encoded hot cells (the string spatial index). */
  def geohashCells(s: SparkSession, dir: String): DataFrame =
    Geo.geohashTopCells(s, dir)

  /** Exact-integer ray-cast containment with shoelace areas. */
  def pointInPolygon(s: SparkSession, dir: String): DataFrame =
    Geo.pointInPolygon(s, dir)

  /** Great-circle distances (haversine, 6-dp portable rounding). */
  def haversine(s: SparkSession, dir: String): DataFrame =
    Geo.haversineCapitals(s, dir)

  /** Per-entity movement statistics: exact L1 path length, largest hop,
    * net displacement, and an integer straightness ratio. */
  def trajectories(s: SparkSession, dir: String): DataFrame =
    Geo.trajectories(s, dir)
}
