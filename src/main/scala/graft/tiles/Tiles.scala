package graft.tiles

import graft.spatial.cell.CellMath
import graft.spatial.cell.{functions => F}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raster↔vector tile assignment (north_star: "raster↔vector tile
  * assignment over tables of image+caption pairs").
  *
  * A tile IS a cell at zoom z (CellMath packing), so point→tile is the
  * codegen cell encode and vector→tile reuses the polygon cell cover.
  * Assignment semantics (deterministic, oracle-reproducible):
  *   - a point (image) belongs to exactly one tile: `cell_of(lon, lat, z)`;
  *   - a polygon is assigned every tile in its bbox cover whose center
  *     lies inside the polygon OR that contains a polygon vertex OR whose
  *     bbox is fully inside the polygon bbox — a superset-free practical
  *     cover for rendering/join workloads.
  */
object Tiles {

  /** Adds `tile` (packed cell id) + `tile_x`/`tile_y`/`tile_z` columns. */
  def assignPoints(points: DataFrame, z: Int,
      lonCol: String = "lon", latCol: String = "lat"): DataFrame =
    points
      .withColumn("tile", F.cell_of(col(lonCol), col(latCol), z))
      .withColumn("tile_z", lit(z))
      .withColumn("tile_x", shiftright(col("tile"), 29).bitwiseAND(lit(0x1FFFFFFFL)).cast("int"))
      .withColumn("tile_y", col("tile").bitwiseAND(lit(0x1FFFFFFFL)).cast("int"))

  private val tilesOfPolygonUdf = udf(
    (minLon: Double, minLat: Double, maxLon: Double, maxLat: Double,
        rings: Seq[Seq[Seq[Double]]], z: Int) => {
      val ringSeq: Seq[Seq[(Double, Double)]] =
        rings.map(_.map(r => (r(0), r(1))))
      CellMath.coverBBox(minLon, minLat, maxLon, maxLat, z).filter { tile =>
        val (tMinLon, tMinLat, tMaxLon, tMaxLat) = CellMath.bounds(tile)
        val cLon = (tMinLon + tMaxLon) / 2
        val cLat = (tMinLat + tMaxLat) / 2
        // interior tiles: center inside (even-odd, so holes excluded);
        // boundary tiles: some ring edge crosses the tile rectangle
        graft.spatial.cell.GeomEval.pip(cLon, cLat, ringSeq) ||
          graft.spatial.cell.GeomEval.ringsIntersectRect(
            ringSeq, tMinLon, tMinLat, tMaxLon, tMaxLat)
      }
    })

  /** polygons(id, rings, bbox, ...) → (id, tile) pairs at zoom z.
    * Rings are reshaped struct→array<double> first: Spark scala UDFs cannot
    * take nested Row arguments. */
  def assignPolygons(polys: DataFrame, z: Int): DataFrame =
    polys.select(col("id"), explode(tilesOfPolygonUdf(
      col("bbox.min_lon"), col("bbox.min_lat"), col("bbox.max_lon"), col("bbox.max_lat"),
      expr("transform(rings, ring -> transform(ring, p -> array(p.lon, p.lat)))"),
      lit(z))).as("tile"))

  /** Per-tile aggregation of an assigned point table (A7): image counts +
    * any numeric payload stats, partial-agg friendly. */
  def tileStats(assigned: DataFrame, valueCol: Option[String] = None): DataFrame = {
    val base = assigned.groupBy(col("tile"), col("tile_z"), col("tile_x"), col("tile_y"))
    valueCol match {
      case Some(v) => base.agg(count(lit(1)).as("n"), avg(col(v)).as("avg_value"),
        min(col(v)).as("min_value"), max(col(v)).as("max_value"))
      case None => base.agg(count(lit(1)).as("n"))
    }
  }
}
