package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.geo.{Extent, MultiPolygon, PlanarCell, Wkb}
import graft.sources.ImageTable

/** Point/tile ⋈ polygon spatial join — the `raster_shpclip` /
  * `shp2array` pipeline (`geolib.py:635-753`) re-expressed as a covering-cell
  * equi-join prefilter plus exact ray-crossing point-in-polygon refine
  * (north rule). The prefilter is the engine analog of the reference's OGR
  * `SetSpatialFilter` pushdown (`geolib.py:663`).
  *
  * Scale shape: polygons flatMap to covering cells (small side), points map
  * to one cell each (big side), equi hash join on cell_id, then a codegen'd
  * refine. The hot-polygon skew (one polygon covering thousands of cells is
  * fine — it explodes the SMALL side; the dangerous skew is many points in
  * one cell) is defused by `saltFactor`: point cells salt by a deterministic
  * hash, polygon cells replicate ×salt. AQE skew-join covers the residual. */
object SpatialJoin {

  /** Decode cache: one WKB parse per polygon per task, not per candidate row. */
  private val cache = new ThreadLocal[java.util.HashMap[String, MultiPolygon]] {
    override def initialValue() = new java.util.HashMap[String, MultiPolygon]()
  }
  private def poly(id: String, wkb: Array[Byte]): MultiPolygon = {
    val c = cache.get()
    var p = c.get(id)
    if (p == null) { p = Wkb.read(wkb); if (c.size > 4096) c.clear(); c.put(id, p) }
    p
  }

  /** Polygon side → (cell_id, salt, poly_id, geom_wkb). */
  def polyCells(spark: SparkSession, polys: DataFrame, cellSize: Double,
                saltFactor: Int): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.Encoders.tuple(
      org.apache.spark.sql.Encoders.scalaLong, org.apache.spark.sql.Encoders.scalaInt,
      org.apache.spark.sql.Encoders.STRING, org.apache.spark.sql.Encoders.BINARY)
    polys.select("poly_id", "geom_wkb", "xmin", "ymin", "xmax", "ymax")
      .flatMap { r =>
        val cells = PlanarCell.cover(
          Extent(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)), cellSize)
        for (c <- cells; s <- 0 until saltFactor)
          yield (c, s, r.getString(0), r.getAs[Array[Byte]](1))
      }(enc)
      .toDF("cell_id", "salt", "poly_id", "geom_wkb")
  }

  /** points(pt_id, x, y, …) ⋈ polys(poly_id, geom_wkb, bbox) → matched pairs.
    * Exact PIP refine after the cell prefilter; `broadcastPolys` chooses the
    * physical join (broadcast for small layers, shuffle hash otherwise). */
  def pipJoin(spark: SparkSession, points: DataFrame, polys: DataFrame,
              cellSize: Double = 64.0, saltFactor: Int = 4,
              broadcastPolys: Boolean = true): DataFrame = {
    val pc = polyCells(spark, polys, cellSize, saltFactor)
    val pts = points.withColumn("cell_id",
        graft.functions.GraftFunctions.planarCell(col("x"), col("y"), lit(cellSize)))
      .withColumn("salt", pmod(hash(col("pt_id")), lit(saltFactor)))
    val right = if (broadcastPolys) broadcast(pc) else pc
    val contains = udf((id: String, wkb: Array[Byte], x: Double, y: Double) =>
      poly(id, wkb).contains(x, y))
    pts.join(right, Seq("cell_id", "salt"))
      .filter(contains(col("poly_id"), col("geom_wkb"), col("x"), col("y")))
      .drop("geom_wkb", "salt")
  }

  /** Polygon density heatmap — `heatmap` `geolib.py:2226-2244`: per-cell
    * count of covering polygons whose geometry actually intersects the cell
    * (burn-add semantics at cell granularity: cell center containment). */
  def heatmap(spark: SparkSession, polys: DataFrame, cellSize: Double = 64.0): DataFrame = {
    val pc = polyCells(spark, polys, cellSize, saltFactor = 1)
    val centerIn = udf((id: String, wkb: Array[Byte], cell: Long) => {
      val e = PlanarCell.extent(cell, cellSize)
      poly(id, wkb).contains((e.xmin + e.xmax) / 2, (e.ymin + e.ymax) / 2)
    })
    pc.filter(centerIn(col("poly_id"), col("geom_wkb"), col("cell_id")))
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n_polys"))
  }

  /** Clip aligned tiles by polygons — `raster_shpclip` `geolib.py:690-753`:
    * mask tile pixels whose centers fall outside (or, inverted, inside) the
    * polygon layer. Tile → covering polygons via cell join, then a per-pixel
    * PIP mask pass; emits re-masked tiles. */
  def clipTiles(spark: SparkSession, tiles: org.apache.spark.sql.Dataset[TileRow],
                polys: DataFrame, target: graft.geo.GridSpec,
                tileSize: Int = Warp.TileSize, invert: Boolean = false,
                ndv: Float = ImageTable.Ndv): org.apache.spark.sql.Dataset[TileRow] = {
    import spark.implicits._
    val polyList = polys.select("poly_id", "geom_wkb", "xmin", "ymin", "xmax", "ymax")
      .collect()
      .map(r => (r.getString(0), r.getAs[Array[Byte]](1),
                 Extent(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    val bc = spark.sparkContext.broadcast(polyList)
    tiles.map { t =>
      val polysLocal = bc.value
      // tile extent in map coords
      val tx0 = target.ulx + t.tx.toDouble * tileSize * target.res
      val ty1 = target.uly - t.ty.toDouble * tileSize * target.res
      val te = Extent(tx0, ty1 - tileSize * target.res, tx0 + tileSize * target.res, ty1)
      val cands = polysLocal.filter(_._3.intersects(te)).map(p => Wkb.read(p._2))
      val payload = t.payload.clone()
      var nValid = 0
      var i = 0
      while (i < payload.length) {
        if (payload(i) != ndv) {
          val px = t.tx * tileSize + (i % tileSize)
          val py = t.ty * tileSize + (i / tileSize)
          val (mx, my) = target.pixelToMap(px.toDouble, py.toDouble)
          val inside = cands.exists(_.contains(mx, my))
          if (inside == invert) payload(i) = ndv else nValid += 1
        }
        i += 1
      }
      t.copy(payload = payload, n_valid = nValid)
    }.filter(_.n_valid > 0)
  }
}
