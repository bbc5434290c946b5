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

  /** Decode cache: one WKB parse per polygon per task, not per candidate row.
    * Keys are (operator-invocation epoch, poly_id): two polygon layers in the
    * same JVM may reuse ids with different geometries, so a bare poly_id key
    * would serve stale geometry across queries. */
  private val cache = new ThreadLocal[java.util.HashMap[String, MultiPolygon]] {
    override def initialValue() = new java.util.HashMap[String, MultiPolygon]()
  }
  private def poly(epoch: String, id: String, wkb: Array[Byte]): MultiPolygon = {
    val c = cache.get()
    val key = epoch + "/" + id
    var p = c.get(key)
    if (p == null) { p = Wkb.read(wkb); if (c.size > 4096) c.clear(); c.put(key, p) }
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
    val epoch = java.util.UUID.randomUUID().toString // cache scope, this invocation
    val contains = udf((id: String, wkb: Array[Byte], x: Double, y: Double) =>
      poly(epoch, id, wkb).contains(x, y))
    pts.join(right, Seq("cell_id", "salt"))
      .filter(contains(col("poly_id"), col("geom_wkb"), col("x"), col("y")))
      .drop("geom_wkb", "salt")
  }

  /** Polygon density heatmap — `heatmap` `geolib.py:2226-2244`: per-cell
    * count of covering polygons whose geometry actually intersects the cell
    * (burn-add semantics at cell granularity: cell center containment). */
  def heatmap(spark: SparkSession, polys: DataFrame, cellSize: Double = 64.0): DataFrame = {
    val pc = polyCells(spark, polys, cellSize, saltFactor = 1)
    val epoch = java.util.UUID.randomUUID().toString // cache scope, this invocation
    val centerIn = udf((id: String, wkb: Array[Byte], cell: Long) => {
      val e = PlanarCell.extent(cell, cellSize)
      poly(epoch, id, wkb).contains((e.xmin + e.xmax) / 2, (e.ymin + e.ymax) / 2)
    })
    pc.filter(centerIn(col("poly_id"), col("geom_wkb"), col("cell_id")))
      .groupBy(col("cell_id")).agg(count(lit(1)).as("n_polys"))
  }

  /** Clip aligned tiles by polygons — `raster_shpclip` `geolib.py:690-753`:
    * mask tile pixels whose centers fall outside (or, inverted, inside) the
    * polygon layer.
    *
    * Scale shape: the polygon layer is never collected to the driver. Tiles'
    * distinct (tile_id, tx, ty) grid joins the covering-cell table of the
    * polygon layer (the same prefilter as pipJoin) to build a per-tile
    * candidate list, which cogroups with the tile stack by tile_id: each
    * candidate WKB is shipped once per tile group, decoded once, and the
    * per-pixel PIP mask is computed ONCE per tile_id and reused across every
    * layer in the stack (the stack has n_layers tiles per tile_id). */
  def clipTiles(spark: SparkSession, tiles: org.apache.spark.sql.Dataset[TileRow],
                polys: DataFrame, target: graft.geo.GridSpec,
                tileSize: Int = Warp.TileSize, invert: Boolean = false,
                ndv: Float = ImageTable.Ndv): org.apache.spark.sql.Dataset[TileRow] = {
    import spark.implicits._
    val cs = tileSize * target.res
    val pc = polyCells(spark, polys, cs, saltFactor = 1)
      .select(col("cell_id"), col("poly_id"), col("geom_wkb"))
    val ulx = target.ulx; val uly = target.uly; val res = target.res
    val tcells = tiles.map(t => (t.tile_id, t.tx, t.ty)).distinct()
      .flatMap { case (tid, tx, ty) =>
        val x0 = ulx + tx.toDouble * tileSize * res
        val y1 = uly - ty.toDouble * tileSize * res
        val te = Extent(x0, y1 - tileSize * res, x0 + tileSize * res, y1)
        PlanarCell.cover(te, cs).map(c => (tid, c))
      }.toDF("tile_id", "cell_id")
    val cands = tcells.join(pc, Seq("cell_id"))
      // a polygon can share several covering cells with one tile — dedup
      .groupBy(col("tile_id"), col("poly_id")).agg(first(col("geom_wkb")).as("wkb"))
      .groupBy(col("tile_id")).agg(collect_list(col("wkb")).as("wkbs"))
      .as[(Long, Seq[Array[Byte]])]
      .groupByKey(_._1)
    tiles.groupByKey(_.tile_id).cogroup(cands) { (_, tIt, cIt) =>
      val geoms: Array[MultiPolygon] = cIt.nextOption()
        .map(_._2.map(w => Wkb.read(w)).toArray).getOrElse(Array.empty)
      if (geoms.isEmpty && !invert) Iterator.empty      // nothing inside → all masked
      else if (geoms.isEmpty) tIt                       // inverted: nothing masked
      else {
        var mask: Array[Boolean] = null // inside-flags, computed once per tile_id
        tIt.flatMap { t =>
          if (mask == null) {
            mask = new Array[Boolean](tileSize * tileSize)
            var i = 0
            while (i < mask.length) {
              val px = t.tx * tileSize + (i % tileSize)
              val py = t.ty * tileSize + (i / tileSize)
              val (mx, my) = target.pixelToMap(px.toDouble, py.toDouble)
              var j = 0; var ins = false
              while (j < geoms.length && !ins) { ins = geoms(j).contains(mx, my); j += 1 }
              mask(i) = ins
              i += 1
            }
          }
          val payload = t.payload.clone()
          var nValid = 0
          var i = 0
          while (i < payload.length) {
            if (payload(i) != ndv) {
              if (mask(i) == invert) payload(i) = ndv else nValid += 1
            }
            i += 1
          }
          if (nValid > 0) Some(t.copy(payload = payload, n_valid = nValid)) else None
        }
      }
    }
  }
}
