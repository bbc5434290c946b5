package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.EngineOracle
import graft.sources.{Codec, ImageTable}

/** Multi-band tiles (`warplib.py:146-153` band loop, `iolib.py:126-142`
  * band arg): bands warp through the same kernels and aggregate under
  * band-composite keys, so a cross-band mix-up shifts exact integer sums.
  */
class BandStackSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val ndv = ImageTable.Ndv

  test("bandSlice extracts exact BSQ bands; non-raw and bad band are loud") {
    val (w, h, nb) = (3, 2, 3)
    val px = Array.tabulate(nb * w * h)(i => (100 * (i / (w * h)) + i % (w * h)).toFloat)
    val bytes = Codec.encode(px, w, h * nb, "raw") // raw = plain LE float32
    for (b <- 0 until nb) {
      val got = Codec.decode(Codec.bandSlice(bytes, w, h, "raw", b, nb), w, h, "raw", ndv)
      assert(got.toSeq == px.slice(b * w * h, (b + 1) * w * h).toSeq, s"band $b")
    }
    // nBands=1 is pass-through regardless of fmt
    assert(Codec.bandSlice(bytes, w, h * nb, "png", 0, 1) eq bytes)
    intercept[IllegalArgumentException](Codec.bandSlice(bytes, w, h, "png", 1, 3))
    intercept[IllegalArgumentException](Codec.bandSlice(bytes, w, h, "raw", 3, 3))
    intercept[IllegalArgumentException](Codec.bandSlice(bytes, w, h + 1, "raw", 0, 3))
  }

  test("warpToTilesBands == per-band single-band warp; bands never mix") {
    import spark.implicits._
    val imgs = EngineOracle.mbImages(spark)
    val target = Warp.analyze(imgs, "min", "union")
    val nb = EngineOracle.MbBands

    val multi = Warp.warpToTilesBands(spark, imgs, target, nb, "near").collect()
      .map(t => (t.image_id, t.band, t.tile_id) -> t).toMap

    // reference path: slice each band on the driver, run the SINGLE-band warp
    val imgRows = imgs.as[graft.sources.ImageRow].collect()
    for (b <- 0 until nb) {
      val bandImgs = spark.createDataset(imgRows.map(r =>
        r.copy(bytes = Codec.bandSlice(r.bytes, r.w, r.h, r.fmt, b, nb))).toSeq).toDF()
      val single = Warp.warpToTiles(spark, bandImgs, target, "near").collect()
      assert(single.nonEmpty)
      single.foreach { s =>
        val m = multi((s.image_id, b, s.tile_id))
        assert(m.payload.toSeq == s.payload.toSeq && m.n_valid == s.n_valid &&
          m.tx == s.tx && m.ty == s.ty && m.ts_us == s.ts_us, s"band $b tile ${s.tile_id}")
      }
      assert(multi.count(_._1._2 == b) == single.length, s"band $b tile count")
    }
    assert(multi.size == multi.count(t => t._1._2 >= 0 && t._1._2 < nb))
  }

  test("stackStatsBands == stackStats run per band (no cross-contamination)") {
    import spark.implicits._
    val imgs = EngineOracle.mbImages(spark)
    val target = Warp.analyze(imgs, "min", "union")
    val nb = EngineOracle.MbBands
    val tiles = Warp.warpToTilesBands(spark, imgs, target, nb, "near").cache()

    val fused = StackOps.stackStatsBands(tiles, nb).collect()
      .map(s => (s.band, s.tile_id) -> s).toMap
    for (b <- 0 until nb) {
      val one = StackOps.stackStats(tiles.filter(_.band == b).map(t =>
        TileRow(t.image_id, t.ts_us, t.tile_id, t.tx, t.ty,
          t.payload, t.n_valid, t.elided))).collect()
      assert(one.nonEmpty)
      one.foreach { s =>
        val f = fused((b, s.tile_id))
        assert(f.n_layers == s.n_layers && f.count.toSeq == s.count.toSeq &&
          f.mean.toSeq == s.mean.toSeq && f.std.toSeq == s.std.toSeq &&
          f.vmin.toSeq == s.vmin.toSeq && f.vmax.toSeq == s.vmax.toSeq,
          s"band $b tile ${s.tile_id}")
      }
      assert(fused.count(_._1._1 == b) == one.length)
    }
    tiles.unpersist()
  }
}
