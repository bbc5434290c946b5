package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Codec, ImageRow, ImageTable}

class OverviewsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val ndv = ImageTable.Ndv

  test("downsample2x golden: NDV-aware means, odd-dim partial blocks") {
    // 3×3: blocks (2×2), (1×2), (2×1), (1×1)
    val src = Array[Float](1, 2, 10, 3, ndv, 20, 100, 200, ndv)
    val (out, w2, h2) = Overviews.downsample2x(src, 3, 3, ndv)
    assert(w2 == 2 && h2 == 2)
    assert(out(0) == 2f)          // mean(1,2,3), NDV excluded
    assert(out(1) == 15f)         // mean(10,20)
    assert(out(2) == 150f)        // mean(100,200)
    assert(out(3) == ndv)         // single NDV pixel
    // all-NDV input stays NDV
    val (o2, _, _) = Overviews.downsample2x(Array.fill(4)(ndv), 2, 2, ndv)
    assert(o2.forall(_ == ndv))
  }

  test("pickLevel: deepest level not exceeding the target res, clamped") {
    assert(Overviews.pickLevel(2.0, 2.0, 3) == 0)
    assert(Overviews.pickLevel(2.0, 1.0, 3) == 0)   // never upsample
    assert(Overviews.pickLevel(2.0, 8.0, 3) == 2)   // exact power boundary
    assert(Overviews.pickLevel(3.0, 8.0, 3) == 1)   // 6 <= 8 < 12
    assert(Overviews.pickLevel(4.0, 8.0, 3) == 1)
    assert(Overviews.pickLevel(2.0, 100.0, 3) == 3) // clamp to built levels
  }

  test("build + pick: one row per base image at the closed-form level") {
    import spark.implicits._
    val images = ImageTable.generate(spark, 9)
    val ovr = Overviews.build(spark, images, maxLevel = 2)
    assert(ovr.count() == 9 * 3)
    val picked = Overviews.pick(spark, ovr, targetRes = 8.0, maxLevel = 2)
      .as[ImageRow].collect()
    assert(picked.length == 9)
    picked.foreach { r =>
      val (base, lvl) = r.image_id.split(Overviews.Sep) match {
        case Array(b, k) => (b, k.toInt)
        case Array(b) => (b, 0)
      }
      val baseRes = r.res / (1 << lvl)
      assert(lvl == Overviews.pickLevel(baseRes, 8.0, 2),
        s"$base: level $lvl at base res $baseRes")
    }
  }

  test("warp from an overview == warp of the equivalently-downsampled image") {
    import spark.implicits._
    val images = ImageTable.generate(spark, 6)
    val ovr = Overviews.build(spark, images, maxLevel = 2)
    val target = Warp.analyze(images, "8.0", "union")
    val picked = Overviews.pick(spark, ovr, 8.0, 2)
    val viaOvr = Warp.warpToTiles(spark, picked, target, "near").collect()
      .map(t => (t.image_id.split(Overviews.Sep).head, t.tile_id) -> t).toMap

    // reference path: downsample each image on the driver to ITS picked
    // level, then warp those as plain images
    val manual = images.as[ImageRow].collect().map { img =>
      val lvl = Overviews.pickLevel(img.res, 8.0, 2)
      var px = Codec.decode(img.bytes, img.w, img.h, img.fmt, ndv)
      var w = img.w; var h = img.h
      (1 to lvl).foreach { _ =>
        val (p, a, b) = Overviews.downsample2x(px, w, h, ndv); px = p; w = a; h = b
      }
      img.copy(bytes = Codec.encode(px, w, h, "raw"), w = w, h = h,
        fmt = "raw", res = img.res * (1 << lvl))
    }
    val viaManual = Warp.warpToTiles(spark,
      spark.createDataset(manual.toSeq).toDF(), target, "near").collect()
    assert(viaManual.nonEmpty && viaManual.length == viaOvr.size)
    viaManual.foreach { t =>
      val o = viaOvr((t.image_id, t.tile_id))
      assert(o.payload.toSeq == t.payload.toSeq && o.n_valid == t.n_valid,
        s"${t.image_id} tile ${t.tile_id}")
    }
  }
}
