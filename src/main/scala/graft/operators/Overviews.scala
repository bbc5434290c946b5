package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.{Codec, ImageRow}

/** Overview pyramids — the distributed form of GDAL's `BuildOverviews`
  * ('average'): each image gains levels 1..maxLevel, level k a 2^k×
  * coarser raster whose pixels are the NDV-aware mean of the level-(k-1)
  * 2×2 block beneath them (iterated halving, like gdaladdo's successive
  * build; the reference reads reduced-resolution data through its
  * subsampled scan, `iolib.py:205` / `fn_getma_sub`, which q61/q69 cover —
  * overviews PRECOMPUTE that path so a coarse-target warp reads 4^-k of
  * the bytes instead of striding over all of them).
  *
  * Overviews are plain [[ImageRow]]s (same table schema, res ×2^k, id
  * suffixed `#ovr<k>`), so every downstream operator — warp, stack stats,
  * the snapshot catalog — takes them unchanged. At 100 TB the build runs
  * ONCE as a narrow map job and lands in the catalog (partition or
  * z-order by level for file-level pruning); a coarse warp then filters
  * to its level with [[pickLevel]]'s closed form — a pure narrow filter,
  * no shuffle, no window — and scans only the coarse bytes. */
object Overviews {

  val Sep = "#ovr"

  /** Levels 0..maxLevel for every image (level 0 = the input row,
    * unchanged). One narrow flatMap; output bytes ≈ 4/3 of input. */
  def build(spark: SparkSession, images: DataFrame, maxLevel: Int): DataFrame = {
    import spark.implicits._
    require(maxLevel >= 1, s"maxLevel $maxLevel")
    images.as[ImageRow].flatMap { img =>
      val ndv = img.ndv.toFloat
      var px = Codec.decode(img.bytes, img.w, img.h, img.fmt, ndv)
      var w = img.w; var h = img.h
      val out = scala.collection.mutable.ArrayBuffer[ImageRow](img)
      var k = 1
      while (k <= maxLevel) {
        val (p2, w2, h2) = downsample2x(px, w, h, ndv)
        px = p2; w = w2; h = h2
        out += img.copy(image_id = s"${img.image_id}$Sep$k",
          bytes = Codec.encode(px, w, h, "raw"), w = w, h = h, fmt = "raw",
          res = img.res * (1L << k))
        k += 1
      }
      out
    }.toDF()
  }

  /** NDV-aware 2×2 mean halving (GDAL 'average'): odd trailing rows/cols
    * pool the 1-2 pixels that exist; all-NDV blocks stay NDV. The mean is
    * a double sum / int count rounded ONCE to float — the same emission as
    * the stack aggregator, so an oracle can replay it exactly. */
  private[operators] def downsample2x(src: Array[Float], w: Int, h: Int,
                                      ndv: Float): (Array[Float], Int, Int) = {
    val w2 = (w + 1) / 2; val h2 = (h + 1) / 2
    val out = new Array[Float](w2 * h2)
    var oy = 0
    while (oy < h2) {
      var ox = 0
      while (ox < w2) {
        var sum = 0.0; var n = 0
        var dy = 0
        while (dy < 2) {
          val sy = 2 * oy + dy
          if (sy < h) {
            var dx = 0
            while (dx < 2) {
              val sx = 2 * ox + dx
              if (sx < w) {
                val v = src(sy * w + sx)
                if (v != ndv) { sum += v; n += 1 }
              }
              dx += 1
            }
          }
          dy += 1
        }
        out(oy * w2 + ox) = if (n == 0) ndv else (sum / n).toFloat
        ox += 1
      }
      oy += 1
    }
    (out, w2, h2)
  }

  /** GDAL's overview choice, closed form: the deepest level whose res does
    * not exceed the target res (never upsample an overview), clamped to
    * what was built. Pure function of (base res, target res) — level
    * selection needs no grouping. */
  def pickLevel(baseRes: Double, targetRes: Double, maxLevel: Int): Int = {
    if (targetRes <= baseRes) return 0
    val k = math.floor(math.log(targetRes / baseRes) / math.log(2.0) + 1e-9).toInt
    math.max(0, math.min(maxLevel, k))
  }

  /** From a `build` output, keep exactly one row per base image: its
    * [[pickLevel]] overview for `targetRes`. Narrow filter (the level and
    * base res are both recoverable from the row itself). */
  def pick(spark: SparkSession, withOverviews: DataFrame, targetRes: Double,
           maxLevel: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    val level = when(col("image_id").contains(Sep),
      regexp_extract(col("image_id"), s"$Sep(\\d+)$$", 1).cast("int"))
      .otherwise(lit(0))
    val baseRes = col("res") / pow(lit(2.0), level.cast("double"))
    val wanted = udfFreePickLevel(baseRes, targetRes, maxLevel)
    withOverviews.filter(level === wanted)
  }

  /** [[pickLevel]] as Column arithmetic (floor∘log2, clamped) so the
    * filter stays codegen'd. */
  private def udfFreePickLevel(baseRes: org.apache.spark.sql.Column,
                               targetRes: Double, maxLevel: Int) = {
    import org.apache.spark.sql.functions._
    val raw = floor(log(2.0, lit(targetRes) / baseRes) + lit(1e-9)).cast("int")
    least(lit(maxLevel), greatest(lit(0), raw))
  }
}
