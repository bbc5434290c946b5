package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{StackOps, Warp}
import graft.sources.ImageTable

/** Engine (non-SQL-expressible) pipeline queries: the warp→tile→stack flow
  * over the deterministic synthetic image+caption table (FIXTURES.md F1),
  * scaled by the testdata sf directory. No DuckDB oracle — correctness is
  * pinned by the golden ScalaTest suites (WarpSpec/StackSpec); the driver
  * records a rows>0 check, and Bench times them as the flagship workload. */
object Engine {
  /** Image count scaled to the sf dir (bench uses sf0.1). */
  def nImages(d: String): Int =
    if (d.contains("sf0.1")) 4000 else if (d.contains("sf0.01")) 800 else 120

  def images(s: SparkSession, d: String): DataFrame =
    ImageTable.generate(s, nImages(d), spread = true)

  /** Flagship: warp all images to the (min-res, union-extent) common grid —
    * the warptool.py trace (SURVEY.md §3.1) — emitting tile assignments. */
  def warpTiles(s: SparkSession, d: String): DataFrame = {
    val imgs = images(s, d)
    val target = Warp.analyze(imgs, "min", "union")
    Warp.warpToTiles(s, imgs, target, "bilinear").toDF()
      .select(col("image_id"), col("tile_id"), col("tx"), col("ty"),
              col("n_valid"), col("elided"))
  }

  /** make_stack.py trace (SURVEY.md §3.2): per-pixel stack stats via the
    * vector aggregator; per-tile scalar summary row. */
  def stackStatsTiles(s: SparkSession, d: String): DataFrame = {
    val imgs = images(s, d)
    val target = Warp.analyze(imgs, "min", "union")
    val tiles = Warp.warpToTiles(s, imgs, target, "near")
    StackOps.stackStats(tiles).toDF().select(
      col("tile_id"), col("n_layers"),
      expr("aggregate(count, 0, (a, x) -> a + x)").as("valid_px"),
      round(expr(s"aggregate(zip_with(mean, count, (m, c) -> if(c > 0, cast(m as double), 0d)), 0d, (a, x) -> a + x)") /
            greatest(expr("size(filter(count, c -> c > 0))"), lit(1)), 4).as("mean_of_means"))
  }

  /** Per-pixel OLS trend over the stack (ma_linreg analog), summarized. */
  def trendTiles(s: SparkSession, d: String): DataFrame = {
    val imgs = images(s, d)
    val target = Warp.analyze(imgs, "min", "union")
    val tiles = Warp.warpToTiles(s, imgs, target, "near")
    val ndv = ImageTable.Ndv
    StackOps.trend(tiles).toDF().select(
      col("tile_id"),
      expr(s"size(filter(slope_yr, v -> v != ${ndv}f))").as("n_trend_px"),
      round(expr(s"aggregate(filter(slope_yr, v -> v != ${ndv}f), 0d, (a, x) -> a + cast(x as double))") /
            greatest(expr(s"size(filter(slope_yr, v -> v != ${ndv}f))"), lit(1)), 4)
        .as("mean_slope_yr"))
  }
}
