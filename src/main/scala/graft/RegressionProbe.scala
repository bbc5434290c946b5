package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{StackOps, Stencil, Warp}
import graft.sources.ImageTable

/** Temporary probe for the r2 driver regressions (VERDICT r2 "What's wrong"
  * #1/#2): interleaved best-of-N of the full-scale trend fold (diagnostics
  * on/off) and q20 exact dedup, on an otherwise idle box. */
object RegressionProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.min(16, cpus.toInt).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val images = ImageTable.generate(spark, graft.queries.Engine.nImages(sfDir),
      spread = true).cache()
    images.count()
    val target = Warp.analyze(images, "min", "union")
    val bigImages = ImageTable.generate(spark, 200, spread = true, dimScale = 8).cache()
    bigImages.count()
    val bigTarget = Warp.analyze(bigImages, "min", "union")
    val bigNtx = (bigTarget.w + 63) / 64; val bigNty = (bigTarget.h + 63) / 64

    def time(f: => Long): Double = {
      val t0 = System.nanoTime(); val n = f; val s = (System.nanoTime() - t0) / 1e9
      require(n > 0); s
    }
    val acc = scala.collection.mutable.Map.empty[String, List[Double]].withDefaultValue(Nil)
    for (r <- 1 to rounds) {
      val tasks = Seq(
        "trend_diag" -> (() => time {
          StackOps.trend(Warp.warpToTiles(spark, images, target, "near")).count()
        }),
        "trend_nodiag" -> (() => time {
          StackOps.trend(Warp.warpToTiles(spark, images, target, "near"),
            diagnostics = false).count()
        }),
        "q20_dedup" -> (() => time {
          graft.queries.Text.dedupExact(spark, sfDir).count()
        }),
        // large-σ smoothing on big rasters (dimScale-8 fixture, ~400×350 px
        // per image): one direct 47×47 kernel vs the decimating pyramid
        // (gauss_fltr_pyramid filtlib.py:175-226, size 48)
        "gauss_direct48" -> (() => time {
          val t = Warp.warpToTiles(spark, bigImages, bigTarget, "near")
          Stencil(t, bigNtx, bigNty, halo = 23)(Stencil.gaussKernel(47 / 6.0)).count()
        }),
        "gauss_pyramid48" -> (() => time {
          val t = Warp.warpToTiles(spark, bigImages, bigTarget, "near")
          Stencil.gaussPyramid(t, bigNtx, bigNty, size = 48)._1.count()
        }))
      tasks.foreach { case (name, f) =>
        val s = f(); acc(name) = s :: acc(name)
        println(f"[probe] round $r $name%-14s ${s}%.2f s")
      }
    }
    acc.toSeq.sortBy(_._1).foreach { case (k, v) =>
      println(f"[probe] BEST $k%-14s ${v.min}%.2f s  (all: ${v.reverse.map(x => f"$x%.2f").mkString(", ")})")
    }
    spark.stop()
  }
}
