package graft

import org.apache.spark.sql.SparkSession
import graft.operators.{Knn, SpatialJoin, StackOps, Warp}
import graft.sources.{ImageTable, PolygonTable}

/** Scaling benchmark — the N→4N efficiency evidence (north rule; sandbox
  * stand-in: local[8] vs local[32] on identical input). Runs ONE heavy
  * fixture (images at 2× pixel dims so per-task compute dominates task
  * scheduling) through the flagship pipeline and prints one JSON line with
  * per-stage seconds. tools/run_scaling.sh runs it at both core counts,
  * min-of-3, and computes efficiency = (T_8 / T_32) / 4. */
object ScaleBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val nImages = sys.env.getOrElse("SPARK_GRAFT_N_IMAGES", "16000").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      // reduce-side concurrency capped at 16: the vector-buffer folds are
      // memory-bandwidth-bound and local-mode threads share one memory
      // controller (measured: 32 concurrent reducers burn 4x the CPU of 8
      // for the same rows). On a real multi-executor cluster each node has
      // its own bandwidth and this cap is unnecessary.
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          math.min(16, cpus.toInt).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val stages = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    def gcMs: Long = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .stream.mapToLong(_.getCollectionTime).sum
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val cpu0 = osBean.getProcessCpuTime; val g0 = gcMs
      val r = f
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - cpu0) / 1e9
      stages(name) = wall
      if (sys.env.contains("SPARK_GRAFT_DEBUG"))
        System.err.println(f"DBG $name wall=$wall%.1f cpu=$cpu%.1f (x${cpu/wall}%.1f) gc=${(gcMs-g0)/1000.0}%.1f s")
      r
    }

    val images = ImageTable.generate(spark, nImages, spread = true, dimScale = 2).cache()
    images.count()   // materialize input outside the timed window
    val polys = PolygonTable.generate(spark, 400).cache(); polys.count()
    val points = PolygonTable.points(spark, 800000).cache(); points.count()

    val tAll0 = System.nanoTime()
    val target = t("analyze")(Warp.analyze(images, "min", "union"))
    // NOT persisted: the warp kernel is ~10k imgs/s/8-threads, far cheaper
    // than serializing ~2 GB of tile payloads into the block manager; each
    // consumer re-runs the narrow map stage instead
    val tiles = Warp.warpToTiles(spark, images, target, "bilinear")
    t("warp")(tiles.count())
    t("stats")(StackOps.stackStats(tiles).count())
    t("trend")(StackOps.trend(tiles).count())
    t("pip")(SpatialJoin.pipJoin(spark, points, polys).count())
    t("heat")(SpatialJoin.heatmap(spark, polys).count())
    t("knn")(Knn.knn(spark,
      points.filter(org.apache.spark.sql.functions.col("pt_id") < "pt_0020000"),
      points, k = 5).count())
    tiles.unpersist()
    val totalSec = (System.nanoTime() - tAll0) / 1e9
    val ips = nImages / totalSec

    // compute-bound kernel probe at the same thread count (no Spark): the
    // pure warp kernel rate, for separating scheduler/memory-bandwidth
    // ceilings of local mode from the operator's own scalability
    val probeRows = (0 until 2000).map(i => ImageTable.row(i, spread = true, dimScale = 2)).toArray
    val ntx2 = (target.w + 63) / 64
    def kernelRate(threads: Int): Double = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val t0 = System.nanoTime()
      val ths = (0 until threads).map { _ =>
        val th = new Thread(() => {
          var i = counter.getAndIncrement()
          while (i < 8000) {
            val r = probeRows(i % probeRows.length)
            Warp.warpOne(r, target, "bilinear", 64, ntx2).size
            i = counter.getAndIncrement()
          }
        })
        th.start(); th
      }
      ths.foreach(_.join())
      8000 / ((System.nanoTime() - t0) / 1e9)
    }
    kernelRate(2) // warmup
    val kRate = kernelRate(cpus.toInt)

    val qs = stages.map { case (k, v) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    println(f"""{"metric":"pipeline","value":$totalSec%.3f,"unit":"sec","queries":$qs,"sf":"scale-fixture-$nImages","cpus":$cpus,"images_per_sec":$ips%.1f,"kernel_images_per_sec":$kRate%.1f}""")
    spark.stop()
  }
}
