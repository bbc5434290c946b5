package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.SpatialJoin
import graft.sources.PolygonTable

/** Skew-stress benchmark for the salted spatial join (SURVEY §4: "must show
  * ≥0.8 with skewed synthetic layers"; VERDICT r3 #5).
  *
  * Fixture: 30% of all points land inside ONE 64 m covering cell (≈1,500×
  * the uniform per-cell load — far past the ≥10× criterion), the rest
  * scatter uniformly. The join runs in its SHUFFLE form
  * (broadcastPolys = false): this is the 100 TB regime where the polygon
  * side is too big to broadcast and every hot-cell point hashes to the same
  * reducer — exactly what point-side salting (pmod(hash(pt_id), salt) vs
  * ×salt polygon replication) is for. Each (salt, aqe) cell is measured
  * interleaved best-of-N (the box's noise demands it, BENCH.md §3).
  *
  * Run at SPARK_GRAFT_CPUS=8 and =32 (tools/run_skew.sh) and compare: the
  * salted join's 8→32 efficiency and its wall-clock vs the unsalted one
  * under identical skew; AQE on/off separates Spark's runtime skew-split
  * from the plan-level salting. */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val n = sys.env.getOrElse("SPARK_GRAFT_N_POINTS", "3000000").toInt
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt

    def session(aqe: Boolean): SparkSession = {
      val s = SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      s.sparkContext.setLogLevel("ERROR")
      s
    }

    // one warm session per AQE setting (AQE flags are honored per-query, so
    // a single session would do, but flipping sql conf between runs is the
    // simpler-to-trust isolation)
    val spark = session(aqe = true)

    // 30% of ids → one 64 m cell at (502000, 5299000); the rest uniform over
    // the ~5,100-cell PolygonTable domain. Deterministic closed forms.
    val pts = spark.range(n).select(
      format_string("pt_%09d", col("id")).as("pt_id"),
      when(col("id") % 10 < 3,
          lit(501952.0) + (col("id") % 63).cast("double") + 0.5)
        .otherwise(lit(499900.0) + (col("id") * 131 % 8592).cast("double")).as("x"),
      when(col("id") % 10 < 3,
          lit(5298944.0) + (col("id") % 7).cast("double") * 9 + 0.5)
        .otherwise(lit(5300100.0) - (col("id") * 71 % 2400).cast("double")).as("y"))
      .cache()
    pts.count()
    val polys = PolygonTable.generate(spark, 400).cache(); polys.count()

    def run(salt: Int, aqe: Boolean): Double = {
      spark.conf.set("spark.sql.adaptive.enabled", aqe.toString)
      spark.conf.set("spark.sql.adaptive.skewJoin.enabled", aqe.toString)
      val t0 = System.nanoTime()
      SpatialJoin.pipJoin(spark, pts, polys, saltFactor = salt,
        broadcastPolys = false).count()
      (System.nanoTime() - t0) / 1e9
    }

    val cells = Seq((1, false), (4, false), (1, true), (4, true))
    run(4, aqe = true) // warmup (codegen + page cache)
    val best = collection.mutable.Map.empty[(Int, Boolean), Double]
    for (_ <- 0 until reps; c <- cells) { // interleaved best-of-N
      val s = run(c._1, c._2)
      best(c) = math.min(best.getOrElse(c, Double.MaxValue), s)
    }
    val hot = pts.filter(col("id") % 10 < 3).count()
    val fields = cells.map { case c @ (salt, aqe) =>
      s""""salt${salt}_aqe${if (aqe) "on" else "off"}":${f"${best(c)}%.3f"}"""
    }.mkString(",")
    println(s"""{"metric":"skew_pip","unit":"sec","cpus":$cpus,"n_points":$n,"hot_cell_points":$hot,$fields}""")
    spark.stop()
  }
}
