package graft
import org.apache.spark.sql.SparkSession
/** Plan-shape diagnostics: join shapes of the pair-join queries (expect no
  * BroadcastNestedLoopJoin/CartesianProduct) and scan pruning (ReadSchema /
  * PushedFilters) of representative relational queries. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    println("== pair-join shapes ==")
    for ((name, df) <- Seq(
        ("q24", queries.Text.minhashPairs(spark, d)),
        ("q28", queries.Vec.embNearDup(spark, d)),
        ("q56", queries.Engine.phashDedup(spark, d)),
        ("q59", queries.Engine.annLsh(spark, d)),
        ("q64", queries.Engine.annIvf(spark, d)),
        ("q93", queries.EngineOracle.annLshExact(spark, d)),
        ("q94", queries.EngineOracle.annIvfExact(spark, d)))) {
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      // the ANN paths must carry NO ScalaUDF: bucket keys / probes are
      // codegen Expressions (LshBucketKeys / IvfProbe)
      println(s"  $name BNLJ=${plan.contains("BroadcastNestedLoopJoin")} " +
        s"CART=${plan.contains("CartesianProduct")} UDF=${plan.contains("UDF")}")
    }
    println("== scan pruning (ReadSchema / PushedFilters) ==")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
         if name < "q40") {
      val df = fn(spark, d)
      val scans = df.queryExecution.executedPlan.toString.linesIterator
        .filter(_.contains("ReadSchema")).toSeq.distinct
      scans.foreach { l =>
        val rs = "ReadSchema: struct<([^>]*)>".r.findFirstMatchIn(l).map(_.group(1)).getOrElse("?")
        val pf = "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(l).map(_.group(1)).getOrElse("")
        println(f"  $name%-22s cols=${rs.split(",").length}%2d  pushed=${pf.take(60)}")
      }
    }
    spark.stop()
  }
}
