package graft
import org.apache.spark.sql.SparkSession
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for ((name, df) <- Seq(
        ("q24", queries.Text.minhashPairs(spark, d)),
        ("q28", queries.Vec.embNearDup(spark, d)),
        ("q56", queries.Engine.phashDedup(spark, d)),
        ("q59", queries.Engine.annLsh(spark, d)))) {
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      val joins = plan.linesIterator.filter(l => l.contains("Join") || l.contains("Cartesian"))
        .map(_.trim.take(100)).toSeq.distinct
      println(s"== $name ==")
      joins.foreach(j => println("  " + j))
      println(s"  BNLJ=${plan.contains("BroadcastNestedLoopJoin")} CART=${plan.contains("CartesianProduct")}")
    }
    spark.stop()
  }
}
