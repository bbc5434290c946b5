package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TestSpark
import graft.queries.{Rel, Rel2}

class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val d = "/root/testdata/sf0.001"

  test("custom as-of plan: AsOfJoinExec is the physical operator") {
    val df = Rel2.asofPlan(spark, d)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan.take(500)) // nodeName strips "Exec"
    assert(!plan.contains("Window")) // no window-rank fallback
  }

  test("custom as-of plan ≡ the window-form q11 (rows set-equal)") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val got = rows(Rel2.asofPlan(spark, d))
    val want = rows(Rel.asofNearest(spark, d))
    assert(got == want, s"sizes ${got.size} vs ${want.size}; " +
      s"missing=${(want -- got).take(3)} extra=${(got -- want).take(3)}")
    assert(got.nonEmpty)
  }

  test("tie-breaks: equal |Δt| on both sides picks the smaller right id") {
    import spark.implicits._
    AsOf.install(spark)
    val l = Seq((1L, 100L, 10L)).toDF("k", "lt", "l_id")
      .select(col("l_id"), col("k"), col("lt"))
    // two clicks at ±5, plus duplicates at the same times with larger ids
    val r = Seq((1L, 95L, 7L), (1L, 95L, 9L), (1L, 105L, 3L), (1L, 105L, 8L),
                (2L, 100L, 1L))
      .toDF("rk", "rt", "r_id").select(col("r_id"), col("rk"), col("rt"))
    val out = AsOf.join(l, r, "k", "lt", "rk", "rt", "r_id")
      .select(col("l_id"), col("r_id")).collect()
    assert(out.length == 1)
    assert(out(0).getLong(1) == 3L) // min id among the |Δt|=5 candidates
    // left keys with no right rows are dropped (inner as-of)
    val l2 = Seq((9L, 100L, 11L)).toDF("k", "lt", "l_id")
      .select(col("l_id"), col("k"), col("lt"))
    assert(AsOf.join(l2, r, "k", "lt", "rk", "rt", "r_id").count() == 0)
  }
}
