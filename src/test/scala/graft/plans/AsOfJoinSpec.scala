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

  test("Long.MinValue is a legal key, not a sentinel (review r3)") {
    import spark.implicits._
    AsOf.install(spark)
    val l = Seq((Long.MinValue, 100L, 1L)).toDF("k", "lt", "l_id")
      .select(col("l_id"), col("k"), col("lt"))
    val r = Seq((Long.MinValue, 90L, 5L)).toDF("rk", "rt", "r_id")
      .select(col("r_id"), col("rk"), col("rt"))
    val out = AsOf.join(l, r, "k", "lt", "rk", "rt", "r_id")
      .select(col("l_id"), col("r_id")).collect()
    assert(out.length == 1 && out.head.getLong(1) == 5L)
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

  test("NULL key/time rows are dropped, not coerced to 0") {
    import spark.implicits._
    AsOf.install(spark)
    // key 0 exists on the right; a null-keyed left row must NOT match it
    val l = Seq((Some(0L), Some(100L), 1L), (None, Some(100L), 2L),
                (Some(0L), None, 3L))
      .toDF("k", "lt", "l_id").select(col("l_id"), col("k"), col("lt"))
    val r = Seq((Some(0L), Some(90L), 5L), (None, Some(100L), 6L))
      .toDF("rk", "rt", "r_id").select(col("r_id"), col("rk"), col("rt"))
    val out = AsOf.join(l, r, "k", "lt", "rk", "rt", "r_id")
      .select(col("l_id"), col("r_id")).collect()
    assert(out.map(x => (x.getLong(0), x.getLong(1))).toSet == Set((1L, 5L)))
  }

  test("hot key: 10^6 right rows on one key stream-merge in bounded state") {
    import spark.implicits._
    AsOf.install(spark)
    val nR = 1000000
    // one hot key; right times = 10·i (ascending after the shuffle sort)
    val r = spark.range(nR).select(col("id").as("r_id"), lit(7L).as("rk"),
      (col("id") * 10).as("rt"))
    val l = spark.range(500).select(col("id").as("l_id"), lit(7L).as("k"),
      (col("id") * 20000 + 4).as("lt"))   // lt = 4 (mod 10): nearest below at Δ=4
    val out = AsOf.join(l, r, "k", "lt", "rk", "rt", "r_id")
      .select(col("l_id"), col("r_id")).collect()
    assert(out.length == 500)
    // closed form: lt = 20000·j + 4 → nearest right time 20000·j → r_id 2000·j
    assert(out.forall(x => x.getLong(1) == x.getLong(0) * 2000))
  }
}
