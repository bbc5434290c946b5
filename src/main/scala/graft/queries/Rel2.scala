package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second relational batch: the remaining binned-statistic and filter
  * variants of SURVEY §2.5/§2.6. */
object Rel2 {
  import Rel.{li, ev}

  /** Abs-range filter — `absrange_fltr` `filtlib.py:26-33`: mask on |v|
    * while KEEPING original (signed) values. Derived signed column from
    * lineitem; keeps rows with |v| in [5, 20]. */
  def absrangeFltr(s: SparkSession, d: String): DataFrame =
    li(s, d).select(col("l_orderkey"), col("l_linenumber"),
        (col("l_quantity") - 25.0).as("v"))
      .filter(abs(col("v")).between(5.0, 20.0))

  val absrangeFltrSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity - 25.0 AS v FROM lineitem
      |WHERE abs(l_quantity - 25.0) BETWEEN 5.0 AND 20.0""".stripMargin

  /** Percentile filter — `perc_fltr` `filtlib.py:35-41`: keep values inside
    * the [p5, p95] band; per-flag survivor stats. */
  def percFltr(s: SparkSession, d: String): DataFrame = {
    val t = li(s, d)
    val p = t.agg(expr("percentile(l_extendedprice, 0.05)").as("lo"),
                  expr("percentile(l_extendedprice, 0.95)").as("hi"))
    t.crossJoin(p)
      .filter(col("l_extendedprice").between(col("lo"), col("hi")))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_kept"), round(avg(col("l_extendedprice")), 6).as("kept_mean"))
  }

  val percFltrSql: String =
    """WITH p AS (SELECT quantile_cont(l_extendedprice, 0.05) AS lo,
      |                  quantile_cont(l_extendedprice, 0.95) AS hi FROM lineitem)
      |SELECT l_returnflag, count(*)::BIGINT AS n_kept,
      |       round(avg(l_extendedprice),6) AS kept_mean
      |FROM lineitem, p WHERE l_extendedprice BETWEEN lo AND hi
      |GROUP BY l_returnflag""".stripMargin

  /** 2-D histogram — `get_2dhist` `malib.py:1767-1796`: bucketed counts over
    * two derived axes, zero bins absent (masked). */
  def hist2d(s: SparkSession, d: String): DataFrame =
    li(s, d).select(
        floor(col("l_quantity") / 5).cast("long").as("bx"),
        floor(col("l_extendedprice") / 10000).cast("long").as("by"))
      .groupBy(col("bx"), col("by")).agg(count(lit(1)).as("n"))

  val hist2dSql: String =
    """SELECT floor(l_quantity/5)::BIGINT AS bx,
      |       floor(l_extendedprice/10000)::BIGINT AS by,
      |       count(*)::BIGINT AS n
      |FROM lineitem GROUP BY 1, 2""".stripMargin

  /** Bin x by z — `bin_x_by_z` `malib.py:1802-1836`: digitize z into bins,
    * per-bin med/NMAD/mean/std/count of x. */
  def binByZ(s: SparkSession, d: String): DataFrame = {
    val pts = ev(s, d).select(
      floor(col("value") / 50).cast("long").as("zbin"),
      (col("user_id") % 100).cast("double").as("x"))
    val base = pts.groupBy(col("zbin")).agg(
      count(lit(1)).as("cnt"), round(avg(col("x")), 6).as("xmean"),
      round(stddev_pop(col("x")), 6).as("xstd"),
      expr("percentile(x, 0.5)").as("xmed0"))
    val nmad = pts.join(base.select(col("zbin"), col("xmed0")), Seq("zbin"))
      .groupBy(col("zbin"))
      .agg(round(expr("1.4826 * percentile(abs(x - xmed0), 0.5)"), 6).as("xnmad"))
    base.join(nmad, Seq("zbin"))
      .select(col("zbin"), col("cnt"), col("xmean"), col("xstd"),
              round(col("xmed0"), 6).as("xmed"), col("xnmad"))
  }

  val binByZSql: String =
    """WITH pts AS (SELECT floor(value/50)::BIGINT AS zbin,
      |                    (user_id % 100)::DOUBLE AS x FROM events),
      |base AS (SELECT zbin, count(*)::BIGINT AS cnt, avg(x) AS xmean,
      |                stddev_pop(x) AS xstd, quantile_cont(x, 0.5) AS xmed0
      |         FROM pts GROUP BY zbin),
      |nm AS (SELECT p.zbin, 1.4826 * quantile_cont(abs(p.x - b.xmed0), 0.5) AS xnmad
      |       FROM pts p JOIN base b USING (zbin) GROUP BY p.zbin)
      |SELECT b.zbin, b.cnt, round(b.xmean,6) AS xmean, round(b.xstd,6) AS xstd,
      |       round(b.xmed0,6) AS xmed, round(nm.xnmad,6) AS xnmad
      |FROM base b JOIN nm USING (zbin)""".stripMargin
}
