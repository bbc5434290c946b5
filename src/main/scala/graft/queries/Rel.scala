package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession, Column}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Relational re-expressions of the reference's operators over the driver's
  * TPC-H-ish testdata, each with an exact DuckDB oracle twin (SparkEntry
  * .oracleSql). Numeric-parity rules:
  *   - time math on integer microseconds (`unix_micros` ≡ DuckDB `epoch_us`)
  *   - exact interpolated percentiles on both sides
  *   - double aggregates rounded (means/stds 6 dp; wide raw sums 2 dp)
  *   - deterministic tie-breaks on every top-k / window rank
  */
object Rel {
  def li(s: SparkSession, d: String): DataFrame  = s.read.parquet(s"$d/lineitem.parquet")
  def ord(s: SparkSession, d: String): DataFrame = s.read.parquet(s"$d/orders.parquet")
  def ev(s: SparkSession, d: String): DataFrame  = s.read.parquet(s"$d/events.parquet")

  private[queries] def r6(c: Column): Column = round(c, 6)

  /** Integer epoch microseconds from a parquet TIMESTAMP_NTZ column. The
    * session timezone is pinned UTC, so the NTZ→TZ cast is the identity
    * wall-clock mapping DuckDB's `epoch_us` uses on naive timestamps. */
  def tUs(c: Column): Column = unix_micros(c.cast("timestamp"))

  /** Global array stats — `get_stats`/`get_stats_dict` `malib.py:1605-1660`:
    * count/min/max/mean/std(population, np.ma.std)/med/nmad/q25/q75/iqr/
    * p16/p84/spread. NMAD = 1.4826·med(|x−med|) (`malib.py:1510-1526`). */
  def globalStats(s: SparkSession, d: String): DataFrame = {
    val t = li(s, d)
    val med = t.agg(expr("percentile(l_quantity, 0.5)").as("med"))
    t.crossJoin(med).agg(
      count(lit(1)).as("cnt"),
      r6(min(col("l_quantity"))).as("vmin"),
      r6(max(col("l_quantity"))).as("vmax"),
      r6(avg(col("l_quantity"))).as("vmean"),
      r6(stddev_pop(col("l_quantity"))).as("vstd"),
      r6(first(col("med"))).as("vmed"),
      r6(expr("1.4826 * percentile(abs(l_quantity - med), 0.5)")).as("vnmad"),
      r6(expr("percentile(l_quantity, 0.25)")).as("q25"),
      r6(expr("percentile(l_quantity, 0.75)")).as("q75"),
      r6(expr("percentile(l_quantity, 0.75) - percentile(l_quantity, 0.25)")).as("iqr"),
      r6(expr("percentile(l_quantity, 0.16)")).as("p16"),
      r6(expr("percentile(l_quantity, 0.84)")).as("p84"),
      r6(expr("percentile(l_quantity, 0.84) - percentile(l_quantity, 0.16)")).as("spread"))
  }

  val globalStatsSql: String =
    """WITH m AS (SELECT quantile_cont(l_quantity, 0.5) AS med FROM lineitem)
      |SELECT count(*)::BIGINT AS cnt,
      |  round(min(l_quantity),6) AS vmin, round(max(l_quantity),6) AS vmax,
      |  round(avg(l_quantity),6) AS vmean, round(stddev_pop(l_quantity),6) AS vstd,
      |  round(any_value(m.med),6) AS vmed,
      |  round(1.4826 * quantile_cont(abs(l_quantity - m.med), 0.5),6) AS vnmad,
      |  round(quantile_cont(l_quantity,0.25),6) AS q25,
      |  round(quantile_cont(l_quantity,0.75),6) AS q75,
      |  round(quantile_cont(l_quantity,0.75)-quantile_cont(l_quantity,0.25),6) AS iqr,
      |  round(quantile_cont(l_quantity,0.16),6) AS p16,
      |  round(quantile_cont(l_quantity,0.84),6) AS p84,
      |  round(quantile_cont(l_quantity,0.84)-quantile_cont(l_quantity,0.16),6) AS spread
      |FROM lineitem, m""".stripMargin

  /** Per-key stack statistics — `compute_stats` `malib.py:559-587`: count,
    * mean, std (population; NULL-masked where count≤1, `malib.py:569`),
    * min, max, median, NMAD. Key = user_id (the cell-id stand-in). */
  def stackStats(s: SparkSession, d: String): DataFrame = {
    val t = ev(s, d)
    val base = t.groupBy(col("user_id")).agg(
      count(lit(1)).as("cnt"),
      r6(avg(col("value"))).as("vmean"),
      r6(when(count(lit(1)) > 1, stddev_pop(col("value")))).as("vstd"),
      r6(min(col("value"))).as("vmin"),
      r6(max(col("value"))).as("vmax"),
      expr("percentile(value, 0.5)").as("med0"))
    val nmad = t.join(base.select(col("user_id"), col("med0")), Seq("user_id"))
      .groupBy(col("user_id"))
      .agg(r6(expr("1.4826 * percentile(abs(value - med0), 0.5)")).as("vnmad"))
    base.join(nmad, Seq("user_id"))
      .select(col("user_id"), col("cnt"), col("vmean"), col("vstd"),
              col("vmin"), col("vmax"), r6(col("med0")).as("vmed"), col("vnmad"))
  }

  val stackStatsSql: String =
    """WITH base AS (
      |  SELECT user_id, count(*)::BIGINT AS cnt, avg(value) AS vmean,
      |    CASE WHEN count(*) > 1 THEN stddev_pop(value) END AS vstd,
      |    min(value) AS vmin, max(value) AS vmax,
      |    quantile_cont(value, 0.5) AS med0
      |  FROM events GROUP BY user_id),
      |nm AS (
      |  SELECT e.user_id, 1.4826 * quantile_cont(abs(e.value - b.med0), 0.5) AS vnmad
      |  FROM events e JOIN base b USING (user_id) GROUP BY e.user_id)
      |SELECT b.user_id, b.cnt, round(b.vmean,6) AS vmean, round(b.vstd,6) AS vstd,
      |  round(b.vmin,6) AS vmin, round(b.vmax,6) AS vmax,
      |  round(b.med0,6) AS vmed, round(nm.vnmad,6) AS vnmad
      |FROM base b JOIN nm USING (user_id)""".stripMargin

  /** Per-key date-coverage stats — `compute_dt_stats` `malib.py:310-324`:
    * first/last valid timestamp, ptp (NULL where 0), center = min + ptp/2.
    * Integer microsecond math end-to-end. */
  def dtStats(s: SparkSession, d: String): DataFrame =
    ev(s, d).groupBy(col("user_id")).agg(
      min(tUs(col("ts"))).as("t_first_us"),
      max(tUs(col("ts"))).as("t_last_us"))
    .select(col("user_id"), col("t_first_us"), col("t_last_us"),
      when(col("t_last_us") > col("t_first_us"),
           col("t_last_us") - col("t_first_us")).as("ptp_us"),
      (col("t_first_us") + floor((col("t_last_us") - col("t_first_us")) / 2)
        .cast("long")).as("center_us"))

  val dtStatsSql: String =
    """SELECT user_id, min(epoch_us(ts)) AS t_first_us, max(epoch_us(ts)) AS t_last_us,
      |  CASE WHEN max(epoch_us(ts)) > min(epoch_us(ts))
      |       THEN max(epoch_us(ts)) - min(epoch_us(ts)) END AS ptp_us,
      |  (min(epoch_us(ts)) + floor((max(epoch_us(ts)) - min(epoch_us(ts))) / 2))::BIGINT AS center_us
      |FROM events GROUP BY user_id""".stripMargin

  /** Per-key OLS + diagnostics — `ma_linreg` `malib.py:999-1171` incl. the
    * rsq block (`malib.py:1139-1144`) and the conf_test T-statistic
    * (`malib.py:1146-1156`): r2 = SSreg/SStot, T0 = slope/SE with
    * SE = √(SSres/(n−2)/Sxx). r2/T0 computed from sums of t−20000 (a global
    * day-offset shift; both are shift-invariant) so the cross-engine r6
    * rounding isn't eaten by cancellation at epoch-day magnitudes. */
  def trendOls(s: SparkSession, d: String): DataFrame = {
    val base = ev(s, d)
      .select(col("user_id"),
        (tUs(col("ts")).cast("double") / 86400e6).as("t"),
        col("value").as("y"))
      .withColumn("tc", col("t") - 20000.0)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
           sum(col("t") * col("t")).as("stt"), sum(col("y")).as("sy"),
           sum(col("t") * col("y")).as("sty"),
           sum(col("tc")).as("stc"), sum(col("tc") * col("tc")).as("stcc"),
           sum(col("tc") * col("y")).as("stcy"), sum(col("y") * col("y")).as("syy"),
           (max(col("t")) - min(col("t"))).as("ptp"))
    val sxx = col("stcc") - col("stc") * col("stc") / col("n")
    val sxy = col("stcy") - col("stc") * col("sy") / col("n")
    val syyC = col("syy") - col("sy") * col("sy") / col("n")
    val b = sxy / sxx
    val ssres = syyC - b * sxy
    val fitOk = col("n") >= 2 && col("ptp") > 0
    base.select(col("user_id"), col("n"),
        r6(when(fitOk,
          (col("n") * col("sty") - col("st") * col("sy")) /
          (col("n") * col("stt") - col("st") * col("st")) * lit(365.25)))
          .as("slope_yr"),
        r6(when(fitOk,
          (col("sy") - (col("n") * col("sty") - col("st") * col("sy")) /
            (col("n") * col("stt") - col("st") * col("st")) * col("st")) / col("n")))
          .as("intercept"),
        r6(when(fitOk && syyC > 0, b * sxy / syyC)).as("r2"),
        r6(when(fitOk && col("n") > 2 && ssres > 0,
          b / sqrt(ssres / (col("n") - 2) / sxx))).as("t_stat"))
  }

  val trendOlsSql: String =
    """WITH s AS (
      |  SELECT user_id, count(*)::BIGINT AS n, sum(t) AS st, sum(t*t) AS stt,
      |         sum(y) AS sy, sum(t*y) AS sty,
      |         sum(tc) AS stc, sum(tc*tc) AS stcc, sum(tc*y) AS stcy,
      |         sum(y*y) AS syy, max(t)-min(t) AS ptp
      |  FROM (SELECT user_id, epoch_us(ts)/86400e6 AS t,
      |               epoch_us(ts)/86400e6 - 20000.0 AS tc, value AS y FROM events)
      |  GROUP BY user_id),
      |d AS (SELECT *, stcc - stc*stc/n AS sxx, stcy - stc*sy/n AS sxy,
      |             syy - sy*sy/n AS syyc FROM s)
      |SELECT user_id, n,
      |  round(CASE WHEN n >= 2 AND ptp > 0
      |    THEN (n*sty - st*sy)/(n*stt - st*st) * 365.25 END, 6) AS slope_yr,
      |  round(CASE WHEN n >= 2 AND ptp > 0
      |    THEN (sy - (n*sty - st*sy)/(n*stt - st*st) * st)/n END, 6) AS intercept,
      |  round(CASE WHEN n >= 2 AND ptp > 0 AND syyc > 0
      |    THEN (sxy/sxx) * sxy / syyc END, 6) AS r2,
      |  round(CASE WHEN n > 2 AND ptp > 0 AND syyc - (sxy/sxx)*sxy > 0
      |    THEN (sxy/sxx) / sqrt((syyc - (sxy/sxx)*sxy) / (n - 2) / sxx) END, 6) AS t_stat
      |FROM d""".stripMargin

  /** Range filter — `range_fltr` `filtlib.py:18-24`: keep values in [5, 45]. */
  def rangeFltr(s: SparkSession, d: String): DataFrame =
    li(s, d).filter(col("l_quantity").between(5.0, 45.0))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))

  val rangeFltrSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
      |WHERE l_quantity BETWEEN 5.0 AND 45.0""".stripMargin

  /** n·σ filter — `sigma_fltr` `filtlib.py:43-58`: mask outside mean ± 2σ. */
  def sigmaFltr(s: SparkSession, d: String): DataFrame = {
    val t = li(s, d)
    val m = t.agg(avg(col("l_extendedprice")).as("mu"),
                  stddev_pop(col("l_extendedprice")).as("sd"))
    t.crossJoin(m)
      .filter(col("l_extendedprice").between(col("mu") - col("sd") * 2,
                                             col("mu") + col("sd") * 2))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_kept"), r6(avg(col("l_extendedprice"))).as("kept_mean"))
  }

  val sigmaFltrSql: String =
    """WITH m AS (SELECT avg(l_extendedprice) AS mu, stddev_pop(l_extendedprice) AS sd
      |           FROM lineitem)
      |SELECT l_returnflag, count(*)::BIGINT AS n_kept,
      |       round(avg(l_extendedprice),6) AS kept_mean
      |FROM lineitem, m
      |WHERE l_extendedprice BETWEEN mu - 2*sd AND mu + 2*sd
      |GROUP BY l_returnflag""".stripMargin

  /** n·MAD filter — `mad_fltr` `filtlib.py:60-69`: mask outside med ± 2·NMAD. */
  def madFltr(s: SparkSession, d: String): DataFrame = {
    val t = li(s, d)
    // Pct.exactPercentiles = the builtin percentile() parallelized (same
    // selection, same interpolation arithmetic — bit-identical under the
    // strict oracle); the two sequential passes stay, each now a parallel
    // selection instead of a single-reducer map merge
    val med = Pct.exactPercentiles(t, col("l_extendedprice"), Seq(0.5)).head
    val nmad = 1.4826 * Pct.exactPercentiles(t,
      abs(col("l_extendedprice") - lit(med)), Seq(0.5)).head
    t.filter(col("l_extendedprice").between(lit(med) - lit(nmad) * 2,
                                            lit(med) + lit(nmad) * 2))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_kept"), r6(avg(col("l_extendedprice"))).as("kept_mean"))
  }

  val madFltrSql: String =
    """WITH m AS (SELECT quantile_cont(l_extendedprice,0.5) AS med FROM lineitem),
      |n AS (SELECT any_value(m.med) AS med,
      |             1.4826*quantile_cont(abs(l_extendedprice - m.med),0.5) AS nmad
      |      FROM lineitem, m)
      |SELECT l_linestatus, count(*)::BIGINT AS n_kept,
      |       round(avg(l_extendedprice),6) AS kept_mean
      |FROM lineitem, n
      |WHERE l_extendedprice BETWEEN med - 2*nmad AND med + 2*nmad
      |GROUP BY l_linestatus""".stripMargin

  /** 2-D binned statistic (points → grid) — `block_stats` `geolib.py:350-398`
    * with `scipy.binned_statistic_2d` semantics: per-bin count/mean/med/min/
    * max. Synthetic points derived deterministically from lineitem keys. */
  def blockStats(s: SparkSession, d: String): DataFrame =
    li(s, d).select(
        ((col("l_partkey") % 1000) / lit(10.0)).as("x"),
        ((col("l_suppkey") % 100) * lit(1.0)).as("y"),
        col("l_quantity").as("z"))
      .groupBy(floor(col("x") / 10).cast("long").as("bin_x"),
               floor(col("y") / 10).cast("long").as("bin_y"))
      .agg(count(lit(1)).as("cnt"), r6(avg(col("z"))).as("zmean"),
           r6(expr("percentile(z, 0.5)")).as("zmed"),
           r6(min(col("z"))).as("zmin"), r6(max(col("z"))).as("zmax"))

  val blockStatsSql: String =
    """SELECT floor(x/10)::BIGINT AS bin_x, floor(y/10)::BIGINT AS bin_y,
      |  count(*)::BIGINT AS cnt, round(avg(z),6) AS zmean,
      |  round(quantile_cont(z,0.5),6) AS zmed,
      |  round(min(z),6) AS zmin, round(max(z),6) AS zmax
      |FROM (SELECT (l_partkey % 1000)/10.0 AS x, (l_suppkey % 100)*1.0 AS y,
      |             l_quantity AS z FROM lineitem)
      |GROUP BY 1, 2""".stripMargin

  /** Tiling aggregation: synthetic lon/lat from keys → fixed lat/lon grid
    * cell → per-cell count + stats. The SQL-expressible twin of the engine's
    * ZCell tiling (`block_stats_grid` `geolib.py:388-398`). */
  def cellCount(s: SparkSession, d: String): DataFrame =
    li(s, d).select(
        (((col("l_orderkey") * 7919) % 36000) / lit(100.0) - 180.0).as("lon"),
        (((col("l_partkey") * 104729) % 18000) / lit(100.0) - 90.0).as("lat"),
        col("l_quantity").as("z"))
      .select(least(floor((col("lon") + 180.0) / 360.0 * 64), lit(63L)).as("ix"),
              least(floor((lit(90.0) - col("lat")) / 180.0 * 64), lit(63L)).as("iy"),
              col("z"))
      .groupBy((col("iy") * 64 + col("ix")).as("cell"))
      .agg(count(lit(1)).as("n_img"), sum(col("z")).as("sum_z"),
           r6(avg(col("z"))).as("mean_z"))

  val cellCountSql: String =
    """SELECT (iy*64 + ix)::BIGINT AS cell, count(*)::BIGINT AS n_img,
      |       sum(z) AS sum_z, round(avg(z),6) AS mean_z
      |FROM (SELECT least(floor((lon+180.0)/360.0*64), 63)::BIGINT AS ix,
      |             least(floor((90.0-lat)/180.0*64), 63)::BIGINT AS iy, z
      |      FROM (SELECT ((l_orderkey*7919) % 36000)/100.0 - 180.0 AS lon,
      |                   ((l_partkey*104729) % 18000)/100.0 - 90.0 AS lat,
      |                   l_quantity AS z FROM lineitem))
      |GROUP BY 1""".stripMargin

  /** Point-in-polygon join against box polygons — `raster_shpclip`/`heatmap`
    * relational twin (`geolib.py:690-753`, `2226-2244`): points from orders,
    * five literal boxes, count + stats per box. Engine PIP with concave/holed
    * polygons is covered by SpatialJoinSpec (not SQL-expressible). */
  val boxes: Seq[(String, Double, Double, Double, Double)] = Seq(
    ("b0", 0.0, 0.0, 30.0, 40.0), ("b1", 20.0, 10.0, 70.0, 60.0),
    ("b2", 50.0, 50.0, 100.0, 100.0), ("b3", -10.0, 80.0, 15.0, 99.0),
    ("b4", 90.0, 0.0, 100.0, 10.0))

  def pipBoxes(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val b = s.createDataFrame(boxes).toDF("box_id", "xmin", "ymin", "xmax", "ymax")
    ord(s, d).select(
        ((col("o_orderkey") % 1000) / lit(10.0)).as("x"),
        ((col("o_custkey") % 500) / lit(5.0)).as("y"),
        col("o_totalprice").as("v"))
      .join(broadcast(b),
        col("x") >= col("xmin") && col("x") <= col("xmax") &&
        col("y") >= col("ymin") && col("y") <= col("ymax"))
      .groupBy(col("box_id"))
      .agg(count(lit(1)).as("n_pts"), r6(avg(col("v"))).as("v_mean"))
  }

  val pipBoxesSql: String =
    """WITH b(box_id, xmin, ymin, xmax, ymax) AS (VALUES
      |  ('b0', 0.0, 0.0, 30.0, 40.0), ('b1', 20.0, 10.0, 70.0, 60.0),
      |  ('b2', 50.0, 50.0, 100.0, 100.0), ('b3', -10.0, 80.0, 15.0, 99.0),
      |  ('b4', 90.0, 0.0, 100.0, 10.0)),
      |p AS (SELECT (o_orderkey % 1000)/10.0 AS x, (o_custkey % 500)/5.0 AS y,
      |             o_totalprice AS v FROM orders)
      |SELECT box_id, count(*)::BIGINT AS n_pts, round(avg(v),6) AS v_mean
      |FROM p JOIN b ON x >= xmin AND x <= xmax AND y >= ymin AND y <= ymax
      |GROUP BY box_id""".stripMargin

  /** Nearest-time (as-of) join — `get_closest_dt_idx` `timelib.py:218-224`:
    * for every purchase event, the same user's click event with min |Δt|;
    * deterministic tie-break on event_id. */
  def asofNearest(s: SparkSession, d: String): DataFrame = {
    val e = ev(s, d).select(col("event_id"), col("user_id"),
                            tUs(col("ts")).as("t_us"), col("event_type"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"), col("t_us").as("p_t"))
    val c = e.filter(col("event_type") === "click")
      .select(col("event_id").as("c_id"), col("user_id"), col("t_us").as("c_t"))
    val w = Window.partitionBy(col("p_id"))
      .orderBy(abs(col("c_t") - col("p_t")).asc, col("c_id").asc)
    p.join(c, Seq("user_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("p_id"), col("user_id"), col("c_id"),
              (abs(col("c_t") - col("p_t"))).as("dt_us"))
  }

  val asofNearestSql: String =
    """WITH e AS (SELECT event_id, user_id, epoch_us(ts) AS t_us, event_type FROM events),
      |p AS (SELECT event_id AS p_id, user_id, t_us AS p_t FROM e WHERE event_type='purchase'),
      |c AS (SELECT event_id AS c_id, user_id, t_us AS c_t FROM e WHERE event_type='click'),
      |j AS (SELECT p.p_id, p.user_id, c.c_id, abs(c.c_t - p.p_t) AS dt_us,
      |        row_number() OVER (PARTITION BY p.p_id
      |                           ORDER BY abs(c.c_t - p.p_t) ASC, c.c_id ASC) AS rn
      |      FROM p JOIN c USING (user_id))
      |SELECT p_id, user_id, c_id, dt_us FROM j WHERE rn = 1""".stripMargin

  /** Session clustering — `dt_cluster` `timelib.py:421-455`: per user, a new
    * cluster starts where the time gap exceeds dt_thresh (here 4 h). Output
    * per-session bounds + count, like the reference's per-cluster min/max. */
  def sessionCluster(s: SparkSession, d: String): DataFrame = {
    val gapUs = 4L * 3600 * 1000000
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("t_us").asc, col("event_id").asc)
    ev(s, d).select(col("event_id"), col("user_id"), tUs(col("ts")).as("t_us"))
      .withColumn("brk",
        when(col("t_us") - lag(col("t_us"), 1).over(byUser) > gapUs, 1)
          .otherwise(0))
      .withColumn("session_idx",
        sum(col("brk")).over(byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
           min(col("t_us")).as("t_start_us"), max(col("t_us")).as("t_end_us"))
  }

  val sessionClusterSql: String =
    """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
      |b AS (SELECT *, CASE WHEN t_us - lag(t_us) OVER w > 14400000000 THEN 1 ELSE 0 END AS brk
      |      FROM t WINDOW w AS (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC)),
      |sx AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY t_us ASC, event_id ASC
      |                                ROWS UNBOUNDED PRECEDING) AS session_idx
      |       FROM b)
      |SELECT user_id, session_idx::BIGINT AS session_idx, count(*)::BIGINT AS n_events,
      |       min(t_us) AS t_start_us, max(t_us) AS t_end_us
      |FROM sx GROUP BY user_id, session_idx""".stripMargin

  /** Nearest-to-target top-1 per key — `get_closest_dt_fn` `timelib.py:212-224`:
    * the event closest to 2024-01-15T00:00:00Z per user. */
  def nearestDt(s: SparkSession, d: String): DataFrame = {
    val targetUs = 1705276800000000L // 2024-01-15T00:00:00Z
    val w = Window.partitionBy(col("user_id"))
      .orderBy(abs(col("t_us") - targetUs).asc, col("event_id").asc)
    ev(s, d).select(col("event_id"), col("user_id"), tUs(col("ts")).as("t_us"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), (col("t_us") - targetUs).as("offset_us"))
  }

  val nearestDtSql: String =
    """WITH t AS (SELECT event_id, user_id, epoch_us(ts) AS t_us FROM events),
      |r AS (SELECT *, row_number() OVER (PARTITION BY user_id
      |        ORDER BY abs(t_us - 1705276800000000) ASC, event_id ASC) AS rn FROM t)
      |SELECT user_id, event_id, t_us - 1705276800000000 AS offset_us FROM r WHERE rn = 1""".stripMargin

  /** Deterministic mode via (count desc, value asc) rank — the reference's
    * `get_stats` mode (`malib.py:1605-1633`) with an explicit tie rule. */
  def modeStats(s: SparkSession, d: String): DataFrame = {
    val counts = li(s, d).groupBy(col("l_quantity").cast("long").as("v"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("n").desc, col("v").asc)
    counts.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("v").as("mode_val"), col("n").as("mode_n"))
  }

  val modeStatsSql: String =
    """WITH c AS (SELECT l_quantity::BIGINT AS v, count(*)::BIGINT AS n
      |           FROM lineitem GROUP BY 1),
      |r AS (SELECT *, row_number() OVER (ORDER BY n DESC, v ASC) AS rn FROM c)
      |SELECT v AS mode_val, n AS mode_n FROM r WHERE rn = 1""".stripMargin

  /** Error metrics — `CE90`/`LE90` `geolib.py:2114-2132`, `rmse`
    * `malib.py:1667-1670`: CE90 = p90 of radial error, LE90 = p90 of |dz|,
    * RMSE = sqrt(mean(dz²)); offsets derived from discount/tax. */
  def errorMetrics(s: SparkSession, d: String): DataFrame =
    li(s, d).select((col("l_discount") - 0.05).as("dx"),
                    (col("l_tax") - 0.04).as("dy"),
                    (col("l_quantity") - 25.0).as("dz"))
      .agg(r6(expr("percentile(sqrt(dx*dx + dy*dy), 0.9)")).as("ce90"),
           r6(expr("percentile(abs(dz), 0.9)")).as("le90"),
           r6(sqrt(avg(col("dz") * col("dz")))).as("rmse"))

  val errorMetricsSql: String =
    """SELECT round(quantile_cont(sqrt(dx*dx + dy*dy), 0.9),6) AS ce90,
      |       round(quantile_cont(abs(dz), 0.9),6) AS le90,
      |       round(sqrt(avg(dz*dz)),6) AS rmse
      |FROM (SELECT l_discount - 0.05 AS dx, l_tax - 0.04 AS dy,
      |             l_quantity - 25.0 AS dz FROM lineitem)""".stripMargin

  /** UTM zone selection as a projection operator — `getUTMzone`/`getUTMepsg`
    * `geolib.py:1917-1953` incl. Norway/Svalbard cases, over synthetic
    * centroids; counts per selected EPSG. */
  def utmSelect(s: SparkSession, d: String): DataFrame = {
    val pts = ord(s, d).select(
      (((col("o_orderkey") * 31) % 7200) / lit(10.0) - 360.0).as("lon0"),
      (((col("o_custkey") * 17) % 1800) / lit(10.0) - 90.0).as("lat"))
      .select((col("lon0") + 180.0 - floor((col("lon0") + 180.0) / 360.0) * 360.0 - 180.0).as("lon180"),
              col("lat"))
    val zoneBase = (floor((col("lon180") + 180.0) / 6.0) + 1).cast("int")
    val zone =
      when(col("lat") >= 56.0 && col("lat") < 64.0 &&
           col("lon180") >= 3.0 && col("lon180") < 12.0, 32)
      .when(col("lat") >= 72.0 && col("lat") < 84.0 && col("lon180") >= 0.0 && col("lon180") < 9.0, 31)
      .when(col("lat") >= 72.0 && col("lat") < 84.0 && col("lon180") >= 9.0 && col("lon180") < 21.0, 33)
      .when(col("lat") >= 72.0 && col("lat") < 84.0 && col("lon180") >= 21.0 && col("lon180") < 33.0, 35)
      .when(col("lat") >= 72.0 && col("lat") < 84.0 && col("lon180") >= 33.0 && col("lon180") < 42.0, 37)
      .otherwise(zoneBase)
    pts.select((when(col("lat") >= 0, 32600).otherwise(32700) + zone).as("epsg"))
      .groupBy(col("epsg")).agg(count(lit(1)).as("n"))
  }

  val utmSelectSql: String =
    """WITH p0 AS (SELECT ((o_orderkey*31) % 7200)/10.0 - 360.0 AS lon0,
      |                   ((o_custkey*17) % 1800)/10.0 - 90.0 AS lat FROM orders),
      |p AS (SELECT (lon0+180.0) - floor((lon0+180.0)/360.0)*360.0 - 180.0 AS lon180, lat FROM p0),
      |z AS (SELECT lat,
      |  CASE WHEN lat >= 56.0 AND lat < 64.0 AND lon180 >= 3.0 AND lon180 < 12.0 THEN 32
      |       WHEN lat >= 72.0 AND lat < 84.0 AND lon180 >= 0.0 AND lon180 < 9.0 THEN 31
      |       WHEN lat >= 72.0 AND lat < 84.0 AND lon180 >= 9.0 AND lon180 < 21.0 THEN 33
      |       WHEN lat >= 72.0 AND lat < 84.0 AND lon180 >= 21.0 AND lon180 < 33.0 THEN 35
      |       WHEN lat >= 72.0 AND lat < 84.0 AND lon180 >= 33.0 AND lon180 < 42.0 THEN 37
      |       ELSE (floor((lon180+180.0)/6.0) + 1)::INT END AS zone
      |  FROM p)
      |SELECT (CASE WHEN lat >= 0 THEN 32600 ELSE 32700 END + zone)::INT AS epsg,
      |       count(*)::BIGINT AS n
      |FROM z GROUP BY 1""".stripMargin

  /** Extent union/intersection aggregation — `parse_extent`
    * `warplib.py:366-419`: per-nation point extents, then the global union
    * and intersection (NULL-safe) in one row. */
  def extentOps(s: SparkSession, d: String): DataFrame = {
    val pts = ord(s, d).select(
      (col("o_custkey") % 25).as("grp"),
      ((col("o_orderkey") % 2000) / lit(10.0)).as("x"),
      // floor() before the integer cast: DuckDB's double->int cast rounds,
      // Spark's truncates — floor makes both sides identical
      ((floor(col("o_totalprice")).cast("long") % 1000) / lit(10.0)).as("y"))
    val per = pts.groupBy(col("grp")).agg(
      min(col("x")).as("xmin"), min(col("y")).as("ymin"),
      max(col("x")).as("xmax"), max(col("y")).as("ymax"))
    per.agg(
      r6(min(col("xmin"))).as("u_xmin"), r6(min(col("ymin"))).as("u_ymin"),
      r6(max(col("xmax"))).as("u_xmax"), r6(max(col("ymax"))).as("u_ymax"),
      r6(max(col("xmin"))).as("i_xmin"), r6(max(col("ymin"))).as("i_ymin"),
      r6(min(col("xmax"))).as("i_xmax"), r6(min(col("ymax"))).as("i_ymax"))
  }

  val extentOpsSql: String =
    """WITH pts AS (SELECT o_custkey % 25 AS grp, (o_orderkey % 2000)/10.0 AS x,
      |                    (floor(o_totalprice)::BIGINT % 1000)/10.0 AS y FROM orders),
      |per AS (SELECT grp, min(x) AS xmin, min(y) AS ymin, max(x) AS xmax, max(y) AS ymax
      |        FROM pts GROUP BY grp)
      |SELECT round(min(xmin),6) AS u_xmin, round(min(ymin),6) AS u_ymin,
      |       round(max(xmax),6) AS u_xmax, round(max(ymax),6) AS u_ymax,
      |       round(max(xmin),6) AS i_xmin, round(max(ymin),6) AS i_ymin,
      |       round(min(xmax),6) AS i_xmax, round(min(ymax),6) AS i_ymax
      |FROM per""".stripMargin
}
