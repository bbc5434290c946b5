package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed EXACT percentiles (guide §2.1/§2.5): the built-in
  * `percentile` aggregate buffers a value→count map per partition and
  * merges the maps on ONE reducer — with mostly-distinct doubles the merge
  * re-does the whole build serially, so partial aggregation buys nothing
  * and the query runs single-threaded (measured ~2.5 s per percentile pass
  * over 600k rows that otherwise scan in 0.2 s).
  *
  * This form is a parallel selection instead: range-repartition + local
  * sort (one small shuffle of the bare column), per-partition counts
  * (bounded driver metadata, like `Warp.analyze`'s scalars), then one
  * gather job that extracts just the ranked values each probe needs. Value
  * SELECTION is identical to the builtin (global sorted order; ties carry
  * equal values across any range boundary) and the interpolation replays
  * `Percentile.getPercentile`'s exact arithmetic — (hi−rk)·v_lo +
  * (rk−lo)·v_hi on rk = p·(n−1) — so results are bit-identical, which the
  * strict DuckDB oracles (q07/q36/q60/q61/q88) gate. */
object Pct {
  def exactPercentiles(df: DataFrame, value: Column,
                       probs: Seq[Double]): Seq[Double] = {
    val s = df.sparkSession
    import s.implicits._
    val ds = df.select(value.cast("double").as("v"))
      .filter(col("v").isNotNull).as[Double]
    val p = math.max(2, s.sparkContext.defaultParallelism)
    val sorted = ds.repartitionByRange(p, col("v"))
      .sortWithinPartitions("v").as[Double].rdd
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val cnts = sorted
        .mapPartitionsWithIndex { (i, it) =>
          var n = 0L; while (it.hasNext) { it.next(); n += 1 }
          Iterator((i, n))
        }
        .collect().sortBy(_._1).map(_._2) // bounded: one count per partition
      val offsets = cnts.scanLeft(0L)(_ + _)
      val n = offsets.last
      if (n == 0) return probs.map(_ => Double.NaN)
      val ranks = probs.flatMap { q =>
        val rk = q * (n - 1)
        Seq(math.floor(rk).toLong, math.ceil(rk).toLong)
      }.distinct.sorted
      // rank -> (partition, local offset) via the prefix sums
      def partOf(r: Long): Int = {
        var i = 0
        while (i + 1 < offsets.length && offsets(i + 1) <= r) i += 1
        i
      }
      val byPart: Map[Int, Seq[(Long, Long)]] = ranks
        .map(r => (partOf(r), r))
        .groupBy(_._1)
        .map { case (i, rs) => i -> rs.map { case (_, r) => (r, r - offsets(i)) } }
      val bp = s.sparkContext.broadcast(byPart)
      val picked: Map[Long, Double] = sorted
        .mapPartitionsWithIndex { (i, it) =>
          bp.value.get(i) match {
            case None => Iterator.empty
            case Some(wanted) =>
              // walk the sorted partition once, emitting (global rank, v)
              // at each wanted local offset
              val want = wanted.sortBy(_._2).iterator.buffered
              val out = Seq.newBuilder[(Long, Double)]
              var idx = 0L
              while (it.hasNext && want.hasNext) {
                val v = it.next()
                while (want.hasNext && want.head._2 == idx) {
                  out += ((want.head._1, v)); want.next()
                }
                idx += 1
              }
              out.result().iterator
          }
        }
        .collect().toMap // bounded: ≤ 2·|probs| ranked values
      probs.map { q =>
        val rk = q * (n - 1)
        val lo = math.floor(rk).toLong; val hi = math.ceil(rk).toLong
        if (lo == hi) picked(lo)
        else (hi - rk) * picked(lo) + (rk - lo) * picked(hi)
      }
    } finally sorted.unpersist(blocking = false)
  }
}
