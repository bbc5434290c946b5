package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.geo.PlanarCell

/** kNN via iterative cell k-ring expansion with a distance-bounded refine
  * join (north rule; the reference's only nearest-sample precedent is the
  * nearest-time join `timelib.py:218-236`).
  *
  * Correctness bound: after joining candidates from rings 0..r around a
  * query's cell, any unseen candidate is at least `r·cellSize` away (ring
  * r+1 cells start that far in Chebyshev→Euclidean distance). So a query is
  * RESOLVED once it holds k hits with kth-distance ≤ r·cellSize; unresolved
  * queries re-join with a doubled ring radius (driver loop, each pass a
  * single equi hash join — no cross join ever materializes).
  *
  * Ties break on (distance, candidate id): deterministic across
  * parallelism levels. */
object Knn {
  def knn(spark: SparkSession, queries: DataFrame, candidates: DataFrame,
          k: Int, cellSize: Double = 128.0, r0: Int = 1,
          maxRounds: Int = 8): DataFrame = {
    import graft.functions.GraftFunctions.{planarCell, planarKRing}
    val cand = candidates
      .select(col("pt_id").as("c_id"), col("x").as("cx"), col("y").as("cy"))
      .withColumn("c_cell", planarCell(col("cx"), col("cy"), lit(cellSize)))
      .cache()

    var pending = queries.select(col("pt_id").as("q_id"), col("x").as("qx"), col("y").as("qy"))
    var results: DataFrame = null
    var r = r0
    var round = 0

    while (round < maxRounds && !pending.isEmpty) {
      val rr = r
      val exploded = pending.withColumn("c_cell", explode(planarKRing(
        planarCell(col("qx"), col("qy"), lit(cellSize)), lit(rr))))
      val hits = exploded.join(cand, Seq("c_cell"))
        .select(col("q_id"), col("qx"), col("qy"), col("c_id"),
          sqrt(pow(col("cx") - col("qx"), 2) + pow(col("cy") - col("qy"), 2)).as("dist"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("dist").asc, col("c_id").asc)
      val topk = hits.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      // resolved: k hits AND the kth distance is covered by the ring bound
      val summary = topk.groupBy(col("q_id"))
        .agg(count(lit(1)).as("n"), max(col("dist")).as("dmax"))
        // strict <: a candidate at exactly the ring bound could still lurk
        // unseen in ring r+1 and tie-break ahead of a found one
        .withColumn("resolved", col("n") === k && col("dmax") < rr * cellSize)
      val resolvedIds = summary.filter(col("resolved")).select(col("q_id"))
      val newResults = topk.join(resolvedIds, Seq("q_id"))
        .select(col("q_id"), col("c_id"), col("dist"), col("rnk"))
      results = if (results == null) newResults else results.unionByName(newResults)
      // keep only unresolved queries; materialize to cut lineage growth
      pending = pending.join(resolvedIds, Seq("q_id"), "left_anti")
        .localCheckpoint(eager = true)
      results = results.localCheckpoint(eager = true)
      r *= 2
      round += 1
    }
    // anything still pending after maxRounds gets whatever it found (bounded
    // domains can exhaust candidates legitimately, e.g. n_candidates < k)
    if (!pending.isEmpty) {
      val rr = r
      val hits = pending.withColumn("c_cell", explode(planarKRing(
        planarCell(col("qx"), col("qy"), lit(cellSize)), lit(rr))))
        .join(cand, Seq("c_cell"))
        .select(col("q_id"), col("c_id"),
          sqrt(pow(col("cx") - col("qx"), 2) + pow(col("cy") - col("qy"), 2)).as("dist"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("dist").asc, col("c_id").asc)
      val topk = hits.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      results = if (results == null) topk else results.unionByName(topk)
    }
    cand.unpersist()
    results
  }

  /** Brute-force reference implementation (cross join + window) — the test
    * oracle and the small-N baseline. */
  def knnBrute(spark: SparkSession, queries: DataFrame, candidates: DataFrame,
               k: Int): DataFrame = {
    val q = queries.select(col("pt_id").as("q_id"), col("x").as("qx"), col("y").as("qy"))
    val c = candidates.select(col("pt_id").as("c_id"), col("x").as("cx"), col("y").as("cy"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("dist").asc, col("c_id").asc)
    q.crossJoin(c)
      .select(col("q_id"), col("c_id"),
        sqrt(pow(col("cx") - col("qx"), 2) + pow(col("cy") - col("qy"), 2)).as("dist"))
      .withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
  }
}
