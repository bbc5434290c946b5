package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** The refresh engine shared by the incrementally-maintained materialized
  * views ([[StatsView]], [[TrendView]]): a view table keyed on `tile_id`
  * whose non-key columns are MERGEABLE buffers (per-pixel moment arrays +
  * a scalar layer count), advanced per refresh by
  *
  *   1. `SnapshotTable.changes(from, to)` — only the source layers
  *      committed since the last refresh (O(delta) file-level scan);
  *   2. a caller-supplied `fold` of those layers into canonical view rows
  *      (one shuffle keyed on tile_id, map-side combined);
  *   3. ONE equi-join against the current view rows of the affected tiles
  *      (stats-pruned read) merging old⊕new element-wise with codegen'd
  *      `zip_with` per array column;
  *   4. a `merge` commit keyed on tile_id — only view files whose tile
  *      range intersects the delta are rewritten, and the refreshed SOURCE
  *      VERSION rides in the manifest as an idempotent-writer marker, so a
  *      crashed/replayed refresh is a no-op, never a double-count.
  *
  * On exact-sum inputs (integer-valued payloads, dyadic time coordinates)
  * double addition is associative, so a view refreshed in ANY commit
  * grouping is bit-identical to the batch fold — which is exactly what the
  * q108/q110 strict oracles check. */
private[operators] object IncrementalView {

  /** One mergeable array column: name and the element-wise old⊕new
    * combiner (sum for moments, least/greatest for envelope bounds). */
  final case class ArrCol(name: String, op: (Column, Column) => Column)

  private def markerId(tilesRoot: String, kind: String): String =
    s"$kind:$tilesRoot"

  /** Source version the view last folded in, -1 for a fresh view. */
  def refreshedVersion(mvRoot: String, tilesRoot: String, kind: String): Long =
    SnapshotTable.lastCommittedEpoch(mvRoot, markerId(tilesRoot, kind))

  /** Advance the view at `mvRoot` to cover `tilesRoot`'s current version.
    * `fold` maps the CDC delta (TileRow-shaped) to canonical view rows —
    * `tile_id`, scalar `n`, then `arrCols` in order, with array element
    * types already cast to their canonical containsNull=true forms (the
    * catalog's schema gate compares dataTypes exactly, and zip_with in
    * later refreshes emits containsNull=true arrays). Returns the source
    * version now covered (unchanged if already current). */
  def refresh(spark: SparkSession, tilesRoot: String, mvRoot: String,
              kind: String, fold: DataFrame => DataFrame,
              arrCols: Seq[ArrCol]): Long = {
    val to = SnapshotTable.currentVersion(tilesRoot).toLong
    val from = refreshedVersion(mvRoot, tilesRoot, kind)
    if (to <= math.max(from, 0L)) return from
    val marker = markerId(tilesRoot, kind)
    val delta = SnapshotTable.changes(spark, tilesRoot, math.max(from, 0L).toInt,
      to.toInt)
    val deltaP = fold(delta)

    if (SnapshotTable.currentVersion(mvRoot) == 0) {
      // first refresh: plain append carrying the marker
      SnapshotTable.commitStreamBatch(spark, mvRoot, deltaP, marker, to)
      return to
    }
    // the folded delta feeds three consumers (the envelope agg, the merge
    // commit's delta write, and the old⊕new join probe) — without a cache
    // each one re-runs the upstream CDC scan + fold
    deltaP.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // affected-tile envelope bounds BOTH the old-view read and the
      // merge's file rewrites; conservative (range, not id set), O(1) plan
      val env = deltaP.agg(min(col("tile_id")), max(col("tile_id"))).head()
      val combined =
        if (env.isNullAt(0)) deltaP // empty delta (all-NDV commit): marker-only
        else {
          val prune = Seq(SnapshotTable.ColRange("tile_id",
            env.getLong(0).toDouble, env.getLong(1).toDouble))
          val oldCols = col("tile_id") +: (("n" +: arrCols.map(_.name))
            .map(c => col(c).as(s"o_$c")))
          val old = SnapshotTable.read(spark, mvRoot, prune = prune)
            .select(oldCols: _*)
          val merged = arrCols.map(a =>
            when(col(s"o_${a.name}").isNull, col(a.name))
              .otherwise(zip_with(col(a.name), col(s"o_${a.name}"), a.op))
              .as(a.name))
          deltaP.join(old, Seq("tile_id"), "left").select(
            (col("tile_id") +:
              (col("n") + coalesce(col("o_n"), lit(0))).as("n") +:
              merged): _*)
        }
      // cdc = false: the view's row-level history is replayable from the
      // SOURCE table's CDC; persisting a full pre-image copy of every
      // refreshed view row would be pure write amplification
      SnapshotTable.merge(spark, mvRoot, combined, Seq("tile_id"),
        txn = Some(marker -> to), cdc = false)
    } finally deltaP.unpersist(blocking = false)
    to
  }
}
