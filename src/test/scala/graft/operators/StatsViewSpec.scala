package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{ImageTable, SnapshotTable}

/** Incremental materialized stack stats: equality with the batch fold,
  * idempotent/replay-safe refresh markers, and the O(delta) refresh scan
  * (a refresh must NOT re-read the source history). */
class StatsViewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def freshRoot(tag: String): String = {
    val r = s"/tmp/graft_sv_test_$tag"
    SnapshotTable.deleteRecursively(r); r
  }

  private def recordsReadDuring(body: => Unit): Long = {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        acc.addAndGet(sc.stageInfo.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      body
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var last = -1L; var stable = 0
      while (System.nanoTime() < deadline && stable < 5) {
        val cur = acc.get()
        if (cur == last) stable += 1 else { stable = 0; last = cur }
        Thread.sleep(100)
      }
      acc.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("view after N incremental refreshes == batch stackStats over everything") {
    import spark.implicits._
    val tilesRoot = freshRoot("eq_t"); val mvRoot = freshRoot("eq_mv")
    val images = ImageTable.generate(spark, 18)
    val target = Warp.analyze(images, "min", "union")
    val idx = substring(col("image_id"), 5, 8).cast("int")
    (0 until 3).foreach { b =>
      SnapshotTable.commit(spark, tilesRoot,
        Warp.warpToTiles(spark, images.filter(idx % 3 === b), target, "near").toDF())
      assert(StatsView.refresh(spark, tilesRoot, mvRoot) == b + 1)
    }
    val incr = StatsView.stats(spark, mvRoot).as[StackOps.TileStats]
      .collect().map(s => s.tile_id -> s).toMap
    val batch = StackOps.stackStats(
      Warp.warpToTiles(spark, images, target, "near")).collect()
    assert(batch.nonEmpty && incr.size == batch.length)
    batch.foreach { s =>
      val i = incr(s.tile_id)
      assert(i.n_layers == s.n_layers && i.count.toSeq == s.count.toSeq &&
        i.mean.toSeq == s.mean.toSeq && i.std.toSeq == s.std.toSeq &&
        i.vmin.toSeq == s.vmin.toSeq && i.vmax.toSeq == s.vmax.toSeq,
        s"tile ${s.tile_id}")
    }
  }

  test("refresh is idempotent and replay-safe; marker survives foreign commits") {
    import spark.implicits._
    val tilesRoot = freshRoot("idem_t"); val mvRoot = freshRoot("idem_mv")
    val images = ImageTable.generate(spark, 6)
    val target = Warp.analyze(images, "min", "union")
    SnapshotTable.commit(spark, tilesRoot,
      Warp.warpToTiles(spark, images, target, "near").toDF())
    assert(StatsView.refresh(spark, tilesRoot, mvRoot) == 1)
    val v1 = SnapshotTable.currentVersion(mvRoot)
    // no new source data: no-op, no commit
    assert(StatsView.refresh(spark, tilesRoot, mvRoot) == 1)
    assert(SnapshotTable.currentVersion(mvRoot) == v1)
    assert(StatsView.refreshedVersion(mvRoot, tilesRoot) == 1)
    // a crashed refresh REPLAY (same source version pushed again through the
    // commit path) is skipped by the marker — no double-counted moments
    val before = StatsView.stats(spark, mvRoot).as[StackOps.TileStats]
      .collect().map(s => s.tile_id -> s.count.toSeq).toMap
    val replayed = SnapshotTable.commitStreamBatch(spark, mvRoot,
      SnapshotTable.read(spark, mvRoot), s"statsview:$tilesRoot", 1L)
    assert(replayed.isEmpty, "replayed refresh epoch must be skipped")
    val after = StatsView.stats(spark, mvRoot).as[StackOps.TileStats]
      .collect().map(s => s.tile_id -> s.count.toSeq).toMap
    assert(after == before)
  }

  test("refresh scans O(delta): source history is never re-read") {
    import spark.implicits._
    val tilesRoot = freshRoot("od_t"); val mvRoot = freshRoot("od_mv")
    val images = ImageTable.generate(spark, 61)
    val target = Warp.analyze(images, "min", "union")
    val idx = substring(col("image_id"), 5, 8).cast("int")
    // DEEP history (60 layers folded in) vs a ONE-image delta: the layer
    // axis is what grows at 100 TB, and it must never be re-scanned
    SnapshotTable.commit(spark, tilesRoot,
      Warp.warpToTiles(spark, images.filter(idx < 60), target, "near").toDF())
    StatsView.refresh(spark, tilesRoot, mvRoot)
    val historyTiles = SnapshotTable.read(spark, tilesRoot).count()
    val viewRows = SnapshotTable.read(spark, mvRoot).count()
    SnapshotTable.commit(spark, tilesRoot,
      Warp.warpToTiles(spark, images.filter(idx === 60), target, "near").toDF())
    val deltaTiles = SnapshotTable.read(spark, tilesRoot).count() - historyTiles
    val rr = recordsReadDuring { StatsView.refresh(spark, tilesRoot, mvRoot) }
    // scans in refresh #2: CDC delta tiles (NOT the history), the affected
    // view rows (≤ whole view here — one file), the merge's delta read-back
    // + touched rewrite over view rows. Bound well under one history scan:
    val bound = 4 * viewRows + 4 * deltaTiles
    assert(historyTiles > 2 * bound,
      s"fixture must make a history rescan visible (history=$historyTiles, bound=$bound)")
    assert(rr < bound, s"refresh read $rr records (delta=$deltaTiles, " +
      s"view=$viewRows, history=$historyTiles) — must not rescan history")
    // and the refreshed view is still exact
    val incr = StatsView.stats(spark, mvRoot).as[StackOps.TileStats]
      .collect().map(s => s.tile_id -> s).toMap
    val batch = StackOps.stackStats(
      Warp.warpToTiles(spark, images, target, "near")).collect()
    assert(batch.nonEmpty)
    batch.foreach { s =>
      val i = incr(s.tile_id)
      assert(i.count.toSeq == s.count.toSeq && i.mean.toSeq == s.mean.toSeq)
    }
  }
}
