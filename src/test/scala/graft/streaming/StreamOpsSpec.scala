package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TestSpark

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("incremental stack stats update as new layers arrive (stack_merge analog)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_in").toString
    // batch 1: two layers of cell 0..9
    (0 until 10).map(i => (i.toLong, 10.0, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("cell_id", "v", "ts").write.mode("append").parquet(dir)
    val q = StreamOps.stackStatsStream(spark, dir, "stack_mem")
    q.processAllAvailable()
    val r1 = spark.sql("SELECT cnt, vmean FROM stack_mem WHERE cell_id = 3").head()
    assert(r1.getLong(0) == 1 && r1.getDouble(1) == 10.0)
    // batch 2 arrives: stats update in place (incremental merge)
    (0 until 10).map(i => (i.toLong, 30.0, java.sql.Timestamp.valueOf("2024-01-02 00:00:00")))
      .toDF("cell_id", "v", "ts").write.mode("append").parquet(dir)
    q.processAllAvailable()
    val r2 = spark.sql("SELECT cnt, vmean, vmin, vmax FROM stack_mem WHERE cell_id = 3")
      .orderBy(col("cnt").desc).head()
    assert(r2.getLong(0) == 2 && r2.getDouble(1) == 20.0 &&
           r2.getDouble(2) == 10.0 && r2.getDouble(3) == 30.0)
    q.stop()
  }

  test("session_window clustering with watermark (dt_cluster analog)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_sess").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // user 1: two bursts separated by > 1 hour → 2 sessions
    Seq(
      (1L, ts("2024-01-01 00:00:00"), 1.0), (1L, ts("2024-01-01 00:20:00"), 2.0),
      (1L, ts("2024-01-01 03:00:00"), 3.0),
      (2L, ts("2024-01-01 01:00:00"), 5.0)
    ).toDF("user_id", "ts", "v").write.mode("append").parquet(dir)
    val q = StreamOps.sessionStream(spark, dir, "sess_mem")
    q.processAllAvailable()
    // push the watermark far forward so earlier sessions close and emit
    Seq((9L, ts("2024-01-02 12:00:00"), 0.0)).toDF("user_id", "ts", "v")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    val rows = spark.sql("SELECT user_id, n_events, v_sum FROM sess_mem ORDER BY user_id, v_sum")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(rows.contains((1L, 2L, 3.0)))   // first burst: 2 events, v=1+2
    assert(rows.contains((1L, 1L, 3.0)))   // second burst
    assert(rows.contains((2L, 1L, 5.0)))
    q.stop()
  }
}

class StreamOps2Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("streaming exact dedup drops repeated fingerprints (bounded state)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_dedup").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq(("d1", "fpA", ts("2024-01-01 00:00:00")),
        ("d2", "fpA", ts("2024-01-01 00:10:00")),   // dup within watermark
        ("d3", "fpB", ts("2024-01-01 00:20:00")))
      .toDF("doc_id", "fp", "ts").write.mode("append").parquet(dir)
    val q = StreamOps.dedupStream(spark, dir, "dedup_mem")
    q.processAllAvailable()
    val fps = spark.sql("SELECT fp FROM dedup_mem").collect().map(_.getString(0)).sorted
    assert(fps.toSeq == Seq("fpA", "fpB"))
    q.stop()
  }

  test("flatMapGroupsWithState maintains running per-cell stats across batches") {
    import spark.implicits._
    val dir = Files.createTempDirectory("stream_state").toString
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    Seq((7L, 10.0, ts("2024-01-01 00:00:00"))).toDF("cell_id", "v", "ts")
      .write.mode("append").parquet(dir)
    val q = StreamOps.stackStateStream(spark, dir, "state_mem")
    q.processAllAvailable()
    Seq((7L, 30.0, ts("2024-01-02 00:00:00"))).toDF("cell_id", "v", "ts")
      .write.mode("append").parquet(dir)
    q.processAllAvailable()
    val r = spark.sql("SELECT cnt, vmean, vmin, vmax FROM state_mem WHERE cell_id = 7")
      .orderBy(col("cnt").desc).head()
    assert(r.getLong(0) == 2 && r.getDouble(1) == 20.0 &&
           r.getDouble(2) == 10.0 && r.getDouble(3) == 30.0)
    q.stop()
  }

  test("generic parquet stream -> snapshot catalog: epoch-per-batch, replay no-op, view chain (q114 core)") {
    import spark.implicits._
    import graft.sources.SnapshotTable
    val base = Files.createTempDirectory("stream_snap_gen").toString
    val srcDir = s"$base/src"; val root = s"$base/tbl"; val ckpt = s"$base/ckpt"
    Files.createDirectories(java.nio.file.Paths.get(srcDir))
    def land(b: Int): Unit = {
      val tmp = Files.createTempDirectory("stream_snap_w").toString
      (0 until 5).map(i => (b.toLong * 10 + i, s"row_${b}_$i"))
        .toDF("k", "payload").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head.toPath
      val dst = java.nio.file.Paths.get(srcDir, s"f$b.parquet")
      Files.move(part, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1704067200000L + b * 2000L))
      SnapshotTable.deleteRecursively(tmp)
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("payload", org.apache.spark.sql.types.StringType)))
    land(0); land(1)
    val q1 = StreamOps.parquetStreamToSnapshot(spark, srcDir, root, ckpt, "t", schema)
    q1.processAllAvailable(); q1.stop()
    assert(SnapshotTable.currentVersion(root) == 2) // one APPEND snapshot per epoch
    assert(SnapshotTable.read(spark, root).count() == 10)
    // replayed epoch is a no-op commit
    val replay = SnapshotTable.commitStreamBatch(spark, root,
      Seq((99L, "dup")).toDF("k", "payload"), "t", 1L)
    assert(replay.isEmpty && SnapshotTable.currentVersion(root) == 2)
    // restart from the checkpoint: only the new file becomes epoch 2
    land(2)
    val q2 = StreamOps.parquetStreamToSnapshot(spark, srcDir, root, ckpt, "t", schema)
    q2.processAllAvailable(); q2.stop()
    assert(SnapshotTable.currentVersion(root) == 3)
    assert(SnapshotTable.read(spark, root).count() == 15)
    // CDC between versions sees exactly the per-epoch rows (view-chain fuel)
    assert(SnapshotTable.changes(spark, root, 1, 2).count() == 5)
    SnapshotTable.deleteRecursively(base)
  }
}
