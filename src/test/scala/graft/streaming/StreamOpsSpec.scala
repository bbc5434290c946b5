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
}
