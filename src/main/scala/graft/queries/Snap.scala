package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.SnapshotTable

/** q86 — snapshot-log catalog semantics (the Iceberg-shaped leg of the north
  * rule: snapshots, time travel, overwrite, rollback) exercised END-TO-END:
  * five commits against a fresh table root, then one time-travel read per
  * snapshot. The DuckDB twin recomputes each snapshot's visible row set from
  * the same modular slices of `events`, so a bug anywhere in commit/publish/
  * manifest/time-travel breaks exact integer counts and sums. */
object Snap {
  def snapshotTravel(s: SparkSession, d: String): DataFrame = {
    val ev = s.read.parquet(s"$d/events.parquet")
    // per-invocation root (the Stream.fixtureDir precedent): a fixed path
    // races two concurrent sessions verifying the same sf dir — one deletes
    // the other's live snapshot log mid-commit
    val root = s"/tmp/graft_snap_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val slice = (m: Int, r: Int) => ev.filter(pmod(col("event_id"), lit(m)) === r)
      SnapshotTable.commit(s, root, slice(3, 0))
      SnapshotTable.commit(s, root, slice(3, 1))
      SnapshotTable.commit(s, root, slice(3, 2), op = "overwrite")
      SnapshotTable.rollback(s, root, toV = 2)
      SnapshotTable.commit(s, root, slice(5, 0))
      import s.implicits._
      // the per-version aggregates are collected HERE (head() per version),
      // so the snapshot tree can be deleted before returning the local DF
      (1 to 5).map { v =>
        val snap = SnapshotTable.snapshot(root, v)
        val agg = SnapshotTable.read(s, root, asOf = v)
          .agg(count(lit(1)), sum(col("event_id"))).head()
        (v, snap.op, agg.getLong(0), agg.getLong(1))
      }.toDF("version", "op", "n_rows", "sum_event_id")
    } finally SnapshotTable.deleteRecursively(root)
  }

  /** q99 — manifest-stats scan pruning end-to-end (round 4): three commits
    * of DISJOINT event_id ranges (repartition(4) → a deterministic 4 files
    * per commit at any parallelism), then a range-pruned read. The planned
    * file count proves pruning engaged (4 of 12 — only the middle commit's
    * stats intersect [4000, 4999]) and the exact count/sum prove it never
    * changed results. Oracle contract: file counts fixed for the sf0.01
    * gate (the imSql(799) precedent; sf0.001's third slice is empty). */
  def snapshotPrune(s: SparkSession, d: String): DataFrame = {
    import SnapshotTable.ColRange
    val ev = s.read.parquet(s"$d/events.parquet")
    val root = s"/tmp/graft_snapprune_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val slice = (lo: Int, hi: Int) =>
        ev.filter(col("event_id") >= lo && col("event_id") < hi).repartition(4)
      SnapshotTable.commit(s, root, slice(0, 3333))
      SnapshotTable.commit(s, root, slice(3333, 6666))
      SnapshotTable.commit(s, root, slice(6666, 1 << 30))
      val v = SnapshotTable.currentVersion(root)
      val all = SnapshotTable.planFiles(root, v, Nil)
      val range = Seq(ColRange("event_id", 4000, 4999))
      val planned = SnapshotTable.planFiles(root, v, range)
      val agg = SnapshotTable.read(s, root, asOf = v, prune = range)
        .filter(col("event_id").between(4000, 4999))
        .agg(count(lit(1)), sum(col("event_id"))).head()
      import s.implicits._
      Seq((all.size, planned.size, agg.getLong(0), agg.getLong(1)))
        .toDF("n_files_total", "n_files_planned", "n_rows", "sum_event_id")
    } finally SnapshotTable.deleteRecursively(root)
  }

  val snapshotPruneSql: String =
    """SELECT 12 AS n_files_total, 4 AS n_files_planned,
      |  count(*) FILTER (WHERE event_id BETWEEN 4000 AND 4999)::BIGINT AS n_rows,
      |  sum(event_id) FILTER (WHERE event_id BETWEEN 4000 AND 4999)::BIGINT
      |    AS sum_event_id
      |FROM events""".stripMargin

  /** q101 — compaction + expiry end-to-end: three 4-file commits, compact
    * to one file, expire history down to the compacted tail; the twin pins
    * the file counts, the exact surviving row set, and that pre-expiry
    * reads (but not expired ones) kept working. */
  def snapshotCompact(s: SparkSession, d: String): DataFrame = {
    val ev = s.read.parquet(s"$d/events.parquet")
    val root = s"/tmp/graft_snapcomp_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val slice = (m: Int, r: Int) =>
        ev.filter(pmod(col("event_id"), lit(m)) === r).repartition(4)
      SnapshotTable.commit(s, root, slice(3, 0))
      SnapshotTable.commit(s, root, slice(3, 1))
      SnapshotTable.commit(s, root, slice(3, 2))
      val filesBefore = SnapshotTable.snapshot(root, 3).files.size
      val v = SnapshotTable.compact(s, root, targetFiles = 1)
      val filesAfter = SnapshotTable.snapshot(root, v).files.size
      val preExpireV1 = SnapshotTable.read(s, root, asOf = 1).count()
      val (dropped, gcd) = SnapshotTable.expire(root, keepLast = 1)
      val agg = SnapshotTable.read(s, root)
        .agg(count(lit(1)), sum(col("event_id"))).head()
      import s.implicits._
      Seq((filesBefore, filesAfter, preExpireV1, dropped, gcd,
           agg.getLong(0), agg.getLong(1)))
        .toDF("n_files_before", "n_files_after", "v1_rows", "n_expired",
              "n_gcd_dirs", "n_rows", "sum_event_id")
    } finally SnapshotTable.deleteRecursively(root)
  }

  val snapshotCompactSql: String =
    """SELECT 12 AS n_files_before, 1 AS n_files_after,
      |  count(*) FILTER (WHERE event_id % 3 = 0)::BIGINT AS v1_rows,
      |  3 AS n_expired, 3 AS n_gcd_dirs,
      |  count(*)::BIGINT AS n_rows, sum(event_id)::BIGINT AS sum_event_id
      |FROM events""".stripMargin

  val snapshotTravelSql: String =
    """WITH s AS (SELECT
      |    count(*) FILTER (WHERE event_id % 3 = 0) AS c0,
      |    sum(event_id) FILTER (WHERE event_id % 3 = 0) AS s0,
      |    count(*) FILTER (WHERE event_id % 3 = 1) AS c1,
      |    sum(event_id) FILTER (WHERE event_id % 3 = 1) AS s1,
      |    count(*) FILTER (WHERE event_id % 3 = 2) AS c2,
      |    sum(event_id) FILTER (WHERE event_id % 3 = 2) AS s2,
      |    count(*) FILTER (WHERE event_id % 5 = 0) AS c5,
      |    sum(event_id) FILTER (WHERE event_id % 5 = 0) AS s5
      |  FROM events)
      |SELECT 1 AS version, 'append' AS op, c0::BIGINT AS n_rows, s0::BIGINT AS sum_event_id FROM s
      |UNION ALL SELECT 2, 'append', (c0 + c1)::BIGINT, (s0 + s1)::BIGINT FROM s
      |UNION ALL SELECT 3, 'overwrite', c2::BIGINT, s2::BIGINT FROM s
      |UNION ALL SELECT 4, 'rollback', (c0 + c1)::BIGINT, (s0 + s1)::BIGINT FROM s
      |UNION ALL SELECT 5, 'append', (c0 + c1 + c5)::BIGINT, (s0 + s1 + s5)::BIGINT FROM s""".stripMargin

  /** q103 — MERGE/upsert + row-level DELETE end-to-end (round 5): three
    * 4-file base commits, an upsert (1,500 value updates + 500 inserts at
    * id+1e6, all tagged event_type='upserted'), then a predicate delete.
    * The twin pins: the file-level write-amplification bounds (8 of 12
    * files rewritten by the merge — exactly the two commits whose key
    * stats intersect the incoming envelope; 4 removed by the delete), the
    * delta-only CDC stream (upserted rows only, never survivor-rewrite
    * carriers, nothing from the delete), and the exact final row set via
    * integer aggregates. File counts are an sf0.01-fixed contract (the
    * q99 note); survivor-file counts are plan-dependent so only
    * SET-DIFFERENCE counts are emitted. */
  def snapshotMerge(s: SparkSession, d: String): DataFrame = {
    import SnapshotTable.ColRange
    val ev = s.read.parquet(s"$d/events.parquet")
    val root = s"/tmp/graft_snapmerge_${java.util.UUID.randomUUID().toString.take(8)}"
    try {
      val slice = (lo: Int, hi: Int) =>
        ev.filter(col("event_id") >= lo && col("event_id") < hi).repartition(4)
      SnapshotTable.commit(s, root, slice(0, 3333))
      SnapshotTable.commit(s, root, slice(3333, 6666))
      SnapshotTable.commit(s, root, slice(6666, 1 << 30))
      val v3files = SnapshotTable.snapshot(root, 3).files.toSet
      val incoming = ev.filter(col("event_id").between(4000, 5499))
          .withColumn("event_type", lit("upserted"))
        .unionByName(ev.filter(col("event_id") < 500)
          .withColumn("event_id", col("event_id") + 1000000L)
          .withColumn("event_type", lit("upserted")))
        .repartition(2)
      val v4 = SnapshotTable.merge(s, root, incoming, Seq("event_id"))
      val v4files = SnapshotTable.snapshot(root, v4).files.toSet
      val v5 = SnapshotTable.delete(s, root,
        col("event_id") % 7 === 3 && col("event_id") < 3333,
        prune = Seq(ColRange("event_id", 0, 3332)))
      val v5files = SnapshotTable.snapshot(root, v5).files.toSet
      val cdc = SnapshotTable.changes(s, root, fromV = 3, toV = v5)
        .agg(count(lit(1)), sum(col("event_id"))).head()
      // full CDC: deletes = merge pre-images (the 1,500 replaced rows) +
      // the predicate-deleted rows, from the manifest tombstones
      val cdcDel = SnapshotTable.changesCdc(s, root, fromV = 3, toV = v5)
        .filter(col("_change_type") === "delete")
        .agg(count(lit(1)), sum(col("event_id"))).head()
      val fin = SnapshotTable.read(s, root)
        .agg(count(lit(1)), sum(col("event_id")),
             sum(when(col("event_type") === "upserted", 1L).otherwise(0L))).head()
      import s.implicits._
      Seq((v3files.size, (v3files -- v4files).size, (v4files -- v5files).size,
           cdc.getLong(0), cdc.getLong(1), cdcDel.getLong(0), cdcDel.getLong(1),
           fin.getLong(0), fin.getLong(2), fin.getLong(1)))
        .toDF("n_files_base", "n_rewritten_by_merge", "n_removed_by_delete",
              "cdc_rows", "cdc_sum_id", "cdc_del_rows", "cdc_del_sum_id",
              "n_rows", "n_upserted", "sum_event_id")
    } finally SnapshotTable.deleteRecursively(root)
  }

  val snapshotMergeSql: String =
    """WITH m AS (SELECT
      |    count(*) FILTER (WHERE event_id BETWEEN 4000 AND 5499) AS u,
      |    sum(event_id) FILTER (WHERE event_id BETWEEN 4000 AND 5499) AS su,
      |    count(*) FILTER (WHERE event_id < 500) AS i5,
      |    sum(event_id) FILTER (WHERE event_id < 500) AS si5,
      |    count(*) FILTER (WHERE event_id % 7 = 3 AND event_id < 3333) AS dels,
      |    sum(event_id) FILTER (WHERE event_id % 7 = 3 AND event_id < 3333) AS sdels,
      |    count(*) AS n, sum(event_id) AS sn
      |  FROM events)
      |SELECT 12 AS n_files_base, 8 AS n_rewritten_by_merge,
      |  4 AS n_removed_by_delete,
      |  (u + i5)::BIGINT AS cdc_rows,
      |  (su + si5 + 1000000 * i5)::BIGINT AS cdc_sum_id,
      |  (u + dels)::BIGINT AS cdc_del_rows,
      |  (su + sdels)::BIGINT AS cdc_del_sum_id,
      |  (n + i5 - dels)::BIGINT AS n_rows,
      |  (u + i5)::BIGINT AS n_upserted,
      |  (sn + si5 + 1000000 * i5 - sdels)::BIGINT AS sum_event_id
      |FROM m""".stripMargin
}
