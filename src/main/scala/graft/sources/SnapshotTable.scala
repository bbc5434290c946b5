package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import scala.jdk.CollectionConverters._

/** Snapshot-log table format over parquet — the catalog semantics the north
  * rule asks of Iceberg (snapshots, time travel, incremental reads,
  * rollback, optimistic concurrency), implemented against the PUBLIC Iceberg
  * table-spec ideas (immutable data files + a versioned metadata pointer;
  * HadoopTables-style version files) since the container ships no Iceberg
  * runtime jar. Layout:
  *
  * {{{
  *   <root>/data/s<N>-<uuid>/part-*.parquet   immutable files of ONE commit
  *                                            attempt (unique per attempt so
  *                                            racing committers never share
  *                                            a directory)
  *   <root>/meta/v<N>.json                    snapshot N: live file list
  * }}}
  *
  * A snapshot manifest lists EVERY live file (not a delta), so a read plans
  * one parquet scan over an explicit file list — no directory listing on the
  * hot path, the property that matters on object stores at 100 TB. Commits
  * are optimistic: the writer materializes data files, then publishes
  * `meta/v<N>.json` with a create-exclusive move — a concurrent committer of
  * the same N loses with `ConcurrentCommitException` and must retry on top
  * of the new state (Iceberg's CAS-on-metadata-pointer model; a cluster
  * deployment swaps the filesystem move for the catalog's CAS). */
object SnapshotTable {
  final class ConcurrentCommitException(v: Int)
    extends RuntimeException(s"snapshot v$v was committed concurrently")

  final case class Snapshot(version: Int, parent: Int, op: String,
                            rows: Long, files: Seq[String])

  private def metaDir(root: String): Path = Paths.get(root, "meta")

  private def listNames(dir: Path): Seq[String] = {
    val st = Files.list(dir)
    try st.iterator().asScala.map(_.getFileName.toString).toList
    finally st.close() // Files.list leaks a DirectoryStream fd unless closed
  }

  /** Latest committed version, 0 if the table is empty/uninitialized. */
  def currentVersion(root: String): Int = {
    val md = metaDir(root)
    if (!Files.isDirectory(md)) 0
    else listNames(md)
      .collect { case s if s.startsWith("v") && s.endsWith(".json") =>
        s.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  def snapshot(root: String, version: Int): Snapshot = {
    val txt = Files.readString(metaDir(root).resolve(s"v$version.json"))
    def field(k: String): String =
      s""""$k": "([^"]*)"""".r.findFirstMatchIn(txt).map(_.group(1))
        .orElse(s""""$k": (-?\\d+)""".r.findFirstMatchIn(txt).map(_.group(1)))
        .getOrElse(throw new IllegalStateException(s"manifest v$version lacks $k"))
    val files = """"files": \[([^\]]*)\]""".r.findFirstMatchIn(txt)
      .map(_.group(1)).getOrElse("")
      .split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).toSeq
    Snapshot(field("version").toInt, field("parent").toInt, field("op"),
             field("rows").toLong, files)
  }

  /** Append or overwrite `df` as a new snapshot; returns the new version. */
  def commit(spark: SparkSession, root: String, df: DataFrame,
             op: String = "append"): Int =
    commitFrom(spark, root, currentVersion(root), df, op)

  /** Commit on top of an explicitly-read base version — the body of
    * `commit`, split out so tests can replay the stale-base race a real
    * concurrent committer hits between its metadata read and its publish. */
  private[sources] def commitFrom(spark: SparkSession, root: String, base: Int,
                                  df: DataFrame, op: String): Int = {
    require(op == "append" || op == "overwrite", s"bad op $op")
    val v = base + 1
    // data dir is unique PER ATTEMPT, not per version: two racers of the
    // same v must not clobber each other's files before the manifest CAS
    // resolves — the loser's orphaned directory is unreferenced garbage
    // (cleaned by maintenance), never a dangling reference in the winner's
    // manifest (Iceberg's uuid-named data files, same reasoning)
    val attempt = s"s$v-${java.util.UUID.randomUUID().toString.take(8)}"
    val dataDir = Paths.get(root, "data", attempt)
    df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    val newFiles = listNames(dataDir)
      .filter(_.endsWith(".parquet"))
      .sorted.map(f => s"data/$attempt/$f")
    val prev = if (op == "overwrite" || base == 0) None else Some(snapshot(root, base))
    val live = prev.map(_.files).getOrElse(Nil) ++ newFiles
    // count ONLY the new files (parquet footer metadata), carry the parent's
    // row count forward — commit cost stays O(new data), not O(table)
    val rows = prev.map(_.rows).getOrElse(0L) +
      spark.read.parquet(newFiles.map(f => s"$root/$f"): _*).count()
    publish(root, v,
      s"""{"version": $v, "parent": $base, "op": "$op", "rows": $rows,
         | "files": [${live.map(f => s""""$f"""").mkString(", ")}]}""".stripMargin)
    v
  }

  /** Publish a snapshot manifest create-exclusively — this IS the
    * optimistic-concurrency gate: a racing committer of the same version
    * finds the target name taken and loses cleanly. NOT a rename: POSIX
    * rename() silently REPLACES an existing target (ATOMIC_MOVE included),
    * so the atomic claim is a hard link, which fails with
    * FileAlreadyExistsException when the version is taken. */
  private[sources] def publish(root: String, v: Int, json: String): Unit = {
    val target = metaDir(root).resolve(s"v$v.json")
    val tmp = metaDir(root).resolve(s".v$v.json.tmp")
    Files.createDirectories(metaDir(root))
    Files.writeString(tmp, json)
    try Files.createLink(target, tmp)
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new ConcurrentCommitException(v)
      case _: UnsupportedOperationException =>
        // filesystems without hard links (some network/object-store mounts):
        // degrade to CREATE_NEW write — still create-exclusive (the claim is
        // the open, not a rename), just not freshness-atomic with the tmp
        // file's content, which is fine because the content is local
        try Files.write(target, json.getBytes(java.nio.charset.StandardCharsets.UTF_8),
          java.nio.file.StandardOpenOption.CREATE_NEW,
          java.nio.file.StandardOpenOption.WRITE)
        catch { case _: java.nio.file.FileAlreadyExistsException =>
          throw new ConcurrentCommitException(v) }
    }
    finally Files.deleteIfExists(tmp)
  }

  /** Read the table at `asOf` (default: latest). Empty table → empty DF is
    * not representable without a schema, so version 0 is an error. */
  def read(spark: SparkSession, root: String, asOf: Int = -1): DataFrame = {
    val v = if (asOf >= 0) asOf else currentVersion(root)
    require(v >= 1, s"no snapshot $v at $root")
    spark.read.parquet(snapshot(root, v).files.map(f => s"$root/$f"): _*)
  }

  /** Incremental read: rows ADDED between `fromV` (exclusive) and `toV`
    * (inclusive) — the files of `toV` not live in `fromV` (append-only CDC;
    * an overwrite's files all count as added). */
  def changes(spark: SparkSession, root: String, fromV: Int, toV: Int): DataFrame = {
    val before = if (fromV >= 1) snapshot(root, fromV).files.toSet else Set.empty[String]
    val added = snapshot(root, toV).files.filterNot(before)
    require(added.nonEmpty, s"no files added between v$fromV and v$toV")
    spark.read.parquet(added.map(f => s"$root/$f"): _*)
  }

  /** Roll the table back to `toV` as a NEW snapshot (history stays intact,
    * like Iceberg's rollback: the old file list is re-published). */
  def rollback(spark: SparkSession, root: String, toV: Int): Int = {
    val target = snapshot(root, toV)
    val base = currentVersion(root)
    val v = base + 1
    publish(root, v,
      s"""{"version": $v, "parent": $base, "op": "rollback", "rows": ${target.rows},
         | "files": [${target.files.map(f => s""""$f"""").mkString(", ")}]}""".stripMargin)
    v
  }

  def deleteRecursively(root: String): Unit = {
    val p = Paths.get(root)
    if (Files.exists(p)) {
      val st = Files.walk(p)
      try st.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      finally st.close()
    }
  }
}
