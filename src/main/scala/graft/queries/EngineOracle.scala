package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{RasterOps, Sampling, StackOps, Warp}
import graft.sources.PolygonTable

/** DuckDB-oracle forms of the heavy engine pipelines (VERDICT r2 #1).
  *
  * The driver hash-compares query output against pure SQL re-derivations, so
  * these queries run the REAL operators (warpToTiles → TileStatsAgg /
  * TileTrendAgg / compositeMean+tileDiff / pointSample) over the image-table
  * subset on which every emitted number is bit-exactly reproducible in any
  * IEEE-754 engine:
  *
  *  - images with `fmt != raw` carry integer payloads (1..255 quantized,
  *    ImageTable.renderPixels), so value sums/means/stds are exact rationals —
  *    double accumulation is EXACT and therefore order-independent (the
  *    aggregation order differs between Spark partial folds and DuckDB);
  *  - images with `i % 3 != 2` have no sin/cos ripple (cross-engine libm
  *    differs in the last ulp — OracleFixtureSpec proves the remaining
  *    quantization boundaries are > 1e-6 away, so round_even == math.rint);
  *  - for the trend twin, `i % 3 == 0` additionally makes the acquisition
  *    hour a multiple of 3, so t = days + hour/24 has 3 fraction bits and the
  *    OLS sums Σt, Σt², Σt·v, Σv² are all EXACT doubles; the normal-equation
  *    chain is then a fixed sequence of correctly-rounded IEEE ops that both
  *    engines evaluate identically (the q63 pattern extended to aggregates).
  *
  * The unrestricted full-scale forms of these operators remain the Bench
  * flagship pipeline (all 16k images at sf0.1) and the golden ScalaTest
  * suites; the subset is a verification surface, not the scale path.
  * Reference semantics: malib.py:559-587 (stats), malib.py:999-1171 (trend),
  * README flagship diff, geolib.py:914-1016 (sample).
  */
object EngineOracle {
  /** Tile edge / pixel count — all (tx, ty, pidx) ↔ (px, py) decodes below
    * derive from the REAL tile size so an engine TileSize change cannot
    * silently shear the emitted pixel coordinates (the generated DuckDB
    * twins embed the matching constants at generation time). */
  private val T = Warp.TileSize
  private val T2 = T * T

  /** Image index parsed from `img_%08d_...` ids. */
  private def idx: Column = substring(col("image_id"), 5, 8).cast("int")

  /** Quantized (integer-payload), ripple-free layers. */
  private def quantNoRipple(imgs: DataFrame): DataFrame =
    imgs.filter(idx % 3 =!= 2 && col("fmt") =!= "raw")

  /** Trend subset: quantized + hour divisible by 3 (exact OLS t sums). */
  private def trendSubset(imgs: DataFrame): DataFrame =
    imgs.filter(idx % 3 === 0 && col("fmt") =!= "raw")

  /** Explode per-pixel stat arrays to one row per valid cell, addressed by
    * global target pixel (px, py) — SQL-joinable without tile arithmetic. */
  private def explodeStats(stats: DataFrame, ntx: Int, fields: Seq[String]): DataFrame = {
    val zipped = stats.select(col("tile_id"),
      posexplode(arrays_zip(fields.map(col): _*)).as(Seq("pidx", "z")))
    val cols = Seq(
      ((col("tile_id") % ntx) * T + col("pidx") % T).cast("int").as("px"),
      (expr(s"cast(tile_id div $ntx as int)") * T +
        expr(s"cast(pidx div $T as int)")).as("py"),
      col("z.count").as("n")) ++
      fields.filter(_ != "count").map(f => col(s"z.$f").cast("double").as(f))
    zipped.select(cols: _*).filter(col("n") > 0)
  }

  /** Scan/partition sizing for the incremental-view protocol drivers
    * (restored on exit): tile payloads compress ~100-200× in parquet and
    * shuffle blocks, so default byte-based planning (128 MB splits, 4 MB
    * per-file open cost, 64 MB AQE advisory) packs the CPU-heavy
    * decode+fold+merge work of the catalog reads onto 1-2 tasks. Sizing by
    * bytes-after-decode keeps every stage wide; ratios, not core counts,
    * so they hold at any cluster size (guide §2.2/§6). */
  private def withFatRowScanConf[T](s: SparkSession)(body: => T): T = {
    val scoped = Seq(
      "spark.sql.files.maxPartitionBytes" -> (16L * 1024 * 1024).toString,
      "spark.sql.files.openCostInBytes" -> (512L * 1024).toString,
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> (4L * 1024 * 1024).toString,
      // batch ROW count must follow row width too: the packed view rows
      // are ~100-260 KB each, and the default 4096-row vectorized batches
      // reserve ~0.5-1 GB of contiguous column buffers PER TASK at sf1
      // (observed reader reserve failure at 10x scale); 128 rows bounds a
      // batch to a few MB per column at any scale
      "spark.sql.parquet.columnarReaderBatchSize" -> "128")
    val saved = scoped.map { case (k, _) => k -> s.conf.getOption(k) }
    scoped.foreach { case (k, v) => s.conf.set(k, v) }
    try body finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

  /** ONE parquet file from a DataFrame without serializing the encode: the
    * earlier `repartition(1).write` funneled every row through a single
    * task — ~3 s of CPU per epoch file pushing ~10⁸ array elements through
    * the parquet writer — and produced a single row group (dictionary
    * encoding keeps the buffered estimate below any block size), so the
    * downstream scan decoded the whole file on ONE task too. Here the
    * encode runs wide (normal distributed write, small row groups), then
    * the part files' row groups are concatenated BYTE-FOR-BYTE on the
    * driver (`ParquetFileWriter.appendFile` — no decode, no re-encode;
    * the parquet-tools merge primitive). Many row groups also give the
    * one-file epoch real scan parallelism (guide §6). */
  private def writeOneFileParquet(s: SparkSession, df: DataFrame,
                                  dst: java.nio.file.Path): Unit = {
    import org.apache.hadoop.fs.{Path => HPath}
    import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
    import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
    val tmp = java.nio.file.Files.createTempDirectory("graft_onefile").toString
    try {
      df.write.mode("overwrite")
        .option("parquet.block.size", (256 * 1024).toString)
        .option("compression", "none")
        .parquet(tmp)
      val parts = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
        .sortBy(_.getName)
      require(parts.nonEmpty, s"no parquet parts under $tmp")
      val conf = s.sessionState.newHadoopConf()
      val r0 = ParquetFileReader.open(
        HadoopInputFile.fromPath(new HPath(parts.head.getPath), conf))
      val (schema, kv) =
        try (r0.getFooter.getFileMetaData.getSchema,
             r0.getFooter.getFileMetaData.getKeyValueMetaData)
        finally r0.close()
      java.nio.file.Files.deleteIfExists(dst)
      val w = new ParquetFileWriter(
        HadoopOutputFile.fromPath(new HPath(dst.toString), conf),
        schema, ParquetFileWriter.Mode.CREATE, 256L * 1024, 0)
      w.start()
      parts.foreach(p =>
        w.appendFile(HadoopInputFile.fromPath(new HPath(p.getPath), conf)))
      w.end(kv)
    } finally graft.sources.SnapshotTable.deleteRecursively(tmp)
  }

  /** Detach a result from scratch inputs the caller is about to delete:
    * a DISTRIBUTED parquet write to a JVM-lifetime temp dir, re-read
    * lazily. The collect()+createDataFrame alternative materializes every
    * row single-threaded on the driver — measured 45 s of q108's 64 s at
    * sf0.1 (10.6M rows); this form is the same rows in ~2 s and keeps the
    * returned plan a plain scan the driver can re-run. */
  private def detachViaParquet(s: SparkSession, df: DataFrame): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("graft_detach").toString
    sys.addShutdownHook(graft.sources.SnapshotTable.deleteRecursively(dir))
    val path = s"$dir/out"
    df.write.parquet(path)
    s.read.parquet(path)
  }

  /** q41 oracle form: per-pixel stack count/mean/std/min/max over the
    * quantized subset, via the production warp + vector-aggregator path. */
  def stackCells(s: SparkSession, d: String): DataFrame = {
    val imgs = quantNoRipple(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    explodeStats(StackOps.stackStats(Warp.warpToTiles(s, imgs, target, "near")).toDF(),
      ntx, Seq("count", "mean", "std", "vmin", "vmax"))
  }

  /** q108: q41's per-pixel stack stats, computed INCREMENTALLY — the same
    * images land in a snapshot-catalog tiles table across three commits,
    * and a materialized view of mergeable moments advances by CDC after
    * each (`StatsView.refresh`: O(delta) scan + stats-bounded merge). The
    * strict oracle is q41's twin VERBATIM: any double-counted replay,
    * missed delta, or wrong old⊕new merge shifts an exact integer moment
    * and fails the hash. A deliberate re-refresh with no new source data
    * and a replayed refresh marker both prove idempotent (version-pinned
    * inside the run). */
  def stackCellsIncremental(s: SparkSession, d: String): DataFrame = {
    val imgs = quantNoRipple(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val base = java.nio.file.Files.createTempDirectory("graft_q108").toString
    val tilesRoot = s"$base/tiles"; val mvRoot = s"$base/mv"
    try withFatRowScanConf(s) {
      appendBatchesWithRefresh(s, tilesRoot,
        (0 until 3).map(b => Warp.warpToTiles(s,
          imgs.filter(idx % 3 === b), target, "near").toDF()),
        () => graft.operators.StatsView.refresh(s, tilesRoot, mvRoot))
      // idempotence: nothing new to fold → marker unchanged, no commit
      val vBefore = graft.sources.SnapshotTable.currentVersion(mvRoot)
      require(graft.operators.StatsView.refresh(s, tilesRoot, mvRoot) == 3)
      require(graft.sources.SnapshotTable.currentVersion(mvRoot) == vBefore,
        "a no-op refresh must not commit")
      val out = explodeStats(graft.operators.StatsView.stats(s, mvRoot),
        ntx, Seq("count", "mean", "std", "vmin", "vmax"))
      detachViaParquet(s, out)
    } finally graft.sources.SnapshotTable.deleteRecursively(base)
  }

  /** q114: the full STREAM → CATALOG → VIEW chain — the composition of
    * q107 (streaming ingest commits snapshot epochs exactly-once) and
    * q108 (a materialized view advances off the catalog's CDC) that
    * neither row exercises end-to-end. The q41 tile batches land as
    * parquet FILES in a streaming source dir; a file-source stream
    * (`StreamOps.parquetStreamToSnapshot`, maxFilesPerTrigger=1) commits
    * one APPEND snapshot per micro-batch with the (streamId, epochId) txn
    * marker; `StatsView.refresh` folds each epoch's delta. The run
    * "crashes" after epochs 0–1, re-delivers epoch 1 straight into the
    * sink (must be a no-op commit AND a no-op refresh — exactly-once
    * holds through the VIEW, not just the table), then resumes from the
    * checkpoint for epoch 2. The strict oracle is q41's twin VERBATIM: a
    * replayed epoch that double-folds, a missed delta, or a stream commit
    * that breaks the view's append-only contract shifts an exact integer
    * moment and fails the hash. */
  def streamViewIncremental(s: SparkSession, d: String): DataFrame =
    streamViewChain(s, "q114",
      quantNoRipple(Engine.images(s, d)), b => idx % 3 === b,
      (tilesRoot, mvRoot) => graft.operators.StatsView.refresh(s, tilesRoot, mvRoot),
      mvRoot => graft.operators.StatsView.stats(s, mvRoot),
      Seq("count", "mean", "std", "vmin", "vmax"))

  /** q115: the stream → catalog → view chain for the TREND view — same
    * protocol as q114 (crash after epochs 0–1, epoch-1 replay must be a
    * no-op commit AND refresh, checkpoint resume for epoch 2), strict
    * oracle = q42's batch twin verbatim. Together q114/q115 prove BOTH
    * view types advance correctly off streamed epoch commits. */
  def streamTrendIncremental(s: SparkSession, d: String): DataFrame =
    streamViewChain(s, "q115",
      trendSubset(Engine.images(s, d)), b => floor(idx / 9) % 3 === b,
      (tilesRoot, mvRoot) => graft.operators.TrendView.refresh(s, tilesRoot, mvRoot),
      mvRoot => graft.operators.TrendView.trend(s, mvRoot),
      Seq("count", "slope_yr", "intercept", "r2", "t_stat"))

  /** Shared q114/q115 driver: land 3 tile batches as files → stream them
    * into the catalog (one epoch commit per micro-batch) → refresh the
    * view after each stream leg, with the crash/replay/resume protocol
    * described on [[streamViewIncremental]]. */
  private def streamViewChain(s: SparkSession, tag: String, imgs: DataFrame,
                              batchPred: Int => Column,
                              refresh: (String, String) => Long,
                              finished: String => DataFrame,
                              fields: Seq[String]): DataFrame = {
    import java.nio.file.{Files, Paths}
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val base = Files.createTempDirectory(s"graft_$tag").toString
    val srcDir = s"$base/src"; val tilesRoot = s"$base/tiles"
    val ckptDir = s"$base/ckpt"; val mvRoot = s"$base/mv"
    Files.createDirectories(Paths.get(srcDir))
    val streamId = s"${tag}_tiles"
    def tilesOf(b: Int) =
      Warp.warpToTiles(s, imgs.filter(batchPred(b)), target, "near").toDF()
    val tileSchema = tilesOf(0).schema
    def land(b: Int): Unit = {
      val dst = Paths.get(srcDir, s"f$b.parquet")
      writeOneFileParquet(s, tilesOf(b), dst)
      // deterministic pickup order for the file source
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1704067200000L + b * 2000L))
    }
    def label[T](what: String)(body: => T): T = {
      s.sparkContext.setJobDescription(s"$tag $what") // guide §1.5
      try body finally s.sparkContext.setJobDescription(null)
    }
    // the three epoch builds are INDEPENDENT inputs — overlap them (guide
    // §2.6): f0/f1 land concurrently, and f2 is built into a staging path
    // during the leg-1/refresh driver phases (it must stay invisible to
    // the file source until the resume leg) and only MOVED into the
    // source dir at its protocol step. Same files, same mtimes, same
    // pickup order — only the idle driver-phase cores get used.
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    def async(body: => Unit): java.util.concurrent.Future[_] =
      pool.submit(new Runnable { def run(): Unit = body })
    val f2staging = Paths.get(base, "stage_f2.parquet")
    try withFatRowScanConf(s) {
      val l0 = async { land(0) }
      val l1 = async { land(1) }
      val l2 = async { writeOneFileParquet(s, tilesOf(2), f2staging) }
      label("land epochs 0,1") { l0.get(); l1.get() }
      label("stream leg 1") {
        val q1 = graft.streaming.StreamOps.parquetStreamToSnapshot(
          s, srcDir, tilesRoot, ckptDir, streamId, tileSchema)
        q1.processAllAvailable(); q1.stop() // "crash" after epochs 0,1
      }
      require(graft.sources.SnapshotTable.currentVersion(tilesRoot) == 2,
        "expected one snapshot per epoch")
      require(label("refresh epochs 0,1") { refresh(tilesRoot, mvRoot) } == 2)
      // crash-window replay of epoch 1: no-op commit, then no-op refresh
      val replay = label("replay epoch 1") {
        graft.sources.SnapshotTable.commitStreamBatch(
          s, tilesRoot, tilesOf(1), streamId, 1L)
      }
      require(replay.isEmpty, s"replayed epoch 1 must be a no-op, got $replay")
      val vBefore = graft.sources.SnapshotTable.currentVersion(mvRoot)
      require(refresh(tilesRoot, mvRoot) == 2)
      require(graft.sources.SnapshotTable.currentVersion(mvRoot) == vBefore,
        "a refresh after a replayed epoch must not commit")
      label("land epoch 2") {
        l2.get()
        val dst = Paths.get(srcDir, "f2.parquet")
        Files.move(f2staging, dst)
        Files.setLastModifiedTime(dst,
          java.nio.file.attribute.FileTime.fromMillis(1704067200000L + 2 * 2000L))
      }
      label("stream leg 2") {
        val q2 = graft.streaming.StreamOps.parquetStreamToSnapshot(
          s, srcDir, tilesRoot, ckptDir, streamId, tileSchema)
        q2.processAllAvailable(); q2.stop() // resume: only f2 → epoch 2
      }
      require(graft.sources.SnapshotTable.currentVersion(tilesRoot) == 3,
        "resume must deliver exactly the one new epoch")
      require(label("refresh epoch 2") { refresh(tilesRoot, mvRoot) } == 3)
      label("explode + detach") {
        val out = explodeStats(finished(mvRoot), ntx, fields)
        detachViaParquet(s, out)
      }
    } finally {
      // stop any still-running staging build BEFORE deleting its target
      // dir (an abandoned l2 on the failure path would otherwise race the
      // recursive delete)
      pool.shutdownNow()
      pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
      graft.sources.SnapshotTable.deleteRecursively(base)
    }
  }

  /** q110: q42's per-pixel OLS trend, computed INCREMENTALLY — the trend
    * stack lands in a snapshot-catalog table across three commits and a
    * materialized view of the normal-equation moments (Σt, Σt², Σv, Σtv,
    * Σv², count, t-envelope) advances by CDC after each
    * (`TrendView.refresh`); slope/intercept/r²/T0 are then finished from
    * the stored moments by the SAME `TileTrendAgg.finish` as the batch
    * path. The strict oracle is q42's DuckDB twin VERBATIM (exact dyadic t
    * on the 3-hour grid → moment sums associate), so any double-counted
    * replay, missed delta, or wrong old⊕new merge fails the hash. */
  def trendCellsIncremental(s: SparkSession, d: String): DataFrame = {
    val imgs = trendSubset(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val base = java.nio.file.Files.createTempDirectory("graft_q110").toString
    val tilesRoot = s"$base/tiles"; val mvRoot = s"$base/mv"
    try withFatRowScanConf(s) {
      // trendSubset already pins idx % 3 == 0 and drops (idx/3) % 3 == 0
      // (raw fmt) — batch on idx/9 so all three commits are non-empty
      appendBatchesWithRefresh(s, tilesRoot,
        (0 until 3).map(b => Warp.warpToTiles(s,
          imgs.filter(floor(idx / 9) % 3 === b), target, "near").toDF()),
        () => graft.operators.TrendView.refresh(s, tilesRoot, mvRoot))
      // idempotence: nothing new to fold → marker unchanged, no commit
      val vBefore = graft.sources.SnapshotTable.currentVersion(mvRoot)
      require(graft.operators.TrendView.refresh(s, tilesRoot, mvRoot) == 3)
      require(graft.sources.SnapshotTable.currentVersion(mvRoot) == vBefore,
        "a no-op refresh must not commit")
      val out = explodeStats(graft.operators.TrendView.trend(s, mvRoot),
        ntx, Seq("count", "slope_yr", "intercept", "r2", "t_stat"))
      detachViaParquet(s, out)
    } finally graft.sources.SnapshotTable.deleteRecursively(base)
  }

  /** Append-protocol driver shared by q108/q110: commit each warped batch
    * and refresh the view after every commit. Batches are independent
    * inputs, so while batch b commits/refreshes, the warps of b+1.. fill
    * their caches on the idle cores of the driver-side phases (guide
    * §2.6); the commit→refresh protocol itself stays strictly serial. */
  private def appendBatchesWithRefresh(s: SparkSession, tilesRoot: String,
                                       batches: Seq[DataFrame],
                                       refresh: () => Long): Unit = {
    val cached = batches.map(_.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      cached.head.count() // the immediately-needed batch first
      val prefetch = cached.tail.map(df => pool.submit(new Runnable {
        def run(): Unit = { df.count(); () }
      }))
      cached.zipWithIndex.foreach { case (df, b) =>
        if (b > 0) prefetch(b - 1).get() // cached before its commit
        graft.sources.SnapshotTable.commit(s, tilesRoot, df)
        val covered = refresh()
        require(covered == b + 1, s"refresh covered v$covered, expected v${b + 1}")
      }
    } finally {
      pool.shutdownNow()
      pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
      cached.foreach(_.unpersist(blocking = false))
    }
  }

  /** Shared churn driver for q111/q112: land `imgs` in a snapshot tiles
    * table through a NON-APPEND history — append b0, append b1, MERGE that
    * corrupts b0's payloads (+1 on valid pixels), MERGE that restores
    * them, row-level DELETE of b1, re-append of b1, append b2 — refreshing
    * the view after EVERY commit. The final live state equals three plain
    * appends of `imgs`, so the strict oracle is the batch twin verbatim;
    * any adds-only double-count (corrupt kept + restore added), stale
    * deleted moment, or missed recompute leaves the +1 shift or a ghost
    * layer in the exact integer moments and fails the hash. */
  private def churnSnapshots(s: SparkSession, imgs: DataFrame,
                             target: graft.geo.GridSpec, tilesRoot: String,
                             batchOf: Column, batchSql: String,
                             refresh: () => Long): Unit = {
    val ST = graft.sources.SnapshotTable
    // b0's tiles feed three commits (append, corrupt-merge, restore-merge)
    // and b1's two — persist each batch's warp ONCE instead of re-running
    // the image-scan + kernel per consumer (within this invocation only;
    // released in the caller's finally)
    val tileCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def tiles(b: Int): DataFrame = tileCache.getOrElseUpdate(b,
      Warp.warpToTiles(s, imgs.filter(batchOf === b), target, "near").toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def step(v: Long)(commit: => Unit): Unit = {
      commit
      val covered = refresh()
      require(covered == v, s"refresh covered v$covered, expected v$v")
    }
    // b1/b2's warps are independent of the first protocol steps — overlap
    // them (guide §2.6): b0 materializes on the protocol path first (s1
    // needs it now), then the b1/b2 cache fills ride the idle cores of
    // s1/s2's driver-side phases. Registration happens on THIS thread
    // (tileCache is not thread-safe); the background work is only the
    // count() that materializes the already-registered persist.
    Seq(0, 1, 2).foreach(tiles)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    // +1-corruption as a typed map, not a `transform(...)` higher-order
    // expression: HOFs evaluate their lambda INTERPRETED per element
    // (measured ~40 s of executor CPU over the batch's ~9·10⁷ elements);
    // the compiled while-loop is the same arithmetic on the same floats
    val ndvF = graft.sources.ImageTable.Ndv
    import s.implicits._
    def corrupt(df: DataFrame): DataFrame = df.as[graft.operators.TileRow].map { t =>
      val p = new Array[Float](t.payload.length)
      var i = 0
      while (i < p.length) {
        val v = t.payload(i); p(i) = if (v == ndvF) v else v + 1.0f; i += 1
      }
      t.copy(payload = p)
    }.toDF()
    try {
      tiles(0).count() // materialize the immediately-needed batch first
      val prefetch = Seq(1, 2).map(b => pool.submit(new Runnable {
        def run(): Unit = { tiles(b).count(); () }
      }))
      step(1) { ST.commit(s, tilesRoot, tiles(0)) }
      prefetch.head.get() // b1 cached before its commit
      step(2) { ST.commit(s, tilesRoot, tiles(1)) }
      step(3) { ST.merge(s, tilesRoot, corrupt(tiles(0)),
        Seq("image_id", "tile_id")) }
      step(4) { ST.merge(s, tilesRoot, tiles(0), Seq("image_id", "tile_id")) }
      step(5) { ST.delete(s, tilesRoot, expr(s"$batchSql = 1")) }
      step(6) { ST.commit(s, tilesRoot, tiles(1)) }
      prefetch(1).get()
      step(7) { ST.commit(s, tilesRoot, tiles(2)) }
    } finally {
      pool.shutdownNow()
      pool.awaitTermination(60, java.util.concurrent.TimeUnit.SECONDS)
      tileCache.values.foreach(_.unpersist(blocking = false))
    }
  }

  /** q111: q108's incrementally-maintained stack stats, driven through
    * source CHURN (merge/delete/re-append — the [[churnSnapshots]]
    * history) instead of pure appends. The refresh engine must take the
    * recompute path for the churned ranges and the O(delta) path for the
    * appends; the strict oracle is the q41 twin over the same final state
    * (even-index half of the oracle subset). */
  def stackCellsIncrementalChurn(s: SparkSession, d: String): DataFrame = {
    val imgs = quantNoRipple(Engine.images(s, d)).filter(idx % 2 === 0)
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val base = java.nio.file.Files.createTempDirectory("graft_q111").toString
    val tilesRoot = s"$base/tiles"; val mvRoot = s"$base/mv"
    try withFatRowScanConf(s) {
      churnSnapshots(s, imgs, target, tilesRoot,
        floor(idx / 6) % 3,
        "(CAST(substring(image_id, 5, 8) AS INT) DIV 6) % 3",
        () => graft.operators.StatsView.refresh(s, tilesRoot, mvRoot))
      val out = explodeStats(graft.operators.StatsView.stats(s, mvRoot),
        ntx, Seq("count", "mean", "std", "vmin", "vmax"))
      detachViaParquet(s, out)
    } finally graft.sources.SnapshotTable.deleteRecursively(base)
  }

  /** q112: q110's incrementally-maintained OLS trend view, driven through
    * the same churn history; strict oracle = the q42 twin over the final
    * state (even-index trend subset). */
  def trendCellsIncrementalChurn(s: SparkSession, d: String): DataFrame = {
    val imgs = trendSubset(Engine.images(s, d)).filter(idx % 2 === 0)
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val base = java.nio.file.Files.createTempDirectory("graft_q112").toString
    val tilesRoot = s"$base/tiles"; val mvRoot = s"$base/mv"
    try withFatRowScanConf(s) {
      churnSnapshots(s, imgs, target, tilesRoot,
        floor(idx / 18) % 3,
        "(CAST(substring(image_id, 5, 8) AS INT) DIV 18) % 3",
        () => graft.operators.TrendView.refresh(s, tilesRoot, mvRoot))
      val out = explodeStats(graft.operators.TrendView.trend(s, mvRoot),
        ntx, Seq("count", "slope_yr", "intercept", "r2", "t_stat"))
      detachViaParquet(s, out)
    } finally graft.sources.SnapshotTable.deleteRecursively(base)
  }

  /** q42 oracle form: per-pixel OLS slope/intercept/r²/t-stat over the
    * exact-time subset, via TileTrendAgg (diagnostics included). */
  def trendCells(s: SparkSession, d: String): DataFrame = {
    val imgs = trendSubset(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    explodeStats(StackOps.trend(Warp.warpToTiles(s, imgs, target, "near")).toDF(),
      ntx, Seq("count", "slope_yr", "intercept", "r2", "t_stat"))
  }

  /** q47 oracle form: per-pixel difference of the two half-set composites
    * (README flagship warp→composite→diff), emitted long-form. */
  def diffCells(s: SparkSession, d: String): DataFrame = {
    // parity split (not id-range): both composites then cover every cluster,
    // so the diff surface spans the full region instead of a boundary sliver
    val imgs = quantNoRipple(Engine.images(s, d))
    val a = imgs.filter(idx % 2 === 0)
    val b = imgs.filter(idx % 2 === 1)
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val ta = StackOps.compositeMean(Warp.warpToTiles(s, a, target, "near"), label = "a")
    val tb = StackOps.compositeMean(Warp.warpToTiles(s, b, target, "near"), label = "b")
    RasterOps.tileDiff(ta, tb).toDF()
      .select(col("tile_id"),
        posexplode(col("payload")).as(Seq("pidx", "v")))
      .filter(col("v") =!= graft.sources.ImageTable.Ndv)
      .select(
        ((col("tile_id") % ntx) * T + col("pidx") % T).cast("int").as("px"),
        (expr(s"cast(tile_id div $ntx as int)") * T +
          expr(s"cast(pidx div $T as int)")).as("py"),
        col("v").cast("double").as("diff"))
  }

  /** q50 oracle form: the production point-sampling cogroup join over the
    * quantized subset (window median + NMAD are exact on integer payloads). */
  def sampleCells(s: SparkSession, d: String): DataFrame =
    Sampling.pointSample(s,
      PolygonTable.points(s, Engine.nPoints(d) / 4),
      quantNoRipple(Engine.images(s, d)),
      cellSize = 256.0, pad = 1)

  /** q73: exact polygon-union aggregate (GeomUnionAgg trapezoid dissolve)
    * over the rectilinear polygon kinds — union area and extent, which the
    * SQL twin re-derives with an independent slab-scanline rectangle union.
    * Non-rectilinear inputs (C-shapes, donuts, crossing shapes) are covered
    * by the GeomBoolSpec goldens. */
  def geomUnion(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pid = substring(col("poly_id"), 6, 5).cast("int")
    val rects = PolygonTable.generate(s, Engine.nPolys(d))
      .filter(pid % 4 === 0 || pid % 4 === 3)
    rects
      .agg(count(lit(1)).cast("int").as("n_polys"),
           graft.functions.GeomFunctions.geomUnion(col("geom_wkb")).as("u"))
      .as[(Int, Array[Byte])]
      .map { case (n, wkb) =>
        val mp = graft.geo.Wkb.read(wkb)
        val e = mp.bbox
        (n, graft.geo.Geom.area(mp), e.xmin, e.ymin, e.xmax, e.ymax)
      }
      .toDF("n_polys", "area", "xmin", "ymin", "xmax", "ymax")
  }

  /** DuckDB twin of q73: slab-scanline union area of the same closed-form
    * rectangles (PolygonTable.polygon kinds 0 and 3) — every coordinate is
    * an integer, so both engines' area sums are exact. */
  val geomUnionSql: String =
    s"""WITH p AS (SELECT i FROM generate_series(0, ${Fix.nPoly - 1}) t(i) WHERE i % 4 = 0 OR i % 4 = 3),
      |c AS (SELECT i, 500040 + (i * 97) % 8192 AS cx, 5299960 - (i * 53) % 1024 AS cy FROM p),
      |r AS (
      |  SELECT i, cx AS x1, cx + 80 AS x2, cy - 60 AS y1, cy AS y2 FROM c WHERE i % 4 = 0
      |  UNION ALL SELECT i, 499950, 508242, 5298000, 5300050 FROM c WHERE i = 3
      |  UNION ALL SELECT i, cx, cx + 40, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3
      |  UNION ALL SELECT i, cx + 70, cx + 110, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3),
      |xs AS (SELECT DISTINCT x FROM (SELECT x1 AS x FROM r UNION SELECT x2 AS x FROM r)),
      |sl AS (SELECT * FROM (SELECT x AS sx1, lead(x) OVER (ORDER BY x) AS sx2 FROM xs)
      |       WHERE sx2 IS NOT NULL),
      |cov AS (SELECT sl.sx1, sl.sx2, r.y1, r.y2
      |        FROM sl JOIN r ON r.x1 <= sl.sx1 AND r.x2 >= sl.sx2),
      |m AS (SELECT sx1, sx2, y1, y2,
      |        max(y2) OVER (PARTITION BY sx1 ORDER BY y1, y2
      |                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
      |      FROM cov),
      |gi AS (SELECT *, sum(CASE WHEN pmax IS NULL OR y1 > pmax THEN 1 ELSE 0 END)
      |         OVER (PARTITION BY sx1 ORDER BY y1, y2 ROWS UNBOUNDED PRECEDING) AS grp
      |       FROM m),
      |iv AS (SELECT sx1, sx2, grp, min(y1) AS iy1, max(y2) AS iy2
      |       FROM gi GROUP BY sx1, sx2, grp)
      |SELECT (SELECT count(*) FROM p)::INT AS n_polys,
      |  (SELECT sum(CAST(sx2 - sx1 AS DOUBLE) * (iy2 - iy1)) FROM iv) AS area,
      |  (SELECT min(x1)::DOUBLE FROM r) AS xmin, (SELECT min(y1)::DOUBLE FROM r) AS ymin,
      |  (SELECT max(x2)::DOUBLE FROM r) AS xmax, (SELECT max(y2)::DOUBLE FROM r) AS ymax""".stripMargin

  // ---------------------------------------------------------------- SQL twins
  // All literals that are not exactly representable in binary are cast
  // ::DOUBLE (DuckDB parses bare decimals as DECIMAL, whose exact arithmetic
  // diverges from the double chain Scala computes).

  /** Shared fixture CTE: the spread-layout image grid (ImageTable.gridOf +
    * spreadGridOf closed forms) for the sf0.01 driver gate (n = 800),
    * restricted to the oracle subset; target grid + per-image pixel bounds
    * (Warp.analyze min/union + Warp.pixelBounds); valid source pixels with
    * quantized surface values. `trendOnly` narrows to i%3=0. */
  private def cellSql(trendOnly: Boolean, halfFilter: String = ""): String = {
    val subset =
      if (trendOnly) "i % 3 = 0 AND (i // 3) % 3 <> 0"
      else "i % 3 <> 2 AND (i // 3) % 3 <> 0"
    s"""WITH im AS (
       |  SELECT i, (i * 3) % 360 AS day, i % 24 AS hr,
       |    CASE i % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 4 END::DOUBLE AS res,
       |    48 + (i % 4) * 8 AS w, 40 + (i % 5) * 8 AS h,
       |    CASE WHEN i % 5 = 0 THEN 3 ELSE 0 END AS marg,
       |    (500000 + (i % 7) * 10 + ((i // 20) % 32) * 256)::DOUBLE AS ulx,
       |    (5300000 - (i % 5) * 8 - ((i // 20) // 32) * 256)::DOUBLE AS uly
       |  FROM generate_series(0, ${Fix.nImg - 1}) t(i)
       |  WHERE $subset $halfFilter),
       |tgt AS (
       |  SELECT min(ulx) AS tulx, max(uly) AS tuly, min(res) AS tres,
       |    round((max(ulx + w * res) - min(ulx)) / min(res))::INT AS ns,
       |    round((max(uly) - min(uly - h * res)) / min(res))::INT AS nl
       |  FROM im),
       |b AS (
       |  SELECT im.*, tulx, tuly, tres, ns, nl,
       |    greatest(0, floor((greatest(ulx, tulx) - tulx) / tres))::INT AS px0,
       |    least(ns - 1, ceil((least(ulx + w * res, tulx + ns * tres) - tulx) / tres)::INT - 1) AS px1,
       |    greatest(0, floor((tuly - least(uly, tuly)) / tres))::INT AS py0,
       |    least(nl - 1, ceil((tuly - greatest(uly - h * res, tuly - nl * tres)) / tres)::INT - 1) AS py1
       |  FROM im, tgt),
       |bx AS (SELECT b.*, unnest(generate_series(px0, px1)) AS x FROM b),
       |bxy AS (SELECT bx.*, unnest(generate_series(py0, py1)) AS y FROM bx),
       |src AS (
       |  SELECT i, day, hr, res, w, h, marg, ulx, uly, x, y,
       |    CASE WHEN i % 3 = 0 THEN x + round((tulx - ulx) / tres)::INT
       |         ELSE floor(((tulx + (x + 0.5::DOUBLE) * tres - ulx) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
       |    END AS sx,
       |    CASE WHEN i % 3 = 0 THEN y + round((uly - tuly) / tres)::INT
       |         ELSE floor(((uly - (tuly - (y + 0.5::DOUBLE) * tres)) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
       |    END AS sy
       |  FROM bxy),
       |cells AS (
       |  SELECT i, day, hr, x, y,
       |    greatest(1, least(255, round_even(
       |      (120.0::DOUBLE + 0.05::DOUBLE * day
       |        + 0.01::DOUBLE * ((ulx + (sx + 0.5::DOUBLE) * res) - 500000.0::DOUBLE))
       |        - 0.005::DOUBLE * (5300000.0::DOUBLE - (uly - (sy + 0.5::DOUBLE) * res)), 0)))::INT AS v
       |  FROM src
       |  WHERE sx >= marg AND sy >= marg AND sx < w - marg AND sy < h - marg)""".stripMargin
  }

  /** Finishing SELECT shared by the q41 twin and its churn variant (q111):
    * grouped exact sums reproduce TileStatsAgg.finish. */
  private val stackSelect: String =
    s"""SELECT x AS px, y AS py, count(*)::INT AS n,
       |  CAST(CAST(CAST(sum(v) AS DOUBLE) / count(*) AS FLOAT) AS DOUBLE) AS mean,
       |  CASE WHEN count(*) <= 1 THEN CAST(-9999.0::FLOAT AS DOUBLE)
       |       ELSE CAST(CAST(sqrt(greatest(0.0::DOUBLE,
       |              CAST(sum(v * v) AS DOUBLE) / count(*)
       |              - (CAST(sum(v) AS DOUBLE) / count(*)) * (CAST(sum(v) AS DOUBLE) / count(*))))
       |            AS FLOAT) AS DOUBLE) END AS std,
       |  CAST(min(v) AS DOUBLE) AS vmin, CAST(max(v) AS DOUBLE) AS vmax
       |FROM cells GROUP BY x, y""".stripMargin

  /** DuckDB twin of q41. */
  val stackCellsSql: String =
    s"""${cellSql(trendOnly = false)}
       |$stackSelect""".stripMargin

  /** DuckDB twin of q111: the SAME finishing arithmetic over the churn
    * fixture's even-index half — the Spark side drives the stats view
    * through merge/delete/re-append churn whose FINAL live state equals
    * this subset, so any double-count/stale-moment bug fails the hash. */
  val stackCellsChurnSql: String =
    s"""${cellSql(trendOnly = false, halfFilter = "AND i % 2 = 0")}
       |$stackSelect""".stripMargin

  /** Normal-equation tail shared by the q42 twin and its churn variant
    * (q112): the TileTrendAgg.finish chain, op-for-op (every intermediate
    * is the same correctly-rounded double). */
  private val trendTail: String =
    s""",
       |ts AS (
       |  SELECT x, y, v,
       |    CAST(((19723 + day) * 86400 + hr * 3600)::BIGINT * 1000000 AS DOUBLE)
       |      / 86400000000.0::DOUBLE - 20000.0::DOUBLE AS t
       |  FROM cells),
       |g AS (
       |  SELECT x, y, count(*)::INT AS n,
       |    sum(t) AS st, sum(t * t) AS stt,
       |    sum(CAST(v AS DOUBLE)) AS sy, sum(t * v) AS sty,
       |    sum(CAST(v AS DOUBLE) * v) AS syy
       |  FROM ts GROUP BY x, y),
       |f AS (
       |  SELECT x, y, n, st, stt, sy, sty, syy,
       |    n * stt - st * st AS det,
       |    (n * sty - st * sy) / nullif(n * stt - st * st, 0.0) AS sl,
       |    stt - st * st / n AS sxx, sty - st * sy / n AS sxy,
       |    syy - sy * sy / n AS syyc
       |  FROM g)
       |SELECT x AS px, y AS py, n,
       |  CASE WHEN n >= 2 AND det <> 0.0
       |       THEN CAST(CAST(sl * 365.25::DOUBLE AS FLOAT) AS DOUBLE)
       |       ELSE -9999.0 END AS slope_yr,
       |  CASE WHEN n >= 2 AND det <> 0.0
       |       THEN CAST(CAST((sy - sl * st) / n - sl * 20000.0::DOUBLE AS FLOAT) AS DOUBLE)
       |       ELSE -9999.0 END AS intercept,
       |  CASE WHEN n >= 2 AND det <> 0.0 AND syyc > 0.0
       |       THEN CAST(CAST(sl * sxy / syyc AS FLOAT) AS DOUBLE)
       |       ELSE -9999.0 END AS r2,
       |  CASE WHEN n >= 2 AND det <> 0.0 AND n > 2 AND syyc - sl * sxy > 0.0
       |       THEN CAST(CAST(sl / sqrt((syyc - sl * sxy) / (n - 2) / sxx) AS FLOAT) AS DOUBLE)
       |       ELSE -9999.0 END AS t_stat
       |FROM f""".stripMargin

  /** DuckDB twin of q42. */
  val trendCellsSql: String = cellSql(trendOnly = true) + trendTail

  /** DuckDB twin of q112 (trend-view churn, even-index trend subset). */
  val trendCellsChurnSql: String =
    cellSql(trendOnly = true, halfFilter = "AND i % 2 = 0") + trendTail

  /** DuckDB twin of q47: per-side exact composite means → float32 diff. */
  val diffCellsSql: String = {
    def side(name: String, filter: String): String =
      s"""$name AS (
         |  SELECT x, y, CAST(CAST(sum(v) AS DOUBLE) / count(*) AS FLOAT) AS m
         |  FROM cells WHERE $filter GROUP BY x, y)""".stripMargin
    s"""${cellSql(trendOnly = false)},
       |${side("ca", "i % 2 = 0")},
       |${side("cb", "i % 2 = 1")}
       |SELECT ca.x AS px, ca.y AS py,
       |  CAST(CAST(CAST(ca.m AS DOUBLE) - CAST(cb.m AS DOUBLE) AS FLOAT) AS DOUBLE) AS diff
       |FROM ca JOIN cb ON ca.x = cb.x AND ca.y = cb.y""".stripMargin
  }

  /** DuckDB twin of q50: containment join + 3×3 window median/NMAD on the
    * image grids directly (no warp — pointSample reads source pixels). */
  val sampleCellsSql: String =
    s"""WITH im AS (
       |  SELECT i,
       |    printf('img_%08d_%s_%02d00', i,
       |      strftime(DATE '2024-01-01' + INTERVAL ((i * 3) % 360) DAY, '%Y%m%d'),
       |      i % 24) AS image_id,
       |    (i * 3) % 360 AS day,
       |    CASE i % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 4 END::DOUBLE AS res,
       |    48 + (i % 4) * 8 AS w, 40 + (i % 5) * 8 AS h,
       |    CASE WHEN i % 5 = 0 THEN 3 ELSE 0 END AS marg,
       |    (500000 + (i % 7) * 10 + ((i // 20) % 32) * 256)::DOUBLE AS ulx,
       |    (5300000 - (i % 5) * 8 - ((i // 20) // 32) * 256)::DOUBLE AS uly
       |  FROM generate_series(0, ${Fix.nImg - 1}) t(i)
       |  WHERE i % 3 <> 2 AND (i // 3) % 3 <> 0),
       |pt AS (
       |  SELECT printf('pt_%07d', i) AS pt_id,
       |    (499900 + (i * 131) % 8592)::DOUBLE AS x,
       |    (5300100 - (i * 71) % 2400)::DOUBLE AS y
       |  FROM generate_series(0, ${Fix.nImg * 50 / 4 - 1}) t(i)),
       |hit AS (
       |  SELECT pt.pt_id, pt.x, pt.y, im.*,
       |    floor(((pt.x - im.ulx) / im.res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT AS cx,
       |    floor(((im.uly - pt.y) / im.res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT AS cy
       |  FROM pt, im
       |  WHERE pt.x >= im.ulx AND pt.x <= im.ulx + im.w * im.res
       |    AND pt.y >= im.uly - im.h * im.res AND pt.y <= im.uly),
       |win AS (
       |  SELECT h.pt_id, h.image_id, h.x, h.y,
       |    greatest(1, least(255, round_even(
       |      (120.0::DOUBLE + 0.05::DOUBLE * day
       |        + 0.01::DOUBLE * ((ulx + (cx + dx + 0.5::DOUBLE) * res) - 500000.0::DOUBLE))
       |        - 0.005::DOUBLE * (5300000.0::DOUBLE - (uly - (cy + dy + 0.5::DOUBLE) * res)), 0)))::INT AS v
       |  FROM hit h, unnest([-1, 0, 1]) tx(dx), unnest([-1, 0, 1]) ty(dy)
       |  WHERE cx + dx >= marg AND cx + dx < w - marg
       |    AND cy + dy >= marg AND cy + dy < h - marg),
       |med AS (
       |  SELECT pt_id, image_id, any_value(x) AS x, any_value(y) AS y,
       |    quantile_cont(v, 0.5) AS m, count(*)::INT AS n
       |  FROM win GROUP BY pt_id, image_id
       |  HAVING count(*) >= 5)
       |SELECT w.pt_id, w.image_id, any_value(m.x) AS x, any_value(m.y) AS y,
       |  any_value(m.m) AS samp_med,
       |  1.4826::DOUBLE * quantile_cont(abs(w.v - m.m), 0.5) AS samp_nmad,
       |  any_value(m.n) AS samp_count
       |FROM win w JOIN med m ON w.pt_id = m.pt_id AND w.image_id = m.image_id
       |GROUP BY w.pt_id, w.image_id""".stripMargin

  /** DuckDB twin of q52: ids rebuilt via strftime, parsed epoch µs closed
    * form — verifies the TimeParse regex cascade independently. */
  val idDatesSql: String =
    s"""WITH im AS (
      |  SELECT i, (i * 3) % 360 AS day, i % 24 AS hr FROM generate_series(0, ${Fix.nImg - 1}) t(i))
      |SELECT printf('img_%08d_%s_%02d00', i,
      |         strftime(DATE '2024-01-01' + INTERVAL (day) DAY, '%Y%m%d'), hr) AS image_id,
      |  ((19723 + day) * 86400 + hr * 3600)::BIGINT * 1000000 AS parsed_us
      |FROM im""".stripMargin

  /** DuckDB twin of q69: get_sub_dim decimation arithmetic (iolib.py:164-247). */
  val subsampleSql: String =
    s"""WITH im AS (
      |  SELECT i,
      |    printf('img_%08d_%s_%02d00', i,
      |      strftime(DATE '2024-01-01' + INTERVAL ((i * 3) % 360) DAY, '%Y%m%d'),
      |      i % 24) AS image_id,
      |    CASE i % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 4 END::DOUBLE AS res,
      |    48 + (i % 4) * 8 AS w, 40 + (i % 5) * 8 AS h
      |  FROM generate_series(0, ${Fix.nImg - 1}) t(i)),
      |sc AS (SELECT *, greatest(w / 48.0::DOUBLE, h / 48.0::DOUBLE) AS scale FROM im)
      |SELECT image_id, w, h,
      |  CASE WHEN greatest(w, h) <= 48 THEN w ELSE round_even(w / scale, 0)::INT END AS sub_w,
      |  CASE WHEN greatest(w, h) <= 48 THEN h ELSE round_even(h / scale, 0)::INT END AS sub_h,
      |  CASE WHEN greatest(w, h) <= 48 THEN res ELSE res * scale END AS sub_res
      |FROM sc""".stripMargin

  /** q76 oracle form: per-pixel Theil–Sen (median of pairwise slopes,
    * `ma_linreg` robust variant malib.py:960-998) over the exact-time
    * subset, clipped to the 4×4 top-left tile window to bound the O(n²)
    * pairs. Bit-exact cross-engine because every slope is ONE correctly-
    * rounded division of exact operands (Δv integer, Δt a 3-fraction-bit
    * dyadic), sorting identical doubles is engine-independent, and the
    * even-count median (a+b)/2 is one rounded add + an exact halving —
    * which the SQL twin reproduces with explicit order statistics instead
    * of DuckDB's interpolating `median` (a + (b-a)·0.5 rounds differently). */
  def theilSenCells(s: SparkSession, d: String): DataFrame = {
    val imgs = trendSubset(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val tiles = StackOps.stackClip(Warp.warpToTiles(s, imgs, target, "near"), 0, 0, 3, 3)
    StackOps.theilSen(StackOps.toCells(tiles))
      .select(
        expr(s"cast((cell_id div $T2) % $ntx as int) * $T + cast((cell_id % $T2) % $T as int)").as("px"),
        expr(s"cast((cell_id div $T2) div $ntx as int) * $T + cast((cell_id % $T2) div $T as int)").as("py"),
        col("n"),
        nanvl(col("slope_yr"), lit(-9999.0)).as("slope_yr"),
        nanvl(col("intercept"), lit(-9999.0)).as("intercept"))
  }

  /** DuckDB twin of q76: pairwise-slope self-join + exact-order-statistic
    * medians (rank (cnt+1)//2 and cnt//2+1; they coincide for odd counts). */
  val theilSenCellsSql: String = {
    def medCte(src: String, vcol: String, out: String): String =
      s"""${src}_r AS (SELECT x, y, $vcol,
         |    row_number() OVER (PARTITION BY x, y ORDER BY $vcol) AS rn,
         |    count(*) OVER (PARTITION BY x, y) AS cnt FROM $src),
         |$out AS (SELECT x, y,
         |    sum($vcol) FILTER (WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1) /
         |    count(*) FILTER (WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1) AS m
         |  FROM ${src}_r GROUP BY x, y)""".stripMargin
    s"""${cellSql(trendOnly = true)},
       |w AS (SELECT i, x, y, v::DOUBLE AS v,
       |    CAST(((19723 + day) * 86400 + hr * 3600)::BIGINT * 1000000 AS DOUBLE)
       |      / 86400000000.0::DOUBLE AS t
       |  FROM cells WHERE x < 256 AND y < 256),
       |g AS (SELECT x, y, count(*)::INT AS n, count(DISTINCT t) AS ndt
       |      FROM w GROUP BY x, y),
       |sl AS (SELECT a.x, a.y, (b.v - a.v) / (b.t - a.t) AS sv
       |       FROM w a JOIN w b ON a.x = b.x AND a.y = b.y AND a.t < b.t),
       |${medCte("sl", "sv", "med")},
       |ic AS (SELECT w.x, w.y, w.v - med.m * w.t AS sv
       |       FROM w JOIN med ON w.x = med.x AND w.y = med.y),
       |${medCte("ic", "sv", "icm")}
       |SELECT g.x AS px, g.y AS py, g.n,
       |  CASE WHEN g.n >= 2 AND g.ndt >= 2
       |       THEN med.m * 365.25::DOUBLE ELSE -9999.0::DOUBLE END AS slope_yr,
       |  CASE WHEN g.n >= 2 AND g.ndt >= 2
       |       THEN icm.m ELSE -9999.0::DOUBLE END AS intercept
       |FROM g LEFT JOIN med ON g.x = med.x AND g.y = med.y
       |       LEFT JOIN icm ON g.x = icm.x AND g.y = icm.y""".stripMargin
  }

  /** q77 oracle form: polygon-density heatmap (`geolib.py:2226-2244`) over
    * the rectilinear polygon kinds — the production covering-cell + PIP
    * pipeline; on axis-aligned boxes the ray-crossing rule reduces to the
    * half-open [xmin,xmax)×[ymin,ymax) center test the SQL twin applies
    * (all coordinates and cell centers are exact doubles). */
  def heatmapRects(s: SparkSession, d: String): DataFrame = {
    val pid = substring(col("poly_id"), 6, 5).cast("int")
    graft.operators.SpatialJoin.heatmap(s,
      PolygonTable.generate(s, Engine.nPolys(d))
        .filter(pid % 4 === 0 || pid % 4 === 3),
      cellSize = 64.0)
  }

  /** DuckDB twin of q77: same rectangle rows as the q73 twin, covering-cell
    * enumeration on the 64 m grid, half-open center containment, packed
    * cell id ((cx+2³⁰)·2³¹ + (cy+2³⁰), PlanarCell.pack). */
  val heatmapRectsSql: String =
    s"""WITH p AS (SELECT i FROM generate_series(0, ${Fix.nPoly - 1}) t(i) WHERE i % 4 = 0 OR i % 4 = 3),
      |c AS (SELECT i, 500040 + (i * 97) % 8192 AS cx, 5299960 - (i * 53) % 1024 AS cy FROM p),
      |r AS (
      |  SELECT i, cx AS x1, cx + 80 AS x2, cy - 60 AS y1, cy AS y2 FROM c WHERE i % 4 = 0
      |  UNION ALL SELECT i, 499950, 508242, 5298000, 5300050 FROM c WHERE i = 3
      |  UNION ALL SELECT i, cx, cx + 40, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3
      |  UNION ALL SELECT i, cx + 70, cx + 110, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3),
      |gx AS (SELECT r.*, unnest(generate_series(x1 // 64, x2 // 64)) AS cgx FROM r),
      |gxy AS (SELECT gx.*, unnest(generate_series(y1 // 64, y2 // 64)) AS cgy FROM gx),
      |hit AS (SELECT DISTINCT i, cgx, cgy FROM gxy
      |        WHERE (cgx + 0.5::DOUBLE) * 64 >= x1 AND (cgx + 0.5::DOUBLE) * 64 < x2
      |          AND (cgy + 0.5::DOUBLE) * 64 >= y1 AND (cgy + 0.5::DOUBLE) * 64 < y2)
      |SELECT (cgx + 1073741824) * 2147483648 + (cgy + 1073741824) AS cell_id,
      |       count(*)::BIGINT AS n_polys
      |FROM hit GROUP BY cgx, cgy""".stripMargin

  /** Vertical-edge table of EVERY polygon kind (all rectilinear —
    * PolygonTable.polygon closed forms at sf0.01): one row per vertical
    * edge (xe, ylo, yhi). Even-odd ray crossing over these edges IS the
    * engine's `ringContains` on rectilinear rings: a rightward ray from
    * (px, py) crosses a vertical edge iff ylo <= py < yhi AND px < xe
    * (horizontal edges never satisfy (yi>py) != (yj>py)); the donut hole
    * and the disjoint multipolygon boxes fall out of crossing PARITY. */
  private val polyEdgesSql: String =
    s"""c AS (SELECT i, printf('poly_%05d', i) AS poly_id,
      |        500040 + (i * 97) % 8192 AS cx, 5299960 - (i * 53) % 1024 AS cy
      |      FROM generate_series(0, ${Fix.nPoly - 1}) t(i)),
      |e AS (
      |  SELECT i, poly_id, cx AS xe, cy - 60 AS ylo, cy AS yhi FROM c WHERE i % 4 = 0
      |  UNION ALL SELECT i, poly_id, cx + 80, cy - 60, cy FROM c WHERE i % 4 = 0
      |  UNION ALL SELECT i, poly_id, cx, cy - 100, cy FROM c WHERE i % 4 = 1
      |  UNION ALL SELECT i, poly_id, cx + 40, cy - 70, cy - 30 FROM c WHERE i % 4 = 1
      |  UNION ALL SELECT i, poly_id, cx + 100, cy - 100, cy - 70 FROM c WHERE i % 4 = 1
      |  UNION ALL SELECT i, poly_id, cx + 100, cy - 30, cy FROM c WHERE i % 4 = 1
      |  UNION ALL SELECT i, poly_id, cx, cy - 90, cy FROM c WHERE i % 4 = 2
      |  UNION ALL SELECT i, poly_id, cx + 90, cy - 90, cy FROM c WHERE i % 4 = 2
      |  UNION ALL SELECT i, poly_id, cx + 25, cy - 65, cy - 25 FROM c WHERE i % 4 = 2
      |  UNION ALL SELECT i, poly_id, cx + 65, cy - 65, cy - 25 FROM c WHERE i % 4 = 2
      |  UNION ALL SELECT i, poly_id, 499950, 5298000, 5300050 FROM c WHERE i = 3
      |  UNION ALL SELECT i, poly_id, 508242, 5298000, 5300050 FROM c WHERE i = 3
      |  UNION ALL SELECT i, poly_id, cx, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3
      |  UNION ALL SELECT i, poly_id, cx + 40, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3
      |  UNION ALL SELECT i, poly_id, cx + 70, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3
      |  UNION ALL SELECT i, poly_id, cx + 110, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3)""".stripMargin

  /** DuckDB twin of q43 (the flagship PIP join, ALL polygon kinds): points
    * inside by crossing parity, grouped per polygon. z is dyadic → the sum
    * is exact and z_mean is one correctly-rounded division. */
  val pipPointsSql: String =
    s"""WITH pt AS (SELECT i, printf('pt_%07d', i) AS pt_id,
       |    (499900 + (i * 131) % 8592)::DOUBLE AS x,
       |    (5300100 - (i * 71) % 2400)::DOUBLE AS y,
       |    100 + i % 50 + 0.25::DOUBLE * (i % 7) AS z
       |  FROM generate_series(0, ${Fix.nImg * 50 - 1}) t(i)),
       |$polyEdgesSql,
       |hit AS (
       |  SELECT pt.pt_id, e.poly_id, any_value(pt.z) AS z
       |  FROM pt JOIN e ON pt.y >= e.ylo AND pt.y < e.yhi AND pt.x < e.xe
       |  GROUP BY pt.pt_id, e.poly_id
       |  HAVING count(*) % 2 = 1)
       |SELECT poly_id, count(*)::BIGINT AS n_pts, sum(z) / count(*) AS z_mean
       |FROM hit GROUP BY poly_id""".stripMargin

  /** DuckDB twin of q44 (heatmap over ALL polygon kinds): covering cells
    * from the per-polygon edge bbox, center-inside by crossing parity,
    * packed PlanarCell ids. */
  val heatmapCellsSql: String =
    s"""WITH $polyEdgesSql,
       |bb AS (SELECT i, min(xe) AS x1, max(xe) AS x2, min(ylo) AS y1, max(yhi) AS y2
       |       FROM e GROUP BY i),
       |gx AS (SELECT bb.*, unnest(generate_series(x1 // 64, x2 // 64)) AS cgx FROM bb),
       |gxy AS (SELECT gx.*, unnest(generate_series(y1 // 64, y2 // 64)) AS cgy FROM gx),
       |hit AS (
       |  SELECT g.i, g.cgx, g.cgy
       |  FROM gxy g JOIN e ON e.i = g.i
       |    AND (g.cgy + 0.5::DOUBLE) * 64 >= e.ylo AND (g.cgy + 0.5::DOUBLE) * 64 < e.yhi
       |    AND (g.cgx + 0.5::DOUBLE) * 64 < e.xe
       |  GROUP BY g.i, g.cgx, g.cgy
       |  HAVING count(*) % 2 = 1)
       |SELECT (cgx + 1073741824) * 2147483648 + (cgy + 1073741824) AS cell_id,
       |       count(*)::BIGINT AS n_polys
       |FROM hit GROUP BY cgx, cgy""".stripMargin

  /** Image-grid CTE with the formatted id (ImageTable closed forms at the
    * sf0.01 driver scale; `where` narrows to an oracle subset). */
  private def imSql(where: String = "TRUE"): String =
    s"""WITH im AS (
       |  SELECT i,
       |    printf('img_%08d_%s_%02d00', i,
       |      strftime(DATE '2024-01-01' + INTERVAL ((i * 3) % 360) DAY, '%Y%m%d'),
       |      i % 24) AS image_id,
       |    (i * 3) % 360 AS day,
       |    CASE i % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 4 END::DOUBLE AS res,
       |    48 + (i % 4) * 8 AS w, 40 + (i % 5) * 8 AS h,
       |    CASE WHEN i % 5 = 0 THEN 3 ELSE 0 END AS marg,
       |    (500000 + (i % 7) * 10 + ((i // 20) % 32) * 256)::DOUBLE AS ulx,
       |    (5300000 - (i % 5) * 8 - ((i // 20) // 32) * 256)::DOUBLE AS uly
       |  FROM generate_series(0, ${Fix.nImg - 1}) t(i)
       |  WHERE $where)""".stripMargin

  /** DuckDB twin of q49: NDV margins are the ONLY invalid pixels in source
    * images (ImageTable.renderPixels), so trim bounds are closed-form and
    * the per-column outline ring has 2·w_trim+1 points → WKB polygon length
    * 1+4+4+4 + 16·n = 29 + 32·w_trim. A bug anywhere in the decode → trim →
    * outline → WKB chain breaks the hash. */
  val outlinesSql: String =
    s"""${imSql()}
       |SELECT image_id,
       |  (w - 2 * marg)::INT AS w_trim, (h - 2 * marg)::INT AS h_trim,
       |  ulx + marg * res AS ulx_trim, uly - marg * res AS uly_trim,
       |  (29 + 32 * (w - 2 * marg))::INT AS outline_wkb_len
       |FROM im""".stripMargin

  /** DuckDB twin of q70: raw ring 2·validCols+1; the 2-px Douglas-Peucker
    * simplify and the convex hull of a rectangle outline both collapse to
    * the 4 corners + closing point. */
  val outlineSimplifySql: String =
    s"""${imSql()}
       |SELECT image_id, (2 * (w - 2 * marg) + 1)::INT AS n_raw,
       |  5::INT AS n_simplified, 5::INT AS n_hull
       |FROM im""".stripMargin

  /** DuckDB twin of q54: every thumbnail is 8×8 raw float32 = 256 bytes —
    * the constant pins the resize plumbing's output shape per image id. */
  val imgResizeSql: String =
    s"""${imSql()}
       |SELECT image_id, 8::INT AS w, 8::INT AS h, 256::INT AS n_bytes FROM im""".stripMargin

  /** DuckDB twin of q57: the checkpointed tiling job's per-stage lineage
    * row counts re-derived from the q63-proven pixel-bounds arithmetic on
    * the first-400-images spread grid. Tiles with NO valid pixel are not
    * emitted by the warp (NDV-margin images shed edge tiles), so tile
    * ranges come from the VALID-pixel bounds — enumerated with the same
    * source-index mapping the cellSql twin uses, validity filtered by the
    * margin test. (Resume SEMANTICS stay under CheckpointSpec; the twin
    * pins the stage outputs.) */
  val resumableJobSql: String =
    warpGridSql(399) + """,
      |src AS (
      |  SELECT i, marg, w, h, x, y,
      |    CASE WHEN i % 3 = 0 THEN x + round((tulx - ulx) / tres)::INT
      |         ELSE floor(((tulx + (x + 0.5::DOUBLE) * tres - ulx) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sx,
      |    CASE WHEN i % 3 = 0 THEN y + round((uly - tuly) / tres)::INT
      |         ELSE floor(((uly - (tuly - (y + 0.5::DOUBLE) * tres)) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sy
      |  FROM bxy),
      |v AS (SELECT i, min(x) AS vx0, max(x) AS vx1, min(y) AS vy0, max(y) AS vy1
      |      FROM src
      |      WHERE sx >= marg AND sy >= marg AND sx < w - marg AND sy < h - marg
      |      GROUP BY i),
      |tx AS (SELECT v.i, unnest(generate_series(vx0 // 64, vx1 // 64)) AS tx, vy0, vy1 FROM v),
      |txy AS (SELECT i, tx, unnest(generate_series(vy0 // 64, vy1 // 64)) AS ty FROM tx)
      |SELECT 'images' AS stage, 400::BIGINT AS "rows"
      |UNION ALL SELECT 'stack_stats', count(DISTINCT (tx, ty)) FROM txy
      |UNION ALL SELECT 'tiles', count(*) FROM txy
      |UNION ALL SELECT 'trend', count(DISTINCT (tx, ty)) FROM txy""".stripMargin

  /** q78 oracle form: multimodal feature extraction (`Multimodal
    * .imageFeatures`) on the quantized subset — decode → per-image validity
    * fraction, brightness mean/min-max histogram. Emits only the columns
    * whose arithmetic is a fixed chain of correctly-rounded ops on exact
    * operands (px_std and ahash accumulate in array order → engine-specific;
    * they stay under the q53 golden). */
  def imgFeatureStats(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.imageFeatures(s, quantNoRipple(Engine.images(s, d)))
      .select(col("image_id"), col("w"), col("h"), col("valid_frac"),
              col("px_mean"), col("h0"), col("h1"), col("h2"), col("h3"))

  /** DuckDB twin of q78: source-grid pixel values from the quantized
    * closed form; 4-bin histogram binned in double exactly as the engine
    * ((v-mn)/(mx-mn)·4 truncated; ·4 is exact, division correctly rounded
    * identically in both engines). */
  val imgFeatureStatsSql: String =
    s"""${imSql("i % 3 <> 2 AND (i // 3) % 3 <> 0")},
       |px AS (SELECT im.*, unnest(generate_series(marg, w - marg - 1)) AS sx FROM im),
       |pxy AS (SELECT px.*, unnest(generate_series(marg, h - marg - 1)) AS sy FROM px),
       |v AS (
       |  SELECT image_id, w, h,
       |    greatest(1, least(255, round_even(
       |      (120.0::DOUBLE + 0.05::DOUBLE * day
       |        + 0.01::DOUBLE * ((ulx + (sx + 0.5::DOUBLE) * res) - 500000.0::DOUBLE))
       |        - 0.005::DOUBLE * (5300000.0::DOUBLE - (uly - (sy + 0.5::DOUBLE) * res)), 0)))::INT AS v
       |  FROM pxy),
       |g AS (SELECT image_id, min(w) AS w, min(h) AS h, count(*) AS n,
       |        sum(v) AS sv, min(v) AS mn, max(v) AS mx
       |      FROM v GROUP BY image_id),
       |b AS (SELECT v.image_id,
       |        CASE WHEN g.mx > g.mn
       |             THEN least(3, floor(CAST(v.v - g.mn AS DOUBLE)
       |                                 / (g.mx - g.mn) * 4)::INT)
       |             ELSE -1 END AS bin
       |      FROM v JOIN g USING (image_id))
       |SELECT g.image_id, g.w::INT AS w, g.h::INT AS h,
       |  CAST(g.n AS DOUBLE) / (g.w * g.h) AS valid_frac,
       |  CAST(g.sv AS DOUBLE) / g.n AS px_mean,
       |  coalesce(sum(CASE WHEN bin = 0 THEN 1 END), 0)::BIGINT AS h0,
       |  coalesce(sum(CASE WHEN bin = 1 THEN 1 END), 0)::BIGINT AS h1,
       |  coalesce(sum(CASE WHEN bin = 2 THEN 1 END), 0)::BIGINT AS h2,
       |  coalesce(sum(CASE WHEN bin = 3 THEN 1 END), 0)::BIGINT AS h3
       |FROM g JOIN b USING (image_id)
       |GROUP BY g.image_id, g.w, g.h, g.n, g.sv""".stripMargin

  /** q81 oracle form: the FULL multimodal feature row (q53's columns —
    * valid_frac, mean, std, 4-bin histogram AND the 64-bit aHash) on the
    * quantized no-ripple subset, where every emitted value is a fixed chain
    * of correctly-rounded IEEE ops on exact integer operands: Σv and Σv²
    * are exact (moment-form std, Multimodal.imageFeatures), block sums in
    * the aHash are exact ints, the block-mean-of-means is a fixed-order
    * 64-term fold the twin replays with an ordered list_reduce, and the
    * threshold bits are exact comparisons. q53 (full set, ripple + float
    * payloads) stays golden-verified. */
  def imgFeaturesExact(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.imageFeatures(s, quantNoRipple(Engine.images(s, d)))

  /** DuckDB twin of q81: pixel closed form (the q78-proven v CTE) +
    * moment-form mean/std + histogram + full aHash replay — 8×8 block
    * means, ordered-fold global mean (list_reduce = the engine's i-ascending
    * fold from 0.0), bit i set iff blockmean_i >= mean; bit 63 is added as
    * the BIGINT min to dodge the 1<<63 overflow check. */
  /** Shared CTE prefix for the multimodal exact twins (q81/q82): quantized
    * no-ripple images → per-pixel closed-form values v (the q78-proven
    * chain, with fmt carried). */
  private val featurePxSql: String =
    s"""${imSql("i % 3 <> 2 AND (i // 3) % 3 <> 0")},
       |px AS (SELECT im.*,
       |    CASE ((i // 3) % 3) WHEN 1 THEN 'png' ELSE 'bmp' END AS fmt,
       |    unnest(generate_series(marg, w - marg - 1)) AS sx FROM im),
       |pxy AS (SELECT px.*, unnest(generate_series(marg, h - marg - 1)) AS sy FROM px),
       |v AS (
       |  SELECT image_id, fmt, w, h, sx, sy,
       |    greatest(1, least(255, round_even(
       |      (120.0::DOUBLE + 0.05::DOUBLE * day
       |        + 0.01::DOUBLE * ((ulx + (sx + 0.5::DOUBLE) * res) - 500000.0::DOUBLE))
       |        - 0.005::DOUBLE * (5300000.0::DOUBLE - (uly - (sy + 0.5::DOUBLE) * res)), 0)))::INT AS v
       |  FROM pxy)""".stripMargin

  /** aHash replay CTEs appended after `v` (bm → am → ah): 8×8 block means,
    * ordered-fold global mean (list_reduce = the engine's i-ascending fold
    * from 0.0), bit i set iff blockmean_i >= mean; bit 63 is added as the
    * BIGINT min to dodge DuckDB's 1<<63 overflow check. NOTE: `ahash` comes
    * out of sum() as HUGEINT — consumers doing bitwise work MUST cast
    * ::BIGINT first, or xor on mixed-sign int128 pairs adds 64 phantom
    * sign-extension bits to bit_count (measured: silently dropped 1,115 of
    * 14,206 q82 pairs). */
  private val ahashCteSql: String =
    """bm AS (SELECT image_id, (least(7, sy * 8 // h) * 8 + least(7, sx * 8 // w)) AS bi,
      |        CAST(sum(v)::BIGINT AS DOUBLE) / count(*) AS m
      |      FROM v GROUP BY image_id, least(7, sy * 8 // h) * 8 + least(7, sx * 8 // w)),
      |am AS (SELECT image_id,
      |        list_reduce(list(m ORDER BY bi), (a, b) -> a + b) / count(*) AS bmean
      |      FROM bm GROUP BY image_id),
      |ah AS (SELECT bm.image_id,
      |        coalesce(sum(CASE WHEN bm.m >= am.bmean AND bm.bi < 63
      |                          THEN (1::BIGINT << bm.bi::INT) END), 0)
      |        + coalesce(max(CASE WHEN bm.m >= am.bmean AND bm.bi = 63
      |                           THEN (-9223372036854775807 - 1) END), 0) AS ahash
      |      FROM bm JOIN am USING (image_id) GROUP BY bm.image_id)""".stripMargin

  val imgFeaturesExactSql: String =
    s"""$featurePxSql,
       |g AS (SELECT image_id, any_value(fmt) AS fmt, min(w) AS w, min(h) AS h,
       |        count(*) AS n, sum(v)::BIGINT AS sv, sum(v::BIGINT * v)::BIGINT AS svv,
       |        min(v) AS mn, max(v) AS mx
       |      FROM v GROUP BY image_id),
       |b AS (SELECT v.image_id,
       |        CASE WHEN g.mx > g.mn
       |             THEN least(3, floor(CAST(v.v - g.mn AS DOUBLE)
       |                                 / (g.mx - g.mn) * 4)::INT)
       |             ELSE -1 END AS bin
       |      FROM v JOIN g USING (image_id)),
       |hist AS (SELECT image_id,
       |        coalesce(sum(CASE WHEN bin = 0 THEN 1 END), 0)::BIGINT AS h0,
       |        coalesce(sum(CASE WHEN bin = 1 THEN 1 END), 0)::BIGINT AS h1,
       |        coalesce(sum(CASE WHEN bin = 2 THEN 1 END), 0)::BIGINT AS h2,
       |        coalesce(sum(CASE WHEN bin = 3 THEN 1 END), 0)::BIGINT AS h3
       |      FROM b GROUP BY image_id),
       |$ahashCteSql
       |SELECT g.image_id, g.fmt, g.w::INT AS w, g.h::INT AS h,
       |  CAST(g.n AS DOUBLE) / (g.w * g.h) AS valid_frac,
       |  CAST(g.sv AS DOUBLE) / g.n AS px_mean,
       |  sqrt(greatest(0.0::DOUBLE,
       |       CAST(g.svv AS DOUBLE) / g.n
       |       - (CAST(g.sv AS DOUBLE) / g.n) * (CAST(g.sv AS DOUBLE) / g.n))) AS px_std,
       |  hist.h0, hist.h1, hist.h2, hist.h3, ah.ahash::BIGINT AS ahash
       |FROM g JOIN hist USING (image_id) JOIN ah USING (image_id)""".stripMargin

  /** q89 oracle form: edge-envelope mask (`get_edgemask`/`apply_edgemask`
    * malib.py:752-831) over the image table — on the synthetic margin-ring
    * masks the envelope is EXACTLY the valid rectangle, so n_env == n_valid
    * == (w−2m)(h−2m) closed-form; any over- or under-masking of row/col
    * spans breaks the hash. (Undercut + interior-hole behavior is pinned by
    * EdgeMaskSpec's C-notch fixture.) */
  def edgeEnvelopeCounts(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Engine.images(s, d).as[graft.sources.ImageRow].map { img =>
      val px = graft.sources.Codec.decode(img.bytes, img.w, img.h, img.fmt, img.ndv.toFloat)
      val nValid = px.count(_ != img.ndv.toFloat)
      val (_, nEnv) = graft.operators.RasterOps.edgeEnvelope(img)
      (img.image_id, nValid, nEnv)
    }.toDF("image_id", "n_valid", "n_env")
  }

  val edgeEnvelopeCountsSql: String =
    s"""${imSql()}
       |SELECT image_id,
       |  ((w - 2 * marg) * (h - 2 * marg))::INT AS n_valid,
       |  ((w - 2 * marg) * (h - 2 * marg))::INT AS n_env
       |FROM im""".stripMargin

  /** q90 oracle form: 2-D dominant spatial frequency (`freq_filt`
    * filtlib.py:565-614 — the reference's unfinished FFT framework,
    * finished as RasterOps.fft2/freqFilter/freqDominant) on the 32×32
    * top-left window of margin-free quantized images. Integer (kx, ky)
    * output in the canonical half-plane (conjugate-symmetry mirrors
    * excluded) is robust to 1-ulp transcendental differences; the twin
    * computes the same spectrum with a separable naive DFT and the same
    * (mag DESC, ky, kx) tie order the engine's scan implements.
    *
    * A deterministic square-wave probe (amplitude 8, period 8 or 16 px,
    * orientation by image index) is ADDED to the window in both engines:
    * the raw quantized-staircase windows are spectrally DEGENERATE (1-2
    * steps → an impulse comb whose bins tie at identical magnitudes —
    * measured: img 33 had |X|² = 4.0 at (1,0), (4,0) and (12,0), so the
    * argmax sat on FP noise and flipped between engines). The probe makes
    * the fundamental isolated by ~10⁶× while the image content still rides
    * along; the chain under test — decode → window → FFT → half-plane
    * argmax vs naive DFT — is unchanged (fixture-oracle precedent q63). */
  def freqDominantQ(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Engine.images(s, d).as[graft.sources.ImageRow]
      .filter { img =>
        val i = img.image_id.slice(4, 12).toInt
        i < 40 && i % 3 != 2 && (i / 3) % 3 != 0 && i % 5 != 0
      }
      .map { img =>
        val i = img.image_id.slice(4, 12).toInt
        val px = graft.sources.Codec.decode(img.bytes, img.w, img.h, img.fmt, img.ndv.toFloat)
        val halfp = 4 << (i % 2)               // probe half-period: 4 or 8
        val alongX = (i / 2) % 2 == 0          // orientation
        val win = new Array[Float](32 * 32)
        var y = 0
        while (y < 32) {
          var x = 0
          while (x < 32) {
            val c = if (alongX) x else y
            val probe = if ((c / halfp) % 2 == 0) 8.0f else -8.0f
            win(y * 32 + x) = px(y * img.w + x) + probe
            x += 1
          }
          y += 1
        }
        val (kx, ky) = graft.operators.RasterOps.freqDominant(win, 32, 32, img.ndv.toFloat)
        (img.image_id, kx, ky)
      }.toDF("image_id", "kx", "ky")
  }

  val freqDominantSql: String =
    s"""${imSql("i < 40 AND i % 3 <> 2 AND (i // 3) % 3 <> 0 AND i % 5 <> 0")},
       |px AS (SELECT im.*, unnest(generate_series(0, 31)) AS sx FROM im),
       |pxy AS (SELECT px.*, unnest(generate_series(0, 31)) AS sy FROM px),
       |v AS (
       |  SELECT image_id, sx, sy,
       |    greatest(1, least(255, round_even(
       |      (120.0::DOUBLE + 0.05::DOUBLE * day
       |        + 0.01::DOUBLE * ((ulx + (sx + 0.5::DOUBLE) * res) - 500000.0::DOUBLE))
       |        - 0.005::DOUBLE * (5300000.0::DOUBLE - (uly - (sy + 0.5::DOUBLE) * res)), 0)))::INT
       |    + CASE WHEN ((CASE WHEN (i // 2) % 2 = 0 THEN sx ELSE sy END)
       |                 // (4 * (1 + i % 2))) % 2 = 0 THEN 8 ELSE -8 END AS v
       |  FROM pxy),
       |s1 AS (SELECT image_id, sy, kk.k AS kx,
       |    sum(v * cos(-2 * pi() * kk.k * sx / 32.0)) AS r1,
       |    sum(v * sin(-2 * pi() * kk.k * sx / 32.0)) AS i1
       |  FROM v, generate_series(0, 31) kk(k) GROUP BY image_id, sy, kk.k),
       |s2 AS (SELECT image_id, kx, kk.k AS ky,
       |    sum(r1 * cos(-2 * pi() * kk.k * sy / 32.0)
       |        - i1 * sin(-2 * pi() * kk.k * sy / 32.0)) AS re,
       |    sum(r1 * sin(-2 * pi() * kk.k * sy / 32.0)
       |        + i1 * cos(-2 * pi() * kk.k * sy / 32.0)) AS im_
       |  FROM s1, generate_series(0, 31) kk(k) GROUP BY image_id, kx, kk.k),
       |mag AS (SELECT image_id, kx, ky, re * re + im_ * im_ AS m FROM s2
       |  WHERE (ky = 0 AND kx BETWEEN 1 AND 15) OR ky BETWEEN 1 AND 15)
       |SELECT image_id, kx::INT AS kx, ky::INT AS ky
       |FROM (SELECT *, row_number() OVER (PARTITION BY image_id
       |        ORDER BY m DESC, ky, kx) AS rn FROM mag)
       |WHERE rn = 1""".stripMargin

  /** q82 oracle form: the banded-LSH perceptual-hash dedup
    * (Multimodal.phashDedup — exact-dup collapse, (band_idx, band_val)
    * equi-join over distinct hashes, first-match-band emission, Hamming ≤ 8
    * refine) on the quantized subset, where the stored phash column is the
    * SQL-replayable aHash (q81). The engine's three-stage join
    * decomposition must reproduce the DECLARATIVE pair semantics — every
    * unordered pair sharing a 16-bit band with Hamming ≤ 8, plus
    * equal-hash pairs — exactly once each. */
  def phashDedupExact(s: SparkSession, d: String): DataFrame =
    graft.operators.Multimodal.phashDedup(s, quantNoRipple(Engine.images(s, d)), maxDist = 8)

  /** DuckDB twin of q82: aHash replay (q81's CTEs) → declarative pair
    * predicate. Band equality masks with & 65535 after the shift, so
    * arithmetic-vs-logical shift on negative hashes cannot diverge. */
  val phashDedupExactSql: String =
    s"""$featurePxSql,
       |$ahashCteSql,
       |ids AS (SELECT image_id, ahash::BIGINT AS ph FROM ah)
       |SELECT a.image_id AS id1, b.image_id AS id2,
       |  CASE WHEN a.ph = b.ph THEN 0
       |       ELSE bit_count(xor(a.ph, b.ph)) END::INT AS hamming
       |FROM ids a JOIN ids b ON a.image_id < b.image_id
       |WHERE a.ph = b.ph
       |   OR (bit_count(xor(a.ph, b.ph)) <= 8 AND (
       |        ((a.ph >> 0)  & 65535) = ((b.ph >> 0)  & 65535) OR
       |        ((a.ph >> 16) & 65535) = ((b.ph >> 16) & 65535) OR
       |        ((a.ph >> 32) & 65535) = ((b.ph >> 32) & 65535) OR
       |        ((a.ph >> 48) & 65535) = ((b.ph >> 48) & 65535)))""".stripMargin

  /** q91 oracle form: near-dup CLUSTERING — the step every dedup pipeline
    * runs after the pair join: connected components (pointer-doubling
    * min-label propagation) over the CONTRACTED distinct-hash graph of the
    * q82 pair predicate, plus the exact-dup grouping (= the hash partitions
    * themselves, no propagation needed). The quant-subset graph is ONE deep
    * component (image-level dist-to-min 21 — a real stress of the doubling)
    * over 138 hash nodes, while the exact groups split into 138 cliques —
    * together they pin both the deep-chain and many-components behavior. */
  def neardupClusters(s: SparkSession, d: String): DataFrame = {
    val imgs = quantNoRipple(Engine.images(s, d))
    // CONTRACTED graph: components run over distinct hashes, not images —
    // equal-payload cliques are already one node (the q56/q82 dedup-collapse
    // principle applied to the graph step; first image-level CC attempt
    // measured 43.7 s at sf0.1, the hash-level form ~4× fewer rounds-jobs
    // and edge rows). Exact groups need no propagation at all: they ARE the
    // hash partitions.
    val ids = imgs.select(col("image_id"), col("phash"))
    val exact = ids.groupBy(col("phash")).agg(
      min(col("image_id")).as("comp_exact"), count(lit(1)).as("csize_exact"))
    val hp = graft.operators.Multimodal.phashHashPairs(imgs, maxDist = 8)
    // name-based joins only: the CC result is localCheckpoint'ed, so
    // DataFrame(col) references from pre-checkpoint instances don't resolve
    val cc = graft.operators.Similarity.connectedComponents(s,
        ids.select(col("phash").as("id")).distinct(),
        hp.select(col("p1").as("a"), col("p2").as("b")))
      .withColumnRenamed("id", "phash")
    // component label exposed as the min image id across the component
    val compLabel = cc.join(exact, Seq("phash"))
      .groupBy(col("component")).agg(min(col("comp_exact")).as("comp_all"))
    ids.join(exact, Seq("phash"))
      .join(cc, Seq("phash"))
      .join(compLabel, Seq("component"))
      .select(col("image_id"), col("comp_all"), col("comp_exact"), col("csize_exact"))
  }

  /** DuckDB twin of q91: the q82 pair predicate feeds 8 unrolled
    * pointer-doubling rounds (propagate-min then shortcut — identical
    * FIXPOINT to the engine's loop; intermediate states need not match,
    * only the converged labels, and 8 doubling rounds cover distance ≫ 21);
    * the exact groups are just min(image_id) per hash value. */
  val neardupClustersSql: String = {
    // every CTE MATERIALIZED: DuckDB inlines CTEs by default, and both the
    // propagate and shortcut steps reference their predecessor twice — an
    // inlined chain re-evaluates the pair predicate 2^rounds times
    def round(r: Int): String =
      s"""p$r AS MATERIALIZED (SELECT id, min(lbl) AS lbl FROM (
         |  SELECT id, lbl FROM l${r - 1}
         |  UNION ALL
         |  SELECT e.b AS id, l${r - 1}.lbl FROM sym e JOIN l${r - 1} ON e.a = l${r - 1}.id)
         |  GROUP BY id),
         |l$r AS MATERIALIZED (SELECT a.id, least(a.lbl, b.lbl) AS lbl
         |  FROM p$r a JOIN p$r b ON a.lbl = b.id)""".stripMargin
    s"""$featurePxSql,
       |$ahashCteSql,
       |ids AS MATERIALIZED (SELECT image_id, ahash::BIGINT AS ph FROM ah),
       |hs AS (SELECT DISTINCT ph FROM ids),
       |pr AS MATERIALIZED (
       |  SELECT a.ph AS p1, b.ph AS p2
       |  FROM hs a JOIN hs b ON a.ph < b.ph
       |  WHERE bit_count(xor(a.ph, b.ph)) <= 8 AND (
       |          ((a.ph >> 0)  & 65535) = ((b.ph >> 0)  & 65535) OR
       |          ((a.ph >> 16) & 65535) = ((b.ph >> 16) & 65535) OR
       |          ((a.ph >> 32) & 65535) = ((b.ph >> 32) & 65535) OR
       |          ((a.ph >> 48) & 65535) = ((b.ph >> 48) & 65535))),
       |sym AS MATERIALIZED (SELECT p1 AS a, p2 AS b FROM pr
       |        UNION ALL SELECT p2, p1 FROM pr),
       |l0 AS MATERIALIZED (SELECT ph AS id, ph AS lbl FROM hs),
       |${(1 to 8).map(round).mkString(",\n")},
       |ex AS MATERIALIZED (SELECT ph, min(image_id) AS comp_exact,
       |        count(*) AS csize_exact FROM ids GROUP BY ph),
       |cl AS (SELECT l8.lbl AS component, min(ex.comp_exact) AS comp_all
       |       FROM l8 JOIN ex ON ex.ph = l8.id GROUP BY l8.lbl)
       |SELECT i.image_id, cl.comp_all, ex.comp_exact,
       |       ex.csize_exact::BIGINT AS csize_exact
       |FROM ids i
       |JOIN ex USING (ph)
       |JOIN l8 ON l8.id = i.ph
       |JOIN cl ON cl.component = l8.lbl""".stripMargin
  }

  /** DuckDB twin of q46: brute-force kNN over the PolygonTable.points
    * closed form (integer-lattice scatter → exact doubles), k = 5, ties on
    * (dist, c_id) — the production ring-expansion operator (auto cell
    * sizing, 3 bounded passes) must be SET-EXACT against an independent
    * engine's full cross-product window. sf0.01 sizes: 40,000 candidates,
    * 1,000 query points (Engine.nPoints / knnRing's nq rule). */
  val knnRingSql: String =
    s"""WITH pts AS (SELECT i, printf('pt_%07d', i) AS pt_id,
      |    (499900 + (i * 131) % 8592)::DOUBLE AS x,
      |    (5300100 - (i * 71) % 2400)::DOUBLE AS y
      |  FROM generate_series(0, ${Fix.nImg * 50 - 1}) t(i)),
      |j AS (SELECT q.pt_id AS q_id, c.pt_id AS c_id,
      |        sqrt(pow(c.x - q.x, 2) + pow(c.y - q.y, 2)) AS dist
      |      FROM pts q CROSS JOIN pts c WHERE q.i < ${math.max(200, Fix.nImg * 50 / 40)}),
      |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |        ORDER BY dist ASC, c_id ASC) AS rnk FROM j)
      |SELECT q_id, c_id, dist, rnk FROM r WHERE rnk <= 5""".stripMargin

  /** DuckDB twin of q55: the REAL video decode path — frame_hash is now a
    * position-sensitive checksum Σ px·(i+1) of the DECODED pixel bytes
    * (round 4; was an id-seeded stub hash), so the twin verifies AVI
    * encode → RIFF walk → bottom-up un-flip → stride strip end-to-end: a
    * flipped row order, wrong stride, or off-by-one chunk offset changes
    * the sum. Pixels replay from VideoTable.pixel's integer closed form. */
  val frameSampleSql: String =
    s"""WITH v AS (SELECT i, printf('vid_%07d', i) AS video_id,
       |    28 + (i % 3) * 2 AS w, 20 + (i % 2) * 4 AS h, 12 + i % 5 AS nf
       |  FROM generate_series(0, ${Fix.nClip - 1}) t(i)),
       |fr AS (SELECT v.*, unnest(generate_series(0, nf - 1, 4)) AS t FROM v),
       |xs AS (SELECT fr.*, unnest(generate_series(0, w - 1)) AS x FROM fr),
       |pxl AS (SELECT xs.*, unnest(generate_series(0, h - 1)) AS y FROM xs)
       |SELECT video_id, video_id || '#f' || t AS frame_id, t::INT AS frame_idx,
       |  w::INT AS w, h::INT AS h,
       |  sum(((x * 3 + y * 5 + t * 7 + i * 11) % 256)
       |      * (y * w + x + 1))::BIGINT AS frame_hash
       |FROM pxl GROUP BY video_id, t, w, h""".stripMargin

  /** Shared warp-grid CTE prefix (im → tgt → b → bx → bxy): the sf0.01
    * image closed forms, the q63-proven pixel-bounds arithmetic, and the
    * per-image target-pixel enumeration — used by six engine twins (fix
    * the arithmetic here, once). `hi` bounds the image series. */
  private def warpGridSql(hi: Int): String =
    s"""WITH im AS (
      |  SELECT i,
      |    printf('img_%08d_%s_%02d00', i,
      |      strftime(DATE '2024-01-01' + INTERVAL ((i * 3) % 360) DAY, '%Y%m%d'),
      |      i % 24) AS image_id,
      |    CASE i % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 4 END::DOUBLE AS res,
      |    48 + (i % 4) * 8 AS w, 40 + (i % 5) * 8 AS h,
      |    CASE WHEN i % 5 = 0 THEN 3 ELSE 0 END AS marg,
      |    (500000 + (i % 7) * 10 + ((i // 20) % 32) * 256)::DOUBLE AS ulx,
      |    (5300000 - (i % 5) * 8 - ((i // 20) // 32) * 256)::DOUBLE AS uly
      |  FROM generate_series(0, $hi) t(i)),
      |tgt AS (SELECT min(ulx) AS tulx, max(uly) AS tuly, min(res) AS tres,
      |    round((max(ulx + w * res) - min(ulx)) / min(res))::INT AS ns,
      |    round((max(uly) - min(uly - h * res)) / min(res))::INT AS nl FROM im),
      |b AS (SELECT im.*, tulx, tuly, tres, ns, nl,
      |    greatest(0, floor((greatest(ulx, tulx) - tulx) / tres))::INT AS px0,
      |    least(ns - 1, ceil((least(ulx + w * res, tulx + ns * tres) - tulx) / tres)::INT - 1) AS px1,
      |    greatest(0, floor((tuly - least(uly, tuly)) / tres))::INT AS py0,
      |    least(nl - 1, ceil((tuly - greatest(uly - h * res, tuly - nl * tres)) / tres)::INT - 1) AS py1
      |  FROM im, tgt),
      |bx AS (SELECT b.*, unnest(generate_series(px0, px1)) AS x FROM b),
      |bxy AS (SELECT bx.*, unnest(generate_series(py0, py1)) AS y FROM bx)""".stripMargin

  /** DuckDB twin of q40 (the warp operator's own output, bilinear kernel):
    * per-(image, tile) valid-pixel counts + the no-op-elision flag.
    * Bilinear validity (Warp.bilinear: wsum > 0) is SEPARABLE on these
    * rectangular source masks — a target pixel is valid iff some
    * positive-weight neighbor column AND row are in the valid range —
    * and elided images (res == tres on the lattice) use the direct copy
    * mapping. Matched 3280/3280 against the executed operator. */
  val warpTilesSql: String =
    warpGridSql(Fix.nImg - 1) + """,
      |f AS (
      |  SELECT i, image_id, marg, w, h, ns, x, y,
      |    (tulx + (x + 0.5::DOUBLE) * tres - ulx) / res - 0.5::DOUBLE AS pxf,
      |    (uly - (tuly - (y + 0.5::DOUBLE) * tres)) / res - 0.5::DOUBLE AS pyf,
      |    x + round((tulx - ulx) / tres)::INT AS dsx,
      |    y + round((uly - tuly) / tres)::INT AS dsy
      |  FROM bxy),
      |v AS (
      |  SELECT i, image_id, ns, x, y,
      |    CASE WHEN i % 3 = 0
      |         THEN dsx >= marg AND dsx < w - marg AND dsy >= marg AND dsy < h - marg
      |         ELSE
      |           ((floor(pxf)::INT >= marg AND floor(pxf)::INT < w - marg)
      |            OR (pxf - floor(pxf) > 0 AND floor(pxf)::INT + 1 >= marg AND floor(pxf)::INT + 1 < w - marg))
      |           AND
      |           ((floor(pyf)::INT >= marg AND floor(pyf)::INT < h - marg)
      |            OR (pyf - floor(pyf) > 0 AND floor(pyf)::INT + 1 >= marg AND floor(pyf)::INT + 1 < h - marg))
      |    END AS ok
      |  FROM f)
      |SELECT image_id,
      |  ((y // 64) * ((ns + 63) // 64) + (x // 64))::BIGINT AS tile_id,
      |  (x // 64)::INT AS tx, (y // 64)::INT AS ty,
      |  count(*)::INT AS n_valid,
      |  (min(i) % 3 = 0)::INT AS elided
      |FROM v WHERE ok
      |GROUP BY image_id, ns, x // 64, y // 64
      |""".stripMargin

  /** DuckDB twin of q104 (`source` strategies): `source_all` is closed-form
    * no-op arithmetic (valid rect = the NDV-margin interior; tile count =
    * the 64-tiling of the full grid restricted to tiles holding valid
    * pixels; every tile elided). `res_min` rebuilds each image's
    * own-anchored target grid at the global min res (tres=2, exact) and
    * replays the q40 twin's separable bilinear-validity argument with
    * tulx=ulx / tuly=uly: res-2 images take the elided copy path, others
    * count pixels whose positive-weight bilinear support intersects the
    * valid interior in BOTH axes. */
  val warpSourceTilesSql: String =
    s"""${imSql()},
      |src_all AS (
      |  SELECT 'source_all' AS cfg, image_id,
      |    ((((w - marg - 1) // 64) + 1) * (((h - marg - 1) // 64) + 1))::BIGINT AS n_tiles,
      |    ((w - 2 * marg) * (h - 2 * marg))::BIGINT AS n_valid_px,
      |    ((((w - marg - 1) // 64) + 1) * (((h - marg - 1) // 64) + 1))::BIGINT AS n_elided
      |  FROM im),
      |g AS (SELECT i, image_id, res, w, h, marg,
      |        round(w * res / 2)::INT AS ns2, round(h * res / 2)::INT AS nl2 FROM im),
      |gx AS (SELECT g.*, unnest(generate_series(0, ns2 - 1)) AS x FROM g),
      |gxy AS (SELECT gx.*, unnest(generate_series(0, nl2 - 1)) AS y FROM gx),
      |f AS (
      |  SELECT i, image_id, marg, w, h, x, y,
      |    (x + 0.5::DOUBLE) * 2 / res - 0.5::DOUBLE AS pxf,
      |    (y + 0.5::DOUBLE) * 2 / res - 0.5::DOUBLE AS pyf
      |  FROM gxy),
      |v AS (
      |  SELECT i, image_id, x, y,
      |    CASE WHEN i % 3 = 0
      |         THEN x >= marg AND x < w - marg AND y >= marg AND y < h - marg
      |         ELSE
      |           ((floor(pxf)::INT >= marg AND floor(pxf)::INT < w - marg)
      |            OR (pxf - floor(pxf) > 0 AND floor(pxf)::INT + 1 >= marg AND floor(pxf)::INT + 1 < w - marg))
      |           AND
      |           ((floor(pyf)::INT >= marg AND floor(pyf)::INT < h - marg)
      |            OR (pyf - floor(pyf) > 0 AND floor(pyf)::INT + 1 >= marg AND floor(pyf)::INT + 1 < h - marg))
      |    END AS ok
      |  FROM f),
      |res_min AS (
      |  SELECT 'res_min' AS cfg, image_id,
      |    count(DISTINCT (x // 64, y // 64))::BIGINT AS n_tiles,
      |    count(*)::BIGINT AS n_valid_px,
      |    (CASE WHEN min(i) % 3 = 0 THEN count(DISTINCT (x // 64, y // 64)) ELSE 0 END)::BIGINT AS n_elided
      |  FROM v WHERE ok GROUP BY image_id)
      |SELECT cfg, image_id, n_tiles, n_valid_px, n_elided FROM src_all
      |UNION ALL
      |SELECT cfg, image_id, n_tiles, n_valid_px, n_elided FROM res_min
      |""".stripMargin

  /** DuckDB twin of q67: on per-image warped masks the valid region is a
    * single rectangle, so remove_islands (closing of the invalid mask) is
    * the IDENTITY and the counts are pure warp-coverage arithmetic — the
    * twin pins exactly that (the morphology itself is exercised on
    * island-bearing fixtures in StencilSpec, set-exact vs whole-array). */
  val removeIslandsSql: String =
    warpGridSql(Fix.nImg - 1) + """,
      |src AS (
      |  SELECT i, image_id, marg, w, h, x, y,
      |    CASE WHEN i % 3 = 0 THEN x + round((tulx - ulx) / tres)::INT
      |         ELSE floor(((tulx + (x + 0.5::DOUBLE) * tres - ulx) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sx,
      |    CASE WHEN i % 3 = 0 THEN y + round((uly - tuly) / tres)::INT
      |         ELSE floor(((uly - (tuly - (y + 0.5::DOUBLE) * tres)) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sy
      |  FROM bxy)
      |SELECT image_id,
      |  count(DISTINCT (x // 64, y // 64))::BIGINT AS n_tiles,
      |  count(*)::BIGINT AS n_valid_px
      |FROM src
      |WHERE sx >= marg AND sy >= marg AND sx < w - marg AND sy < h - marg
      |GROUP BY image_id
      |""".stripMargin

  /** DuckDB twin of q71: on margin-only source masks the maskfill family is
    * closed-form — the BFS outside fill equals the margin ring (all invalid
    * connects to the border), and the edge-including opening of an EMPTY
    * invalid mask is exactly the 1-px border ring 2(w+h)−4 (out-of-bounds
    * counts as invalid), while a ≥3-px margin ring reproduces itself.
    * Hole-bearing fixtures stay under FillSpec. */
  val maskfillSql: String =
    s"""${imSql()}
       |SELECT image_id,
       |  (w * h - (w - 2 * marg) * (h - 2 * marg))::INT AS n_invalid,
       |  (w * h - (w - 2 * marg) * (h - 2 * marg))::INT AS n_outside,
       |  (CASE WHEN marg > 0 THEN w * h - (w - 2 * marg) * (h - 2 * marg)
       |        ELSE 2 * (w + h) - 4 END)::INT AS n_opened
       |FROM im""".stripMargin

  /** q79 oracle form: profile extraction (`geolib.py:1018-1098`) on the
    * quantized subset — the real line2pts remainder-carry transect + the
    * production pointSample window median/NMAD (the q50 machinery along a
    * line). The full-set form stays q51. */
  def profileCells(s: SparkSession, d: String): DataFrame = {
    import graft.sources.ImageTable
    import ImageTable.{X0, Y0}
    Sampling.profile(s, quantNoRipple(Engine.images(s, d)),
      xs = Seq(X0, X0 + ImageTable.ClusterCols * 256.0),
      ys = Seq(Y0 - 50.0, Y0 - 120.0), dl = 10.0)
  }

  /** DuckDB twin of q79: transect points re-derived with the same double
    * chain (t = k·10 exact; x = x0 + dx·t/len with len = √(dx²+dy²) — every
    * op correctly rounded identically), then the q50 window logic. */
  val profileCellsSql: String =
    s"""WITH im AS (
       |  SELECT i,
       |    printf('img_%08d_%s_%02d00', i,
       |      strftime(DATE '2024-01-01' + INTERVAL ((i * 3) % 360) DAY, '%Y%m%d'),
       |      i % 24) AS image_id,
       |    (i * 3) % 360 AS day,
       |    CASE i % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 4 END::DOUBLE AS res,
       |    48 + (i % 4) * 8 AS w, 40 + (i % 5) * 8 AS h,
       |    CASE WHEN i % 5 = 0 THEN 3 ELSE 0 END AS marg,
       |    (500000 + (i % 7) * 10 + ((i // 20) % 32) * 256)::DOUBLE AS ulx,
       |    (5300000 - (i % 5) * 8 - ((i // 20) // 32) * 256)::DOUBLE AS uly
       |  FROM generate_series(0, ${Fix.nImg - 1}) t(i)
       |  WHERE i % 3 <> 2 AND (i // 3) % 3 <> 0),
       |seg AS (SELECT 8192.0::DOUBLE AS dx, -70.0::DOUBLE AS dy,
       |               sqrt(8192.0::DOUBLE * 8192.0::DOUBLE + 70.0::DOUBLE * 70.0::DOUBLE) AS len),
       |pt AS (
       |  SELECT k, printf('prof_%06d', k) AS pt_id,
       |    500000.0::DOUBLE + dx * (k * 10.0::DOUBLE) / len AS x,
       |    5299950.0::DOUBLE + dy * (k * 10.0::DOUBLE) / len AS y,
       |    k * 10.0::DOUBLE AS dist_along
       |  FROM generate_series(0, 2000) t(k), seg
       |  WHERE k * 10.0::DOUBLE < len),
       |hit AS (
       |  SELECT pt.pt_id, pt.x, pt.y, pt.dist_along, im.*,
       |    floor(((pt.x - im.ulx) / im.res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT AS cx,
       |    floor(((im.uly - pt.y) / im.res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT AS cy
       |  FROM pt, im
       |  WHERE pt.x >= im.ulx AND pt.x <= im.ulx + im.w * im.res
       |    AND pt.y >= im.uly - im.h * im.res AND pt.y <= im.uly),
       |win AS (
       |  SELECT h.pt_id, h.image_id, h.x, h.y, h.dist_along,
       |    greatest(1, least(255, round_even(
       |      (120.0::DOUBLE + 0.05::DOUBLE * day
       |        + 0.01::DOUBLE * ((ulx + (cx + dx + 0.5::DOUBLE) * res) - 500000.0::DOUBLE))
       |        - 0.005::DOUBLE * (5300000.0::DOUBLE - (uly - (cy + dy + 0.5::DOUBLE) * res)), 0)))::INT AS v
       |  FROM hit h, unnest([-1, 0, 1]) tx(dx), unnest([-1, 0, 1]) ty(dy)
       |  WHERE cx + dx >= marg AND cx + dx < w - marg
       |    AND cy + dy >= marg AND cy + dy < h - marg),
       |med AS (
       |  SELECT pt_id, image_id, any_value(x) AS x, any_value(y) AS y,
       |    any_value(dist_along) AS dist_along,
       |    quantile_cont(v, 0.5) AS m, count(*)::INT AS n
       |  FROM win GROUP BY pt_id, image_id
       |  HAVING count(*) >= 5)
       |SELECT w.pt_id, w.image_id, any_value(m.x) AS x, any_value(m.y) AS y,
       |  any_value(m.m) AS samp_med,
       |  1.4826::DOUBLE * quantile_cont(abs(w.v - m.m), 0.5) AS samp_nmad,
       |  any_value(m.n) AS samp_count,
       |  any_value(m.dist_along) AS dist_along
       |FROM win w JOIN med m ON w.pt_id = m.pt_id AND w.image_id = m.image_id
       |GROUP BY w.pt_id, w.image_id""".stripMargin

  /** DuckDB twin of q65: Horn 3×3 shading requires the full neighborhood,
    * so on single-rectangle warped masks the shaded region is the INNER
    * rectangle — counts are coverage arithmetic (the shading VALUES are
    * pinned by StencilSpec closed forms on the affine surface). */
  val demFamilySql: String =
    warpGridSql(Fix.nImg - 1) + """,
      |src AS (
      |  SELECT i, image_id, marg, w, h, x, y,
      |    CASE WHEN i % 3 = 0 THEN x + round((tulx - ulx) / tres)::INT
      |         ELSE floor(((tulx + (x + 0.5::DOUBLE) * tres - ulx) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sx,
      |    CASE WHEN i % 3 = 0 THEN y + round((uly - tuly) / tres)::INT
      |         ELSE floor(((uly - (tuly - (y + 0.5::DOUBLE) * tres)) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sy
      |  FROM bxy),
      |v AS (SELECT i, image_id, min(x) AS vx0, max(x) AS vx1, min(y) AS vy0, max(y) AS vy1
      |      FROM src
      |      WHERE sx >= marg AND sy >= marg AND sx < w - marg AND sy < h - marg
      |      GROUP BY i, image_id),
      |tx AS (SELECT v.*, unnest(generate_series((vx0 + 1) // 64, (vx1 - 1) // 64)) AS tx FROM v),
      |txy AS (SELECT tx.*, unnest(generate_series((vy0 + 1) // 64, (vy1 - 1) // 64)) AS ty FROM tx)
      |SELECT image_id,
      |  count(*)::BIGINT AS n_tiles,
      |  (min((vx1 - vx0 - 1)) * min((vy1 - vy0 - 1)))::BIGINT AS n_shaded_px
      |FROM txy GROUP BY image_id
      |""".stripMargin


  /** DuckDB twin of q45 (raster clip by polygon layer, ALL kinds): valid
    * warp cells → map-space centers → 64 m covering-cell equi-join against
    * the polygon layer (the same prefilter shape the engine uses) →
    * crossing-parity PIP → per-(image, tile) counts. Zero-valid tiles drop,
    * matching clipTiles' nValid > 0 emission. */
  val clipTilesSql: String =
    warpGridSql(Fix.nImg - 1) + s""",
      |src AS (
      |  SELECT i AS img, image_id, ns, tulx, tuly, tres, marg, w, h, x, y,
      |    CASE WHEN i % 3 = 0 THEN x + round((tulx - ulx) / tres)::INT
      |         ELSE floor(((tulx + (x + 0.5::DOUBLE) * tres - ulx) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sx,
      |    CASE WHEN i % 3 = 0 THEN y + round((uly - tuly) / tres)::INT
      |         ELSE floor(((uly - (tuly - (y + 0.5::DOUBLE) * tres)) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sy
      |  FROM bxy),
      |cells AS (
      |  SELECT img, image_id, ns, x, y,
      |    tulx + (x + 0.5::DOUBLE) * tres AS mx,
      |    tuly - (y + 0.5::DOUBLE) * tres AS my
      |  FROM src WHERE sx >= marg AND sy >= marg AND sx < w - marg AND sy < h - marg),
      |c AS (SELECT i, 500040 + (i * 97) % 8192 AS cx, 5299960 - (i * 53) % 1024 AS cy
      |      FROM generate_series(0, ${Fix.nPoly - 1}) t(i)),
      |e AS (
      |  SELECT i, cx AS xe, cy - 60 AS ylo, cy AS yhi FROM c WHERE i % 4 = 0
      |  UNION ALL SELECT i, cx + 80, cy - 60, cy FROM c WHERE i % 4 = 0
      |  UNION ALL SELECT i, cx, cy - 100, cy FROM c WHERE i % 4 = 1
      |  UNION ALL SELECT i, cx + 40, cy - 70, cy - 30 FROM c WHERE i % 4 = 1
      |  UNION ALL SELECT i, cx + 100, cy - 100, cy - 70 FROM c WHERE i % 4 = 1
      |  UNION ALL SELECT i, cx + 100, cy - 30, cy FROM c WHERE i % 4 = 1
      |  UNION ALL SELECT i, cx, cy - 90, cy FROM c WHERE i % 4 = 2
      |  UNION ALL SELECT i, cx + 90, cy - 90, cy FROM c WHERE i % 4 = 2
      |  UNION ALL SELECT i, cx + 25, cy - 65, cy - 25 FROM c WHERE i % 4 = 2
      |  UNION ALL SELECT i, cx + 65, cy - 65, cy - 25 FROM c WHERE i % 4 = 2
      |  UNION ALL SELECT i, 499950, 5298000, 5300050 FROM c WHERE i = 3
      |  UNION ALL SELECT i, 508242, 5298000, 5300050 FROM c WHERE i = 3
      |  UNION ALL SELECT i, cx, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3
      |  UNION ALL SELECT i, cx + 40, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3
      |  UNION ALL SELECT i, cx + 70, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3
      |  UNION ALL SELECT i, cx + 110, cy - 40, cy FROM c WHERE i % 4 = 3 AND i <> 3),
      |bb AS (SELECT i, min(xe) AS x1, max(xe) AS x2, min(ylo) AS y1, max(yhi) AS y2 FROM e GROUP BY i),
      |pgx AS (SELECT bb.*, unnest(generate_series(x1 // 64, x2 // 64)) AS gx FROM bb),
      |pgxy AS (SELECT pgx.*, unnest(generate_series(y1 // 64, y2 // 64)) AS gy FROM pgx),
      |pcell AS (SELECT DISTINCT i AS poly_i, gx, gy FROM pgxy),
      |cand AS (SELECT cl.img, cl.image_id, cl.ns, cl.x, cl.y, cl.mx, cl.my, pcell.poly_i
      |         FROM cells cl JOIN pcell ON floor(cl.mx / 64)::BIGINT = pcell.gx
      |                                 AND floor(cl.my / 64)::BIGINT = pcell.gy),
      |par AS (SELECT img, image_id, ns, x, y, poly_i
      |        FROM cand JOIN e ON e.i = cand.poly_i
      |             AND cand.my >= e.ylo AND cand.my < e.yhi AND cand.mx < e.xe
      |        GROUP BY img, image_id, ns, x, y, poly_i
      |        HAVING count(*) % 2 = 1),
      |keep AS (SELECT DISTINCT img, image_id, ns, x, y FROM par)
      |SELECT image_id, ((y // 64) * ((ns + 63) // 64) + (x // 64))::BIGINT AS tile_id,
      |       count(*)::INT AS n_valid
      |FROM keep GROUP BY image_id, ns, x // 64, y // 64
      |""".stripMargin


  /** DuckDB twin of q66 (map_interp-grade gap fill): the interp gate is
    * support >= 2x coefficient count AND a nonsingular fit, which on
    * rectangular valid regions reduces to window-overlap arithmetic
    * (ox*oy >= 20 with ox,oy >= 4 distinct coordinates for the degree-3
    * Vandermonde rank) — the fill ring is exactly 1 px with corners
    * excluded (4x4 = 16 < 20), clipped at the global tile grid; the
    * grow-into-neighbor strip-only tiles fall out of the same arithmetic.
    * Fill VALUES (cubic-exact) stay under FillSpec. */
  val fillInterpSql: String =
    warpGridSql(Fix.nImg - 1) + """,
      |src AS (
      |  SELECT i, image_id, ns, nl, marg, w, h, x, y,
      |    CASE WHEN i % 3 = 0 THEN x + round((tulx - ulx) / tres)::INT
      |         ELSE floor(((tulx + (x + 0.5::DOUBLE) * tres - ulx) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sx,
      |    CASE WHEN i % 3 = 0 THEN y + round((uly - tuly) / tres)::INT
      |         ELSE floor(((uly - (tuly - (y + 0.5::DOUBLE) * tres)) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
      |    END AS sy
      |  FROM bxy),
      |v AS (SELECT i, image_id, min(ns) AS ns, min(nl) AS nl,
      |        min(x) AS vx0, max(x) AS vx1, min(y) AS vy0, max(y) AS vy1
      |      FROM src
      |      WHERE sx >= marg AND sy >= marg AND sx < w - marg AND sy < h - marg
      |      GROUP BY i, image_id),
      |ex AS (SELECT v.*, ((ns + 63) // 64) AS ntx, ((nl + 63) // 64) AS nty,
      |        unnest(generate_series(greatest(0, vx0 - 1),
      |          least(vx1 + 1, ((ns + 63) // 64) * 64 - 1))) AS x FROM v),
      |exy AS (SELECT ex.*,
      |        unnest(generate_series(greatest(0, vy0 - 1),
      |          least(vy1 + 1, ((nl + 63) // 64) * 64 - 1))) AS y FROM ex),
      |o AS (SELECT image_id, ntx, x, y,
      |        (x BETWEEN vx0 AND vx1) AND (y BETWEEN vy0 AND vy1) AS valid,
      |        least(x + 4, vx1) - greatest(x - 4, vx0) + 1 AS ox,
      |        least(y + 4, vy1) - greatest(y - 4, vy0) + 1 AS oy
      |      FROM exy),
      |keep AS (SELECT image_id, ntx, x, y FROM o
      |         WHERE valid OR (ox >= 4 AND oy >= 4 AND ox * oy >= 20))
      |SELECT image_id,
      |  count(DISTINCT (x // 64, y // 64))::BIGINT AS n_tiles,
      |  count(*)::BIGINT AS n_valid_px
      |FROM keep GROUP BY image_id
      |""".stripMargin

  // ---------------------------------------------------------------------
  // q93/q94 — oracle-exact forms of the two ANN scale paths (VERDICT r3 #1)
  // ---------------------------------------------------------------------

  /** Shared DuckDB dot product: ordered left fold in DOUBLE, bit-identical
    * to the codegen'd VecDot Expression (proven strict by q27/q28). */
  private def dotSql(a: String, b: String): String =
    s"list_sum(list_transform(list_zip($a, $b), p -> p[1]::DOUBLE * p[2]::DOUBLE))"

  /** q93 engine side — the FULL hyperplane-LSH ANN path (Similarity
    * .annCosine: bucketKeys → bucket equi-join → exact cosine re-rank) on
    * the real float embeddings, cosine emitted UNROUNDED (the same
    * correctly-rounded IEEE chain in both engines is bit-identical; decimal
    * round() is the cross-engine trap). tables=16, planes=6 = q59's exact
    * configuration. */
  def annLshExact(s: SparkSession, d: String): DataFrame = {
    val e = s.read.parquet(s"$d/embeddings.parquet")
    val q = e.filter(col("vec_id") < 50).select(col("vec_id").as("q_id"), col("embedding"))
    val c = e.filter(col("vec_id") >= 50).select(col("vec_id").as("c_id"), col("embedding"))
    graft.operators.Similarity.annCosine(s, q, c, k = 3, tables = 16, planes = 6)
      .select(col("q_id"), col("c_id"), col("cos"), col("rnk"))
  }

  /** q93 oracle — the splitmix+Box–Muller hyperplane components cannot be
    * recomputed in DuckDB (64-bit modular multiplies overflow), so they are
    * embedded as string-cast literals from the SAME Similarity.gauss the
    * Spark plan evaluates (the q84 Goertzel-coefficient technique). The
    * per-(vec, table, plane) projection replays the engine's left-to-right
    * double fold via list_reduce (fold from the first element ≡ Scala's fold
    * from 0.0 — 0 + x is exact), so every sign bit, bucket key, candidate
    * pair, cosine, and rank matches bit-for-bit. */
  val annLshExactSql: String = {
    val tables = 16; val planes = 6; val dims = 64
    val g = graft.operators.Similarity.gauss _
    val planeRows = (for { t <- 0 until tables; p <- 0 until planes } yield {
      val lst = (0 until dims).map(dd => s"'${g(t, p, dd).toString}'").mkString(",")
      s"($t, $p, [$lst])"
    }).mkString(", ")
    val dqc = dotSql("eq.embedding", "ec.embedding")
    val dqq = dotSql("eq.embedding", "eq.embedding")
    val dcc = dotSql("ec.embedding", "ec.embedding")
    s"""WITH hp AS (SELECT t, p, list_transform(gs, s -> s::DOUBLE) AS gv
      |           FROM (VALUES $planeRows) raw(t, p, gs)),
      |dots AS (SELECT e.vec_id, hp.t, hp.p,
      |    list_reduce(list_transform(list_zip(e.embedding, hp.gv),
      |      pr -> pr[1]::DOUBLE * pr[2]), (a, b) -> a + b) AS dot
      |  FROM embeddings e CROSS JOIN hp),
      |keys AS (SELECT vec_id, t,
      |    (t::BIGINT << 32) | sum(CASE WHEN dot >= 0
      |        THEN (1::BIGINT << p) ELSE 0 END)::BIGINT AS bkey
      |  FROM dots GROUP BY vec_id, t),
      |pairs AS (SELECT DISTINCT qb.vec_id AS q_id, cb.vec_id AS c_id
      |  FROM keys qb JOIN keys cb ON qb.bkey = cb.bkey
      |  WHERE qb.vec_id < 50 AND cb.vec_id >= 50),
      |j AS (SELECT p.q_id, p.c_id,
      |    $dqc / (sqrt($dqq) * sqrt($dcc)) AS cos
      |  FROM pairs p JOIN embeddings eq ON eq.vec_id = p.q_id
      |               JOIN embeddings ec ON ec.vec_id = p.c_id),
      |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos DESC, c_id ASC) AS rnk FROM j)
      |SELECT q_id, c_id, cos, rnk FROM r WHERE rnk <= 3""".stripMargin
  }

  /** q94 engine side — the FULL IVF-flat ANN path (Similarity.ivfCosine:
    * deterministic Lloyd k-means → inverted lists → probe → exact re-rank)
    * on a bit-exactness-engineered input: embeddings quantized to integers
    * by floor(x·64) (64 is a power of two, so the scale is EXACT in both
    * engines). Integer-valued vectors make every k-means sum exact in
    * double (order-independent across partitionings and engines), each
    * centroid one correctly-rounded division, and every distance/cosine a
    * fixed IEEE chain — the q41 engineered-subset philosophy applied to the
    * operator's input instead of its rows. The operator under test is the
    * real one, untouched. */
  def annIvfExact(s: SparkSession, d: String): DataFrame = {
    val e = s.read.parquet(s"$d/embeddings.parquet")
      .withColumn("vq",
        expr("transform(embedding, x -> cast(floor(cast(x as double) * 64d) as float))"))
    val q = e.filter(col("vec_id") < 50).select(col("vec_id").as("q_id"), col("vq").as("embedding"))
    val c = e.filter(col("vec_id") >= 50).select(col("vec_id").as("c_id"), col("vq").as("embedding"))
    graft.operators.Similarity.ivfCosine(s, q, c, k = 3, nLists = 16, nProbe = 4)
      .select(col("q_id"), col("c_id"), col("cos"), col("rnk"))
  }

  /** q94 oracle — the five Lloyd iterations unrolled as CTE chains:
    * assignment = per-candidate argmin over centroids via an ordered
    * squared-distance fold (ties → lowest list, the engine's strict `<`),
    * update = exact integer sum / count per (list, dim) with empty lists
    * keeping their previous centroid, probe = per-query top-nProbe by the
    * same fold, re-rank = exact cosine over the probed lists. */
  val annIvfExactSql: String = {
    val nLists = 16; val nProbe = 4; val iters = 5
    def dist(v: String, cv: String): String =
      s"list_reduce(list_transform(list_zip($v, $cv), " +
      s"pr -> (pr[1] - pr[2]) * (pr[1] - pr[2])), (a, b) -> a + b)"
    def assignCte(k: Int): String =
      s"""a$k AS (SELECT c_id, v, l FROM (
         |  SELECT c.c_id, c.v, ct.l,
         |    row_number() OVER (PARTITION BY c.c_id
         |      ORDER BY ${dist("c.v", "ct.cv")} ASC, ct.l ASC) AS rn
         |  FROM cvq c CROSS JOIN cent${k - 1} ct) WHERE rn = 1)""".stripMargin
    def updateCte(k: Int): String =
      s"""u$k AS (SELECT l, i, CAST(sum(x) AS DOUBLE) / count(*) AS cx
         |  FROM (SELECT l, unnest(v) AS x, generate_subscripts(v, 1) AS i FROM a$k)
         |  GROUP BY l, i),
         |cent$k AS (SELECT p.l, coalesce(u.cv, p.cv) AS cv
         |  FROM cent${k - 1} p LEFT JOIN
         |    (SELECT l, list(cx ORDER BY i) AS cv FROM u$k GROUP BY l) u
         |  ON p.l = u.l)""".stripMargin
    val loop = (1 to iters).map(k => s"${assignCte(k)},\n${updateCte(k)}").mkString(",\n")
    val dqc = dotSql("q.v", "a.v")
    val dqq = dotSql("q.v", "q.v")
    val dcc = dotSql("a.v", "a.v")
    s"""WITH cvq AS (SELECT vec_id AS c_id,
      |    list_transform(embedding, x -> floor(x::DOUBLE * 64)) AS v
      |  FROM embeddings WHERE vec_id >= 50),
      |qvq AS (SELECT vec_id AS q_id,
      |    list_transform(embedding, x -> floor(x::DOUBLE * 64)) AS v
      |  FROM embeddings WHERE vec_id < 50),
      |cent0 AS (SELECT row_number() OVER (ORDER BY c_id) - 1 AS l, v AS cv
      |  FROM (SELECT c_id, v FROM cvq ORDER BY c_id LIMIT $nLists)),
      |$loop,
      |af AS (SELECT c_id, v, l FROM (
      |  SELECT c.c_id, c.v, ct.l,
      |    row_number() OVER (PARTITION BY c.c_id
      |      ORDER BY ${dist("c.v", "ct.cv")} ASC, ct.l ASC) AS rn
      |  FROM cvq c CROSS JOIN cent$iters ct) WHERE rn = 1),
      |probe AS (SELECT q_id, v, l FROM (
      |  SELECT q.q_id, q.v, ct.l,
      |    row_number() OVER (PARTITION BY q.q_id
      |      ORDER BY ${dist("q.v", "ct.cv")} ASC, ct.l ASC) AS rn
      |  FROM qvq q CROSS JOIN cent$iters ct) WHERE rn <= $nProbe),
      |j AS (SELECT q.q_id, a.c_id,
      |    $dqc / (sqrt($dqq) * sqrt($dcc)) AS cos
      |  FROM probe q JOIN af a ON q.l = a.l),
      |r AS (SELECT *, row_number() OVER (PARTITION BY q_id
      |    ORDER BY cos DESC, c_id ASC) AS rnk FROM j)
      |SELECT q_id, c_id, cos, rnk FROM r WHERE rnk <= 3""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q95 — value-level hillshade oracle (VERDICT r3 #2: shaded VALUES, not
  // coverage counts)
  // ---------------------------------------------------------------------

  /** q95 engine side — the production warp("near") → halo-1 Stencil →
    * demKernel("hillshade") path on the quantized subset, exploded to one
    * row per shaded pixel. On integer payloads the Horn gradients are EXACT
    * dyadic rationals (float sums ≤ 1020 are exact; /(8·res) with res = 2
    * is a power-of-two division), so the one-sqrt algebraic gdaldem form is
    * a fixed chain of correctly-rounded IEEE ops — replayable per-pixel. */
  def hillshadeCells(s: SparkSession, d: String): DataFrame = {
    val imgs = quantNoRipple(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val nty = (target.h + Warp.TileSize - 1) / Warp.TileSize
    val tiles = Warp.warpToTiles(s, imgs, target, "near")
    val shade = graft.operators.Stencil(tiles, ntx, nty, halo = 1)(
      graft.operators.Stencil.demKernel("hillshade", target.res))
    shade.toDF()
      .select(col("image_id"), col("tx"), col("ty"),
              posexplode(col("payload")).as(Seq("pidx", "sv")))
      .filter(col("sv") =!= graft.sources.ImageTable.Ndv)
      .select(col("image_id"),
        (col("tx") * T + col("pidx") % T).cast("int").as("px"),
        (col("ty") * T + expr(s"cast(pidx div $T as int)")).cast("int").as("py"),
        col("sv").cast("double").as("shade"))
  }

  /** q95 oracle — per-image 3×3 neighborhoods via a 9-way offset explode +
    * group (an equi-join shape, no range join), Horn gradients as exact
    * integer sums, then the engine's algebraic shade chain op-for-op with
    * the light-direction transcendentals embedded as string-cast literals
    * (computed by the SAME JVM expressions demKernel hoists). */
  val hillshadeCellsSql: String = {
    def dlit(x: Double) = s"CAST('${x.toString}' AS DOUBLE)"
    val azR = math.toRadians(315.0); val altR = math.toRadians(45.0)
    val sinAlt = dlit(math.sin(altR)); val cosAlt = dlit(math.cos(altR))
    val sinAz = dlit(math.sin(azR)); val cosAz = dlit(math.cos(azR))
    s"""${cellSql(trendOnly = false)},
       |nb AS (SELECT i, x - ox AS cx, y - oy AS cy, ox, oy, v
       |  FROM cells, (VALUES (-1, -1), (0, -1), (1, -1), (-1, 0), (0, 0),
       |                      (1, 0), (-1, 1), (0, 1), (1, 1)) d(ox, oy)),
       |hs AS (SELECT i, cx, cy,
       |    sum(CASE WHEN ox = 1 THEN (CASE WHEN oy = 0 THEN 2 ELSE 1 END) * v
       |             WHEN ox = -1 THEN -(CASE WHEN oy = 0 THEN 2 ELSE 1 END) * v
       |             ELSE 0 END)::BIGINT AS gx,
       |    sum(CASE WHEN oy = 1 THEN (CASE WHEN ox = 0 THEN 2 ELSE 1 END) * v
       |             WHEN oy = -1 THEN -(CASE WHEN ox = 0 THEN 2 ELSE 1 END) * v
       |             ELSE 0 END)::BIGINT AS gy
       |  FROM nb GROUP BY i, cx, cy
       |  HAVING count(*) = 9),
       |sh AS (SELECT i, cx, cy, gx / (8 * tres) AS p, gy / (8 * tres) AS q
       |  FROM hs, tgt)
       |SELECT printf('img_%08d_%s_%02d00', i,
       |    strftime(DATE '2024-01-01' + INTERVAL ((i * 3) % 360) DAY, '%Y%m%d'),
       |    i % 24) AS image_id,
       |  cx::INT AS px, cy::INT AS py,
       |  CAST(CAST(255.0::DOUBLE * greatest(0.0::DOUBLE,
       |    ($sinAlt + $cosAlt * ($cosAz * q - $sinAz * p))
       |    / sqrt((1.0::DOUBLE + p * p) + q * q)) AS FLOAT) AS DOUBLE) AS shade
       |FROM sh""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q96 — value-level gaussian-smooth oracle (VERDICT r3 #2 stretch goal)
  // ---------------------------------------------------------------------

  /** q96 engine side — the production warp("near") → halo-4 Stencil →
    * separable masked gaussKernel(σ=1.5) path (q48's exact kernel) on the
    * quantized subset, exploded to one row per smoothed pixel. */
  def gaussCells(s: SparkSession, d: String): DataFrame = {
    val imgs = quantNoRipple(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val nty = (target.h + Warp.TileSize - 1) / Warp.TileSize
    val tiles = Warp.warpToTiles(s, imgs, target, "near")
    val sm = graft.operators.Stencil(tiles, ntx, nty, halo = 4)(
      graft.operators.Stencil.gaussKernel(1.5))
    sm.toDF()
      .select(col("image_id"), col("tx"), col("ty"),
              posexplode(col("payload")).as(Seq("pidx", "sv")))
      .filter(col("sv") =!= graft.sources.ImageTable.Ndv)
      .select(col("image_id"),
        (col("tx") * T + col("pidx") % T).cast("int").as("px"),
        (col("ty") * T + expr(s"cast(pidx div $T as int)")).cast("int").as("py"),
        col("sv").cast("double").as("sv"))
  }

  /** q96 oracle — both separable passes replayed with the engine's w1 taps
    * embedded as string-cast literals: each pass is a per-center ordered
    * left fold over the present (valid-contributor) terms in offset order —
    * skipped NDV terms contribute exactly +0.0 in the engine, so folding
    * only the present terms is the identical IEEE chain (list_reduce from
    * the first element ≡ Scala's fold from 0.0). Mask preserved by joining
    * centers back to the valid cell set; ws > 0 mirrors the engine gate. */
  val gaussCellsSql: String = {
    val w1 = graft.operators.Stencil.gaussWeights(1.5)
    val r = w1.length / 2
    val taps = w1.zipWithIndex
      .map { case (wt, idx) => s"(${idx - r}, CAST('${wt.toString}' AS DOUBLE))" }
      .mkString(", ")
    s"""${cellSql(trendOnly = false)},
       |w AS (SELECT * FROM (VALUES $taps) w(dx, wt)),
       |hc AS (SELECT c.i, c.y, c.x - w.dx AS x, w.dx, c.v * w.wt AS term, w.wt
       |  FROM cells c CROSS JOIN w),
       |hp AS (SELECT i, y, x,
       |    list_reduce(list(term ORDER BY dx), (a, b) -> a + b) AS ns,
       |    list_reduce(list(wt ORDER BY dx), (a, b) -> a + b) AS ms
       |  FROM hc GROUP BY i, y, x),
       |vc AS (SELECT h.i, h.x, h.y - w.dx AS y, w.dx AS dy,
       |    h.ns * w.wt AS tn, h.ms * w.wt AS tm
       |  FROM hp h CROSS JOIN w),
       |vp AS (SELECT i, x, y,
       |    list_reduce(list(tn ORDER BY dy), (a, b) -> a + b) AS s,
       |    list_reduce(list(tm ORDER BY dy), (a, b) -> a + b) AS ws
       |  FROM vc GROUP BY i, x, y)
       |SELECT printf('img_%08d_%s_%02d00', i,
       |    strftime(DATE '2024-01-01' + INTERVAL ((i * 3) % 360) DAY, '%Y%m%d'),
       |    i % 24) AS image_id,
       |  x::INT AS px, y::INT AS py,
       |  CAST(CAST(s / ws AS FLOAT) AS DOUBLE) AS sv
       |FROM vp JOIN cells USING (i, x, y) WHERE ws > 0""".stripMargin
  }

  /** q98 engine side — the production RANSAC per-cell robust trend
    * (StackOps.ransac: splitmix-seeded 2-point hypotheses, NMAD threshold,
    * best-trial inlier OLS refit) on the q76 input (trend subset, clipped
    * 4×4 tile window), outputs UNROUNDED. On this subset every arithmetic
    * step is exact or a fixed correctly-rounded chain: t = days + hr/24 is
    * an exactly-representable dyadic (3 fraction bits), y is integer, so
    * medians/NMAD/hypothesis slopes/inlier residuals and ALL refit sums are
    * replayable (the sums are exact in double, hence fold-order-free). */
  def ransacCells(s: SparkSession, d: String): DataFrame = {
    val imgs = trendSubset(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val tiles = StackOps.stackClip(Warp.warpToTiles(s, imgs, target, "near"), 0, 0, 3, 3)
    StackOps.ransac(StackOps.toCells(tiles))
      .select(
        expr(s"cast((cell_id div $T2) % $ntx as int) * $T + cast((cell_id % $T2) % $T as int)").as("px"),
        expr(s"cast((cell_id div $T2) div $ntx as int) * $T + cast((cell_id % $T2) div $T as int)").as("py"),
        col("n"),
        nanvl(col("slope_yr"), lit(-9999.0)).as("slope_yr"),
        nanvl(col("intercept"), lit(-9999.0)).as("intercept"),
        col("n_inliers"))
  }

  /** q98 oracle — the r3 "splitmix64 has no DuckDB twin" verdict overturned:
    * the wrapping 64-bit multiplies replay EXACTLY in HUGEINT with 32-bit
    * limb splitting (a·b mod 2⁶⁴ = (a·b_lo + (a·b_hi mod 2³²)·2³²) mod 2⁶⁴;
    * every intermediate < 2⁹⁷ < HUGEINT), shifts are integer divisions of
    * non-negative values, and xor is 128-bit-safe below 2⁶⁴. The seed
    * products never wrap (cell ids are small), floorMod is
    * ((z_signed % n) + n) % n. The rest is order statistics (q76 medians),
    * a 16-trial hypothesis × point inlier join, best-(count, trial) pick,
    * and exact-sum OLS refit. */
  val ransacCellsSql: String = {
    val two32 = BigInt(1) << 32; val two64 = BigInt(1) << 64
    def u(x: Long): BigInt = BigInt(x) & (two64 - 1)
    val c1 = u(0xbf58476d1ce4e5b9L); val c2 = u(0x94d049bb133111ebL)
    val add = u(0x9e3779b97f4a7c15L)
    def mulmod(a: String, c: BigInt): String =
      s"(($a * ${c % two32} + (($a * ${c / two32}) % $two32) * $two32) % $two64)"
    def shr(z: String, k: Int): String = s"($z // ${BigInt(1) << k})"
    // one splitmix application to column z (non-negative HUGEINT < 2^64)
    def mix(z: String): String = {
      val z1 = s"(($z + $add) % $two64)"
      val a1 = s"xor($z1, ${shr(z1, 30)})"
      val z2 = mulmod(a1, c1)
      val a2 = s"xor($z2, ${shr(z2, 27)})"
      val z3 = mulmod(a2, c2)
      s"xor($z3, ${shr(z3, 31)})"
    }
    val fm = // floorMod of the signed reinterpretation by n
      s"""(((CASE WHEN mz >= ${two64 / 2} THEN mz - $two64 ELSE mz END % n) + n) % n)"""
    s"""${cellSql(trendOnly = true)},
       |w0 AS (SELECT i, x, y, v::DOUBLE AS v,
       |    CAST(((19723 + day) * 86400 + hr * 3600)::BIGINT * 1000000 AS DOUBLE)
       |      / 86400000000.0::DOUBLE AS t
       |  FROM cells WHERE x < 256 AND y < 256),
       |tg AS (SELECT (SELECT (ns + 63) // 64 FROM tgt) AS ntx),
       |w AS (SELECT ((y // 64) * ntx + (x // 64)) * 4096
       |        + (y % 64) * 64 + (x % 64) AS cell_id, x, y, v, t,
       |      row_number() OVER (PARTITION BY x, y ORDER BY t, v) - 1 AS rn
       |      FROM w0, tg),
       |g AS (SELECT cell_id, min(x) AS x, min(y) AS y, count(*)::INT AS n,
       |        count(DISTINCT t) AS ndt FROM w GROUP BY cell_id),
       |${"" /* per-cell NMAD threshold via exact order statistics */}
       |yr AS (SELECT cell_id, v, row_number() OVER (PARTITION BY cell_id ORDER BY v) AS rn,
       |        count(*) OVER (PARTITION BY cell_id) AS cnt FROM w),
       |med AS (SELECT cell_id,
       |    sum(v) FILTER (WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1) /
       |    count(*) FILTER (WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1) AS m
       |  FROM yr GROUP BY cell_id),
       |dv AS (SELECT w.cell_id, abs(w.v - med.m) AS d
       |       FROM w JOIN med USING (cell_id)),
       |dvr AS (SELECT cell_id, d, row_number() OVER (PARTITION BY cell_id ORDER BY d) AS rn,
       |        count(*) OVER (PARTITION BY cell_id) AS cnt FROM dv),
       |mad AS (SELECT cell_id,
       |    sum(d) FILTER (WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1) /
       |    count(*) FILTER (WHERE rn = (cnt + 1) // 2 OR rn = cnt // 2 + 1) AS m
       |  FROM dvr GROUP BY cell_id),
       |thr AS (SELECT cell_id,
       |    greatest(1.4826::DOUBLE * mad.m, 0.000000001::DOUBLE) AS thr
       |  FROM mad),
       |${"" /* 16 trials: splitmix both seeds, floorMod to indices */}
       |tr AS (SELECT g.cell_id, g.n, tt.t AS trial,
       |    (g.cell_id * 1000003 + tt.t)::HUGEINT AS s1,
       |    (g.cell_id * 998244353 + tt.t * 31 + 7)::HUGEINT AS s2
       |  FROM g, generate_series(0, 15) tt(t) WHERE g.n >= 2 AND g.ndt >= 2),
       |mz AS (SELECT cell_id, n, trial, which, ${mix("z")} AS mz FROM (
       |    SELECT cell_id, n::HUGEINT AS n, trial, 1 AS which, s1 AS z FROM tr
       |    UNION ALL
       |    SELECT cell_id, n::HUGEINT, trial, 2, s2 FROM tr)),
       |ix AS (SELECT cell_id, trial,
       |    max(CASE WHEN which = 1 THEN f END)::BIGINT AS i0,
       |    max(CASE WHEN which = 2 THEN f END)::BIGINT AS j0,
       |    max(n)::BIGINT AS n
       |  FROM (SELECT cell_id, n, trial, which, $fm AS f FROM mz)
       |  GROUP BY cell_id, trial),
       |ij AS (SELECT cell_id, trial, i0 AS i,
       |    CASE WHEN j0 = i0 THEN (j0 + 1) % n ELSE j0 END AS j FROM ix),
       |hyp AS (SELECT ij.cell_id, ij.trial,
       |    (pj.v - pi.v) / (pj.t - pi.t) AS sl,
       |    pi.v - (pj.v - pi.v) / (pj.t - pi.t) * pi.t AS ic
       |  FROM ij
       |  JOIN w pi ON pi.cell_id = ij.cell_id AND pi.rn = ij.i
       |  JOIN w pj ON pj.cell_id = ij.cell_id AND pj.rn = ij.j
       |  WHERE pi.t <> pj.t),
       |inl AS (SELECT h.cell_id, h.trial, h.sl, h.ic, count(*)::INT AS ninl
       |  FROM hyp h JOIN w ON w.cell_id = h.cell_id JOIN thr ON thr.cell_id = h.cell_id
       |  WHERE abs(w.v - (h.sl * w.t + h.ic)) <= thr.thr
       |  GROUP BY h.cell_id, h.trial, h.sl, h.ic),
       |best AS (SELECT cell_id, trial, sl, ic, ninl FROM (
       |    SELECT *, row_number() OVER (PARTITION BY cell_id
       |      ORDER BY ninl DESC, trial ASC) AS rk FROM inl) WHERE rk = 1),
       |${"" /* exact-sum OLS refit over the winning inlier set */}
       |fit AS (SELECT b.cell_id, b.ninl,
       |    count(*)::DOUBLE AS m, sum(w.t) AS st, sum(w.v) AS sy,
       |    sum(w.t * w.t) AS stt, sum(w.t * w.v) AS sty
       |  FROM best b JOIN w ON w.cell_id = b.cell_id
       |              JOIN thr ON thr.cell_id = b.cell_id
       |  WHERE abs(w.v - (b.sl * w.t + b.ic)) <= thr.thr
       |  GROUP BY b.cell_id, b.ninl),
       |res AS (SELECT cell_id, ninl, m, st, sy, stt, sty,
       |    m * stt - st * st AS det,
       |    (m * sty - st * sy) / nullif(m * stt - st * st, 0.0) AS sl
       |  FROM fit)
       |SELECT g.x::INT AS px, g.y::INT AS py, g.n,
       |  CASE WHEN res.det IS NOT NULL AND res.det <> 0.0 AND res.ninl >= 2
       |       THEN res.sl * 365.25::DOUBLE ELSE -9999.0 END AS slope_yr,
       |  CASE WHEN res.det IS NOT NULL AND res.det <> 0.0 AND res.ninl >= 2
       |       THEN (res.sy - res.sl * res.st) / res.m ELSE -9999.0 END AS intercept,
       |  CASE WHEN res.ninl IS NULL THEN 0
       |       WHEN res.ninl < 2 THEN 0 ELSE res.ninl END AS n_inliers
       |FROM g LEFT JOIN res ON g.cell_id = res.cell_id""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q97 — DuckDB twin of the end-to-end training flagship (Flagship
  // .trainingPipeline): quality/lang filter → text MinHash-LSH pairs → CC →
  // keepers, plus aHash bands → hash-level CC → image keepers; the final
  // keeper manifest (kind, id) is what the snapshot commit/read roundtrip
  // must reproduce. Both CC chains double 8 rounds — covering dist-to-min
  // up to 2⁸ = 256, vastly past the measured fixture depths (text 1,
  // image 21); the engine iterates to TRUE convergence, so the unrolled
  // bound is oracle-side insurance, and only the fixpoint is compared.
  // ---------------------------------------------------------------------
  val trainingFlagshipSql: String = {
    def ccRound(pfx: String, r: Int): String =
      s"""${pfx}p$r AS MATERIALIZED (SELECT id, min(lbl) AS lbl FROM (
         |  SELECT id, lbl FROM ${pfx}l${r - 1}
         |  UNION ALL
         |  SELECT e.b AS id, ${pfx}l${r - 1}.lbl
         |  FROM ${pfx}sym e JOIN ${pfx}l${r - 1} ON e.a = ${pfx}l${r - 1}.id)
         |  GROUP BY id),
         |${pfx}l$r AS MATERIALIZED (SELECT a.id, least(a.lbl, b.lbl) AS lbl
         |  FROM ${pfx}p$r a JOIN ${pfx}p$r b ON a.lbl = b.id)""".stripMargin
    s"""$featurePxSql,
       |$ahashCteSql,
       |ids AS MATERIALIZED (SELECT image_id, ahash::BIGINT AS ph FROM ah),
       |hs AS (SELECT DISTINCT ph FROM ids),
       |ipr AS MATERIALIZED (
       |  SELECT a.ph AS p1, b.ph AS p2
       |  FROM hs a JOIN hs b ON a.ph < b.ph
       |  WHERE bit_count(xor(a.ph, b.ph)) <= 8 AND (
       |          ((a.ph >> 0)  & 65535) = ((b.ph >> 0)  & 65535) OR
       |          ((a.ph >> 16) & 65535) = ((b.ph >> 16) & 65535) OR
       |          ((a.ph >> 32) & 65535) = ((b.ph >> 32) & 65535) OR
       |          ((a.ph >> 48) & 65535) = ((b.ph >> 48) & 65535))),
       |isym AS MATERIALIZED (SELECT p1 AS a, p2 AS b FROM ipr
       |        UNION ALL SELECT p2, p1 FROM ipr),
       |il0 AS MATERIALIZED (SELECT ph AS id, ph AS lbl FROM hs),
       |${(1 to 8).map(r => ccRound("i", r)).mkString(",\n")},
       |iex AS MATERIALIZED (SELECT ph, min(image_id) AS comp_exact
       |        FROM ids GROUP BY ph),
       |icl AS (SELECT il8.lbl AS component, min(iex.comp_exact) AS comp_all
       |        FROM il8 JOIN iex ON iex.ph = il8.id GROUP BY il8.lbl),
       |fd AS MATERIALIZED (
       |  SELECT doc_id, text FROM (
       |    SELECT doc_id, text,
       |      round(least(((length(text) - length(regexp_replace(text, ' the ', ' ', 'g'))) / 4
       |           + (length(text) - length(regexp_replace(text, ' a ', ' ', 'g'))) / 2
       |           + (length(text) - length(regexp_replace(text, ' of ', ' ', 'g'))) / 3
       |           + (length(text) - length(regexp_replace(text, ' and ', ' ', 'g'))) / 4)::DOUBLE
       |            / len(string_split_regex(trim(text), ' +')) * 4, 1.0) * 0.5 +
       |        CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 0.5 ELSE 0.0 END, 6)
       |        AS quality,
       |      CASE WHEN score_en >= score_de AND score_en >= score_es THEN 'en'
       |           WHEN score_de >= score_es THEN 'de' ELSE 'es' END AS pred_lang
       |    FROM (SELECT doc_id, text,
       |      ((length(text) - length(regexp_replace(text, ' the ', ' ', 'g'))) / 4
       |     + (length(text) - length(regexp_replace(text, ' of ',  ' ', 'g'))) / 3
       |     + (length(text) - length(regexp_replace(text, ' and ', ' ', 'g'))) / 4)::BIGINT AS score_en,
       |      ((length(text) - length(regexp_replace(text, ' der ', ' ', 'g'))) / 4
       |     + (length(text) - length(regexp_replace(text, ' und ', ' ', 'g'))) / 4
       |     + (length(text) - length(regexp_replace(text, ' das ', ' ', 'g'))) / 4)::BIGINT AS score_de,
       |      ((length(text) - length(regexp_replace(text, ' el ',  ' ', 'g'))) / 3
       |     + (length(text) - length(regexp_replace(text, ' los ', ' ', 'g'))) / 4
       |     + (length(text) - length(regexp_replace(text, ' que ', ' ', 'g'))) / 4)::BIGINT AS score_es
       |     FROM documents))
       |  WHERE quality >= 0.5 AND pred_lang = 'en'),
       |${Text.shinglesSqlFrom("fd")},
       |tsig AS MATERIALIZED (
       |  SELECT doc_id,
       |    md5(min(('0x'||substr(md5('0:'||sh),1,8))::BIGINT)::VARCHAR || ':' ||
       |        min(('0x'||substr(md5('1:'||sh),1,8))::BIGINT)::VARCHAR) AS band0,
       |    md5(min(('0x'||substr(md5('2:'||sh),1,8))::BIGINT)::VARCHAR || ':' ||
       |        min(('0x'||substr(md5('3:'||sh),1,8))::BIGINT)::VARCHAR) AS band1
       |  FROM sh GROUP BY doc_id),
       |tpr AS MATERIALIZED (
       |  SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
       |  FROM tsig a JOIN tsig b
       |    ON (a.band0 = b.band0 OR a.band1 = b.band1) AND a.doc_id < b.doc_id),
       |tsym AS MATERIALIZED (SELECT d1 AS a, d2 AS b FROM tpr
       |        UNION ALL SELECT d2, d1 FROM tpr),
       |tl0 AS MATERIALIZED (SELECT doc_id AS id, doc_id AS lbl FROM fd),
       |${(1 to 8).map(r => ccRound("t", r)).mkString(",\n")}
       |SELECT 'doc' AS kind, id::VARCHAR AS id FROM tl8 WHERE id = lbl
       |UNION ALL
       |SELECT 'img' AS kind, comp_all AS id FROM icl""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q102 — cross-CRS warp oracle (VERDICT r4 #1): the full reprojection
  // chain replayed INDEPENDENTLY in DuckDB
  // ---------------------------------------------------------------------

  /** Fixed two-image fixture in EPSG:32610 (UTM 10N), integer payloads,
    * fully valid (no NDV margins): the closed-form pixel values make every
    * emitted number an integer DECISION rather than a float, so the oracle
    * can recompute the spherical projections with ITS OWN libm (DuckDB
    * sin/cos/atan2/ln differ from the JVM in the last ulp) and still match
    * strictly — WarpCrossOracleSpec certifies every floor/ceil/round
    * decision is stable under ±1e-9 perturbation of all
    * transcendental-derived intermediates (the q85/q90 isolated-argmax
    * precedent generalized). */
  private[graft] val wcGrids: Seq[graft.geo.GridSpec] = Seq(
    graft.geo.GridSpec(500000.0, 5300000.0, 64.0, "EPSG:32610", 48, 40),
    graft.geo.GridSpec(500800.0, 5299200.0, 96.0, "EPSG:32610", 40, 32))

  private[graft] def wcValue(i: Int, cx: Int, cy: Int): Int =
    if (i == 0) 1 + (cx * 7 + cy * 13) % 199 else 1 + (cx * 11 + cy * 5) % 173

  /** Bilinear decisions are quantized to 1/WcQ before hashing; the spec
    * certifies the quantization margins. */
  private[graft] val WcQ = 16.0

  private[graft] def wcImages(s: SparkSession): DataFrame = {
    val rows = wcGrids.zipWithIndex.map { case (g, i) =>
      val px = Array.tabulate(g.w * g.h)(idx => wcValue(i, idx % g.w, idx / g.w).toFloat)
      graft.sources.ImageRow(s"wc$i", graft.sources.Codec.encode(px, g.w, g.h, "raw"),
        g.w, g.h, "raw", "", 0L, g.ulx, g.uly, g.res, g.crs,
        graft.sources.ImageTable.Ndv.toDouble,
        new java.sql.Timestamp(86400000L * (i + 1)))
    }
    import s.implicits._
    s.createDataset(rows).toDF()
  }

  /** Pure-Scala replica of the cross-CRS `Warp.analyze("min", "union",
    * tSrs = 4326)` on the fixture — its grid parameters are embedded into
    * the SQL twin as literals (the q93 constant-embedding technique);
    * WarpCrossOracleSpec asserts it equals the Spark analyze exactly. */
  private[graft] def wcTarget: graft.geo.GridSpec = {
    val tcrs = "EPSG:4326"
    val res = wcGrids.map(g => graft.geo.Proj.resIn(g, tcrs, "sphere")).min
    val ext = graft.geo.Extent.unionAll(
      wcGrids.map(g =>
        graft.geo.Proj.projectExtent(g.extent, g.crs, tcrs, datum = "sphere")))
    graft.geo.GridSpec.fromExtentRes(ext, res, tcrs)
  }

  /** q102 engine side: analyze(tSrs=4326) → cross-CRS warp with BOTH the
    * near and bilinear kernels → integer decisions per target pixel
    * (near: the integer source value itself; bilinear: floor(v·WcQ + ½) of
    * the float32 payload). (px, py) presence IS the tile-assignment check. */
  def warpCross(s: SparkSession, d: String): DataFrame = {
    val imgs = wcImages(s)
    val target = Warp.analyze(imgs, "min", "union", tSrs = "EPSG:4326",
      datum = "sphere")
    def cells(kernel: String): DataFrame =
      Warp.warpToTiles(s, imgs, target, kernel, datum = "sphere").toDF()
        .select(col("image_id"), col("tx"), col("ty"),
                posexplode(col("payload")).as(Seq("pidx", "v")))
        .filter(col("v") =!= graft.sources.ImageTable.Ndv)
        .select(substring(col("image_id"), 3, 1).cast("int").as("img"),
          (col("tx") * T + col("pidx") % T).cast("int").as("px"),
          (col("ty") * T + expr(s"cast(pidx div $T as int)")).cast("int").as("py"),
          col("v"))
    cells("near").select(col("img"), lit("near").as("krn"), col("px"), col("py"),
        floor(col("v").cast("double") + 0.5).cast("long").as("q"))
      .unionByName(cells("bilinear").select(col("img"), lit("bil").as("krn"),
        col("px"), col("py"),
        floor(col("v").cast("double") * WcQ + 0.5).cast("long").as("q")))
  }

  /** q102 oracle: per-image pixel bounds from the DENSIFIED projected
    * footprint (22 samples per edge through the exp-form spherical-TM
    * inverse), then per-pixel forward TM (lon/lat → UTM) with DuckDB's own
    * transcendentals, nearest / bilinear sampling over the closed-form
    * integer payload, and the same integer decisions. Embedded literals:
    * the target grid (engine analyze output) and k0·R. */
  val warpCrossSql: String = {
    def dlit(x: Double) = s"CAST('${x.toString}' AS DOUBLE)"
    val t = wcTarget
    val kR = 0.9996 * graft.geo.Proj.R
    val (tulx, tuly, tres) = (dlit(t.ulx), dlit(t.uly), dlit(t.res))
    val kRl = dlit(kR)
    val imgsRows = wcGrids.zipWithIndex.map { case (g, i) =>
      s"($i, ${g.ulx}, ${g.uly}, ${g.res}, ${g.w}, ${g.h})"
    }.mkString(", ")
    s"""WITH imgs(i, gulx, guly, gres, gw, gh) AS (VALUES $imgsRows),
       |tgt AS (SELECT $tulx AS tulx, $tuly AS tuly, $tres AS tres,
       |               ${t.w} AS tw, ${t.h} AS th),
       |-- densified source-footprint boundary (Proj.projectExtent: 22
       |-- samples per edge), inverse-projected with exp-form sinh/cosh
       |edge AS (SELECT i, gulx + CASE WHEN e.f IN (0, 1) THEN s.t / 21.0 * gw * gres
       |                               WHEN e.f = 2 THEN 0 ELSE gw * gres END AS bx,
       |               (guly - gh * gres) + CASE WHEN e.f IN (2, 3) THEN s.t / 21.0 * gh * gres
       |                               WHEN e.f = 0 THEN 0 ELSE gh * gres END AS by
       |  FROM imgs, generate_series(0, 21) s(t), (VALUES (0), (1), (2), (3)) e(f)),
       |lls AS (SELECT i,
       |    -123.0 + degrees(atan2((exp(xp) - exp(-xp)) / 2, cos(dp))) AS lon,
       |    degrees(asin(sin(dp) / ((exp(xp) + exp(-xp)) / 2))) AS lat
       |  FROM (SELECT i, (bx - 500000.0) / $kRl AS xp, by / $kRl AS dp FROM edge)),
       |bbox AS (SELECT i, min(lon) AS bxmin, min(lat) AS bymin,
       |                max(lon) AS bxmax, max(lat) AS bymax FROM lls GROUP BY i),
       |-- Warp.pixelBounds: clip to the target extent, floor/ceil to pixels
       |bnds AS (SELECT i, gulx, guly, gres, gw, gh,
       |    greatest(0, floor((greatest(bxmin, tulx) - tulx) / tres)::INT) AS px0,
       |    least(tw - 1, ceil((least(bxmax, tulx + tw * tres) - tulx) / tres)::INT - 1) AS px1,
       |    greatest(0, floor((tuly - least(bymax, tuly)) / tres)::INT) AS py0,
       |    least(th - 1, ceil((tuly - greatest(bymin, tuly - th * tres)) / tres)::INT - 1) AS py1
       |  FROM bbox JOIN imgs USING (i), tgt),
       |pxl AS (SELECT i, gulx, guly, gres, gw, gh, gx.px, gy.py
       |  FROM bnds, tgt, generate_series(0, ${t.w - 1}) gx(px),
       |       generate_series(0, ${t.h - 1}) gy(py)
       |  WHERE gx.px BETWEEN px0 AND px1 AND gy.py BETWEEN py0 AND py1),
       |-- per-pixel: target center → lon/lat (identity in 4326) → forward
       |-- spherical TM (Proj.TmercSphere) → fractional source pixel
       |frac AS (SELECT i, px, py, gw, gh,
       |    (500000.0 + $kRl * (0.5 * ln((1 + b) / (1 - b))) - gulx) / gres - 0.5 AS pxf,
       |    (guly - ($kRl * atan2(tan(lr), cos(dl)))) / gres - 0.5 AS pyf
       |  FROM (SELECT i, px, py, gulx, guly, gres, gw, gh,
       |          cos(lr) * sin(dl) AS b, lr, dl
       |        FROM (SELECT i, px, py, gulx, guly, gres, gw, gh,
       |                radians((tulx + (px + 0.5) * tres) - -123.0) AS dl,
       |                radians(tuly - (py + 0.5) * tres) AS lr
       |              FROM pxl, tgt))),
       |near AS (SELECT i, px, py, floor(pxf + 0.5)::INT AS cx, floor(pyf + 0.5)::INT AS cy,
       |                gw, gh FROM frac),
       |bil0 AS (SELECT i, px, py, gw, gh, floor(pxf)::INT AS x0, floor(pyf)::INT AS y0,
       |                pxf - floor(pxf) AS fx, pyf - floor(pyf) AS fy FROM frac),
       |-- engine neighbor order (0,0),(1,0),(0,1),(1,1); out-of-bounds terms
       |-- are +0.0 — the identical IEEE chain (q96 skipped-term precedent)
       |bil AS (SELECT i, px, py,
       |    (((CASE WHEN x0 >= 0 AND x0 < gw AND y0 >= 0 AND y0 < gh
       |         THEN v00 * ((1 - fx) * (1 - fy)) ELSE 0 END
       |     + CASE WHEN x0 + 1 >= 0 AND x0 + 1 < gw AND y0 >= 0 AND y0 < gh
       |         THEN v10 * (fx * (1 - fy)) ELSE 0 END)
       |     + CASE WHEN x0 >= 0 AND x0 < gw AND y0 + 1 >= 0 AND y0 + 1 < gh
       |         THEN v01 * ((1 - fx) * fy) ELSE 0 END)
       |     + CASE WHEN x0 + 1 >= 0 AND x0 + 1 < gw AND y0 + 1 >= 0 AND y0 + 1 < gh
       |         THEN v11 * (fx * fy) ELSE 0 END) AS vsum,
       |    (((CASE WHEN x0 >= 0 AND x0 < gw AND y0 >= 0 AND y0 < gh
       |         THEN (1 - fx) * (1 - fy) ELSE 0 END
       |     + CASE WHEN x0 + 1 >= 0 AND x0 + 1 < gw AND y0 >= 0 AND y0 < gh
       |         THEN fx * (1 - fy) ELSE 0 END)
       |     + CASE WHEN x0 >= 0 AND x0 < gw AND y0 + 1 >= 0 AND y0 + 1 < gh
       |         THEN (1 - fx) * fy ELSE 0 END)
       |     + CASE WHEN x0 + 1 >= 0 AND x0 + 1 < gw AND y0 + 1 >= 0 AND y0 + 1 < gh
       |         THEN fx * fy ELSE 0 END) AS wsum
       |  FROM (SELECT *,
       |      CASE WHEN i = 0 THEN 1 + (x0 * 7 + y0 * 13) % 199
       |           ELSE 1 + (x0 * 11 + y0 * 5) % 173 END::DOUBLE AS v00,
       |      CASE WHEN i = 0 THEN 1 + ((x0 + 1) * 7 + y0 * 13) % 199
       |           ELSE 1 + ((x0 + 1) * 11 + y0 * 5) % 173 END::DOUBLE AS v10,
       |      CASE WHEN i = 0 THEN 1 + (x0 * 7 + (y0 + 1) * 13) % 199
       |           ELSE 1 + (x0 * 11 + (y0 + 1) * 5) % 173 END::DOUBLE AS v01,
       |      CASE WHEN i = 0 THEN 1 + ((x0 + 1) * 7 + (y0 + 1) * 13) % 199
       |           ELSE 1 + ((x0 + 1) * 11 + (y0 + 1) * 5) % 173 END::DOUBLE AS v11
       |    FROM bil0))
       |SELECT i AS img, 'near' AS krn, px, py,
       |    (CASE WHEN i = 0 THEN 1 + (cx * 7 + cy * 13) % 199
       |          ELSE 1 + (cx * 11 + cy * 5) % 173 END)::BIGINT AS q
       |  FROM near WHERE cx >= 0 AND cx < gw AND cy >= 0 AND cy < gh
       |UNION ALL
       |SELECT i AS img, 'bil' AS krn, px, py,
       |    floor(CAST(vsum / wsum AS FLOAT)::DOUBLE * ${WcQ} + 0.5)::BIGINT AS q
       |  FROM bil WHERE wsum > 0""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q105 — ELLIPSOIDAL cross-CRS warp oracle (VERDICT r5 #1): the Krüger
  // transverse-Mercator and Snyder ellipsoidal polar-stereo chains
  // replayed INDEPENDENTLY in DuckDB
  // ---------------------------------------------------------------------

  /** Two-CRS fixture — one image in EPSG:32623 (UTM 23N, Krüger series)
    * and one in EPSG:3413 (NSIDC polar stereo, Snyder ellipsoidal forms),
    * both over the same ~73°N patch on the zone-23 central meridian,
    * warped to a common EPSG:4326 grid. Same integer-decision technique
    * as q102 (closed-form integer payloads, WarpEllOracleSpec certifies
    * every decision's ±1e-9 perturbation margin); the oracle recomputes
    * BOTH series chains — conformal latitude, α/β/δ sums, the 15-9
    * half-angle function — with DuckDB's own libm, the series
    * coefficients entering as embedded constants exactly like q102's
    * k0·R. */
  private[graft] val weGrids: Seq[graft.geo.GridSpec] = Seq(
    graft.geo.GridSpec(497952.0, 8110000.0, 64.0, "EPSG:32623", 64, 48),
    graft.geo.GridSpec(-1920.0, -1853568.0, 96.0, "EPSG:3413", 48, 40))

  private[graft] def weValue(i: Int, cx: Int, cy: Int): Int =
    if (i == 0) 1 + (cx * 7 + cy * 13) % 199 else 1 + (cx * 11 + cy * 5) % 173

  private[graft] def weImages(s: SparkSession): DataFrame = {
    val rows = weGrids.zipWithIndex.map { case (g, i) =>
      val px = Array.tabulate(g.w * g.h)(idx => weValue(i, idx % g.w, idx / g.w).toFloat)
      graft.sources.ImageRow(s"we$i", graft.sources.Codec.encode(px, g.w, g.h, "raw"),
        g.w, g.h, "raw", "", 0L, g.ulx, g.uly, g.res, g.crs,
        graft.sources.ImageTable.Ndv.toDouble,
        new java.sql.Timestamp(86400000L * (i + 1)))
    }
    import s.implicits._
    s.createDataset(rows).toDF()
  }

  /** Pure-Scala replica of the ELLIPSOIDAL `Warp.analyze("min", "union",
    * tSrs = 4326)` (default datum) — embedded into the SQL twin as
    * literals; WarpEllOracleSpec asserts it equals the Spark analyze. */
  private[graft] def weTarget: graft.geo.GridSpec = {
    val tcrs = "EPSG:4326"
    val res = weGrids.map(g => graft.geo.Proj.resIn(g, tcrs)).min
    val ext = graft.geo.Extent.unionAll(
      weGrids.map(g => graft.geo.Proj.projectExtent(g.extent, g.crs, tcrs)))
    graft.geo.GridSpec.fromExtentRes(ext, res, tcrs)
  }

  /** q105 engine side: ellipsoidal analyze → cross-CRS warp (near +
    * bilinear) → the q102 integer decisions. */
  def warpCrossEll(s: SparkSession, d: String): DataFrame = {
    val imgs = weImages(s)
    val target = Warp.analyze(imgs, "min", "union", tSrs = "EPSG:4326")
    def cells(kernel: String): DataFrame =
      Warp.warpToTiles(s, imgs, target, kernel).toDF()
        .select(col("image_id"), col("tx"), col("ty"),
                posexplode(col("payload")).as(Seq("pidx", "v")))
        .filter(col("v") =!= graft.sources.ImageTable.Ndv)
        .select(substring(col("image_id"), 3, 1).cast("int").as("img"),
          (col("tx") * T + col("pidx") % T).cast("int").as("px"),
          (col("ty") * T + expr(s"cast(pidx div $T as int)")).cast("int").as("py"),
          col("v"))
    cells("near").select(col("img"), lit("near").as("krn"), col("px"), col("py"),
        floor(col("v").cast("double") + 0.5).cast("long").as("q"))
      .unionByName(cells("bilinear").select(col("img"), lit("bil").as("krn"),
        col("px"), col("py"),
        floor(col("v").cast("double") * WcQ + 0.5).cast("long").as("q")))
  }

  /** q105 oracle: both ellipsoidal chains in DuckDB SQL. Per image:
    * densified footprint boundary → INVERSE chain (Krüger β/δ series for
    * the UTM image; ρ→χ→δ series for the polar-stereo image) → bbox →
    * pixel bounds → per-pixel FORWARD chain (conformal latitude + α
    * series; 15-9 half-angle ρ) → fractional source pixel → the exact
    * q102 near/bilinear integer decisions. sinh/cosh/atanh are spelled in
    * exp/ln form (DuckDB has none of the three); all series coefficients
    * and the target grid enter as embedded literals. */
  val warpCrossEllSql: String = {
    import graft.geo.Ellipsoid
    def dlit(x: Double) = s"CAST('${x.toString}' AS DOUBLE)"
    val t = weTarget
    val (tulx, tuly, tres) = (dlit(t.ulx), dlit(t.uly), dlit(t.res))
    val eE = dlit(Ellipsoid.e)
    val kA = dlit(0.9996 * Ellipsoid.A)
    // SQL fragment builders (hyperbolics in exp form, atanh in ln form)
    def sinhS(u: String) = s"((exp($u) - exp(-($u))) / 2)"
    def coshS(u: String) = s"((exp($u) + exp(-($u))) / 2)"
    def atanhS(u: String) = s"(0.5 * ln((1 + ($u)) / (1 - ($u))))"
    def ser(cs: Array[Double], f: Int => String): String =
      (1 to 6).map(j => s"${dlit(cs(j - 1))} * ${f(j)}").mkString(" + ")
    val deltaSer = ser(Ellipsoid.delta, j => s"sin(${2 * j} * chi)")

    /** Stages for one image; `inv` maps (bx, by) columns → (lon, lat)
      * CTE chain, `fwd` maps (lon, lat) → (pxf, pyf). */
    def imageSql(i: Int): String = {
      val g = weGrids(i)
      val (gulx, guly, gres) = (dlit(g.ulx), dlit(g.uly), dlit(g.res))
      val inv =
        if (i == 0) {
          // inverse Krüger: xi/eta → xi'/eta' (β series) → χ (exact) → φ (δ)
          s"""ll$i AS (
             |  SELECT degrees(atan2(${sinhS("etap")}, cos(xip))) - 45.0 AS lon,
             |         degrees(chi + $deltaSer) AS lat
             |  FROM (SELECT xip, etap, asin(sin(xip) / ${coshS("etap")}) AS chi
             |        FROM (SELECT
             |            xi - (${ser(Ellipsoid.beta, j => s"sin(${2 * j} * xi) * ${coshS(s"${2 * j} * eta")}")}) AS xip,
             |            eta - (${ser(Ellipsoid.beta, j => s"cos(${2 * j} * xi) * ${sinhS(s"${2 * j} * eta")}")}) AS etap
             |          FROM (SELECT by / $kA AS xi, (bx - 500000.0) / $kA AS eta
             |                FROM e$i))))""".stripMargin
        } else {
          // inverse PS-ell: ρ → χ → φ (δ series); lon via atan2 (north)
          val aMoverT = dlit(graft.geo.PolarStereoEll(north = true, 70.0, -45.0).aMoverT)
          s"""ll$i AS (
             |  SELECT -45.0 + degrees(atan2(bx, -by)) AS lon,
             |         degrees(chi + $deltaSer) AS lat
             |  FROM (SELECT bx, by,
             |          pi() / 2 - 2 * atan(sqrt(bx * bx + by * by) / $aMoverT) AS chi
             |        FROM e$i))""".stripMargin
        }
      val fwd =
        if (i == 0) {
          // forward Krüger: conformal lat (atanh form) → xi'/eta' → α series
          s"""f$i AS (
             |  SELECT px, py,
             |      (500000.0 + $kA * (etap + (${ser(Ellipsoid.alpha, j => s"cos(${2 * j} * xip) * ${sinhS(s"${2 * j} * etap")}")}))
             |        - $gulx) / $gres - 0.5 AS pxf,
             |      ($guly - ($kA * (xip + (${ser(Ellipsoid.alpha, j => s"sin(${2 * j} * xip) * ${coshS(s"${2 * j} * etap")}")})))
             |        ) / $gres - 0.5 AS pyf
             |  FROM (SELECT px, py,
             |          atan2(tt, cos(dl)) AS xip,
             |          ${atanhS("sin(dl) / sqrt(1 + tt * tt)")} AS etap
             |        FROM (SELECT px, py, dl,
             |                ${sinhS(s"${atanhS("sphi")} - $eE * ${atanhS(s"$eE * sphi")}")} AS tt
             |              FROM (SELECT px, py, radians(lon - -45.0) AS dl,
             |                      sin(radians(lat)) AS sphi FROM p$i))))""".stripMargin
        } else {
          val aMoverT = dlit(graft.geo.PolarStereoEll(north = true, 70.0, -45.0).aMoverT)
          // forward PS-ell: 15-9 half-angle t → ρ → (x, y)
          s"""f$i AS (
             |  SELECT px, py,
             |      (rho * sin(dl) - $gulx) / $gres - 0.5 AS pxf,
             |      ($guly - (-rho * cos(dl))) / $gres - 0.5 AS pyf
             |  FROM (SELECT px, py, dl,
             |          $aMoverT * tan(pi() / 4 - phi / 2)
             |            / power((1 - $eE * sin(phi)) / (1 + $eE * sin(phi)), $eE / 2) AS rho
             |        FROM (SELECT px, py, radians(lon - -45.0) AS dl,
             |                radians(lat) AS phi FROM p$i)))""".stripMargin
        }
      // densified boundary (22 per edge), bbox, pixel bounds, pixel grid
      // with per-pixel lon/lat of the TARGET cell center (4326: identity)
      s"""e$i AS (SELECT $gulx + CASE WHEN e.f IN (0, 1) THEN s.t / 21.0 * ${g.w} * $gres
         |                            WHEN e.f = 2 THEN 0 ELSE ${g.w} * $gres END AS bx,
         |               ($guly - ${g.h} * $gres)
         |                 + CASE WHEN e.f IN (2, 3) THEN s.t / 21.0 * ${g.h} * $gres
         |                        WHEN e.f = 0 THEN 0 ELSE ${g.h} * $gres END AS by
         |  FROM generate_series(0, 21) s(t), (VALUES (0), (1), (2), (3)) e(f)),
         |$inv,
         |bb$i AS (SELECT min(lon) AS bxmin, min(lat) AS bymin,
         |                max(lon) AS bxmax, max(lat) AS bymax FROM ll$i),
         |pb$i AS (SELECT
         |    greatest(0, floor((greatest(bxmin, tulx) - tulx) / tres)::INT) AS px0,
         |    least(tw - 1, ceil((least(bxmax, tulx + tw * tres) - tulx) / tres)::INT - 1) AS px1,
         |    greatest(0, floor((tuly - least(bymax, tuly)) / tres)::INT) AS py0,
         |    least(th - 1, ceil((tuly - greatest(bymin, tuly - th * tres)) / tres)::INT - 1) AS py1
         |  FROM bb$i, tgt),
         |p$i AS (SELECT gx.px, gy.py,
         |               tulx + (gx.px + 0.5) * tres AS lon,
         |               tuly - (gy.py + 0.5) * tres AS lat
         |  FROM pb$i, tgt, generate_series(0, ${t.w - 1}) gx(px),
         |       generate_series(0, ${t.h - 1}) gy(py)
         |  WHERE gx.px BETWEEN px0 AND px1 AND gy.py BETWEEN py0 AND py1),
         |$fwd""".stripMargin
    }

    /** near + bilinear decisions for one image over its f$i fractional
      * pixels — identical arithmetic to the q102 twin, per-image value
      * formula embedded. */
    def decisionSql(i: Int): String = {
      val g = weGrids(i)
      def v(cx: String, cy: String) =
        if (i == 0) s"(1 + (($cx) * 7 + ($cy) * 13) % 199)"
        else s"(1 + (($cx) * 11 + ($cy) * 5) % 173)"
      s"""SELECT $i AS img, 'near' AS krn, px, py,
         |    ${v("cx", "cy")}::BIGINT AS q
         |  FROM (SELECT px, py, floor(pxf + 0.5)::INT AS cx,
         |               floor(pyf + 0.5)::INT AS cy FROM f$i)
         |  WHERE cx >= 0 AND cx < ${g.w} AND cy >= 0 AND cy < ${g.h}
         |UNION ALL
         |SELECT $i AS img, 'bil' AS krn, px, py,
         |    floor(CAST(vsum / wsum AS FLOAT)::DOUBLE * ${WcQ} + 0.5)::BIGINT AS q
         |FROM (SELECT px, py,
         |    (((CASE WHEN x0 >= 0 AND x0 < ${g.w} AND y0 >= 0 AND y0 < ${g.h}
         |         THEN ${v("x0", "y0")}::DOUBLE * ((1 - fx) * (1 - fy)) ELSE 0 END
         |     + CASE WHEN x0 + 1 >= 0 AND x0 + 1 < ${g.w} AND y0 >= 0 AND y0 < ${g.h}
         |         THEN ${v("x0 + 1", "y0")}::DOUBLE * (fx * (1 - fy)) ELSE 0 END)
         |     + CASE WHEN x0 >= 0 AND x0 < ${g.w} AND y0 + 1 >= 0 AND y0 + 1 < ${g.h}
         |         THEN ${v("x0", "y0 + 1")}::DOUBLE * ((1 - fx) * fy) ELSE 0 END)
         |     + CASE WHEN x0 + 1 >= 0 AND x0 + 1 < ${g.w} AND y0 + 1 >= 0 AND y0 + 1 < ${g.h}
         |         THEN ${v("x0 + 1", "y0 + 1")}::DOUBLE * (fx * fy) ELSE 0 END) AS vsum,
         |    (((CASE WHEN x0 >= 0 AND x0 < ${g.w} AND y0 >= 0 AND y0 < ${g.h}
         |         THEN (1 - fx) * (1 - fy) ELSE 0 END
         |     + CASE WHEN x0 + 1 >= 0 AND x0 + 1 < ${g.w} AND y0 >= 0 AND y0 < ${g.h}
         |         THEN fx * (1 - fy) ELSE 0 END)
         |     + CASE WHEN x0 >= 0 AND x0 < ${g.w} AND y0 + 1 >= 0 AND y0 + 1 < ${g.h}
         |         THEN (1 - fx) * fy ELSE 0 END)
         |     + CASE WHEN x0 + 1 >= 0 AND x0 + 1 < ${g.w} AND y0 + 1 >= 0 AND y0 + 1 < ${g.h}
         |         THEN fx * fy ELSE 0 END) AS wsum
         |  FROM (SELECT px, py, floor(pxf)::INT AS x0, floor(pyf)::INT AS y0,
         |               pxf - floor(pxf) AS fx, pyf - floor(pyf) AS fy FROM f$i))
         |WHERE wsum > 0""".stripMargin
    }

    s"""WITH tgt AS (SELECT $tulx AS tulx, $tuly AS tuly, $tres AS tres,
       |               ${t.w} AS tw, ${t.h} AS th),
       |${imageSql(0)},
       |${imageSql(1)}
       |${decisionSql(0)}
       |UNION ALL
       |${decisionSql(1)}""".stripMargin
  }

  // ---------------------------------------------------------------------
  // q109 — overview-pyramid warp: gdaladdo 'average' levels + GDAL's
  // level choice, replayed end-to-end (iterated NDV-aware block means →
  // closed-form level pick → elided/near assignment at the overview res)
  // ---------------------------------------------------------------------

  private[graft] def ovImages(s: SparkSession): DataFrame = {
    val rows = (0 until MbImgs).map { i =>
      val g = graft.sources.ImageTable.gridOf(i)
      val marg = if (i % 5 == 0) 3 else 0
      val px = new Array[Float](g.w * g.h)
      for (sy <- 0 until g.h; sx <- 0 until g.w)
        px(sy * g.w + sx) =
          if (sx < marg || sy < marg || sx >= g.w - marg || sy >= g.h - marg)
            graft.sources.ImageTable.Ndv
          else mbValue(i, 0, sx, sy).toFloat
      graft.sources.ImageRow(f"ov_$i%08d", graft.sources.Codec.encode(px, g.w, g.h, "raw"),
        g.w, g.h, "raw", "", 0L, g.ulx, g.uly, g.res, g.crs,
        graft.sources.ImageTable.Ndv.toDouble,
        new java.sql.Timestamp(86400000L * (i + 1)))
    }
    import s.implicits._
    s.createDataset(rows).toDF()
  }

  /** q109 engine side: build levels 0..2, pick per image for an 8 m
    * target, warp the picked overviews through the UNCHANGED warp path,
    * emit per-(image, pixel) values. */
  def ovrWarpCells(s: SparkSession, d: String): DataFrame = {
    val imgs = ovImages(s)
    val target = Warp.analyze(imgs, "8.0", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val picked = graft.operators.Overviews.pick(
      s, graft.operators.Overviews.build(s, imgs, maxLevel = 2), 8.0, 2)
    Warp.warpToTiles(s, picked, target, "near").toDF()
      .select(
        substring(col("image_id"), 4, 8).cast("int").as("i"),
        col("tile_id"),
        posexplode(col("payload")).as(Seq("pidx", "v")))
      .filter(col("v") =!= graft.sources.ImageTable.Ndv)
      .select(col("i"),
        ((col("tile_id") % ntx) * T + col("pidx") % T).cast("int").as("px"),
        (expr(s"cast(tile_id div $ntx as int)") * T +
          expr(s"cast(pidx div $T as int)")).as("py"),
        col("v").cast("double").as("v"))
  }

  /** DuckDB twin of q109: the full overview chain restated — integer base
    * cells → level-1 float means (exact double sums of ints) → level-2
    * means of level-1 floats (every addition exact: 24-bit dyadics far
    * inside a 53-bit mantissa) → per-image level choice → the elided-copy
    * or near-assignment decision at the overview's res — then an inner
    * join onto the overview cells (absent cell = NDV = dropped). */
  // lazy: references MbImgs, which is declared later in this object
  lazy val ovrWarpCellsSql: String =
    s"""WITH im AS (
       |  SELECT i,
       |    CASE i % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 4 END::DOUBLE AS res,
       |    48 + (i % 4) * 8 AS w, 40 + (i % 5) * 8 AS h,
       |    CASE WHEN i % 5 = 0 THEN 3 ELSE 0 END AS marg,
       |    (500000 + (i % 7) * 10)::DOUBLE AS ulx,
       |    (5300000 - (i % 5) * 8)::DOUBLE AS uly
       |  FROM generate_series(0, ${MbImgs - 1}) t(i)),
       |tgt AS (
       |  SELECT min(ulx) AS tulx, max(uly) AS tuly, 8.0::DOUBLE AS tres,
       |    round((max(ulx + w * res) - min(ulx)) / 8.0)::INT AS ns,
       |    round((max(uly) - min(uly - h * res)) / 8.0)::INT AS nl
       |  FROM im),
       |base AS (
       |  SELECT im.i, sx, sy, (1 + (sx * 7 + sy * 13 + i) % 199) AS v
       |  FROM im,
       |    LATERAL (SELECT unnest(generate_series(marg, w - marg - 1)) AS sx),
       |    LATERAL (SELECT unnest(generate_series(marg, h - marg - 1)) AS sy)),
       |o1 AS (
       |  SELECT i, sx // 2 AS ox, sy // 2 AS oy,
       |    CAST(CAST(sum(v)::DOUBLE / count(*) AS FLOAT) AS DOUBLE) AS v
       |  FROM base GROUP BY i, sx // 2, sy // 2),
       |o2 AS (
       |  SELECT i, ox // 2 AS ox, oy // 2 AS oy,
       |    CAST(CAST(sum(v) / count(*) AS FLOAT) AS DOUBLE) AS v
       |  FROM o1 GROUP BY i, ox // 2, oy // 2),
       |lv AS (
       |  SELECT im.*, CASE i % 3 WHEN 0 THEN 2 ELSE 1 END AS k,
       |    res * (CASE i % 3 WHEN 0 THEN 4 ELSE 2 END) AS resk,
       |    CASE i % 3 WHEN 0 THEN ((w + 1) // 2 + 1) // 2 ELSE (w + 1) // 2 END AS wk,
       |    CASE i % 3 WHEN 0 THEN ((h + 1) // 2 + 1) // 2 ELSE (h + 1) // 2 END AS hk
       |  FROM im),
       |ovr AS (
       |  SELECT o1.i, ox, oy, v FROM o1 JOIN lv ON o1.i = lv.i AND lv.k = 1
       |  UNION ALL
       |  SELECT o2.i, ox, oy, v FROM o2 JOIN lv ON o2.i = lv.i AND lv.k = 2),
       |b AS (
       |  SELECT lv.*, tulx, tuly, tres, ns, nl,
       |    greatest(0, floor((greatest(ulx, tulx) - tulx) / tres))::INT AS px0,
       |    least(ns - 1, ceil((least(ulx + wk * resk, tulx + ns * tres) - tulx) / tres)::INT - 1) AS px1,
       |    greatest(0, floor((tuly - least(uly, tuly)) / tres))::INT AS py0,
       |    least(nl - 1, ceil((tuly - greatest(uly - hk * resk, tuly - nl * tres)) / tres)::INT - 1) AS py1
       |  FROM lv, tgt),
       |bx AS (SELECT b.*, unnest(generate_series(px0, px1)) AS x FROM b),
       |bxy AS (SELECT bx.*, unnest(generate_series(py0, py1)) AS y FROM bx),
       |assign AS (
       |  SELECT i, x, y,
       |    CASE WHEN resk = tres AND (i % 7) IN (0, 4)
       |         THEN x + round((tulx - ulx) / resk)::INT
       |         ELSE floor(((tulx + (x + 0.5::DOUBLE) * tres - ulx) / resk - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
       |    END AS sx,
       |    CASE WHEN resk = tres AND (i % 7) IN (0, 4)
       |         THEN y + round((uly - tuly) / resk)::INT
       |         ELSE floor(((uly - (tuly - (y + 0.5::DOUBLE) * tres)) / resk - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
       |    END AS sy
       |  FROM bxy)
       |SELECT a.i, a.x AS px, a.y AS py, o.v
       |FROM assign a JOIN ovr o ON a.i = o.i AND a.sx = o.ox AND a.sy = o.oy""".stripMargin

  // ---------------------------------------------------------------------
  // q106 — multi-band warp + per-band stack stats (VERDICT r5 #2): the
  // warplib.py:146-153 band loop distributed, q41's exact-sum technique
  // with a band column
  // ---------------------------------------------------------------------

  private[graft] val MbBands = 3
  private[graft] val MbImgs = 12 * Fix.mult

  /** Per-band closed-form integer payload — distinct coefficient/modulus
    * triples per band, so any cross-band contamination (a band-b sample
    * aggregated under band-b') shifts an exact integer sum and fails the
    * hash. */
  private[graft] def mbValue(i: Int, band: Int, sx: Int, sy: Int): Int = band match {
    case 0 => 1 + (sx * 7 + sy * 13 + i) % 199
    case 1 => 1 + (sx * 11 + sy * 5 + i * 3) % 193
    case _ => 1 + (sx * 3 + sy * 17 + i * 7) % 181
  }

  /** 12 images on the standard ImageTable grid layout (res {2,3,4} mix →
    * both the elided fast path and the resampling near chain), 3-band raw
    * BSQ payloads, NDV margins on every 5th image IN ALL BANDS (the
    * per-band NDV fill of `warplib.py:146-153`). */
  private[graft] def mbImages(s: SparkSession): DataFrame = {
    val rows = (0 until MbImgs).map { i =>
      val g = graft.sources.ImageTable.gridOf(i)
      val marg = if (i % 5 == 0) 3 else 0
      val px = new Array[Float](MbBands * g.w * g.h)
      for (b <- 0 until MbBands; sy <- 0 until g.h; sx <- 0 until g.w)
        px(b * g.w * g.h + sy * g.w + sx) =
          if (sx < marg || sy < marg || sx >= g.w - marg || sy >= g.h - marg)
            graft.sources.ImageTable.Ndv
          else mbValue(i, b, sx, sy).toFloat
      graft.sources.ImageRow(f"mb_$i%08d", graft.sources.Codec.encode(px, g.w, g.h, "raw"),
        g.w, g.h, "raw", "", 0L, g.ulx, g.uly, g.res, g.crs,
        graft.sources.ImageTable.Ndv.toDouble,
        new java.sql.Timestamp(86400000L * (i + 1)))
    }
    import s.implicits._
    s.createDataset(rows).toDF()
  }

  /** q106 engine side: multi-band warp → per-band stack stats via the
    * production band-composite fold → per-(band, pixel) rows. */
  def stackBandCells(s: SparkSession, d: String): DataFrame = {
    val imgs = mbImages(s)
    val target = Warp.analyze(imgs, "min", "union")
    val ntx = (target.w + Warp.TileSize - 1) / Warp.TileSize
    val stats = graft.operators.StackOps.stackStatsBands(
      Warp.warpToTilesBands(s, imgs, target, MbBands, "near"), MbBands).toDF()
    val fields = Seq("count", "mean", "std", "vmin", "vmax")
    val zipped = stats.select(col("band"), col("tile_id"),
      posexplode(arrays_zip(fields.map(col): _*)).as(Seq("pidx", "z")))
    zipped.select(Seq(col("band"),
      ((col("tile_id") % ntx) * T + col("pidx") % T).cast("int").as("px"),
      (expr(s"cast(tile_id div $ntx as int)") * T +
        expr(s"cast(pidx div $T as int)")).as("py"),
      col("z.count").as("n")) ++
      fields.filter(_ != "count").map(f => col(s"z.$f").cast("double").as(f)): _*)
      .filter(col("n") > 0)
  }

  /** DuckDB twin of q106 — the cellSql warp-assignment chain restated for
    * the 12-image fixture, crossed with a band dimension carrying each
    * band's value formula, then q41's exact-integer-sum → float32
    * mean/std emission grouped by (band, px, py). */
  val stackBandCellsSql: String =
    s"""WITH im AS (
       |  SELECT i,
       |    CASE i % 3 WHEN 0 THEN 2 WHEN 1 THEN 3 ELSE 4 END::DOUBLE AS res,
       |    48 + (i % 4) * 8 AS w, 40 + (i % 5) * 8 AS h,
       |    CASE WHEN i % 5 = 0 THEN 3 ELSE 0 END AS marg,
       |    (500000 + (i % 7) * 10)::DOUBLE AS ulx,
       |    (5300000 - (i % 5) * 8)::DOUBLE AS uly
       |  FROM generate_series(0, ${MbImgs - 1}) t(i)),
       |tgt AS (
       |  SELECT min(ulx) AS tulx, max(uly) AS tuly, min(res) AS tres,
       |    round((max(ulx + w * res) - min(ulx)) / min(res))::INT AS ns,
       |    round((max(uly) - min(uly - h * res)) / min(res))::INT AS nl
       |  FROM im),
       |b AS (
       |  SELECT im.*, tulx, tuly, tres, ns, nl,
       |    greatest(0, floor((greatest(ulx, tulx) - tulx) / tres))::INT AS px0,
       |    least(ns - 1, ceil((least(ulx + w * res, tulx + ns * tres) - tulx) / tres)::INT - 1) AS px1,
       |    greatest(0, floor((tuly - least(uly, tuly)) / tres))::INT AS py0,
       |    least(nl - 1, ceil((tuly - greatest(uly - h * res, tuly - nl * tres)) / tres)::INT - 1) AS py1
       |  FROM im, tgt),
       |bx AS (SELECT b.*, unnest(generate_series(px0, px1)) AS x FROM b),
       |bxy AS (SELECT bx.*, unnest(generate_series(py0, py1)) AS y FROM bx),
       |src AS (
       |  SELECT i, w, h, marg, x, y,
       |    CASE WHEN i % 3 = 0 THEN x + round((tulx - ulx) / tres)::INT
       |         ELSE floor(((tulx + (x + 0.5::DOUBLE) * tres - ulx) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
       |    END AS sx,
       |    CASE WHEN i % 3 = 0 THEN y + round((uly - tuly) / tres)::INT
       |         ELSE floor(((uly - (tuly - (y + 0.5::DOUBLE) * tres)) / res - 0.5::DOUBLE) + 0.5::DOUBLE)::INT
       |    END AS sy
       |  FROM bxy),
       |cells AS (
       |  SELECT band, i, x, y,
       |    CASE band
       |      WHEN 0 THEN 1 + (sx * 7 + sy * 13 + i) % 199
       |      WHEN 1 THEN 1 + (sx * 11 + sy * 5 + i * 3) % 193
       |      ELSE 1 + (sx * 3 + sy * 17 + i * 7) % 181 END AS v
       |  FROM src, (VALUES (0), (1), (2)) bands(band)
       |  WHERE sx >= marg AND sy >= marg AND sx < w - marg AND sy < h - marg)
       |SELECT band, x AS px, y AS py, count(*)::INT AS n,
       |  CAST(CAST(CAST(sum(v) AS DOUBLE) / count(*) AS FLOAT) AS DOUBLE) AS mean,
       |  CASE WHEN count(*) <= 1 THEN CAST(-9999.0::FLOAT AS DOUBLE)
       |       ELSE CAST(CAST(sqrt(greatest(0.0::DOUBLE,
       |              CAST(sum(v * v) AS DOUBLE) / count(*)
       |              - (CAST(sum(v) AS DOUBLE) / count(*)) * (CAST(sum(v) AS DOUBLE) / count(*))))
       |            AS FLOAT) AS DOUBLE) END AS std,
       |  CAST(min(v) AS DOUBLE) AS vmin, CAST(max(v) AS DOUBLE) AS vmax
       |FROM cells GROUP BY band, x, y""".stripMargin
}
