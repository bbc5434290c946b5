package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{StackOps, Warp}
import graft.queries.Engine

/** Diagnostic bench (guide §1.4/§1.5): per-STEP wall timing of the
  * incremental-view protocol queries (q108/q110/q111/q112/q114/q115 are the
  * round-7 heavy hitters) and noop-sink isolation for the other expensive
  * inventory entries. NOT part of the frozen driver contract — Bench.scala
  * stays the one measured artifact; numbers from here feed
  * OPTIMIZATION_r08.md only. */
object BenchExtra {
  private def idx: org.apache.spark.sql.Column =
    substring(col("image_id"), 5, 8).cast("int")
  private def quantNoRipple(imgs: DataFrame): DataFrame =
    imgs.filter(idx % 3 =!= 2 && col("fmt") =!= "raw")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", math.min(16, cpus.toInt).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.network.timeout", "600s")
      .config("spark.executor.heartbeatInterval", "60s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // job-level accounting: description -> (count, total ms)
    val jobAgg = new java.util.concurrent.ConcurrentHashMap[String, (Int, Long)]()
    val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    // phase-level shuffle/input accounting via stage metrics
    val curPhase = new java.util.concurrent.atomic.AtomicReference[String]("?")
    val shufAgg = new java.util.concurrent.ConcurrentHashMap[String, (Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        val d = Option(js.properties.getProperty("spark.job.description")).getOrElse("?")
        jobStart.put(js.jobId, (d, js.time))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val (d, t0) = jobStart.getOrDefault(je.jobId, ("?", je.time))
        jobAgg.merge(d, (1, je.time - t0),
          (a, b) => (a._1 + b._1, a._2 + b._2))
      }
      override def onStageCompleted(sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        shufAgg.merge(curPhase.get(),
          (m.shuffleWriteMetrics.bytesWritten, m.shuffleReadMetrics.totalBytesRead,
           m.inputMetrics.bytesRead),
          (a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
        if (sys.env.contains("SPARK_GRAFT_STAGES")) {
          val i = sc.stageInfo
          val dur = i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L)
          println(f"[stage] ${dur / 1e3}%7.3f s tasks=${i.numTasks}%-4d " +
            f"run=${m.executorRunTime / 1e3}%7.2f cpu=${m.executorCpuTime / 1e9}%7.2f " +
            f"deser=${m.executorDeserializeTime / 1e3}%6.2f gc=${m.jvmGCTime / 1e3}%5.2f " +
            f"in=${m.inputMetrics.bytesRead / 1e6}%8.1f sW=${m.shuffleWriteMetrics.bytesWritten / 1e6}%8.1f " +
            f"sR=${m.shuffleReadMetrics.totalBytesRead / 1e6}%8.1f out=${m.outputMetrics.bytesWritten / 1e6}%8.1f " +
            s"[${curPhase.get()}] ${i.name.take(60)}")
        }
      }
    })

    def phase[T](name: String)(body: => T): T = {
      spark.sparkContext.setJobDescription(name)
      curPhase.set(name)
      val t0 = System.nanoTime()
      val r = body
      println(f"[phase] $name%-42s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
      curPhase.set("?")
      r
    }

    val which = sys.env.getOrElse("SPARK_GRAFT_EXTRA", "q111").split(",").toSet

    val phaseFn: (String, () => Unit) => Unit = (n, b) => phase(n)(b())
    if (which("q111")) runQ111(spark, sfDir, phaseFn)
    if (which("q112")) runQ112(spark, sfDir, phaseFn)
    if (which("q108")) runQ108(spark, sfDir, phaseFn)
    if (which("q114")) {
      phase("q114 full") {
        SparkEntry.queries("q114_stream_view")(spark, sfDir).count()
      }
    }
    if (which("q114s")) runQ114Steps(spark, sfDir, phaseFn)
    if (which("noop")) {
      val targets = sys.env.get("SPARK_GRAFT_NOOP").map(_.split(",").toSeq)
        .getOrElse(Seq("q07_mad_fltr", "q66_fill_interp", "q48_stencil_gauss",
        "q36_perc_fltr", "q60_hist2d_clipped", "q88_robust_spread",
        "q91_neardup_clusters", "q92_doc_clusters", "q67_remove_islands",
        "q65_dem_family", "q97_training_flagship", "q103_snapshot_merge",
        "q75_stream_sessions", "q74_stream_dedup"))
      targets.foreach { name =>
        phase(s"$name noop") {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }

    if (which("pipe")) {
      import graft.operators.{Knn, SpatialJoin}
      import graft.sources.{ImageTable, PolygonTable}
      val nImages = Engine.nImages(sfDir)
      val images = ImageTable.generate(spark, nImages, spread = true).cache()
      images.count()
      val polys = PolygonTable.generate(spark, Engine.nPolys(sfDir)).cache()
      polys.count()
      val points = PolygonTable.points(spark, Engine.nPoints(sfDir)).cache()
      points.count()
      (1 to 2).foreach { pass =>
        val target = phase(s"p$pass analyze") { Warp.analyze(images, "min", "union") }
        val tiles = Warp.warpToTiles(spark, images, target, "bilinear")
        phase(s"p$pass warp.count") { tiles.count() }
        phase(s"p$pass stackStats.count") { StackOps.stackStats(tiles).count() }
        phase(s"p$pass trend.count") { StackOps.trend(tiles).count() }
        phase(s"p$pass pip.count") { SpatialJoin.pipJoin(spark, points, polys).count() }
        phase(s"p$pass heat.count") { SpatialJoin.heatmap(spark, polys).count() }
        val nq = math.max(200, Engine.nPoints(sfDir) / 40)
        val queriesDf = points.filter(col("pt_id") < f"pt_$nq%07d")
        phase(s"p$pass knn.count") { Knn.knn(spark, queriesDf, points, k = 5).count() }
      }
    }

    if (which("fold")) {
      import spark.implicits._
      val imgs = quantNoRipple(Engine.images(spark, sfDir))
      val target = Warp.analyze(imgs, "min", "union")
      val tiles = Warp.warpToTiles(spark, imgs.filter(idx % 3 === 1), target, "near")
      (1 to 2).foreach { pass =>
        phase(s"fold partial (current) p$pass") {
          StackOps.stackStats(tiles).write.format("noop").mode("overwrite").save()
        }
        phase(s"fold raw groupByKey p$pass") {
          val agg = new StackOps.TileStatsAgg(64 * 64, graft.sources.ImageTable.Ndv)
          tiles.groupByKey(_.tile_id).mapGroups { (tid, it) =>
            var b = agg.zero
            it.foreach(t => b = agg.reduce(b, t))
            agg.finish(b).copy(tile_id = tid)
          }.write.format("noop").mode("overwrite").save()
        }
        phase(s"fold trend partial p$pass") {
          StackOps.trend(tiles).write.format("noop").mode("overwrite").save()
        }
      }
    }

    println("---- job time by description ----")
    import scala.jdk.CollectionConverters._
    jobAgg.asScala.toSeq.sortBy(-_._2._2).take(60).foreach { case (d, (n, ms)) =>
      println(f"[jobs] ${ms / 1e3}%8.3f s  n=$n%-4d $d")
    }
    println("---- bytes by phase (shufW / shufR / input, MB) ----")
    shufAgg.asScala.toSeq.sortBy(-_._2._1).take(60).foreach { case (d, (w, r, in)) =>
      println(f"[bytes] ${w / 1e6}%9.1f ${r / 1e6}%9.1f ${in / 1e6}%9.1f  $d")
    }
    Engine.clearImageCache()
    spark.stop()
  }

  /** q111 churn protocol, step-timed (mirrors EngineOracle.churnSnapshots). */
  private def runQ111(s: SparkSession, d: String,
                      ph: (String, () => Unit) => Unit): Unit = {
    def phase(n: String)(b: => Unit): Unit = ph(n, () => b)
    val ST = graft.sources.SnapshotTable
    val imgs = quantNoRipple(Engine.images(s, d)).filter(idx % 2 === 0)
    val target = Warp.analyze(imgs, "min", "union")
    val base = java.nio.file.Files.createTempDirectory("graft_x111").toString
    val tilesRoot = s"$base/tiles"; val mvRoot = s"$base/mv"
    val batchOf = floor(idx / 6) % 3
    val batchSql = "(CAST(substring(image_id, 5, 8) AS INT) DIV 6) % 3"
    def tiles(b: Int): DataFrame =
      Warp.warpToTiles(s, imgs.filter(batchOf === b), target, "near").toDF()
    val ndvF = s"CAST(${graft.sources.ImageTable.Ndv} AS FLOAT)"
    try {
      phase("q111 s1 commit b0") { ST.commit(s, tilesRoot, tiles(0)); () }
      phase("q111 s1 refresh")   { graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); () }
      phase("q111 s2 commit b1") { ST.commit(s, tilesRoot, tiles(1)); () }
      phase("q111 s2 refresh")   { graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); () }
      phase("q111 s3 merge corrupt") { ST.merge(s, tilesRoot, tiles(0).withColumn("payload",
        expr(s"transform(payload, v -> IF(v = $ndvF, v, v + CAST(1.0 AS FLOAT)))")),
        Seq("image_id", "tile_id")); () }
      phase("q111 s3 refresh (churn)") { graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); () }
      phase("q111 s4 merge restore") { ST.merge(s, tilesRoot, tiles(0), Seq("image_id", "tile_id")); () }
      phase("q111 s4 refresh (churn)") { graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); () }
      phase("q111 s5 delete b1") { ST.delete(s, tilesRoot, expr(s"$batchSql = 1")); () }
      phase("q111 s5 refresh (churn)") { graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); () }
      phase("q111 s6 commit b1 again") { ST.commit(s, tilesRoot, tiles(1)); () }
      phase("q111 s6 refresh")   { graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); () }
      phase("q111 s7 commit b2") { ST.commit(s, tilesRoot, tiles(2)); () }
      phase("q111 s7 refresh")   { graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); () }
      phase("q111 read view + explode + count") {
        graft.operators.StatsView.stats(s, mvRoot).count(); ()
      }
    } finally ST.deleteRecursively(base)
  }

  /** q112 churn protocol, step-timed (TrendView sibling of runQ111). */
  private def runQ112(s: SparkSession, d: String,
                      ph: (String, () => Unit) => Unit): Unit = {
    def phase(n: String)(b: => Unit): Unit = ph(n, () => b)
    val ST = graft.sources.SnapshotTable
    val imgs = Engine.images(s, d)
      .filter(idx % 3 === 0 && col("fmt") =!= "raw")
      .filter(idx % 2 === 0)
    val target = Warp.analyze(imgs, "min", "union")
    val base = java.nio.file.Files.createTempDirectory("graft_x112").toString
    val tilesRoot = s"$base/tiles"; val mvRoot = s"$base/mv"
    val batchOf = floor(idx / 18) % 3
    val batchSql = "(CAST(substring(image_id, 5, 8) AS INT) DIV 18) % 3"
    val tileCache = scala.collection.mutable.Map.empty[Int, DataFrame]
    def tiles(b: Int): DataFrame = tileCache.getOrElseUpdate(b,
      Warp.warpToTiles(s, imgs.filter(batchOf === b), target, "near").toDF()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
    def refresh(): Unit = { graft.operators.TrendView.refresh(s, tilesRoot, mvRoot); () }
    val ndvF = s"CAST(${graft.sources.ImageTable.Ndv} AS FLOAT)"
    try {
      phase("q112 s1 commit b0") { ST.commit(s, tilesRoot, tiles(0)); () }
      phase("q112 s1 refresh")   { refresh() }
      phase("q112 s2 commit b1") { ST.commit(s, tilesRoot, tiles(1)); () }
      phase("q112 s2 refresh")   { refresh() }
      phase("q112 s3 merge corrupt") { ST.merge(s, tilesRoot, tiles(0).withColumn("payload",
        expr(s"transform(payload, v -> IF(v = $ndvF, v, v + CAST(1.0 AS FLOAT)))")),
        Seq("image_id", "tile_id")); () }
      phase("q112 s3 refresh (churn)") { refresh() }
      phase("q112 s4 merge restore") { ST.merge(s, tilesRoot, tiles(0), Seq("image_id", "tile_id")); () }
      phase("q112 s4 refresh (churn)") { refresh() }
      phase("q112 s5 delete b1") { ST.delete(s, tilesRoot, expr(s"$batchSql = 1")); () }
      phase("q112 s5 refresh (churn)") { refresh() }
      phase("q112 s6 commit b1 again") { ST.commit(s, tilesRoot, tiles(1)); () }
      phase("q112 s6 refresh")   { refresh() }
      phase("q112 s7 commit b2") { ST.commit(s, tilesRoot, tiles(2)); () }
      phase("q112 s7 refresh")   { refresh() }
      phase("q112 read view + count") {
        graft.operators.TrendView.trend(s, mvRoot).count(); ()
      }
    } finally {
      tileCache.values.foreach(_.unpersist(blocking = false))
      ST.deleteRecursively(base)
    }
  }

  /** q114 stream→catalog→view chain, step-timed (mirrors streamViewChain). */
  private def runQ114Steps(s: SparkSession, d: String,
                           ph: (String, () => Unit) => Unit): Unit = {
    def phase(n: String)(b: => Unit): Unit = ph(n, () => b)
    import java.nio.file.{Files, Paths}
    val imgs = quantNoRipple(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val base = Files.createTempDirectory("graft_x114").toString
    val srcDir = s"$base/src"; val tilesRoot = s"$base/tiles"
    val ckptDir = s"$base/ckpt"; val mvRoot = s"$base/mv"
    Files.createDirectories(Paths.get(srcDir))
    val streamId = "x114_tiles"
    def tilesOf(b: Int) =
      Warp.warpToTiles(s, imgs.filter(idx % 3 === b), target, "near").toDF()
    val tileSchema = tilesOf(0).schema
    // mirrors EngineOracle.writeOneFileParquet (the production land path):
    // distributed small-row-group write, then driver-side row-group concat
    def land(b: Int): Unit = {
      import org.apache.hadoop.fs.{Path => HPath}
      import org.apache.parquet.hadoop.{ParquetFileReader, ParquetFileWriter}
      import org.apache.parquet.hadoop.util.{HadoopInputFile, HadoopOutputFile}
      val tmp = Files.createTempDirectory("graft_x114w").toString
      tilesOf(b).write.mode("overwrite")
        .option("parquet.block.size", (256 * 1024).toString)
        .option("compression", "none").parquet(tmp)
      val parts = new java.io.File(tmp).listFiles()
        .filter(f => f.getName.endsWith(".parquet") && f.length > 0)
        .sortBy(_.getName)
      val conf = s.sessionState.newHadoopConf()
      val r0 = ParquetFileReader.open(
        HadoopInputFile.fromPath(new HPath(parts.head.getPath), conf))
      val (schema, kv) =
        try (r0.getFooter.getFileMetaData.getSchema,
             r0.getFooter.getFileMetaData.getKeyValueMetaData)
        finally r0.close()
      val dst = Paths.get(srcDir, s"f$b.parquet")
      Files.deleteIfExists(dst)
      val w = new ParquetFileWriter(
        HadoopOutputFile.fromPath(new HPath(dst.toString), conf),
        schema, ParquetFileWriter.Mode.CREATE, 256L * 1024, 0)
      w.start()
      parts.foreach(p =>
        w.appendFile(HadoopInputFile.fromPath(new HPath(p.getPath), conf)))
      w.end(kv)
      Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(1704067200000L + b * 2000L))
      graft.sources.SnapshotTable.deleteRecursively(tmp)
    }
    val prevMaxPart = s.conf.get("spark.sql.files.maxPartitionBytes")
    s.conf.set("spark.sql.files.maxPartitionBytes", (16 * 1024 * 1024).toString)
    try {
      phase("q114 land f0") { land(0) }
      phase("q114 land f1") { land(1) }
      phase("q114 stream leg1 (epochs 0,1)") {
        val q1 = graft.streaming.StreamOps.parquetStreamToSnapshot(
          s, srcDir, tilesRoot, ckptDir, streamId, tileSchema)
        q1.processAllAvailable(); q1.stop()
      }
      phase("q114 refresh (0,1)") {
        graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); ()
      }
      phase("q114 replay epoch1 + noop refresh") {
        graft.sources.SnapshotTable.commitStreamBatch(
          s, tilesRoot, tilesOf(1), streamId, 1L)
        graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); ()
      }
      phase("q114 land f2") { land(2) }
      phase("q114 stream leg2 (epoch 2)") {
        val q2 = graft.streaming.StreamOps.parquetStreamToSnapshot(
          s, srcDir, tilesRoot, ckptDir, streamId, tileSchema)
        q2.processAllAvailable(); q2.stop()
      }
      phase("q114 refresh (2)") {
        graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); ()
      }
      phase("q114 read view + count") {
        graft.operators.StatsView.stats(s, mvRoot).count(); ()
      }
    } finally {
      s.conf.set("spark.sql.files.maxPartitionBytes", prevMaxPart)
      graft.sources.SnapshotTable.deleteRecursively(base)
    }
  }

  /** q108 append-only protocol, step-timed. */
  private def runQ108(s: SparkSession, d: String,
                      ph: (String, () => Unit) => Unit): Unit = {
    def phase(n: String)(b: => Unit): Unit = ph(n, () => b)
    val ST = graft.sources.SnapshotTable
    val imgs = quantNoRipple(Engine.images(s, d))
    val target = Warp.analyze(imgs, "min", "union")
    val base = java.nio.file.Files.createTempDirectory("graft_x108").toString
    val tilesRoot = s"$base/tiles"; val mvRoot = s"$base/mv"
    try {
      (0 until 3).foreach { b =>
        phase(s"q108 commit b$b") {
          ST.commit(s, tilesRoot,
            Warp.warpToTiles(s, imgs.filter(idx % 3 === b), target, "near").toDF()); ()
        }
        phase(s"q108 refresh $b") {
          graft.operators.StatsView.refresh(s, tilesRoot, mvRoot); ()
        }
      }
      phase("q108 read view + count") {
        graft.operators.StatsView.stats(s, mvRoot).count(); ()
      }
    } finally ST.deleteRecursively(base)
  }
}
