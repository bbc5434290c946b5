package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.{Codec, ImageRow, ImageTable}

/** Multimodal-column operators for the training-data pipeline: the binary
  * payload stays opaque through shuffles and is decoded only inside typed
  * batch stages (mapPartitions), mirroring how image/audio/video columns are
  * handled at 100 TB. All three modality decoders are genuine: images
  * (raw/png/bmp via Codec), audio (PCM16 via AudioTable), and video
  * (uncompressed 8-bit AVI via VideoTable.parseAvi). */
object Multimodal {

  /** Feature extraction: decode → per-image numeric features (valid fraction,
    * mean/std, 4-bin histogram, aHash). One decode per row, batched per
    * partition; output is a narrow feature table ready for dedup/ANN. */
  def imageFeatures(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.as[ImageRow].mapPartitions { it =>
      it.map { img =>
        val px = Codec.decode(img.bytes, img.w, img.h, img.fmt, img.ndv.toFloat)
        val valid = px.filter(_ != img.ndv.toFloat)
        val n = valid.length
        // moment accumulators, not a two-pass residual sum: on integer-
        // quantized payloads Σv and Σv² are EXACT (v ≤ 255, v² ≤ 2¹⁶, well
        // inside double's 53 bits), so mean/std become fixed chains of
        // correctly-rounded ops on exact operands — cross-engine
        // reproducible (q81's DuckDB twin replays them bit-for-bit)
        var sv = 0.0; var svv = 0.0
        valid.foreach { v => sv += v; svv += v.toDouble * v }
        val mean = if (n > 0) sv / n else Double.NaN
        val std = if (n > 1)
          math.sqrt(math.max(0.0, svv / n - (sv / n) * (sv / n))) else 0.0
        val (mn, mx) = if (n > 0) (valid.min.toDouble, valid.max.toDouble) else (0.0, 0.0)
        // binning is double arithmetic (mn/mx are Double, so v promotes):
        // on integer-quantized payloads every op is correctly rounded from
        // exact operands → engine-portable (q78's oracle relies on this)
        val hist = new Array[Long](4)
        if (mx > mn) valid.foreach { v =>
          hist(math.min(3, ((v.toDouble - mn) / (mx - mn) * 4).toInt)) += 1
        }
        (img.image_id, img.fmt, img.w, img.h,
         n.toDouble / (img.w * img.h), mean, std,
         hist(0), hist(1), hist(2), hist(3),
         ImageTable.aHash(px, img.w, img.h))
      }
    }.toDF("image_id", "fmt", "w", "h", "valid_frac", "px_mean", "px_std",
           "h0", "h1", "h2", "h3", "ahash")
  }

  /** Block-average resize (the real thumbnail path for our formats). */
  def resize(spark: SparkSession, images: DataFrame, outW: Int, outH: Int): DataFrame = {
    import spark.implicits._
    images.as[ImageRow].map { img =>
      val px = Codec.decode(img.bytes, img.w, img.h, img.fmt, img.ndv.toFloat)
      val out = new Array[Float](outW * outH)
      var oy = 0
      while (oy < outH) {
        var ox = 0
        while (ox < outW) {
          val x0 = ox * img.w / outW; val x1 = math.max(x0 + 1, (ox + 1) * img.w / outW)
          val y0 = oy * img.h / outH; val y1 = math.max(y0 + 1, (oy + 1) * img.h / outH)
          var s = 0.0; var n = 0
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val v = px(y * img.w + x)
              if (v != img.ndv.toFloat) { s += v; n += 1 }
              x += 1
            }
            y += 1
          }
          out(oy * outW + ox) = if (n > 0) (s / n).toFloat else img.ndv.toFloat
          ox += 1
        }
        oy += 1
      }
      (img.image_id, outW, outH, Codec.encode(out, outW, outH, "raw"), img.caption)
    }.toDF("image_id", "w", "h", "bytes", "caption")
  }

  /** Video frame sampling — REAL decode (round-4; the video leg's stub era
    * ended the way audio's did in round 3): each payload is parsed as an
    * uncompressed 8-bit AVI container (graft.sources.VideoTable.parseAvi —
    * RIFF walk, strf geometry, bottom-up un-flip, stride strip), every k-th
    * decoded frame emits one row with a position-sensitive content checksum
    * Σ px[i]·(i+1) over the row-major top-down pixels (exact in Long; a
    * flipped or mis-strided decode changes it). One binary in, N frame rows
    * out, stable indexes — partition-safe, decode batched per partition. */
  def frameSample(spark: SparkSession, videos: DataFrame, everyK: Int): DataFrame = {
    import spark.implicits._
    import graft.sources.{VideoRow, VideoTable}
    videos.as[VideoRow].flatMap { v =>
      val frames = VideoTable.parseAvi(v.bytes)
      frames.zipWithIndex.collect { case (px, t) if t % everyK == 0 =>
        var hash = 0L
        var i = 0
        while (i < px.length) { hash += (px(i) & 0xff).toLong * (i + 1); i += 1 }
        (v.video_id, s"${v.video_id}#f$t", t, v.w, v.h, hash)
      }
    }.toDF("video_id", "frame_id", "frame_idx", "w", "h", "frame_hash")
  }

  /** Perceptual-hash near-dup candidates: band the 64-bit aHash into 4×16-bit
    * LSH keys, self-join on any shared band, refine by Hamming distance ≤
    * maxDist.
    *
    * Three scale decisions, in order of leverage on duplicate-heavy corpora:
    * 1. **Exact-dup collapse first**: the banded self-join runs over DISTINCT
    *    hashes, not images (16k synthetic images → 5,056 hashes; Σ
    *    band-group² falls 93.6M → 2.7M pair evaluations, 35×), then hash
    *    pairs expand back to image-id pairs through two equi-joins. This is
    *    the standard 100 TB dedup shape: identical payloads are grouped
    *    before any near-dup machinery runs.
    * 2. **Equi-join on unpivoted (band_idx, band_val)**: the `ON a=x OR b=y`
    *    form has no equi keys and degenerates to a BroadcastNestedLoopJoin;
    *    the exploded form is a pure hash join with the identical result set.
    * 3. **First-match-band emission**: a hash pair sharing several bands is
    *    emitted only from its lowest shared band (a predicate on the carried
    *    hashes), so no wide `distinct` shuffle is needed afterwards. */
  /** DISTINCT-hash near-dup pairs (p1 < p2, hamming ≤ maxDist, sharing a
    * (64/nBands)-bit band) — the contracted graph phashDedup expands back
    * to images, and the right granularity for clustering (q91: run
    * connected components here, where equal-payload cliques are already one
    * node). `nBands` is the corpus-scale knob for the CANDIDATE stage:
    * band-VALUE space must outgrow the distinct-hash count or
    * Σ band-group² goes quadratic; fewer, wider bands only SHRINK the
    * candidate set (sharing a 32-bit band implies sharing both constituent
    * 16-bit bands — MultimodalSpec), trading recall at the high end of
    * maxDist for bounded pair counts. Note the OTHER quadratic risk is the
    * image-level pair EXPANSION itself on duplicate-heavy corpora (BENCH
    * §10 measured 127× output rows at 10× images, distinct hashes flat) —
    * at scale, cluster on THIS contracted hash graph (q91) and never
    * materialize per-image pairs of exact-dup cliques. */
  def phashHashPairs(images: DataFrame, maxDist: Int,
                     nBands: Int = 4): DataFrame = {
    require(nBands > 0 && 64 % nBands == 0, s"nBands must divide 64: $nBands")
    val bits = 64 / nBands
    val mask = if (bits == 64) -1L else (1L << bits) - 1
    def band(c: org.apache.spark.sql.Column, j: Int) =
      shiftright(c, bits * j).bitwiseAND(mask)
    val hashes = images.select(col("phash")).distinct()
    val bands = hashes.select(col("phash"), posexplode(array(
        (0 until nBands).map(j => band(col("phash"), j)): _*)).as(Seq("bi", "bv")))
    val noEarlierSharedBand = (0 until nBands - 1).map { j =>
      when(col("bi") > j, band(col("p1"), j) =!= band(col("p2"), j)).otherwise(lit(true))
    }.foldLeft(lit(true))(_ && _) // foldLeft: nBands = 1 has no earlier bands
    bands.select(col("phash").as("p1"), col("bi"), col("bv"))
      .join(bands.select(col("phash").as("p2"), col("bi"), col("bv")), Seq("bi", "bv"))
      .filter(col("p1") < col("p2") && noEarlierSharedBand)
      .withColumn("hamming", bit_count(col("p1").bitwiseXOR(col("p2"))))
      .filter(col("hamming") <= maxDist)
      .select(col("p1"), col("p2"), col("hamming"))
  }

  def phashDedup(spark: SparkSession, images: DataFrame, maxDist: Int = 8): DataFrame = {
    val ids = images.select(col("image_id"), col("phash"))
    val hashPairs = phashHashPairs(images, maxDist)
    // expand qualifying hash pairs back to image-id pairs...
    val cross = hashPairs
      .join(ids.select(col("image_id").as("ida"), col("phash").as("p1")), Seq("p1"))
      .join(ids.select(col("image_id").as("idb"), col("phash").as("p2")), Seq("p2"))
      .select(least(col("ida"), col("idb")).as("id1"),
              greatest(col("ida"), col("idb")).as("id2"), col("hamming"))
    // ...plus the exact-dup pairs themselves (hamming 0, same hash)
    val same = ids.select(col("image_id").as("id1"), col("phash"))
      .join(ids.select(col("image_id").as("id2"), col("phash")), Seq("phash"))
      .filter(col("id1") < col("id2"))
      .select(col("id1"), col("id2"), lit(0).cast("int").as("hamming"))
    cross.unionByName(same)
  }

  /** Lossy re-encode audit — BASELINE.json's "PSNR ≥ 40 dB for lossy
    * re-encode" invariant exercised NON-vacuously (the fixture formats are
    * all lossless, so until the JPEG leg existed the invariant only ever
    * held as PSNR = ∞). Per image: decode the stored payload, push it
    * through the JPEG leg twice, decode back, and report
    *   - PSNR over the ORIGINAL's valid mask (validity is external for
    *     lossy formats — Codec object doc),
    *   - byte-level encode determinism (fixed input + explicit quality →
    *     identical bits; what makes q113's hash gate meaningful),
    *   - the valid-pixel count (closed-form checkable).
    * Narrow map over the image table — no shuffle, scale-shape identical
    * to imageFeatures. */
  def jpegRoundtrip(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.as[ImageRow].mapPartitions { it =>
      it.map { img =>
        val ndv = img.ndv.toFloat
        val px = Codec.decode(img.bytes, img.w, img.h, img.fmt, ndv)
        val jb = Codec.encode(px, img.w, img.h, "jpg")
        val jb2 = Codec.encode(px, img.w, img.h, "jpg")
        val dec = Codec.decode(jb, img.w, img.h, "jpg", ndv)
        var nValid = 0L
        var i = 0
        while (i < px.length) { if (px(i) != ndv) nValid += 1; i += 1 }
        (img.image_id, img.w, img.h, nValid,
         Codec.psnr(px, dec, ndv) >= 40.0,
         java.util.Arrays.equals(jb, jb2))
      }
    }.toDF("image_id", "w", "h", "n_valid", "psnr_ge_40", "deterministic")
  }
}
