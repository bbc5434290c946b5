package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.{Codec, ImageTable}

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("image features: valid fraction + moments match direct computation") {
    val images = ImageTable.generate(spark, 10)
    val feats = Multimodal.imageFeatures(spark, images).collect()
      .map(r => r.getString(0) -> r).toMap
    for (i <- Seq(0, 5)) {   // margin images
      val g = ImageTable.gridOf(i)
      val px = ImageTable.renderPixels(i).filter(_ != ImageTable.Ndv)
      val r = feats(ImageTable.imageIdOf(i))
      assert(math.abs(r.getDouble(4) - px.length.toDouble / (g.w * g.h)) < 1e-9)
      assert(math.abs(r.getDouble(5) - px.map(_.toDouble).sum / px.length) < 1e-6)
      assert(r.getLong(11) == ImageTable.aHash(ImageTable.renderPixels(i), g.w, g.h))
    }
  }

  test("resize: block average of a constant image is constant; dims correct") {
    import spark.implicits._
    val images = ImageTable.generate(spark, 3)
    val small = Multimodal.resize(spark, images, 8, 8).collect()
    assert(small.length == 3)
    small.foreach { r =>
      assert(r.getInt(1) == 8 && r.getInt(2) == 8)
      val px = Codec.decode(r.getAs[Array[Byte]](3), 8, 8, "raw", ImageTable.Ndv)
      assert(px.length == 64)
      // caption byte-equality invariant survives the pipeline
      val idx = r.getString(0).substring(4, 12).toInt
      assert(r.getString(4) == ImageTable.captionOf(idx))
    }
    // resized mean ~ original mean (block average preserves mass)
    val img1 = ImageTable.renderPixels(1).filter(_ != ImageTable.Ndv)
    val r1 = small.find(_.getString(0) == ImageTable.imageIdOf(1)).get
    val rs = Codec.decode(r1.getAs[Array[Byte]](3), 8, 8, "raw", ImageTable.Ndv)
      .filter(_ != ImageTable.Ndv)
    assert(math.abs(rs.map(_.toDouble).sum / rs.length -
                    img1.map(_.toDouble).sum / img1.length) < 0.5)
  }

  test("AVI codec roundtrip: parse(encode(frames)) is byte-exact, incl. stride padding") {
    import graft.sources.VideoTable
    for (i <- 0 until 6) { // w ∈ {28, 30, 32} covers padded and unpadded strides
      val w = VideoTable.wOf(i); val h = VideoTable.hOf(i)
      val frames = (0 until VideoTable.nFramesOf(i)).map { t =>
        Array.tabulate(w * h)(p => VideoTable.pixel(i, t, p % w, p / w).toByte)
      }
      val decoded = VideoTable.parseAvi(VideoTable.encodeAvi(frames, w, h))
      assert(decoded.length == frames.length)
      frames.zip(decoded).foreach { case (a, b) => assert(a.sameElements(b)) }
    }
  }

  test("AVI parser handles top-down DIBs (negative biHeight) — the branch our encoder never emits") {
    import graft.sources.VideoTable
    val w = 30; val h = 4 // stride 32: padding exercised too
    val frame = Array.tabulate(w * h)(i => (i * 7 % 256).toByte)
    val bytes = VideoTable.encodeAvi(Seq(frame), w, h)
    // patch biHeight (strf BITMAPINFOHEADER offset: find the strf chunk) to
    // negative AND rewrite the movi frame rows to top-down order
    val b = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def find(cc: String, from: Int): Int = {
      val pat = cc.getBytes("US-ASCII")
      (from until bytes.length - 4).find(i => pat.indices.forall(j => bytes(i + j) == pat(j))).get
    }
    val strf = find("strf", 0)
    b.putInt(strf + 8 + 8, -h) // biHeight := -h (top-down)
    val db = find("00db", strf)
    val stride = (w + 3) & ~3
    val body = db + 8
    // rows currently bottom-up; rewrite to top-down
    val rows = (0 until h).map { y =>
      val a = new Array[Byte](stride); System.arraycopy(bytes, body + y * stride, a, 0, stride); a
    }
    for (y <- 0 until h)
      System.arraycopy(rows(h - 1 - y), 0, bytes, body + y * stride, stride)
    val decoded = VideoTable.parseAvi(bytes)
    assert(decoded.length == 1 && decoded.head.sameElements(frame))
  }

  test("AVI parser rejects non-AVI payloads loudly") {
    import graft.sources.VideoTable
    intercept[IllegalArgumentException] {
      VideoTable.parseAvi("not a container at all".getBytes)
    }
    // RIFF but not AVI
    val wav = "RIFF".getBytes ++ Array[Byte](8, 0, 0, 0) ++ "WAVE....".getBytes
    intercept[IllegalArgumentException] { VideoTable.parseAvi(wav) }
  }

  test("frame sampling decodes real AVI containers: every-k indexes, content hashes") {
    import graft.sources.VideoTable
    val videos = VideoTable.generate(spark, 4)
    val frames = Multimodal.frameSample(spark, videos, everyK = 4).collect()
    // per-video frame count = ceil(nFrames/4)
    val expected = (0 until 4).map(i => (VideoTable.nFramesOf(i) + 3) / 4).sum
    assert(frames.length == expected)
    assert(frames.map(_.getInt(2)).distinct.sorted.toSeq == Seq(0, 4, 8, 12))
    // the hash is the decoded-content checksum — recompute from closed form
    frames.foreach { r =>
      val i = r.getString(0).substring(4).toInt
      val t = r.getInt(2); val w = VideoTable.wOf(i); val h = VideoTable.hOf(i)
      var want = 0L
      for (y <- 0 until h; x <- 0 until w)
        want += VideoTable.pixel(i, t, x, y).toLong * (y * w + x + 1)
      assert(r.getLong(5) == want, s"vid $i frame $t")
    }
    // determinism across reruns
    val again = Multimodal.frameSample(spark, videos, everyK = 4).collect()
    assert(frames.map(_.getLong(5)).sorted.toSeq == again.map(_.getLong(5)).sorted.toSeq)
  }

  test("phash LSH dedup finds identical-hash pairs and respects the Hamming gate") {
    import spark.implicits._
    val base = ImageTable.generate(spark, 20).select("image_id", "phash")
    // add an exact duplicate of image 0's phash under a new id
    val p0 = base.filter(col("image_id") === ImageTable.imageIdOf(0))
      .select("phash").head().getLong(0)
    val dup = Seq(("img_dup", p0)).toDF("image_id", "phash")
    val pairs = Multimodal.phashDedup(spark, base.unionByName(dup), maxDist = 0)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(pairs.contains((ImageTable.imageIdOf(0), "img_dup")))
    // with maxDist=0, every reported pair has identical hashes
    val all = Multimodal.phashDedup(spark, base.unionByName(dup), maxDist = 0).collect()
    all.foreach(r => assert(r.getInt(2) == 0))
  }

  test("phash LSH dedup is set-exact vs the brute-force all-pairs join") {
    val imgs = ImageTable.generate(spark, 60).select("image_id", "phash")
    val got = Multimodal.phashDedup(spark, imgs, maxDist = 8)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    val rows = imgs.collect().map(r => (r.getString(0), r.getLong(1)))
    val want = (for {
      (id1, p1) <- rows; (id2, p2) <- rows if id1 < id2
      h = java.lang.Long.bitCount(p1 ^ p2)
      // candidate gate: at hamming ≤ 8 over 4×16-bit bands some band always
      // matches only if the bits cluster; replicate the banded-LSH gate
      if (0 until 4).exists(j => ((p1 >>> (16 * j)) & 0xffff) == ((p2 >>> (16 * j)) & 0xffff))
      if h <= 8
    } yield (id1, id2, h)).toSet
    assert(got == want)
    // no duplicate emissions (first-match-band, not distinct)
    val lst = Multimodal.phashDedup(spark, imgs, maxDist = 8)
      .collect().map(r => (r.getString(0), r.getString(1)))
    assert(lst.length == lst.distinct.length)
  }

  test("phash banding knob: wider bands yield a SUBSET of the 4-band pairs; exact dups always found") {
    val imgs = graft.sources.ImageTable.generate(spark, 300)
    def pairs(n: Int) = Multimodal.phashHashPairs(imgs, maxDist = 8, nBands = n)
      .select("p1", "p2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p4 = pairs(4); val p2 = pairs(2)
    assert(p4.nonEmpty)
    // sharing a 32-bit band implies sharing both constituent 16-bit bands
    assert(p2.subsetOf(p4), s"wider bands must only shrink: extra=${(p2 -- p4).take(3)}")
    // hamming-0 (equal-hash) pairs never reach the banded join (distinct
    // collapse), and identical hashes share every band width — the collapse
    // stage is band-width-invariant, checked via the full dedup output
    val d4 = Multimodal.phashDedup(spark, imgs, maxDist = 8).count()
    assert(d4 > 0)
  }

  test("jpg leg: lossy (PSNR finite) yet >= 40 dB, incl. masked-margin images") {
    for (i <- Seq(0, 1, 2, 5, 7)) { // i%5==0 rows carry NDV margins
      val g = ImageTable.gridOf(i)
      val px = ImageTable.renderPixels(i)
      val jb = Codec.encode(px, g.w, g.h, "jpg")
      val dec = Codec.decode(jb, g.w, g.h, "jpg", ImageTable.Ndv)
      val p = Codec.psnr(px, dec, ImageTable.Ndv)
      assert(p >= 40.0, s"image $i PSNR $p < 40 dB")
      assert(!p.isInfinity, s"image $i roundtrip lossless — the lossy " +
        "invariant would be vacuous again")
      // lossy decode carries NO sentinel: every sample is a value
      assert(dec.forall(v => v >= 0f && v <= 255f))
      // and jpg bytes actually compress relative to the raw payload
      assert(jb.length < g.w * g.h * 4)
    }
  }

  test("jpg encode is deterministic; NDV fill replicates nearest valid") {
    val g = ImageTable.gridOf(5) // margin image
    val px = ImageTable.renderPixels(5)
    val a = Codec.encode(px, g.w, g.h, "jpg")
    val b = Codec.encode(px, g.w, g.h, "jpg")
    assert(java.util.Arrays.equals(a, b))
    // fill golden: a 4x3 grid, NDV frame around two valid pixels
    val n = ImageTable.Ndv
    val grid = Array(
      n, n, n, n,
      n, 10f, 20f, n,
      n, n, n, n)
    val filled = Codec.fillNdvForLossy(grid, 4, 3, n)
    // row 1: left/right replicate nearest valid (tie goes left)
    assert(filled.slice(4, 8).toSeq == Seq(10f, 10f, 20f, 20f))
    // empty rows copy the nearest valid row
    assert(filled.slice(0, 4).toSeq == Seq(10f, 10f, 20f, 20f))
    assert(filled.slice(8, 12).toSeq == Seq(10f, 10f, 20f, 20f))
    // all-NDV image flattens to mid-gray, not a crash
    val flat = Codec.fillNdvForLossy(Array(n, n, n, n), 2, 2, n)
    assert(flat.forall(_ == 128f))
  }

  test("features and thumbnails run over lossy jpg payloads (full plumbing)") {
    import spark.implicits._
    import graft.sources.ImageRow
    // re-encode the fixture table through the jpg leg, then run the
    // standard multimodal operators over the LOSSY payloads
    val jpgTable = ImageTable.generate(spark, 12).as[ImageRow].map { img =>
      val px = Codec.decode(img.bytes, img.w, img.h, img.fmt, img.ndv.toFloat)
      img.copy(bytes = Codec.encode(px, img.w, img.h, "jpg"), fmt = "jpg")
    }.toDF()
    val feats = Multimodal.imageFeatures(spark, jpgTable).collect()
    assert(feats.length == 12)
    feats.foreach { r =>
      assert(r.getDouble(4) == 1.0, "jpg decode is mask-free: all samples valid")
      assert(r.getDouble(5) > 0 && r.getDouble(5) < 255, "sane mean")
    }
    val thumbs = Multimodal.resize(spark, jpgTable, 8, 8).collect()
    assert(thumbs.length == 12)
    // roundtrip audit over the audit operator itself
    val audit = Multimodal.jpegRoundtrip(spark, ImageTable.generate(spark, 12))
      .collect()
    assert(audit.length == 12 &&
      audit.forall(r => r.getBoolean(4) && r.getBoolean(5)))
  }
}
