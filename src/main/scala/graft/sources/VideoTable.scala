package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The engine's video input row — the third leg of the multimodal contract
  * (image/audio/video as opaque binary + typed metadata): a REAL container
  * payload (uncompressed 8-bit AVI), frame geometry, frame count, caption. */
final case class VideoRow(
  video_id: String, bytes: Array[Byte], w: Int, h: Int, n_frames: Int,
  caption: String)

/** Deterministic synthetic video table over a REAL container format —
  * minimal but spec-correct uncompressed AVI (RIFF: hdrl(avih, strl(strh,
  * strf+palette)) + movi('00db' DIB frames, bottom-up rows padded to 4
  * bytes)), written and parsed here in pure JVM code, the way AudioTable
  * carries real PCM16 (round-3 precedent; the reference's closest analog is
  * the GDAL-sided iolib raster open, iolib.py:93). Frame pixels are INTEGER
  * closed forms of (video, frame, x, y) only, so every decoded byte is
  * exactly reproducible in the DuckDB twins — and identical at any
  * parallelism (FIXTURES.md F7 determinism rule).
  *
  * The parser is the honest decode path: it validates the RIFF/AVI magic,
  * reads geometry from the strf BITMAPINFOHEADER (8-bit, BI_RGB only),
  * walks the movi LIST chunk-by-chunk (word-aligned, '##db'/'##dc'),
  * un-flips the bottom-up rows and strips the stride padding. */
object VideoTable {
  /** Frame geometry for video i: width 28/30/32 (28 and 30 exercise the
    * 4-byte row-stride padding), height 20/24. */
  def wOf(i: Int): Int = 28 + (i % 3) * 2
  def hOf(i: Int): Int = 20 + (i % 2) * 4
  def nFramesOf(i: Int): Int = 12 + i % 5

  /** Pixel (x, y) of frame t in video i — a moving integer gradient. */
  def pixel(i: Int, t: Int, x: Int, y: Int): Int =
    (x * 3 + y * 5 + t * 7 + i * 11) % 256

  def videoIdOf(i: Int): String = f"vid_$i%07d"

  private def frameOf(i: Int, t: Int): Array[Byte] = {
    val w = wOf(i); val h = hOf(i)
    val px = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { px(y * w + x) = pixel(i, t, x, y).toByte; x += 1 }
      y += 1
    }
    px
  }

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode row-major top-down 8-bit frames as an uncompressed AVI. */
  def encodeAvi(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int = 10): Array[Byte] = {
    require(frames.forall(_.length == w * h), "frame size mismatch")
    val stride = (w + 3) & ~3
    val frameBytes = h * stride
    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val pad = body.length % 2 // RIFF chunks are word-aligned
      val out = ByteBuffer.allocate(8 + body.length + pad).order(ByteOrder.LITTLE_ENDIAN)
      out.put(fourcc(cc)).putInt(body.length).put(body)
      out.array()
    }
    def list(kind: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", fourcc(kind) ++ body)

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps)           // dwMicroSecPerFrame
      .putInt(frameBytes * fps)          // dwMaxBytesPerSec
      .putInt(0).putInt(0)               // padding, flags
      .putInt(frames.length)             // dwTotalFrames
      .putInt(0).putInt(1)               // initial frames, dwStreams
      .putInt(frameBytes)                // suggested buffer
      .putInt(w).putInt(h)
    // 16 reserved bytes remain zero
    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.put(fourcc("vids")).put(fourcc("DIB "))
      .putInt(0).putShort(0).putShort(0) // flags, priority, language
      .putInt(0)                         // initial frames
      .putInt(1).putInt(fps)             // scale, rate → fps
      .putInt(0).putInt(frames.length)   // start, length (frames)
      .putInt(frameBytes).putInt(-1)     // buffer size, quality
      .putInt(0)                         // sample size
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    // BITMAPINFOHEADER + 256-entry grayscale palette (8-bit DIB requires it)
    val strf = ByteBuffer.allocate(40 + 256 * 4).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40).putInt(w).putInt(h)  // biSize, biWidth, biHeight (+: bottom-up)
      .putShort(1).putShort(8)           // biPlanes, biBitCount
      .putInt(0)                         // biCompression = BI_RGB
      .putInt(frameBytes)
      .putInt(0).putInt(0).putInt(256).putInt(256)
    var g = 0
    while (g < 256) { // palette entries are (B, G, R, 0)
      strf.put(g.toByte).put(g.toByte).put(g.toByte).put(0.toByte); g += 1
    }

    val hdrl = list("hdrl",
      chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))
    val movi = list("movi", frames.flatMap { f =>
      val dib = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) { // bottom-up rows, zero-padded to the stride
        System.arraycopy(f, (h - 1 - y) * w, dib, y * stride, w)
        y += 1
      }
      chunk("00db", dib)
    }.toArray)
    chunk("RIFF", fourcc("AVI ") ++ hdrl ++ movi)
  }

  /** Decode an uncompressed 8-bit AVI to row-major top-down frames — the
    * real parse path frameSample runs per video payload. */
  def parseAvi(bytes: Array[Byte]): Seq[Array[Byte]] = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def cc(): String = { val a = new Array[Byte](4); b.get(a); new String(a, "US-ASCII") }
    require(cc() == "RIFF", "not a RIFF container")
    val riffSize = b.getInt
    require(riffSize + 8 <= bytes.length, s"truncated RIFF (claims $riffSize)")
    require(cc() == "AVI ", "not an AVI")

    var w = -1; var h = -1; var topDown = false
    val frames = Seq.newBuilder[Array[Byte]]
    // walk a LIST body in [from, until): returns nothing, recurses into
    // hdrl/strl/movi, picks up strf geometry and ##db/##dc frame chunks
    def walk(from: Int, until: Int): Unit = {
      var pos = from
      while (pos + 8 <= until) {
        b.position(pos)
        val id = cc(); val size = b.getInt
        val body = pos + 8
        id match {
          case "LIST" =>
            b.position(body)
            cc() // list kind — recurse regardless; only known chunks match below
            walk(body + 4, body + size)
          case "strf" =>
            require(size >= 40, "strf too small for BITMAPINFOHEADER")
            b.position(body)
            val biSize = b.getInt; val biW = b.getInt; val biH = b.getInt
            b.getShort // planes
            val bits = b.getShort; val comp = b.getInt
            require(biSize >= 40 && bits == 8 && comp == 0,
              s"unsupported DIB (bits=$bits compression=$comp)")
            w = biW; h = math.abs(biH); topDown = biH < 0
          case fcc if fcc.length == 4 && (fcc.endsWith("db") || fcc.endsWith("dc")) &&
                      fcc.take(2).forall(_.isDigit) =>
            require(w > 0 && h > 0, "frame chunk before strf header")
            val stride = (w + 3) & ~3
            require(size >= h * stride, s"frame chunk short: $size < ${h * stride}")
            val px = new Array[Byte](w * h)
            var y = 0
            while (y < h) {
              val srcRow = if (topDown) y else h - 1 - y
              b.position(body + srcRow * stride)
              b.get(px, y * w, w)
              y += 1
            }
            frames += px
          case _ => // unknown chunk (idx1, JUNK, …): skip
        }
        pos = body + size + (size % 2) // word alignment
      }
    }
    walk(12, 8 + riffSize)
    frames.result()
  }

  /** Deterministic video table: `n` AVI payloads, encoded in executors. */
  def generate(spark: SparkSession, n: Int): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { li =>
      val i = li.toInt
      val frames = (0 until nFramesOf(i)).map(t => frameOf(i, t))
      VideoRow(videoIdOf(i), encodeAvi(frames, wOf(i), hOf(i)),
        wOf(i), hOf(i), nFramesOf(i),
        s"synthetic video $i ${wOf(i)}x${hOf(i)} frames=${nFramesOf(i)}")
    }.toDF()
  }
}
