package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.{ImageMeta, MediaRow}
import org.scalatest.funsuite.AnyFunSuite

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import javax.imageio.ImageIO

/** Exactness contract for the REAL image decoder
  * ([[Multimodal.decodeImages]]): plant payloads ENCODED with the same
  * JDK codecs (a deterministic RGB gradient), run the distributed
  * decode, and assert lossless formats round-trip dimensions and
  * per-pixel mean luminance bit-exactly. Also proves the poisoned-blob
  * contract: non-image bytes yield ok=false rows, never task failures.
  */
class ImageDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** Deterministic test image: RGB gradient keyed by (seed, x, y). */
  private def gradient(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 7 + seed) % 256
      val g = (y * 11 + seed * 3) % 256
      val b = (x + y + seed * 5) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK has no $fmt writer")
    bos.toByteArray
  }

  private def meanLuma(img: BufferedImage): Double = {
    var sum = 0.0
    for (y <- 0 until img.getHeight; x <- 0 until img.getWidth) {
      val rgb = img.getRGB(x, y)
      sum += 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
        0.114 * (rgb & 0xff)
    }
    sum / (img.getWidth.toLong * img.getHeight)
  }

  test("planted PNG/BMP payloads decode to exact dimensions and luminance; JPEG to exact dims") {
    val spark2 = spark
    import spark2.implicits._
    val fixtures = Seq(
      (1L, gradient(64, 48, 1), "png"),
      (2L, gradient(17, 31, 2), "png"), // odd dims — stride edge case
      (3L, gradient(32, 32, 3), "bmp"),
      (4L, gradient(80, 20, 4), "jpeg"))
    val rows = fixtures.map { case (id, img, fmt) => MediaRow(id, encode(img, fmt)) }
    val expected = fixtures.map { case (id, img, fmt) =>
      id -> (img.getWidth, img.getHeight, meanLuma(img), fmt)
    }.toMap

    val got = Multimodal.decodeImages(rows.toDS().repartition(3))
      .collect().map(m => m.doc_id -> m).toMap
    assert(got.size == 4)
    for ((id, (w, h, luma, fmt)) <- expected) {
      val m = got(id)
      assert(m.ok, s"doc $id ($fmt) failed to decode")
      assert(m.format == fmt, s"doc $id sniffed as ${m.format}, wrote $fmt")
      assert(m.width == w && m.height == h,
        s"doc $id ($fmt): got ${m.width}x${m.height}, planted ${w}x$h")
      if (fmt != "jpeg") // lossless formats round-trip pixels exactly
        assert(m.avg_luma == luma,
          s"doc $id ($fmt): luminance ${m.avg_luma} != planted $luma")
    }
  }

  test("planted animated GIF decodes to exact per-frame rows") {
    val spark2 = spark
    import spark2.implicits._
    // solid-color frames: GIF palette quantization keeps a single color
    // bit-exact, so per-frame luminance asserts exactly
    val grays = Seq(40, 120, 200)
    val frames = grays.map { g =>
      val img = new BufferedImage(24, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24) img.setRGB(x, y, (g << 16) | (g << 8) | g)
      img
    }
    val bos = new ByteArrayOutputStream()
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach(f =>
      writer.writeToSequence(new javax.imageio.IIOImage(f, null, null), null))
    writer.endWriteSequence(); writer.dispose(); ios.close()

    val rows = Seq(MediaRow(20L, bos.toByteArray),
      MediaRow(21L, "junk".getBytes("UTF-8"))) // contributes zero rows
    val got = Multimodal.decodeFrames(rows.toDS().repartition(2))
      .collect().sortBy(_.frame_idx)
    assert(got.length == 3, s"expected 3 frames, got ${got.toSeq}")
    got.zip(grays).zipWithIndex.foreach { case ((m, g), i) =>
      assert(m.doc_id == 20L && m.frame_idx == i)
      assert(m.width == 24 && m.height == 16)
      // solid gray g: luma = g * (0.299 + 0.587 + 0.114) exactly as the
      // decoder folds it
      val expected = (0.299 * g + 0.587 * g + 0.114 * g)
      assert(m.avg_luma == expected,
        s"frame $i: luma ${m.avg_luma} != planted $expected")
    }
  }

  test("poisoned blobs yield ok=false rows, never task failures") {
    val spark2 = spark
    import spark2.implicits._
    val junk = Seq(
      MediaRow(10L, "not an image at all".getBytes("UTF-8")),
      MediaRow(11L, Array[Byte]()),
      // a PNG magic header with truncated garbage after it
      MediaRow(12L, Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10, 0, 0)))
    val got = Multimodal.decodeImages(junk.toDS())
      .collect().map(m => m.doc_id -> m).toMap
    assert(got.size == 3)
    assert(got.values.forall(!_.ok), s"junk decoded?: $got")
    assert(got(12L).format == "png", "magic-byte sniff should still identify the container")
  }

  /** Deterministic block image: cell (bx, by) of an nB×nB grid filled
    * with a constant gray level in [0, 180] (headroom so a +40
    * brightness shift never clamps). Block-aligned with the 32×32
    * box-filter for any size that's a multiple of 32. */
  private def blocks(size: Int, nB: Int, seed: Int, bright: Int = 0,
      editBlock: Int = -1): BufferedImage = {
    val img = new BufferedImage(size, size, BufferedImage.TYPE_INT_RGB)
    val cell = size / nB
    for (y <- 0 until size; x <- 0 until size) {
      val b = (y / cell) * nB + (x / cell)
      val base = (b * 37 + seed * 11) % 181
      val v0 = if (b == editBlock) math.min(255, base + 30) else base
      val v = math.min(255, v0 + bright)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def phashOf(imgs: Seq[(Long, BufferedImage)]): Map[Long, Long] = {
    val spark2 = spark
    import spark2.implicits._
    val rows = imgs.map { case (id, im) => MediaRow(id, encode(im, "png")) }
    val got = Multimodal.phashImages(rows.toDS().repartition(2)).collect()
    assert(got.forall(_.ok), s"planted PNGs must decode: ${got.toSeq}")
    got.map(p => p.doc_id -> p.phash).toMap
  }

  private def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  test("phash: brightness shift and re-scaling leave the hash unchanged") {
    // +40 gray on every pixel moves ONLY the (excluded) DC coefficient;
    // the same 8×8 block pattern rendered at 64px and 128px box-filters
    // to the same 32×32 luminance. Both must hash identically.
    val h = phashOf(Seq(
      1L -> blocks(64, 8, seed = 5),
      2L -> blocks(64, 8, seed = 5, bright = 40),
      3L -> blocks(128, 8, seed = 5)))
    assert(h(2L) == h(1L),
      f"brightness shift moved the hash: ${h(1L)}%016x -> ${h(2L)}%016x")
    assert(h(3L) == h(1L),
      f"2x re-scale moved the hash: ${h(1L)}%016x -> ${h(3L)}%016x")
  }

  test("phash: local edit stays near, different structure lands far") {
    // One edited block of 64 shifts few low-freq coefficients a little
    // (measured Hamming 4–7/64 across edit positions; ceiling 16 with
    // headroom); a different seed reshuffles every block (measured
    // 29–32 across seeds; floor 10 with headroom).
    val h = phashOf(Seq(
      1L -> blocks(64, 8, seed = 5),
      4L -> blocks(64, 8, seed = 5, editBlock = 27),
      5L -> blocks(64, 8, seed = 9)))
    val near = hamming(h(1L), h(4L))
    val far = hamming(h(1L), h(5L))
    assert(near <= 16, s"single-block edit moved $near/64 bits (floor 16)")
    assert(far >= 10, s"distinct structure only $far/64 bits apart (floor 10)")
    assert(near < far, s"edit ($near) should be nearer than a reshuffle ($far)")
  }

  test("MJPEG-in-AVI demuxes and decodes per-frame rows; poison-safe") {
    val spark2 = spark
    import spark2.implicits._
    def u32le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, data: Array[Byte]): Array[Byte] =
      id.getBytes("ISO-8859-1") ++ u32le(data.length) ++ data ++
        (if (data.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def avi(frames: Seq[Array[Byte]]): Array[Byte] = {
      val movi = chunk("LIST",
        "movi".getBytes("ISO-8859-1") ++ frames.flatMap(chunk("00dc", _)))
      val inner = "AVI ".getBytes("ISO-8859-1") ++ movi
      "RIFF".getBytes("ISO-8859-1") ++ u32le(inner.length) ++ inner
    }
    def solid(rgb: Int): BufferedImage = {
      val img = new BufferedImage(24, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 24) img.setRGB(x, y, rgb)
      img
    }
    val jpegs = Seq(0x808080, 0x204060, 0xf0f0f0).map(c => encode(solid(c), "jpg"))
    val good = avi(jpegs)
    // poisoned variants: lying chunk size, truncated tail, junk chunk
    val lying = good.clone()
    lying(good.length - jpegs.last.length - 6) = 0x7f.toByte // corrupt a size
    val truncated = good.take(good.length / 2)
    val junkFrame = avi(Seq(jpegs.head, "not a jpeg at all!".getBytes("UTF-8")))
    val rows = Seq(
      Multimodal.MediaRow(1L, good),
      Multimodal.MediaRow(2L, lying),
      Multimodal.MediaRow(3L, truncated),
      Multimodal.MediaRow(4L, junkFrame),
      Multimodal.MediaRow(5L, "no container here".getBytes("UTF-8")))
    val got = Multimodal.decodeAviFrames(spark2.createDataset(rows).repartition(2))
      .collect().groupBy(_.doc_id)
    // the demuxed frames must be EXACTLY the embedded JPEGs: compare
    // against decoding the same bytes standalone
    val want = jpegs.map(j => ImageIO.read(new java.io.ByteArrayInputStream(j)))
    val frames1 = got(1L).sortBy(_.frame_idx)
    assert(frames1.length == 3, s"expected 3 frames, got ${frames1.length}")
    frames1.zip(want).foreach { case (f, img) =>
      assert(f.width == 24 && f.height == 16)
      assert(f.avg_luma == meanLuma(img),
        s"frame ${f.frame_idx}: demuxed luminance ${f.avg_luma} != standalone decode")
    }
    // poison contracts: no crash, bounded degradation
    assert(!got.contains(5L), "non-AVI payload must yield no rows")
    assert(got.getOrElse(4L, Array.empty).length == 1,
      "junk frame chunk skipped, valid frame kept")
    assert(got.getOrElse(3L, Array.empty).length <= 3 &&
      got.getOrElse(2L, Array.empty).length <= 3)
    assert(Multimodal.sniffFormat(good) == "avi")
  }

  test("RIFF walk survives 100k-deep LIST nesting and still finds the frame") {
    // the round-12 advisor scenario: LIST chunks nest at 12 bytes per
    // level, so a ~1.2 MB crafted AVI reaches 100k depth — recursive
    // descent would StackOverflowError (an Error, invisible to the
    // Exception-based poison contract). The iterative walk must (a)
    // return rather than kill the task and (b) preserve in-order
    // traversal deep enough to surface a planted frame at the bottom.
    def u32le(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val depth = 100000
    val frame = Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3, 4)
    // innermost content: one valid 00dc jpeg-marker chunk
    var inner = "00dc".getBytes("ISO-8859-1") ++ u32le(frame.length) ++ frame
    val bufLen = 12 + depth * 12 + inner.length
    val out = new Array[Byte](bufLen)
    // build outward-in directly into the buffer: each level is
    // LIST <size> 'lst ' wrapping the next
    "RIFF".getBytes("ISO-8859-1").copyToArray(out, 0)
    u32le(bufLen - 8).copyToArray(out, 4)
    "AVI ".getBytes("ISO-8859-1").copyToArray(out, 8)
    var o = 12
    var remaining = bufLen - 12
    for (_ <- 0 until depth) {
      "LIST".getBytes("ISO-8859-1").copyToArray(out, o)
      u32le(remaining - 8).copyToArray(out, o + 4)
      "lst ".getBytes("ISO-8859-1").copyToArray(out, o + 8)
      o += 12
      remaining -= 12
    }
    inner.copyToArray(out, o)
    val got = Multimodal.demuxMjpegAvi(out) // must not StackOverflow
    assert(got.length == 1 && got.head.sameElements(frame),
      s"expected the planted frame at depth $depth, got ${got.length} frames")
  }

  test("phash: poisoned blobs yield ok=false, hash 0") {
    val spark2 = spark
    import spark2.implicits._
    val junk = Seq(MediaRow(10L, "junk".getBytes("UTF-8")))
    val got = Multimodal.phashImages(junk.toDS()).collect()
    assert(got.length == 1 && !got(0).ok && got(0).phash == 0L)
  }
}
