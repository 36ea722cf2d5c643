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
}
