package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal
import graft.operators.Multimodal.ImageCodec

/** Real JDK-backed image decode (`javax.imageio`) + perceptual dHash
  * near-dup: PNGs are generated in-test, so the decode path runs on
  * genuine image bytes with zero external dependencies; non-image
  * payloads take the FNV-1a fallback.
  */
class ImageDedupSpec extends SparkSuite {
  import spark.implicits._

  /** Render a w×h RGB image from a pixel function and PNG-encode it. */
  private def png(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, f(x, y))
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Smooth diagonal gradient with a dark block — enough structure for a
    * distinctive dHash that survives resampling.
    */
  private def scene(x: Int, y: Int, w: Int, h: Int): Int = {
    val base = (x * 255 / w + y * 128 / h) & 0xff
    val v = if (x > w / 2 && y < h / 4) base / 4 else base
    (v << 16) | (v << 8) | v
  }

  private def resizedPng(src: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val img = ImageIO.read(new java.io.ByteArrayInputStream(src))
    val out = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
      java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
    g.drawImage(img, 0, 0, w, h, null)
    g.dispose()
    val bytes = new ByteArrayOutputStream()
    ImageIO.write(out, "png", bytes)
    bytes.toByteArray
  }

  private val original = png(64, 48)((x, y) => scene(x, y, 64, 48))

  test("javax.imageio decodes real PNG bytes: true dimensions, 1 frame") {
    val media = Seq((1L, original)).toDF("media_id", "payload")
    val d = Multimodal.decodeAndFeaturize(media).collect()(0)
    assert((d.getInt(1), d.getInt(2), d.getInt(3)) === ((64, 48, 1)))
  }

  test("decoded features are REAL pixel luminance histograms with a " +
      "decoded_real provenance flag; fakes keep byte stats") {
    val reencoded = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(original))
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // genuinely different luminance DISTRIBUTION (inverted values) — a
    // mirrored scene would fool a histogram, inversion cannot
    val inverted = png(64, 48) { (x, y) =>
      val v = 255 - (scene(x, y, 64, 48) & 0xff)
      (v << 16) | (v << 8) | v
    }
    val media = Seq(
      (1L, original), (2L, reencoded), (3L, inverted),
      (10L, "not an image at all".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val rows = Multimodal.decodeAndFeaturize(media).collect()
      .map(r => r.getLong(0) ->
        (r.getSeq[Float](4).toArray, r.getBoolean(5))).toMap
    def l1(a: Array[Float], b: Array[Float]): Double =
      a.zip(b).map { case (x, y) => math.abs(x - y).toDouble }.sum
    // re-encode preserves pixels → identical histogram
    assert(l1(rows(1L)._1, rows(2L)._1) === 0.0)
    // inverted values move mass across bins → far histogram (measured
    // 0.44 on this scene vs 0.0 for the re-encode — the gradient's
    // near-symmetric luminance distribution caps how far inversion moves)
    assert(l1(rows(1L)._1, rows(3L)._1) > 0.3,
      s"inverted image histogram too close: ${l1(rows(1L)._1, rows(3L)._1)}")
    // histograms are normalized: fractions sum to ~1
    assert(math.abs(rows(1L)._1.map(_.toDouble).sum - 1.0) < 1e-5)
    // provenance: decoded rows flagged real, fallback rows not
    assert(rows(1L)._2 && rows(2L)._2 && rows(3L)._2)
    assert(!rows(10L)._2)
  }

  test("dHash finds re-encoded and resized duplicates, not a different " +
      "image; fallback pairs only exact byte-dups") {
    // re-encode: decode + write again (byte stream differs, pixels don't)
    val reencoded = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(original))
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val resized = resizedPng(original, 48, 36)
    val different = png(64, 48)((x, y) => scene(63 - x, y, 64, 48)) // mirrored
    val media = Seq(
      (1L, original), (2L, reencoded), (3L, resized), (4L, different)
    ).toDF("media_id", "payload")

    val sigs = Multimodal.imageSignatures(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sigs(1) === sigs(2)) // identical pixels -> identical dHash
    assert(java.lang.Long.bitCount(sigs(1) ^ sigs(3)) <= 10,
      s"resize moved dHash ${java.lang.Long.bitCount(sigs(1) ^ sigs(3))} bits")
    assert(java.lang.Long.bitCount(sigs(1) ^ sigs(4)) > 10,
      "mirrored image should be far in dHash space")

    val pairs = Multimodal.imageNearDup(media, maxHamming = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((1L, 3L)) &&
      pairs.contains((2L, 3L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))

    // fallback: non-image payloads pair only on exact byte equality
    val textMedia = Seq(
      (10L, "not an image at all".getBytes("UTF-8")),
      (11L, "not an image at all".getBytes("UTF-8")),
      (12L, "different bytes entirely".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val fp = Multimodal.imageNearDup(textMedia, maxHamming = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(fp === Set((10L, 11L)))
  }

  test("incremental image near-dup against a written dHash index finds " +
      "a re-encoded duplicate of an INDEXED image without re-hashing " +
      "the corpus") {
    val reencoded = {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(original))
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val different = png(64, 48)((x, y) => scene(63 - x, y, 64, 48))
    val standing = Seq((1L, original), (2L, different))
      .toDF("media_id", "payload")
    val batch = Seq((10L, reencoded),
      (11L, "not an image at all".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val dir = java.nio.file.Files.createTempDirectory("imgidx").toString
    Multimodal.writeImageIndex(standing, dir, maxHamming = 10)
    val pairs = Multimodal.imageNearDupAgainstIndex(spark, batch, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 10L))) // the duplicate, nothing else
  }

  test("dHash is deterministic and sensitive to content, not encoding") {
    val a = ImageCodec.dhash64(
      ImageIO.read(new java.io.ByteArrayInputStream(original)))
    val b = ImageCodec.dhash64(
      ImageIO.read(new java.io.ByteArrayInputStream(original)))
    assert(a === b)
    assert(ImageCodec.fnv1a64("x".getBytes) !== ImageCodec.fnv1a64("y".getBytes))
  }
}
