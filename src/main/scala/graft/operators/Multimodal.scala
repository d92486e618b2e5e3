package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (extension tier): image/audio/video travel as
  * opaque `binary` columns with a typed metadata struct; decode /
  * feature-extract run as per-partition batch functions.
  *
  * Codec reality, per modality: IMAGE decode is REAL for the formats the
  * JDK ships readers for ([[ImageCodec]], `javax.imageio` — dimensions,
  * luminance features, perceptual dHash all from true pixels); AUDIO
  * metadata is REAL for WAV ([[AudioCodec]], `javax.sound.sampled` header
  * parse — sample rate, channels, frames, duration); VIDEO container
  * metadata is REAL for MP4 ([[VideoCodec]], a dependency-free ISO
  * BMFF box walk — duration from `moov/mvhd`, track count from `trak`
  * boxes), while per-frame counts/decodes remain the deterministic
  * [[FakeCodec]] stand-in (the JDK ships no video pixel codec). Every
  * decoded row carries a `decoded_real` provenance flag so
  * downstream can tell which codec produced it — fake values never
  * masquerade as decoded ones.
  *
  * Scale notes: binary payloads stay columnar in parquet; metadata-only
  * queries never touch the payload column (column pruning). Decode is
  * per-partition (one codec init per partition, not per row), and the
  * output schema is fixed so downstream stays in whole-stage codegen.
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  val mediaMetaType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("n_bytes", LongType),
    StructField("checksum", StringType)))

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("payload", BinaryType),
    StructField("meta", mediaMetaType)))

  /** Build a media table from the `documents` testdata: the UTF-8 bytes of
    * `text` play the opaque payload (deterministic fake "image bytes"), and
    * the metadata struct is computed with codegen'd built-ins.
    */
  def mediaFromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image/fake").as("media_type"),
        length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes"),
        md5(encode(col("text"), "UTF-8")).as("checksum")).as("meta"))

  /** STUB codec: deterministic fake decode. A real deployment swaps this
    * object for one backed by an actual codec library; the signature — a
    * whole partition of payloads in, fixed-schema features out — is the
    * contract `mapPartitions` needs.
    */
  object FakeCodec {
    /** "Decode" → (width, height, n_frames): pure function of the bytes. */
    def decode(payload: Array[Byte]): (Int, Int, Int) = {
      val n = payload.length
      (n % 640 + 1, n % 480 + 1, n % 30 + 1)
    }
    /** "Feature vector": 8 deterministic byte-statistics. */
    def features(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](8)
      var i = 0
      while (i < payload.length) {
        out(i % 8) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
    /** "Resize": scale decoded dimensions to fit a bounding box,
      * preserving aspect ratio — the arithmetic a real resizer performs on
      * real dimensions.
      */
    def resize(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
      val scale = math.min(maxW.toDouble / w, maxH.toDouble / h)
      if (scale >= 1.0) (w, h)
      else (math.max((w * scale).toInt, 1), math.max((h * scale).toInt, 1))
    }

    /** "Audio metadata": deterministic fake (sample rate, channels,
      * frames, duration) from the byte count — the stand-in for payloads
      * no real decoder claims. */
    def audioMeta(payload: Array[Byte]): (Int, Int, Long, Double) = {
      val n = payload.length
      val rate = 8000 + n % 40000
      val frames = n.toLong * 4
      (rate, n % 2 + 1, frames, frames.toDouble / rate)
    }

    /** "Video metadata": deterministic fake (duration s, track count)
      * from the byte count — the stand-in for payloads [[VideoCodec]]
      * does not claim. Duration reuses [[decode]]'s fake frame count at
      * a nominal 25 fps so the two fake surfaces agree. */
    def videoMeta(payload: Array[Byte]): (Double, Int) = {
      val n = payload.length
      ((n % 30 + 1) / 25.0, n % 3 + 1)
    }
  }

  /** REAL codec for the formats the JDK ships readers for (PNG, JPEG,
    * GIF, BMP via `javax.imageio` — part of `java.desktop`, no external
    * dependency). Non-image payloads (ImageIO returns null / throws)
    * fall back to [[FakeCodec]], so the document-backed fake media
    * tables keep their deterministic contract while genuine image bytes
    * decode for real.
    */
  object ImageCodec {

    /** Refuse to decode anything whose header claims more pixels: a
      * decompression bomb (tiny file, huge declared dimensions) would
      * otherwise allocate a multi-GB BufferedImage on the executor.
      */
    val MaxPixels: Long = 64L * 1024 * 1024

    /** Cheap magic-byte sniff for the formats the JDK ships readers
      * for (PNG, JPEG, GIF, BMP, TIFF since Java 9) — the fast path
      * for the overwhelmingly common non-image payload (no reader
      * probing, no stream setup).
      */
    private def looksLikeImage(p: Array[Byte]): Boolean =
      p.length >= 4 &&
        (((p(0) & 0xff) == 0x89 && p(1) == 'P' && p(2) == 'N' &&
            p(3) == 'G') ||                              // PNG
          ((p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) || // JPEG
          (p(0) == 'G' && p(1) == 'I' && p(2) == 'F') ||      // GIF
          (p(0) == 'B' && p(1) == 'M') ||                     // BMP
          (p(0) == 'I' && p(1) == 'I' && p(2) == 42 &&
            p(3) == 0) ||                                // TIFF little-endian
          (p(0) == 'M' && p(1) == 'M' && p(2) == 0 &&
            p(3) == 42))                                 // TIFF big-endian

    def decode(payload: Array[Byte]): Option[java.awt.image.BufferedImage] = {
      if (!looksLikeImage(payload)) return None
      var stream: javax.imageio.stream.ImageInputStream = null
      try {
        // a MemoryCacheImageInputStream directly, NOT
        // ImageIO.createImageInputStream: the factory consults the
        // JVM-global use-cache flag and would spend a tmpdir file
        // create+delete PER read attempt (per-row cost — q46 is a
        // frozen headline query); constructing the in-memory stream
        // scopes the choice to this read instead of mutating the
        // global default for every ImageIO user in the JVM
        stream = new javax.imageio.stream.MemoryCacheImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(stream)
        if (!readers.hasNext) return None
        val reader = readers.next()
        try {
          reader.setInput(stream)
          // dimension check from the HEADER, before any pixel allocation
          val (w, h) = (reader.getWidth(0).toLong, reader.getHeight(0).toLong)
          if (w <= 0 || h <= 0 || w * h > MaxPixels) None
          else Option(reader.read(0))
        } finally reader.dispose()
      } catch { case scala.util.control.NonFatal(_) => None }
      finally if (stream != null) stream.close()
    }

    /** Perceptual dHash (difference hash): average luminance on a 9×8
      * grid of cell-box means, then one bit per horizontal neighbor pair
      * — bit (r,c) set iff cell(r,c+1) is brighter than cell(r,c). 64
      * bits, robust to re-encoding and resizing (the grid means survive
      * both); plugs into the simhash pigeonhole candidate machinery.
      */
    def dhash64(img: java.awt.image.BufferedImage): Long = {
      val (cols, rows) = (9, 8)
      val lum = Array.ofDim[Double](rows, cols)
      val (w, h) = (img.getWidth, img.getHeight)
      var r = 0
      while (r < rows) {
        var c = 0
        while (c < cols) {
          // cell box [x0,x1) x [y0,y1), at least one pixel
          val x0 = c * w / cols; val x1 = math.max((c + 1) * w / cols, x0 + 1)
          val y0 = r * h / rows; val y1 = math.max((r + 1) * h / rows, y0 + 1)
          var acc = 0.0
          var y = y0
          while (y < h && y < y1) {
            var x = x0
            while (x < w && x < x1) {
              val rgb = img.getRGB(x, y)
              acc += 0.299 * ((rgb >> 16) & 0xff) +
                0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
              x += 1
            }
            y += 1
          }
          lum(r)(c) = acc / ((math.min(x1, w) - x0).max(1) *
            (math.min(y1, h) - y0).max(1))
          c += 1
        }
        r += 1
      }
      var bits = 0L
      r = 0
      while (r < rows) {
        var c = 0
        while (c < 8) {
          bits = (bits << 1) | (if (lum(r)(c + 1) > lum(r)(c)) 1L else 0L)
          c += 1
        }
        r += 1
      }
      bits
    }

    /** Normalized luminance histogram over the decoded pixels — the REAL
      * feature vector for genuinely decoded images (re-encoding preserves
      * it exactly: same pixels, same histogram; resampling preserves it
      * approximately). `bins` buckets over the 0..255 Rec.601 luma range,
      * each value = fraction of pixels in the bucket, so vectors are
      * comparable across image sizes. Cost is one O(pixels) pass, bounded
      * by [[MaxPixels]] via [[decode]]'s header guard.
      */
    def lumHistogram(img: java.awt.image.BufferedImage,
        bins: Int = 8): Array[Float] = {
      val out = new Array[Float](bins)
      val (w, h) = (img.getWidth, img.getHeight)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val lum = 0.299 * ((rgb >> 16) & 0xff) +
            0.587 * ((rgb >> 8) & 0xff) + 0.114 * (rgb & 0xff)
          out(math.min((lum * bins / 256.0).toInt, bins - 1)) += 1f
          x += 1
        }
        y += 1
      }
      val n = (w.toLong * h).toFloat.max(1f)
      var i = 0
      while (i < bins) { out(i) /= n; i += 1 }
      out
    }

    /** Fallback 64-bit signature for non-decodable payloads: FNV-1a over
      * the raw bytes — distinct payloads land on effectively random bits,
      * so only EXACT byte duplicates pair up within a small Hamming
      * radius (the right degenerate semantics when no decode exists).
      */
    def fnv1a64(payload: Array[Byte]): Long = {
      var h = 0xcbf29ce484222325L
      var i = 0
      while (i < payload.length) {
        h ^= (payload(i) & 0xffL)
        h *= 0x100000001b3L
        i += 1
      }
      h
    }
  }

  /** REAL audio metadata for WAV payloads via `javax.sound.sampled`
    * (part of `java.desktop`, no external dependency): RIFF/WAVE
    * magic-byte sniff, then the JDK parses the format chunk — true
    * sample rate, channels, frame count, duration. Non-WAV payloads fall
    * back to [[FakeCodec]], the same sniff-then-fallback contract as
    * [[ImageCodec]].
    */
  object AudioCodec {
    private def looksLikeWav(p: Array[Byte]): Boolean =
      p.length >= 12 && p(0) == 'R' && p(1) == 'I' && p(2) == 'F' &&
        p(3) == 'F' && p(8) == 'W' && p(9) == 'A' && p(10) == 'V' &&
        p(11) == 'E'

    /** (sample_rate, channels, n_frames, duration_s) from the WAV
      * header, or None when the payload is not parseable WAV. */
    def decodeMeta(payload: Array[Byte]): Option[(Int, Int, Long, Double)] = {
      if (!looksLikeWav(payload)) return None
      try {
        val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
          new java.io.ByteArrayInputStream(payload))
        val fmt = aff.getFormat
        val frames = aff.getFrameLength.toLong
        val rate = fmt.getSampleRate
        // NOT_SPECIFIED (-1) header fields → no trustworthy metadata
        if (rate <= 0 || frames < 0) None
        else Some((rate.toInt, fmt.getChannels, frames,
          frames / rate.toDouble))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  /** REAL video container metadata for MP4-family payloads (ISO BMFF —
    * MP4, M4V, MOV share the box layout) with zero dependencies: walk
    * the length-prefixed box tree, read duration/timescale from
    * `moov/mvhd` (version 0 and 1 layouts) and count `trak` children.
    * No JDK video PIXEL codec exists, so this is deliberately
    * container-level only — the honest boundary: real duration + track
    * count, no fake frame decode claiming to be real. Non-MP4 or
    * malformed payloads (bad box sizes, missing/truncated `mvhd`, zero
    * timescale) fall back to [[FakeCodec]], the same
    * sniff-then-fallback contract as [[ImageCodec]]/[[AudioCodec]].
    */
  object VideoCodec {
    /** ISO BMFF sniff: the first box is `ftyp` (its 4-byte type sits at
      * offset 4, after the 4-byte size). */
    private def looksLikeMp4(p: Array[Byte]): Boolean =
      p.length >= 12 && p(4) == 'f' && p(5) == 't' && p(6) == 'y' &&
        p(7) == 'p'

    private def u32(p: Array[Byte], off: Int): Long =
      ((p(off) & 0xffL) << 24) | ((p(off + 1) & 0xffL) << 16) |
        ((p(off + 2) & 0xffL) << 8) | (p(off + 3) & 0xffL)

    private def u64(p: Array[Byte], off: Int): Long = {
      var v = 0L
      var i = 0
      while (i < 8) { v = (v << 8) | (p(off + i) & 0xffL); i += 1 }
      v
    }

    /** The child boxes of [start, end) as (type, payloadStart,
      * payloadEnd), or None on ANY malformed size field — a container
      * whose accounting is broken gets no partial answer. Handles the
      * 64-bit `size == 1` largesize and the `size == 0` to-end forms.
      */
    private def children(p: Array[Byte], start: Int, end: Int)
        : Option[List[(String, Int, Int)]] = {
      val out = List.newBuilder[(String, Int, Int)]
      var off = start
      while (off < end) {
        if (end - off < 8) return None
        var size = u32(p, off)
        var hdr = 8
        if (size == 1L) {
          if (end - off < 16) return None
          size = u64(p, off + 8)
          hdr = 16
        } else if (size == 0L) size = (end - off).toLong
        if (size < hdr || off.toLong + size > end) return None
        out += ((new String(p, off + 4, 4, "ISO-8859-1"),
          off + hdr, off + size.toInt))
        off += size.toInt
      }
      Some(out.result())
    }

    /** (duration_s, n_tracks) from the `moov` box, or None when the
      * payload is not parseable ISO BMFF. */
    def decodeMeta(payload: Array[Byte]): Option[(Double, Int)] = {
      if (!looksLikeMp4(payload)) return None
      try {
        for {
          top <- children(payload, 0, payload.length)
          (_, ms, me) <- top.find(_._1 == "moov")
          kids <- children(payload, ms, me)
          (_, ps, pe) <- kids.find(_._1 == "mvhd")
          duration <- {
            // mvhd payload: version(1) flags(3), then v0 creation(4)
            // modification(4) timescale(4) duration(4); v1 widens the
            // three time fields to 8 bytes
            val v = payload(ps) & 0xff
            if (v == 0 && pe - ps >= 20) {
              val ts = u32(payload, ps + 12)
              if (ts > 0) Some(u32(payload, ps + 16).toDouble / ts)
              else None
            } else if (v == 1 && pe - ps >= 32) {
              val ts = u32(payload, ps + 20)
              if (ts > 0) Some(u64(payload, ps + 24).toDouble / ts)
              else None
            } else None
          }
        } yield (duration, kids.count(_._1 == "trak"))
      } catch { case scala.util.control.NonFatal(_) => None }
    }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("features", ArrayType(FloatType)),
    StructField("decoded_real", BooleanType)))

  /** Decode + feature-extract, batched per partition. One codec "session"
    * per partition; rows stream through without materializing the whole
    * partition. Real image bytes get their TRUE dimensions AND a real
    * pixel feature vector (8-bin luminance histogram,
    * [[ImageCodec.lumHistogram]]) from [[ImageCodec]] (stills decode as
    * 1 frame); everything else keeps [[FakeCodec]]'s deterministic fake
    * dims and byte-stat features, so the document-backed tables
    * (q45/q46) are unchanged. `decoded_real` discloses per row which
    * codec produced it — real dimensions can never silently carry fake
    * features or vice versa.
    */
  def decodeAndFeaturize(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        // real codec: open once per partition here
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          ImageCodec.decode(payload) match {
            case Some(img) =>
              Row(id, img.getWidth, img.getHeight, 1,
                ImageCodec.lumHistogram(img).toSeq, true)
            case None =>
              val (w, h, f) = FakeCodec.decode(payload)
              Row(id, w, h, f, FakeCodec.features(payload).toSeq, false)
          }
        }
      }(enc)
  }

  val audioMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType),
    StructField("duration_s", DoubleType),
    StructField("decoded_real", BooleanType)))

  /** Audio metadata, batched per partition: REAL header-parsed values
    * for WAV payloads ([[AudioCodec]]), deterministic [[FakeCodec]]
    * stand-ins otherwise, with the same `decoded_real` provenance
    * contract as [[decodeAndFeaturize]]. Map-only (`mapPartitions` is
    * the codec-batch contract), fixed output schema.
    */
  def audioMetadata(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(audioMetaSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          AudioCodec.decodeMeta(payload) match {
            case Some((rate, ch, frames, dur)) =>
              Row(id, rate, ch, frames, dur, true)
            case None =>
              val (rate, ch, frames, dur) = FakeCodec.audioMeta(payload)
              Row(id, rate, ch, frames, dur, false)
          }
        }
      }(enc)
  }

  val videoMetaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("duration_s", DoubleType),
    StructField("n_tracks", IntegerType),
    StructField("decoded_real", BooleanType)))

  /** Video container metadata, batched per partition: REAL
    * `moov`/`mvhd`-parsed duration and track count for MP4-family
    * payloads ([[VideoCodec]]), deterministic [[FakeCodec]] stand-ins
    * otherwise, with the same `decoded_real` provenance contract as
    * [[decodeAndFeaturize]]/[[audioMetadata]]. Map-only, fixed output
    * schema.
    */
  def videoMetadata(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(videoMetaSchema)
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          VideoCodec.decodeMeta(payload) match {
            case Some((dur, tracks)) => Row(id, dur, tracks, true)
            case None =>
              val (dur, tracks) = FakeCodec.videoMeta(payload)
              Row(id, dur, tracks, false)
          }
        }
      }(enc)
  }

  /** Per-media 64-bit perceptual signature: dHash when the payload
    * decodes as an image, FNV-1a of the bytes otherwise. Map-only
    * (`mapPartitions` is the codec-batch contract), one long per row out.
    */
  def imageSignatures(media: DataFrame): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType),
      StructField("dhash", LongType))))
    media.select(col("media_id"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = Option(r.getAs[Array[Byte]](1))
            .getOrElse(Array.emptyByteArray)
          val sig = ImageCodec.decode(payload).map(ImageCodec.dhash64)
            .getOrElse(ImageCodec.fnv1a64(payload))
          Row(r.getLong(0), sig)
        }
      }(enc)
  }

  /** Image near-dup pairs within `maxHamming` dHash bits — re-encoded
    * and resized copies of the same picture land a few bits apart, so
    * the exact same pigeonhole candidate join as text simhash applies
    * ([[Dedup.hammingCandidates]]): always bucketed, never all-pairs.
    */
  def imageNearDup(media: DataFrame, maxHamming: Int = 10): DataFrame =
    Dedup.hammingCandidates(imageSignatures(media), maxHamming)

  /** Persist the media corpus' dHash signatures as an on-disk Hamming
    * index ([[Dedup.writeHammingIndex]]) — the incremental image-dedup
    * layout: each NEW media batch probes the standing index
    * ([[imageNearDupAgainstIndex]]) instead of re-decoding and re-hashing
    * the whole corpus, and `mode = "append"` folds the batch in.
    */
  def writeImageIndex(media: DataFrame, dir: String, maxHamming: Int = 10,
      pieceBuckets: Int = 256, mode: String = "overwrite"): Unit =
    Dedup.writeHammingIndex(imageSignatures(media), dir, maxHamming,
      pieceBuckets, mode)

  /** Cross image near-dup pairs between a new media batch and a
    * [[writeImageIndex]] corpus — decode + dHash only the BATCH, probe
    * the written pieces ([[Dedup.hammingCandidatesAgainstIndex]]).
    */
  def imageNearDupAgainstIndex(spark: SparkSession, newMedia: DataFrame,
      dir: String, maxHamming: Int = -1): DataFrame =
    Dedup.hammingCandidatesAgainstIndex(spark,
      imageSignatures(newMedia), dir, maxHamming)

  /** Frame sampling: every `stride`-th frame index per media, exploded —
    * the row-multiplying shape a video pipeline needs, done with
    * codegen'd `sequence`+`explode`, no UDF.
    */
  def sampleFrames(decoded: DataFrame, stride: Int = 5): DataFrame =
    decoded.select(col("media_id"), col("n_frames"),
      explode(sequence(lit(0), col("n_frames") - 1,
        lit(stride))).as("frame_idx"))

  /** Resize: aspect-preserving fit into (maxW, maxH), pure column
    * arithmetic (the codec only runs at decode; resize operates on decoded
    * dimensions and stays codegen'd).
    */
  def resized(decoded: DataFrame, maxW: Int = 224,
      maxH: Int = 224): DataFrame = {
    val scale = least(lit(maxW.toDouble) / col("width"),
      lit(maxH.toDouble) / col("height"))
    decoded.select(col("media_id"), col("width"), col("height"),
      when(scale >= 1.0, col("width"))
        .otherwise(greatest(floor(col("width") * scale).cast("int"),
          lit(1))).as("out_width"),
      when(scale >= 1.0, col("height"))
        .otherwise(greatest(floor(col("height") * scale).cast("int"),
          lit(1))).as("out_height"))
  }
}
