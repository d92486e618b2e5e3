package graft

import java.nio.ByteBuffer

import graft.operators.Multimodal

/** [[Multimodal.VideoCodec]]: real `moov`/`mvhd` duration + `trak`
  * counting on in-test generated ISO BMFF bytes (version 0 and 1 mvhd
  * layouts, the 64-bit largesize form), and the fall-back-to-fake
  * contract on every malformed shape.
  */
class VideoMetaSpec extends SparkSuite {
  import spark.implicits._

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(payload.length + 8)
    b.putInt(payload.length + 8)
    b.put(typ.getBytes("ISO-8859-1"))
    b.put(payload)
    b.array()
  }

  /** The 64-bit largesize form: size field 1, actual size after type. */
  private def largeBox(typ: String, payload: Array[Byte]): Array[Byte] = {
    val b = ByteBuffer.allocate(payload.length + 16)
    b.putInt(1)
    b.put(typ.getBytes("ISO-8859-1"))
    b.putLong(payload.length + 16L)
    b.put(payload)
    b.array()
  }

  private def mvhdV0(timescale: Int, duration: Int): Array[Byte] = {
    val b = ByteBuffer.allocate(100) // full v0 mvhd payload
    b.putInt(0)                      // version 0 + flags
    b.putInt(0); b.putInt(0)         // creation, modification
    b.putInt(timescale)
    b.putInt(duration)
    box("mvhd", b.array())
  }

  private def mvhdV1(timescale: Int, duration: Long): Array[Byte] = {
    val b = ByteBuffer.allocate(112) // full v1 mvhd payload
    b.putInt(0x01000000)             // version 1 + flags
    b.putLong(0L); b.putLong(0L)     // creation, modification
    b.putInt(timescale)
    b.putLong(duration)
    box("mvhd", b.array())
  }

  private val ftyp = box("ftyp",
    "isomiso2".getBytes("ISO-8859-1")) // brand + minor/compat
  private val trak = box("trak", box("tkhd", new Array[Byte](84)))

  private def mp4(moovKids: Array[Byte]*): Array[Byte] =
    ftyp ++ box("moov", moovKids.flatten.toArray)

  test("v0 mvhd: duration = duration/timescale, trak boxes counted") {
    val bytes = mp4(mvhdV0(600, 1200), trak, trak)
    assert(Multimodal.VideoCodec.decodeMeta(bytes) === Some((2.0, 2)))
  }

  test("v1 mvhd and the 64-bit largesize moov both parse") {
    assert(Multimodal.VideoCodec.decodeMeta(
      mp4(mvhdV1(1000, 3500L), trak)) === Some((3.5, 1)))
    val large = ftyp ++ largeBox("moov",
      Array(mvhdV0(90000, 450000), trak, trak, trak).flatten)
    assert(Multimodal.VideoCodec.decodeMeta(large) === Some((5.0, 3)))
  }

  test("malformed shapes refuse rather than half-answer: bad size, " +
      "truncated mvhd, zero timescale, missing moov/mvhd, non-MP4") {
    val good = mp4(mvhdV0(600, 1200), trak)
    // a box whose declared size runs past the payload
    val overrun = good.clone()
    val bb = ByteBuffer.wrap(overrun)
    bb.putInt(ftyp.length, good.length * 2) // moov size field
    assert(Multimodal.VideoCodec.decodeMeta(overrun).isEmpty)
    // mvhd payload shorter than the v0 fixed fields
    assert(Multimodal.VideoCodec.decodeMeta(
      mp4(box("mvhd", new Array[Byte](10)), trak)).isEmpty)
    assert(Multimodal.VideoCodec.decodeMeta(
      mp4(mvhdV0(0, 1200), trak)).isEmpty)
    assert(Multimodal.VideoCodec.decodeMeta(mp4(trak)).isEmpty)
    assert(Multimodal.VideoCodec.decodeMeta(ftyp).isEmpty)
    assert(Multimodal.VideoCodec
      .decodeMeta("not a video at all".getBytes).isEmpty)
  }

  test("videoMetadata: real MP4 rows carry decoded_real=true, everything " +
      "else falls back to the deterministic fake") {
    val media = Seq(
      (1L, mp4(mvhdV0(600, 1500), trak, trak)),
      (2L, "plain text payload".getBytes("UTF-8")))
      .toDF("media_id", "payload")
    val out = Multimodal.videoMetadata(media).collect()
      .map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getInt(2), r.getBoolean(3)))).toMap
    assert(out(1L) === ((2.5, 2, true)))
    val n = "plain text payload".getBytes("UTF-8").length
    assert(out(2L) === (((n % 30 + 1) / 25.0, n % 3 + 1, false)))
  }
}
