package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream,
  AudioSystem}

import graft.operators.Multimodal

/** Real JDK-backed audio metadata (`javax.sound.sampled`): WAV bytes are
  * generated in-test, so the header-parse path runs on genuine RIFF/WAVE
  * payloads with zero external dependencies; non-audio payloads take the
  * deterministic FakeCodec fallback, disclosed by `decoded_real`.
  */
class AudioMetaSpec extends SparkSuite {
  import spark.implicits._

  /** PCM WAV bytes: `frames` 16-bit samples per channel at `rate` Hz. */
  private def wav(rate: Float, channels: Int, frames: Int): Array[Byte] = {
    val fmt = new AudioFormat(rate, 16, channels, true, false)
    val pcm = new Array[Byte](frames * fmt.getFrameSize)
    var i = 0
    while (i < pcm.length) { pcm(i) = (i % 251).toByte; i += 1 }
    val ais = new AudioInputStream(new ByteArrayInputStream(pcm), fmt,
      frames.toLong)
    val out = new ByteArrayOutputStream()
    AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
    out.toByteArray
  }

  test("WAV payloads parse to TRUE sample rate, channels, frames, " +
      "duration; non-audio payloads keep the FakeCodec fallback") {
    val mono = wav(16000f, 1, 8000)   // 0.5 s mono
    val stereo = wav(44100f, 2, 44100) // 1.0 s stereo
    val media = Seq(
      (1L, mono), (2L, stereo),
      (10L, "definitely not audio content".getBytes("UTF-8"))
    ).toDF("media_id", "payload")
    val rows = Multimodal.audioMetadata(media).collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getLong(3), r.getDouble(4),
          r.getBoolean(5)))).toMap
    assert(rows(1L) === ((16000, 1, 8000L, 0.5, true)))
    assert(rows(2L) === ((44100, 2, 44100L, 1.0, true)))
    // fallback: FakeCodec byte arithmetic, flagged as NOT real
    val n = "definitely not audio content".getBytes("UTF-8").length
    assert(rows(10L) === ((8000 + n % 40000, n % 2 + 1, n.toLong * 4,
      (n.toLong * 4).toDouble / (8000 + n % 40000), false)))
  }

  test("truncated / corrupt RIFF headers fall back instead of throwing") {
    val broken = "RIFF1234WAVEgarbage-not-a-format-chunk".getBytes("UTF-8")
    val media = Seq((1L, broken)).toDF("media_id", "payload")
    val r = Multimodal.audioMetadata(media).collect()(0)
    assert(!r.getBoolean(5)) // fell back, disclosed as fake
  }
}
