package graft

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow
import org.scalatest.funsuite.AnyFunSuite

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}

/** Exactness contract for the REAL audio decoder
  * ([[Multimodal.decodeAudio]]): plant WAV payloads WRITTEN with the
  * same JDK audio stack (deterministic 16-bit PCM signals), run the
  * distributed decode, and assert the stream parameters and sample
  * features round-trip. A constant-amplitude signal has
  * rms == peak == amp/32768 BIT-exactly (every decoded sample is the
  * planted short); a full-cycle sine hits A/√2 to 1e-3. Poisoned-blob
  * contract: non-audio bytes and non-PCM16 encodings yield ok=false
  * rows, never task failures.
  */
class AudioDecodeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** WAV bytes for the given 16-bit little-endian PCM samples. */
  private def wav(samples: Array[Short], rate: Float, channels: Int,
      bigEndian: Boolean = false): Array[Byte] = {
    val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, rate, 16,
      channels, 2 * channels, rate, bigEndian)
    val raw = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      if (bigEndian) {
        raw(2 * i) = (s >> 8).toByte; raw(2 * i + 1) = (s & 0xff).toByte
      } else {
        raw(2 * i) = (s & 0xff).toByte; raw(2 * i + 1) = (s >> 8).toByte
      }
      i += 1
    }
    val ais = new AudioInputStream(new ByteArrayInputStream(raw), fmt,
      samples.length / channels)
    val bos = new ByteArrayOutputStream()
    AudioSystem.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  test("planted WAV payloads decode parameters and sample features exactly") {
    val spark2 = spark
    import spark2.implicits._
    val const = Array.fill[Short](800)(16384) // amp/32768 = 0.5 exactly
    val sine = Array.tabulate[Short](8000)(i =>
      (16384 * math.sin(2 * math.Pi * i / 100)).toShort)
    val stereo = Array.tabulate[Short](400)(i => if (i % 2 == 0) 8192 else -8192)
    val rows = Seq(
      MediaRow(1L, wav(const, 8000f, 1)),
      MediaRow(2L, wav(sine, 16000f, 1)),
      MediaRow(3L, wav(stereo, 44100f, 2)),
      MediaRow(4L, "definitely not audio bytes".getBytes("UTF-8")))
    val got = Multimodal.decodeAudio(spark2.createDataset(rows).repartition(2))
      .collect().map(m => m.doc_id -> m).toMap

    val c = got(1L)
    assert(c.ok && c.format == "wav" && c.sample_rate == 8000 &&
      c.channels == 1 && c.bits == 16 && c.n_frames == 800L)
    assert(c.rms == 0.5 && c.peak == 0.5,
      s"constant-amplitude rms/peak must be bit-exact, got ${c.rms}/${c.peak}")

    val s = got(2L)
    assert(s.ok && s.sample_rate == 16000 && s.n_frames == 8000L)
    assert(math.abs(s.rms - 0.5 / math.sqrt(2.0)) < 1e-3,
      s"sine rms ${s.rms} should be A/sqrt(2) = ${0.5 / math.sqrt(2.0)}")
    assert(s.peak <= 0.5 && s.peak > 0.49, s"sine peak ${s.peak}")

    val st = got(3L)
    assert(st.ok && st.channels == 2 && st.n_frames == 200L)
    assert(st.rms == 0.25 && st.peak == 0.25,
      s"square-wave stereo rms/peak must be bit-exact, got ${st.rms}/${st.peak}")

    val bad = got(4L)
    assert(!bad.ok && bad.format == "unknown",
      "non-audio bytes must yield ok=false, not a task failure")
  }

  test("big-endian PCM decodes to the same samples as little-endian") {
    val spark2 = spark
    import spark2.implicits._
    val sig = Array.tabulate[Short](256)(i => ((i * 257 - 32768) % 32768).toShort)
    // AIFF is the JDK's big-endian container; WAVE is little-endian —
    // same samples through both paths must produce identical features
    val fmtBe = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16,
      1, 2, 8000f, true)
    val rawBe = new Array[Byte](sig.length * 2)
    sig.indices.foreach { i =>
      rawBe(2 * i) = (sig(i) >> 8).toByte; rawBe(2 * i + 1) = (sig(i) & 0xff).toByte
    }
    val bosBe = new ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new ByteArrayInputStream(rawBe), fmtBe, sig.length),
      javax.sound.sampled.AudioFileFormat.Type.AIFF, bosBe)
    val rows = Seq(MediaRow(1L, wav(sig, 8000f, 1)),
      MediaRow(2L, bosBe.toByteArray))
    val got = Multimodal.decodeAudio(spark2.createDataset(rows))
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(1L).ok && got(2L).ok)
    assert(got(1L).rms == got(2L).rms && got(1L).peak == got(2L).peak,
      s"endianness must not change decoded samples: " +
        s"${got(1L).rms}/${got(1L).peak} vs ${got(2L).rms}/${got(2L).peak}")
  }

  test("audio fingerprint: gain-invariant, pitch-sensitive, poison-safe") {
    // A tone with period P samples concentrates at DFT bin 64/P of the
    // 64-sample frame: period 8 → bin 8, period 16 → bin 4. A 4×
    // quieter copy must fingerprint IDENTICALLY (per-frame argmax is
    // scale-invariant); a different pitch must land in a different
    // bin and fingerprint.
    val spark2 = spark
    import spark2.implicits._
    def tone(period: Int, amp: Int, n: Int): Array[Short] =
      Array.tabulate[Short](n)(i => (amp * math.sin(2 * math.Pi * i / period)).toShort)
    val rows = Seq(
      MediaRow(1L, wav(tone(8, 16384, 2048), 8000f, 1)),
      MediaRow(2L, wav(tone(8, 4096, 2048), 8000f, 1)),
      MediaRow(3L, wav(tone(16, 16384, 2048), 8000f, 1)),
      MediaRow(4L, "junk".getBytes("UTF-8")))
    val got = Multimodal.fingerprintAudio(spark2.createDataset(rows).repartition(2))
      .collect().map(m => m.doc_id -> m).toMap
    assert(got(1L).ok && got(2L).ok && got(3L).ok && !got(4L).ok)
    assert(got(1L).dominant_bin == 8,
      s"period-8 tone peaked at bin ${got(1L).dominant_bin}, expected 8")
    assert(got(3L).dominant_bin == 4,
      s"period-16 tone peaked at bin ${got(3L).dominant_bin}, expected 4")
    assert(got(2L).fp == got(1L).fp && got(2L).dominant_bin == 8,
      "4x gain change moved the fingerprint — argmax invariance broken")
    assert(got(3L).fp != got(1L).fp,
      "different pitches must not share a fingerprint")
    assert(got(1L).n_frames == (2048 - 64) / 32 + 1)
  }

  test("G.711 µ-law and A-law WAV payloads decode through the JDK codec expansion") {
    val spark2 = spark
    import spark2.implicits._
    // plant: PCM16 constant-amplitude signal → encode to ULAW/ALAW via
    // the JDK's own conversion, write as WAV (format codes 7/6)
    def g711(samples: Array[Short], enc: AudioFormat.Encoding): Array[Byte] = {
      val pcmFmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED, 8000f, 16,
        1, 2, 8000f, false)
      val raw = new Array[Byte](samples.length * 2)
      samples.indices.foreach { i =>
        raw(2 * i) = (samples(i) & 0xff).toByte
        raw(2 * i + 1) = (samples(i) >> 8).toByte
      }
      val pcm = new AudioInputStream(new ByteArrayInputStream(raw), pcmFmt,
        samples.length)
      val conv = AudioSystem.getAudioInputStream(
        new AudioFormat(enc, 8000f, 8, 1, 1, 8000f, false), pcm)
      val bos = new ByteArrayOutputStream()
      AudioSystem.write(conv, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
      bos.toByteArray
    }
    val const = Array.fill[Short](800)(16384) // 0.5 amplitude
    val rows = Seq(
      MediaRow(1L, g711(const, AudioFormat.Encoding.ULAW)),
      MediaRow(2L, g711(const, AudioFormat.Encoding.ALAW)),
      MediaRow(3L, wav(const, 8000f, 1))) // PCM16 reference
    val got = Multimodal.decodeAudio(spark2.createDataset(rows).repartition(2))
      .collect().map(m => m.doc_id -> m).toMap
    for (id <- Seq(1L, 2L)) {
      val m = got(id)
      assert(m.ok, s"doc $id: G.711 payload must decode (ok=false)")
      assert(m.format == "wav" && m.sample_rate == 8000 && m.channels == 1)
      assert(m.bits == 8, s"doc $id: container sample size is 8-bit, got ${m.bits}")
      assert(m.n_frames == 800L)
      // G.711 is log-quantized 8-bit: segment step size grows with
      // amplitude, ~2.3% measured at 0.5 (µ-law decodes the constant
      // to 0.51160) — assert within the codec's error envelope, and
      // that the constant stays constant (rms == peak exactly)
      assert(math.abs(m.rms - 0.5) < 0.03 && math.abs(m.peak - 0.5) < 0.03,
        s"doc $id: rms=${m.rms} peak=${m.peak}, expected ~0.5")
      assert(m.rms == m.peak,
        s"doc $id: a constant signal must decode to a constant (rms != peak)")
    }
    assert(got(3L).rms == 0.5 && got(3L).bits == 16) // PCM16 stays bit-exact
  }
}
