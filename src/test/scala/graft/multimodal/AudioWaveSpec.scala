package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[AudioWave]] — the REAL RIFF/WAVE PCM kernel: writer↔parser
  * round-trips, fail-soft framing, the envelope hash's exactness
  * contract (gain + bit-depth invariance), and the relational
  * surface (hashes, near-dup, quality gate). */
class AudioWaveSpec extends SparkSpec {
  import spark.implicits._

  test("writeWav/parseWav round-trip: 16-bit mono is exact, meta as declared") {
    val s = Array.tabulate(300)(t => ((t * 37) % 128 - 64) * 256)
    val Some((meta, back)) = AudioWave.parseWav(
      AudioWave.writeWav(s, 22050, bits = 16))
    meta shouldBe AudioWave.WavMeta(22050, 1, 16, 300)
    back shouldBe s
  }

  test("8-bit write → parse normalizes back to the exact 16-bit samples (256-multiples)") {
    val s = Array.tabulate(256)(t => ((t * 7) % 250 - 125) * 256)
    val Some((meta, back)) = AudioWave.parseWav(
      AudioWave.writeWav(s, 8000, bits = 8))
    meta.bits shouldBe 8
    back shouldBe s
  }

  test("stereo mixes down floor((L+R)/2); interleaving as declared") {
    val l = Array(1000, -2000, 32767)
    val r = Array(500, -1001, 32767)
    val inter = l.zip(r).flatMap { case (a, b) => Array(a, b) }
    val Some((meta, back)) = AudioWave.parseWav(
      AudioWave.writeWav(inter, 16000, bits = 16, channels = 2))
    meta shouldBe AudioWave.WavMeta(16000, 2, 16, 3)
    back shouldBe l.zip(r).map { case (a, b) =>
      java.lang.Math.floorDiv(a + b, 2) }
  }

  test("fail-soft framing: truncated data keeps the good prefix; garbage, compressed tags, and unknown-chunk skips behave") {
    val s = Array.tabulate(100)(t => (t % 50 - 25) * 256)
    val full = AudioWave.writeWav(s, 16000, bits = 16)
    // cut the last 10 bytes: declared data size exceeds what's there —
    // the 95 intact samples survive (truncated capture)
    val Some((meta, back)) = AudioWave.parseWav(full.dropRight(10))
    meta.nSamples shouldBe 95
    back shouldBe s.take(95)
    // an unknown chunk between fmt and data skips by declared size
    val fact = "fact".getBytes("ISO-8859-1") ++
      Array[Byte](4, 0, 0, 0) ++ Array[Byte](9, 9, 9, 9)
    val spliced = full.take(36) ++ fact ++ full.drop(36)
    AudioWave.parseWav(spliced).map(_._2.toSeq) shouldBe Some(s.toSeq)
    // garbage, a compressed format tag, and NULL all refuse loudly-soft
    AudioWave.parseWav("not a wav at all, just text".getBytes) shouldBe None
    // adversarial chunk size near 2³¹: the skip arithmetic must not
    // wrap an Int position negative (that threw out of the fail-soft
    // contract instead of returning None)
    val evil = full.take(12) ++ "junk".getBytes("ISO-8859-1") ++
      Array[Byte](0xF0.toByte, 0xFF.toByte, 0xFF.toByte, 0x7F) ++
      full.drop(12)
    AudioWave.parseWav(evil) shouldBe None
    val compressed = full.clone()
    compressed(20) = 85 // format tag 0x0055 = MP3
    AudioWave.parseWav(compressed) shouldBe None
    AudioWave.parseWav(null) shouldBe None
  }

  test("envelope hash: exactly invariant to ANY uniform integer gain and to bit-depth re-encode; empty is None") {
    val v = Array.tabulate(1024)(t => (13 + 7 * t) % 64 - 32)
    val s16 = v.map(_ * 256)
    val h = AudioWave.envelopeHash64(s16)
    h.isDefined shouldBe true
    // power-of-two re-master (the old floor rule also survived this)
    AudioWave.envelopeHash64(v.map(_ * 128)) shouldBe h
    // NON-power-of-two, non-multiple-of-256 gains — the cross-
    // multiplied rule's claim: ×85, ×3, and the raw ×1 signal all
    // hash identically (the old double-floored rule could flip
    // near-mean bits here)
    AudioWave.envelopeHash64(v.map(_ * 85)) shouldBe h
    AudioWave.envelopeHash64(v.map(_ * 3)) shouldBe h
    AudioWave.envelopeHash64(v) shouldBe h
    // bit-depth re-encode THROUGH the real writer/parser
    val Some((_, back8)) = AudioWave.parseWav(
      AudioWave.writeWav(s16, 16000, bits = 8))
    AudioWave.envelopeHash64(back8) shouldBe h
    AudioWave.envelopeHash64(Array.empty[Int]) shouldBe None
  }

  test("resampled re-masters land NEAR the original, not at Hamming 0 — the documented miss class, measured") {
    // a 2:1 decimation ("32 kHz → 16 kHz" re-master): the banded
    // window rule is time-proportional (t·64 div N), so each
    // decimated window samples the same time region — window sums
    // track the energy profile approximately, and only bits whose
    // window mean sits near the global mean can flip. The envelope
    // hash's contract is exact under gain/bit-depth and APPROXIMATE
    // under resampling: this pins the measured miss class so maxDist
    // sizing is evidence-based, not hoped.
    def signal(n: Int) = Array.tabulate(n) { t =>
      val w = t.toLong * 64 / n // window-aligned structure
      val base = (13 + 7 * w) % 64 - 32
      val hi = (1103515245L * w + w * w * 11) % 97 < 32
      (base * (if (hi) 4 else 1) * 256).toInt
    }
    val full = signal(2048)
    val decimated = Array.tabulate(1024)(i => full(2 * i))
    val h1 = AudioWave.envelopeHash64(full).get
    val h2 = AudioWave.envelopeHash64(decimated).get
    val hamming = java.lang.Long.bitCount(h1 ^ h2)
    // within the family's default maxDist = 3 on this fixture: a
    // clean decimation still collapses through audioNearDups.
    // (Adversarial signals with many windows AT the global mean can
    // exceed it — resample robustness is statistical, never exact.)
    hamming should be <= 3
  }

  test("audioHashes/audioNearDups: re-encoded and re-mastered copies collapse; unparseable is NULL, never a match") {
    def v(gid: Int) = Array.tabulate(1024) { t =>
      val w = t * 64 / 1024
      val base = (gid * 13 + (gid % 7 + 1) * t) % 64 - 32
      val hi = ((gid.toLong * 1103515245L + w.toLong * w * (gid % 13 + 1) +
        w.toLong * (gid % 31 + 3)) % 97) < 32
      base * (if (hi) 4 else 1)
    }
    val media = Seq(
      Multimodal.Media(1L, "audio", AudioWave.writeWav(v(9).map(_ * 256), 16000, 16)),
      Multimodal.Media(2L, "audio", AudioWave.writeWav(v(9).map(_ * 256), 16000, 8)),
      Multimodal.Media(3L, "audio", AudioWave.writeWav(v(9).map(_ * 128), 16000, 16)),
      Multimodal.Media(4L, "audio", AudioWave.writeWav(v(33).map(_ * 256), 16000, 16)),
      Multimodal.Media(5L, "audio", "garbage bytes".getBytes),
      Multimodal.Media(6L, "image", AudioWave.writeWav(v(9).map(_ * 256), 16000, 16)))
      .toDS()
    val hashes = AudioWave.audioHashes(media)
      .as[(Long, Option[Long])].collect().toMap
    hashes.keySet shouldBe Set(1L, 2L, 3L, 4L, 5L) // image row filtered
    hashes(5L) shouldBe None
    hashes(2L) shouldBe hashes(1L)
    hashes(3L) shouldBe hashes(1L)
    hashes(4L) should not be hashes(1L)
    val dups = AudioWave.audioNearDups(media)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    dups shouldBe Array((2L, 1L, 0), (3L, 1L, 0))
  }

  test("audioQualityGate: rate floor, length floor, clipping cap — boundaries inclusive; unparseable keep=false") {
    val quiet = Array.tabulate(2000)(t => (t % 64 - 32) * 256)
    // exactly 2% clipped: 40 of 2000 samples at the positive rail
    val clipped = quiet.zipWithIndex.map { case (s, i) =>
      if (i < 40) 32767 else s }
    val media = Seq(
      Multimodal.Media(1L, "audio", AudioWave.writeWav(quiet, 16000, 16)),
      Multimodal.Media(2L, "audio", AudioWave.writeWav(quiet, 7999, 16)),
      Multimodal.Media(3L, "audio", AudioWave.writeWav(quiet.take(1023), 16000, 16)),
      Multimodal.Media(4L, "audio", AudioWave.writeWav(clipped, 16000, 16)),
      Multimodal.Media(5L, "audio", Array[Byte](1, 2, 3)))
      .toDS()
    val out = AudioWave.audioQualityGate(media, minRate = 8000,
        minSamples = 1024, maxClipPerMille = 10)
      .as[(Long, Int, Int, Int, Boolean)].collect().sortBy(_._1)
    out(0) shouldBe ((1L, 16000, 2000, 0, true))
    out(1)._5 shouldBe false // rate 7999 < 8000
    out(2)._5 shouldBe false // 1023 < 1024 samples
    out(3) shouldBe ((4L, 16000, 2000, 20, false)) // 20‰ > 10‰
    out(4) shouldBe ((5L, 0, 0, 0, false))
    // the cap is inclusive: exactly 10 per mille keeps
    val atCap = quiet.zipWithIndex.map { case (s, i) =>
      if (i < 20) 32767 else s }
    AudioWave.audioQualityGate(
        Seq(Multimodal.Media(9L, "audio",
          AudioWave.writeWav(atCap, 16000, 16))).toDS(),
        minRate = 8000, minSamples = 1024, maxClipPerMille = 10)
      .as[(Long, Int, Int, Int, Boolean)].collect().head shouldBe
      ((9L, 16000, 2000, 10, true))
  }
}
