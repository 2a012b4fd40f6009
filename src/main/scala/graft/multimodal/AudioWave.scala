package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** REAL audio kernel for RIFF/WAVE PCM — the one audio container a
  * JDK-only environment can honestly parse (RIFF framing + PCM
  * samples are pure integer byte-walking; no codec library exists in
  * this container for anything compressed, which stays a documented
  * stub — see [[Multimodal.stubDecode]]). This upgrades the audio
  * column family from "honest stub" to real for the format crawls
  * actually deliver uncompressed: metadata, a quality gate, and an
  * energy-envelope perceptual hash all computed from decoded PCM.
  *
  * Exact integer contract (what lets a DuckDB oracle replay the whole
  * family): samples NORMALIZE to the signed 16-bit domain (16-bit
  * as-is; 8-bit unsigned maps (u − 128)·256 — exact inverse of the
  * 16→8 truncating re-encode, so a bit-depth re-encode of the same
  * signal is sample-identical after normalization); stereo mixes down
  * floor((L+R)/2); windows follow t·64 div N (the [[PerceptualHash]]
  * block rule on a 1-D signal, deterministic for every length); hash
  * bit i is `window-sum_i·N > total·count_i` — the window mean of
  * |s| vs the GLOBAL mean, cross-multiplied in exact integers with
  * no floor division, so the hash is EXACTLY invariant to ANY
  * uniform gain that keeps stored samples integral (both products
  * scale by g — volume re-masters collapse, the brightness-shift
  * argument of aHash, proven in spec for non-power-of-two gains),
  * and normalization makes it exactly invariant to bit-depth
  * re-encodes.
  *
  * Scale shape: parsing + hashing is one narrow `mapPartitions` pass
  * (payload bytes never shuffle — only the 8-byte hash and small
  * meta move, the q26 fingerprint rule); near-dup composes with
  * [[PerceptualHash.nearDupsByHash]]'s banded machinery unchanged.
  */
object AudioWave {

  /** Parsed WAV facts. `bits` ∈ {8, 16}, `channels` ∈ {1, 2};
    * `nSamples` counts per-channel frames (post-mixdown length). */
  case class WavMeta(sampleRate: Int, channels: Int, bits: Int,
                     nSamples: Int)

  // ---- writer (ingest/fixture side) -----------------------------------

  private def u16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }
  private def u32(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  /** Serialize interleaved samples to a canonical RIFF/WAVE file.
    * `bits` 16: values are signed 16-bit (clamped); 8: values are the
    * SIGNED 16-bit domain, truncating-re-encoded to unsigned 8-bit as
    * `(s div 256) + 128` — the standard quiet re-master path whose
    * normalization round-trips exactly for multiples of 256. */
  def writeWav(samples: Array[Int], sampleRate: Int, bits: Int,
               channels: Int = 1): Array[Byte] = {
    require(bits == 8 || bits == 16, s"bits must be 8 or 16, got $bits")
    require(channels == 1 || channels == 2,
      s"channels must be 1 or 2, got $channels")
    require(sampleRate >= 1, s"sampleRate must be positive, got $sampleRate")
    val bytesPer = bits / 8
    val dataSize = samples.length * bytesPer
    val out = new java.io.ByteArrayOutputStream(44 + dataSize)
    out.write("RIFF".getBytes("ISO-8859-1")); u32(out, 36 + dataSize)
    out.write("WAVE".getBytes("ISO-8859-1"))
    out.write("fmt ".getBytes("ISO-8859-1")); u32(out, 16)
    u16(out, 1) // PCM
    u16(out, channels)
    u32(out, sampleRate)
    u32(out, sampleRate * channels * bytesPer)
    u16(out, channels * bytesPer)
    u16(out, bits)
    out.write("data".getBytes("ISO-8859-1")); u32(out, dataSize)
    var i = 0
    while (i < samples.length) {
      val s = math.max(-32768, math.min(32767, samples(i)))
      if (bits == 16) u16(out, s & 0xffff)
      else out.write((java.lang.Math.floorDiv(s, 256) + 128) & 0xff)
      i += 1
    }
    out.toByteArray
  }

  // ---- parser ----------------------------------------------------------

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
  private def fourCC(b: Array[Byte], i: Int, cc: String): Boolean =
    b(i) == cc(0).toByte && b(i + 1) == cc(1).toByte &&
      b(i + 2) == cc(2).toByte && b(i + 3) == cc(3).toByte

  /** Parse a RIFF/WAVE PCM payload to (meta, mono samples in the
    * signed 16-bit domain). None for anything that is not a readable
    * PCM WAV (wrong magic, compressed format tag, unsupported
    * bits/channels, truncated before any sample). Fail-soft on data:
    * a `data` chunk cut short by a truncated capture yields the
    * samples that fit (the scanner's good-prefix rule); unknown
    * chunks (LIST, fact, cue) skip by their declared size per spec
    * (word-aligned). */
  def parseWav(payload: Array[Byte]): Option[(WavMeta, Array[Int])] = {
    val b = Multimodal.bytes(payload)
    if (b.length < 44 || !fourCC(b, 0, "RIFF") || !fourCC(b, 8, "WAVE"))
      return None
    var pos = 12
    var rate = 0; var channels = 0; var bits = 0; var haveFmt = false
    while (pos + 8 <= b.length) {
      val size = le32(b, pos + 4)
      val body = pos + 8
      if (fourCC(b, pos, "fmt ")) {
        if (size < 16 || body + 16 > b.length) return None
        val tag = le16(b, body)
        channels = le16(b, body + 2)
        rate = le32(b, body + 4).toInt
        bits = le16(b, body + 14)
        if (tag != 1 || (bits != 8 && bits != 16) ||
          (channels != 1 && channels != 2) || rate < 1) return None
        haveFmt = true
      } else if (fourCC(b, pos, "data")) {
        if (!haveFmt) return None
        val avail = math.min(size, (b.length - body).toLong).toInt
        val bytesPer = bits / 8
        val frames = avail / (bytesPer * channels)
        val mono = new Array[Int](frames)
        var f = 0
        while (f < frames) {
          def sampleAt(c: Int): Int = {
            val off = body + (f * channels + c) * bytesPer
            if (bits == 16) le16(b, off).toShort.toInt
            else ((b(off) & 0xff) - 128) * 256
          }
          mono(f) =
            if (channels == 1) sampleAt(0)
            else java.lang.Math.floorDiv(sampleAt(0) + sampleAt(1), 2)
          f += 1
        }
        return Some((WavMeta(rate, channels, bits, frames), mono))
      }
      // skip chunk, word-aligned per RIFF spec — arithmetic in LONG:
      // a corrupt declared size near 2³¹ would wrap an Int `pos`
      // negative, turn the loop guard true, and throw out of the
      // documented fail-soft contract (index out of bounds) instead
      // of returning None
      val next = body.toLong + size + (size & 1L)
      if (size < 0 || next > b.length) return None
      pos = next.toInt
    }
    None
  }

  // ---- energy-envelope hash ---------------------------------------------

  /** 64-bit energy-envelope hash: bit i = the banded-window mean of
    * |s| strictly exceeds the GLOBAL mean of |s| — compared
    * cross-multiplied in exact integers (`sums_i·n > total·counts_i`,
    * never a floor division), so the hash is EXACTLY invariant to any
    * uniform gain that keeps the stored samples integral (×g scales
    * both products by g; the old double-floored mean-of-window-means
    * rule was exact only for gains that preserved every floor, e.g.
    * the fixture's power-of-two re-masters — near-mean bits could
    * flip under a general re-master). Combined with the 8↔16-bit
    * normalization it is exactly invariant to bit-depth re-encodes of
    * 256-multiple signals. None for an empty signal. NOT invariant to
    * trimming (window boundaries shift — trimmed copies are the
    * frame-set story, [[Multimodal.videoNearDups]]) and only
    * APPROXIMATELY robust to resampling: a rate change rewrites
    * sample values, window sums track the same energy profile
    * proportionally but not exactly, so bits near the global mean can
    * flip — a resampled re-master lands NEAR its original (small
    * Hamming, spec-measured), not at 0; size `maxDist` accordingly.
    * The cross-multiply runs in BigInt: `sums_i·n` exceeds a Long
    * once n passes ~1.3·10⁸ samples (a 2-hour 16 kHz signal), and 64
    * small-object comparisons per payload cost nothing next to the
    * PCM parse. */
  def envelopeHash64(samples: Array[Int]): Option[Long] = {
    val n = samples.length
    if (n == 0) return None
    val sums = new Array[Long](64)
    val counts = new Array[Long](64)
    var total = 0L
    var t = 0
    while (t < n) {
      val w = (t.toLong * 64 / n).toInt
      val a = math.abs(samples(t).toLong)
      sums(w) += a
      counts(w) += 1
      total += a
      t += 1
    }
    var bits = 0L
    var i = 0
    while (i < 64) {
      if (BigInt(sums(i)) * n > BigInt(total) * counts(i)) bits |= 1L << i
      i += 1
    }
    Some(bits)
  }

  // ---- relational surface ------------------------------------------------

  /** (media_id, format, sample_rate, channels, bits, n_samples) for
    * every AUDIO payload — one narrow parse pass; unparseable
    * payloads keep their row with '' format and zeroed fields (the
    * imageQualityGate convention: never stub-faked). */
  def audioMeta(media: Dataset[Multimodal.Media]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio")
      .mapPartitions(_.map { m =>
        parseWav(m.payload) match {
          case Some((mt, _)) =>
            (m.media_id, "wav", mt.sampleRate, mt.channels, mt.bits,
              mt.nSamples)
          case None => (m.media_id, "", 0, 0, 0, 0)
        }
      })
      .toDF("media_id", "format", "sample_rate", "channels", "bits",
        "n_samples")
  }

  /** (media_id, ehash) for every audio payload — the near-dup input;
    * unparseable/empty audio keeps its row with a NULL hash (never a
    * fake match — the perceptualHashes convention). */
  def audioHashes(media: Dataset[Multimodal.Media]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio")
      .mapPartitions(_.map { m =>
        (m.media_id,
          parseWav(m.payload).flatMap { case (_, s) => envelopeHash64(s) })
      })
      .toDF("media_id", "ehash")
  }

  /** Banded-Hamming audio near-dup: [[PerceptualHash.nearDupsByHash]]
    * over the envelope hash — identical election, census cap, and
    * NULL semantics. Output (dup_id, keep_id, hamming). */
  def audioNearDups(media: Dataset[Multimodal.Media], maxDist: Int = 3,
                    maxBucket: Int = 1024): DataFrame =
    PerceptualHash.nearDupsByHash(audioHashes(media), "media_id",
      "ehash", maxDist, maxBucket)

  /** Structural audio quality gate — the rules an audio-corpus
    * pipeline applies before any model hears a sample: parseable PCM
    * (bytes a real parser rejects are not audio), a sample-rate floor
    * (upsampled-telephone content carries no high band), a minimum
    * length (sub-second stubs are noise), and a CLIPPING cap —
    * clipped_per_mille = samples within 256 of full scale ×1000 div n,
    * exact integers. Judged only on really-parsed PCM; unparseable
    * payloads are keep=false with zeroed fields. Output: (media_id,
    * sample_rate, n_samples, clip_per_mille, keep). */
  def audioQualityGate(media: Dataset[Multimodal.Media],
                       minRate: Int = 8000, minSamples: Int = 1024,
                       maxClipPerMille: Int = 10): DataFrame = {
    require(minRate >= 1 && minSamples >= 1 && maxClipPerMille >= 0,
      s"gate bounds must be positive, got $minRate/$minSamples/$maxClipPerMille")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio")
      .mapPartitions(_.map { m =>
        parseWav(m.payload) match {
          case Some((mt, s)) if s.nonEmpty =>
            var clipped = 0L
            var i = 0
            while (i < s.length) {
              if (math.abs(s(i)) >= 32512) clipped += 1
              i += 1
            }
            val cpm = (clipped * 1000L / s.length).toInt
            val keep = mt.sampleRate >= minRate &&
              s.length >= minSamples && cpm <= maxClipPerMille
            (m.media_id, mt.sampleRate, s.length, cpm, keep)
          case _ => (m.media_id, 0, 0, 0, false)
        }
      })
      .toDF("media_id", "sample_rate", "n_samples", "clip_per_mille",
        "keep")
  }
}
