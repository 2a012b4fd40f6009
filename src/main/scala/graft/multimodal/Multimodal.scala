package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video treated as opaque
  * `binary` payloads with typed metadata, processed batch-wise with
  * `mapPartitions` (the Scala analog of a vectorized pandas UDF: one
  * heavyweight decoder init per PARTITION, then a streamed iterator of
  * rows — never per-row init, never a driver collect).
  *
  * The IMAGE kernel is REAL where the JDK can be: PNG/JPEG/GIF/BMP
  * headers decode via `javax.imageio` (ships in the JDK, offline-safe)
  * to exact format/width/height/channels — header-only, O(1) per
  * payload. The AUDIO kernel is real for RIFF/WAVE PCM
  * ([[AudioWave]]: parser, envelope hash, near-dup, quality gate);
  * compressed audio and real video CODECS remain stubs (no
  * ffmpeg/soundfile in this container) — video rides the
  * length-prefixed image-frame container ([[packImageFrames]]) whose
  * per-frame decode is the real image codec. Everything around the
  * stubs — schemas, encoders, partition-wise batching,
  * init-once-per-partition lifecycle, frame-explosion shape — is the
  * real distributed plumbing and is what the tests assert.
  *
  * Scale notes: payload columns ride through shuffles as opaque bytes;
  * keep them OUT of wide shuffles (extract features first, join the
  * small feature table). Feature extraction is a narrow map — at 100 TB
  * it scales linearly with no coordination.
  */
object Multimodal {

  case class MediaMeta(format: String, width: Int, height: Int,
                       n_frames: Int, sample_rate: Int, channels: Int)
  case class Media(media_id: Long, kind: String, payload: Array[Byte])
  case class DecodedMedia(media_id: Long, kind: String, payload: Array[Byte],
                          meta: MediaMeta)
  case class MediaFeatures(media_id: Long, kind: String, features: Array[Float])
  case class Frame(media_id: Long, frame_idx: Int, frame_bytes: Array[Byte])

  /** Sniff the media KIND from the payload's leading bytes — magics
    * only, no decode: image formats via [[hasImageMagic]] (PNG/JPEG/
    * GIF/BMP/TIFF) or the RIFF/WEBP form tag, audio via the RIFF/WAVE
    * form tag, video via RIFF/AVI (`AVI` + space), the ISO-BMFF
    * `ftyp` box (MP4/MOV — size at 0, tag at 4), the EBML magic
    * (MKV/WebM), or this package's own frame container
    * ([[packImageFrames]]'s `GFV1`). RIFF routes by its FORM tag —
    * WAVE/AVI /WEBP each to its kind, any other form to "bin" (a
    * RIFF container of unknown content must not be guessed). WEBP and
    * AVI have no shipped decoder in this environment, so their
    * perceptual legs fail-soft to NULL hashes (keep-the-unparseable)
    * — the ROUTING is still correct, which is what the quality gates
    * and kind censuses consume. Anything else is "bin": an
    * unrecognized payload must never be guessed into a kind, because
    * every perceptual leg trusts the kind column to route decodes. */
  private[graft] def sniffKind(payload: Array[Byte]): String = {
    val pb = bytes(payload)
    def u(i: Int) = pb(i) & 0xff
    def riffForm(a: Char, b: Char, c: Char, d: Char): Boolean =
      pb.length >= 12 && u(0) == 'R' && u(1) == 'I' && u(2) == 'F' &&
        u(3) == 'F' && u(8) == a && u(9) == b && u(10) == c && u(11) == d
    if (hasImageMagic(pb) || riffForm('W', 'E', 'B', 'P')) "image"
    else if (riffForm('W', 'A', 'V', 'E')) "audio"
    else if (riffForm('A', 'V', 'I', ' ')) "video"
    else if (pb.length >= 8 && u(4) == 'f' && u(5) == 't' && u(6) == 'y' &&
      u(7) == 'p') "video"
    else if (pb.length >= 4 && u(0) == 0x1a && u(1) == 0x45 &&
      u(2) == 0xdf && u(3) == 0xa3) "video"
    else if (hasFrameMagic(pb)) "video"
    else "bin"
  }

  private lazy val sniffKindUdf = udf(sniffKind _)

  /** [[sniffKind]] as a column: the kind router for payloads that
    * arrive OUTSIDE [[fromBinaryFiles]] (crawl-archive media records,
    * per-doc media arrays in a streamed corpus) — one sniff rule
    * everywhere, magics only, never an extension or a declared
    * Content-Type. */
  def kindOf(payload: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sniffKindUdf(payload)

  /** A `binaryFile` relation (path, modificationTime, length, content
    * — [[graft.io.BinaryFileSource]]) → the media relation every
    * operator in this package consumes: `media_id = xxhash64(path)`
    * (deterministic, well-spread, integral — the WarcRecords id rule;
    * collision odds are the corpus-negligible 64-bit birthday bound),
    * `kind` sniffed from the payload's own magic ([[sniffKind]] —
    * extensions lie on real crawls; bytes do not), `payload` the raw
    * content, plus `path` and the file's `modificationTime` as
    * event-time column `mtime` (the only timestamp an on-disk object
    * has — what lets a media stream watermark, the toCrawlDocsTimed
    * discipline). Narrow projection: no shuffle, payloads stay in
    * place; at 100 TB this is one linear scan. `.select(media
    * columns).as[Media]` feeds the typed operators. */
  def fromBinaryFiles(files: DataFrame): DataFrame =
    files.select(
      xxhash64(col("path")).as("media_id"),
      sniffKindUdf(col("content")).as("kind"),
      col("content").as("payload"),
      col("path"),
      col("modificationTime").as("mtime"))

  /** Wrap a testdata table into the media shape: text bytes play the
    * opaque payload, `kind` cycles image/audio/video. Stand-in for a
    * real `binaryFile`/parquet media source ([[fromBinaryFiles]] is
    * the real-disk entrance). */
  def asMedia(documents: DataFrame, idCol: String = "doc_id",
              textCol: String = "text"): Dataset[Media] = {
    val spark = documents.sparkSession
    import spark.implicits._
    documents.select(
      col(idCol).as("media_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      encode(col(textCol), "UTF-8").as("payload"))
      .as[Media]
  }

  // ---- STUB decode kernel ---------------------------------------------
  // Deterministic fake standing in for a codec call. A real deployment
  // replaces ONLY this function (and the init in decodeAll) — the
  // surrounding plumbing is unchanged.
  /** Null payloads (a null source column survives asMedia's encode) are
    * treated as empty byte arrays by every kernel — a real codec call
    * would be skipped the same way; an executor NPE must never be the
    * answer to one bad row. */
  private[multimodal] def bytes(p: Array[Byte]): Array[Byte] =
    if (p == null) Array.emptyByteArray else p

  private[multimodal] def stubDecode(kind: String, payload: Array[Byte]): MediaMeta = {
    val h = bytes(payload).foldLeft(17L)((acc, b) => acc * 31 + (b & 0xff))
    def pick(lo: Int, hi: Int, salt: Long): Int =
      (Math.floorMod(h ^ salt, (hi - lo).toLong) + lo).toInt
    kind match {
      case "image" => MediaMeta("png", pick(64, 4096, 1), pick(64, 4096, 2), 1, 0, 3)
      case "audio" => MediaMeta("wav", 0, 0, 0,
        Seq(16000, 22050, 44100)(pick(0, 3, 3)), pick(1, 3, 7))
      case "video" => MediaMeta("mp4", pick(320, 1920, 4), pick(240, 1080, 5),
        pick(24, 2400, 6), 0, 3)
      case _ => MediaMeta("bin", 0, 0, 0, 0, 0)
    }
  }

  /** True when the bytes START with a real image-format signature:
    * PNG, JPEG, GIF, BMP (the formats the JDK decodes) plus TIFF
    * (decoded since JDK 9). The gatekeeper every image decode in this
    * package runs FIRST, because `javax.imageio` registers a WBMP
    * reader and WBMP has NO magic — its "detection" accepts any
    * stream starting with two zero bytes and plausible dimension
    * varints, so arbitrary binary payloads (length-prefixed frame
    * containers, truncated fetches) "decode" as tiny garbage bitmaps.
    * For metadata that is merely misleading; for the perceptual
    * election it is corpus damage — two unrelated payloads of similar
    * length hash near each other and innocent docs drop as
    * "duplicates". An image is bytes that DECLARE themselves an
    * image. */
  private[multimodal] def hasImageMagic(pb: Array[Byte]): Boolean = {
    if (pb.length < 8) return false
    def u(i: Int) = pb(i) & 0xff
    (u(0) == 0x89 && u(1) == 0x50 && u(2) == 0x4e && u(3) == 0x47) || // PNG
    (u(0) == 0xff && u(1) == 0xd8 && u(2) == 0xff) ||                 // JPEG
    (u(0) == 'G' && u(1) == 'I' && u(2) == 'F' && u(3) == '8') ||     // GIF
    (u(0) == 'B' && u(1) == 'M') ||                                   // BMP
    (u(0) == 'I' && u(1) == 'I' && u(2) == 0x2a && u(3) == 0) ||      // TIFF LE
    (u(0) == 'M' && u(1) == 'M' && u(2) == 0 && u(3) == 0x2a)         // TIFF BE
  }

  // ---- REAL image kernel (JDK-builtin, offline-safe) -------------------
  /** Header-only image probe with `javax.imageio` — the ONE codec this
    * container actually ships (PNG/JPEG/GIF/BMP readers are part of
    * the JDK): format, width, height, channels read from the image
    * header WITHOUT decoding pixel data (`ImageReader.getWidth/
    * getHeight` parse the header; `getImageTypes` exposes the band
    * count), so cost per payload is O(header), not O(pixels) — the
    * right probe for a metadata pass over 10⁹ images. Returns None for
    * anything ImageIO can't read (truncated files, non-image bytes) —
    * callers fall back to [[stubDecode]], so text-payload fixtures and
    * the q37 oracle are byte-for-byte unchanged. Audio/video kernels
    * remain honest stubs (no ffmpeg/soundfile in this environment). */
  private[multimodal] def realImageMeta(payload: Array[Byte]): Option[MediaMeta] = {
    val pb = bytes(payload)
    // magic first ([[hasImageMagic]]): without it the WBMP reader
    // claims arbitrary binary and reports garbage dims as metadata
    if (pb.length < 8 || !hasImageMagic(pb)) return None
    val in = new java.io.ByteArrayInputStream(pb)
    var iis: javax.imageio.stream.ImageInputStream = null
    try {
      iis = javax.imageio.ImageIO.createImageInputStream(in)
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) return None
      val reader = readers.next()
      try {
        reader.setInput(iis, true, true)
        val w = reader.getWidth(0)
        val h = reader.getHeight(0)
        val types = reader.getImageTypes(0)
        val ch = if (types.hasNext) types.next().getNumBands else 0
        Some(MediaMeta(reader.getFormatName.toLowerCase, w, h, 1, 0, ch))
      } finally reader.dispose()
    } catch { case scala.util.control.NonFatal(_) => None }
    finally if (iis != null) iis.close()
  }

  /** Decode metadata for every payload: one decoder "session" per
    * partition (the init-once lifecycle a real codec binding needs),
    * then a pure iterator map — no materialization of the partition. */
  def decodeAll(media: Dataset[Media]): Dataset[DecodedMedia] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val session = DecoderSession.open() // per-partition heavy init (stubbed)
      it.map { m =>
        DecodedMedia(m.media_id, m.kind, m.payload,
          session.decode(m.kind, m.payload))
      }
    }
  }

  /** Fixed-dim feature vector per payload (stub for an embedding model):
    * batch-iterated per partition, payload dropped from the output so
    * downstream joins/shuffles move only (id, kind, dim floats). */
  def extractFeatures(media: Dataset[Media], dim: Int = 16): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val session = DecoderSession.open()
      it.map { m =>
        MediaFeatures(m.media_id, m.kind, session.embed(m.payload, dim))
      }
    }
  }

  /** Frame sampling for video payloads: every `stride`-th fixed-size
    * chunk becomes a frame row (stub for ffmpeg frame extraction) —
    * the one-to-many generator shape, one output row per sampled frame.
    */
  def sampleFrames(media: Dataset[Media], frameBytes: Int = 64,
                   stride: Int = 4): Dataset[Frame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      bytes(m.payload).grouped(frameBytes).zipWithIndex
        .collect { case (chunk, i) if i % stride == 0 => Frame(m.media_id, i, chunk) }
    }
  }

  // ---- Video frames: length-prefixed image container -------------------
  // The container ships no video codec (an environment limit, like
  // audio), but a concatenation of length-prefixed REAL image frames
  // is an honest stand-in for the I-frame/keyframe stream ffmpeg
  // would hand back: the framing walk, the per-frame REAL codec
  // decode, the hashing, and every relational step downstream are the
  // production shapes — a deployment swaps ONLY the splitter for an
  // ffmpeg keyframe call.

  /** The frame container's 4-byte magic: every container format needs
    * a signature ([[sniffKind]] routes on magics alone — an
    * unsniffable container would reach a binaryFile-fed gate as 'bin'
    * and silently skip the video leg). The bytes can never be
    * mistaken for a frame length-prefix: read as one, they declare a
    * ~1.2 GB first frame, which the walk's bounds guard rejects. */
  private val FrameMagic: Array[Byte] =
    "GFV1".getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)

  private[multimodal] def hasFrameMagic(pb: Array[Byte]): Boolean =
    pb.length >= 4 && pb(0) == FrameMagic(0) && pb(1) == FrameMagic(1) &&
      pb(2) == FrameMagic(2) && pb(3) == FrameMagic(3)

  /** Pack image byte arrays into one video payload: the container
    * magic, then each frame as [4-byte big-endian length][frame
    * bytes]. The fixture/ingest-side twin of [[splitImageFrames]]. */
  def packImageFrames(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(FrameMagic, 0, 4)
    frames.foreach { f =>
      val len = f.length
      out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      out.write(f, 0, len)
    }
    out.toByteArray
  }

  /** Walk a length-prefixed frame container, fail-soft (the scanner's
    * good-prefix rule): a corrupt length (non-positive or past
    * end-of-data) ends the walk with every frame parsed so far. A
    * leading container magic is skipped; magic-less payloads walk
    * from byte 0 (pre-magic containers keep parsing — the magic read
    * as a length fails the bounds guard, so the two framings can
    * never be confused). */
  private[multimodal] def splitImageFrames(payload: Array[Byte])
      : Seq[Array[Byte]] = {
    val pb = bytes(payload)
    val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    var pos = if (hasFrameMagic(pb)) 4 else 0
    var done = false
    while (!done && pos + 4 <= pb.length) {
      val len = ((pb(pos) & 0xff) << 24) | ((pb(pos + 1) & 0xff) << 16) |
        ((pb(pos + 2) & 0xff) << 8) | (pb(pos + 3) & 0xff)
      // bounds compare in LONG: a corrupt length near 2³¹ would wrap
      // `pos + 4 + len` negative, pass the guard, and throw out of the
      // fail-soft contract instead of ending the walk
      if (len <= 0 || pos + 4L + len > pb.length) done = true
      else {
        out += java.util.Arrays.copyOfRange(pb, pos + 4, pos + 4 + len)
        pos += 4 + len
      }
    }
    out.toSeq
  }

  /** The one container-walk pass shared by every per-frame operator:
    * (media_id, frame_idx, frame bytes) for every `stride`-th frame
    * of every VIDEO payload — narrow, payloads stay in place. ONE
    * copy of the walk, so stride semantics and the fail-soft rule
    * cannot diverge between the dual-hash and aHash-only paths. */
  private def videoFrames(media: Dataset[Media],
                          stride: Int): Dataset[(Long, Int, Array[Byte])] = {
    require(stride >= 1, s"stride must be >= 1, got $stride")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video")
      .mapPartitions(_.flatMap { m =>
        splitImageFrames(m.payload).zipWithIndex
          .collect { case (f, i) if i % stride == 0 => (m.media_id, i, f) }
      })
  }

  /** Per-frame perceptual hashes of every VIDEO payload: one narrow
    * container-walk + decode pass (payloads never shuffle — only
    * (id, idx, two 8-byte hashes) move), every `stride`-th frame,
    * undecodable frames keep their row with NULL hashes (corrupt
    * frames are a signal, not a dropped record — the perceptualHashes
    * convention). Output: (media_id, frame_idx, ahash, dhash). */
  def videoFrameHashes(media: Dataset[Media], stride: Int = 1): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    videoFrames(media, stride)
      .map { case (id, i, f) =>
        val g = PerceptualHash.lumaPixels(f)
        (id, i,
          g.map { case (w, h, px) =>
            PerceptualHash.aHashOfGrid(
              PerceptualHash.blockGrid(w, h, px, 8, 8)) },
          g.map { case (w, h, px) =>
            PerceptualHash.dHashOfGrid(
              PerceptualHash.blockGrid(w, h, px, 9, 8)) })
      }
      .toDF("media_id", "frame_idx", "ahash", "dhash")
  }

  /** Video near-duplicates by FRAME-SET overlap — alignment-free, so
    * re-encoded copies (every frame collapses at Hamming 0 through
    * the real codec), trimmed copies (the shared tail still clears
    * the overlap floor), and single-frame retouches all surface, and
    * a shifted frame index (trimming) changes nothing. Two stages,
    * both banded: frame pairs across videos come from the q28-shaped
    * 16-bit aHash band buckets (census-capped — degenerate
    * title-card/black frames shared by thousands of videos are
    * SKIPPED, their videos pair through their distinctive frames),
    * confirm at `bit_count(xor) <= maxDist`; then video pair (a, b),
    * a > b, is a near-dup when the count of DISTINCT a-frames with a
    * matching b-frame clears `minOverlapBp` basis points of a's
    * hashed-frame count — `matched·10000 >= bp·n` in exact integers,
    * division-free. Keeper: smallest such b (the dedup family rule).
    * Output: (dup_id, keep_id, n_matched, n_frames). */
  def videoNearDups(media: Dataset[Media], stride: Int = 1,
                    maxDist: Int = 3, maxBucket: Int = 1024,
                    minOverlapBp: Int = 6000): DataFrame = {
    require(minOverlapBp >= 1 && minOverlapBp <= 10000,
      s"minOverlapBp must be in 1..10000, got $minOverlapBp")
    videoOverlapDups(videoFrameAHashes(media, stride), maxDist,
      maxBucket, minOverlapBp)
  }

  /** aHash-only per-frame pass: [[videoFrameHashes]] computes BOTH
    * hashes, but the overlap dedup bands and confirms on aHash alone —
    * paying the 9×8 dHash grid per frame in the corpus-scale decode
    * pass for a column nothing reads would be waste Catalyst cannot
    * prune out of an opaque mapPartitions. Decoded frames only
    * (NULL hashes dropped here — they can't band). */
  private[multimodal] def videoFrameAHashes(media: Dataset[Media],
                                            stride: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    videoFrames(media, stride)
      .map { case (id, i, f) =>
        (id, i, PerceptualHash.lumaPixels(f).map {
          case (w, h, px) => PerceptualHash.aHashOfGrid(
            PerceptualHash.blockGrid(w, h, px, 8, 8)) })
      }
      .toDF("media_id", "frame_idx", "ahash")
      .filter(col("ahash").isNotNull)
  }

  /** The relational tail of [[videoNearDups]] over a precomputed
    * (media_id, frame_idx, ahash) relation — split out so callers
    * that must dedup among a SUBSET of videos (the originality gate's
    * byte keepers) can filter the hash-sized relation instead of
    * semi-joining payload bytes through a shuffle. */
  private[multimodal] def videoOverlapDups(fh: DataFrame, maxDist: Int,
                                           maxBucket: Int,
                                           minOverlapBp: Int): DataFrame = {
    val nFrames = fh.groupBy(col("media_id").as("__vid"))
      .agg(count(lit(1)).as("n_frames"))
    // the family's shared candidacy stage: banded buckets + census cap
    val capped = PerceptualHash.cappedBands(
      fh.select(col("media_id").as("__vid"), col("frame_idx").as("__f"),
        col("ahash").as("__h")),
      Seq("__vid", "__f"), Seq("__h"), maxBucket)
    // distinct matched a-frames per video pair (a frame may match
    // through several bands and several b-frames — it counts once)
    val matched = capped.as("a")
      .join(capped.as("b"),
        col("a.__b") === col("b.__b") && col("a.__v") === col("b.__v") &&
          col("a.__vid") > col("b.__vid"))
      .filter(bit_count(col("a.__h").bitwiseXOR(col("b.__h"))) <= maxDist)
      .select(col("a.__vid").as("dup_id"), col("b.__vid").as("__nbr"),
        col("a.__f").as("__f"))
      .distinct()
      .groupBy(col("dup_id"), col("__nbr"))
      .agg(count(lit(1)).as("n_matched"))
    matched
      .join(nFrames.select(col("__vid").as("dup_id"),
        col("n_frames")), Seq("dup_id"))
      .filter(col("n_matched") * 10000 >= lit(minOverlapBp.toLong) *
        col("n_frames"))
      .groupBy(col("dup_id"))
      .agg(min(struct(col("__nbr"), col("n_matched"), col("n_frames")))
        .as("__k"))
      .select(col("dup_id"), col("__k.__nbr").as("keep_id"),
        col("__k.n_matched").as("n_matched"), col("__k.n_frames").as("n_frames"))
  }

  /** Resize images to fit a bounding box (stub for a libvips/Pillow
    * resample): aspect-preserving target dims from the decoded meta,
    * payload re-encoded proportionally to the pixel-count change — the
    * shape of the real op (bytes in, smaller bytes + new dims out)
    * without the codec. Non-image payloads pass through untouched.
    * Same partition-wise lifecycle as the other kernels: one decoder
    * session per partition, narrow map, linear at any corpus size. */
  def resizeImages(media: Dataset[Media], maxW: Int = 256,
                   maxH: Int = 256): Dataset[DecodedMedia] = {
    require(maxW > 0 && maxH > 0, s"resize box must be positive, got ${maxW}x$maxH")
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val session = DecoderSession.open()
      it.map { m =>
        val meta = session.decode(m.kind, m.payload)
        if (m.kind != "image" || (meta.width <= maxW && meta.height <= maxH))
          DecodedMedia(m.media_id, m.kind, m.payload, meta)
        else {
          // aspect-preserving fit: one integer scale per axis, floor —
          // deterministic, no float-rounding drift across engines
          val pb = bytes(m.payload) // null payload → empty, never NPE
          val scaleNum = math.min(maxW.toLong * meta.height,
            maxH.toLong * meta.width)
          val w = (scaleNum / meta.height).toInt.max(1)
          val h = (scaleNum / meta.width).toInt.max(1)
          val outLen = math.max(1,
            (pb.length.toLong * (w.toLong * h) /
              (meta.width.toLong * meta.height)).toInt)
          DecodedMedia(m.media_id, m.kind,
            java.util.Arrays.copyOf(pb, outLen),
            meta.copy(width = w, height = h))
        }
      }
    }
  }

  /** Decoded metadata joined back as columns — the typed-metadata table
    * shape a catalog would persist alongside the payload store. */
  /** Exact payload dedup — byte-identical media collapse, the first
    * pass every multimodal corpus runs (re-crawled images, mirrored
    * videos): group by md5 of the raw bytes, keep the min-id copy.
    * KIND-agnostic on purpose — a byte-identical payload is the same
    * object whatever its label says. Output: (keep_id, kind — the
    * keeper's, n_copies, ids — sorted members). One fingerprint
    * shuffle; the payloads themselves never shuffle (only the 16-byte
    * hash and ids move — the q26 exact-dedup shape on binary).
    *
    * NEAR-dup is compositional, not duplicated here:
    * [[extractFeatures]] → `Similarity.semanticDedupe` runs the
    * embedding-cosine pass over the feature vectors (spec-proven:
    * byte-identical payloads embed identically, so the compositional
    * path subsumes this operator's groups at threshold 1.0). */
  def dedupePayloads(media: Dataset[Media]): DataFrame =
    media.toDF()
      .select(col("media_id"), col("kind"),
        md5(coalesce(col("payload"), lit(Array.emptyByteArray)))
          .as("__fp"))
      .groupBy(col("__fp"))
      .agg(
        min(struct(col("media_id"), col("kind"))).as("__k"),
        count(lit(1)).as("n_copies"),
        sort_array(collect_list(col("media_id"))).as("ids"))
      .select(col("__k.media_id").as("keep_id"),
        col("__k.kind").as("kind"), col("n_copies"), col("ids"))

  /** LAION-class image quality gate — the structural rules every
    * image-corpus pipeline applies before any model sees a pixel:
    * decodability (bytes a real codec rejects are not an image),
    * minimum short side (thumbnails and tracking pixels carry no
    * signal), and bounded aspect ratio (banners/sliver crops distort
    * training) — `max(w,h) ≤ maxAspect·min(w,h)`, integer arithmetic.
    * Judged on the REAL decoded header ([[realImageMeta]]) only:
    * undecodable payloads are keep=false with zeroed dims, NEVER
    * stub-faked (a gate that passes garbage on synthetic metadata is
    * worse than no gate). Non-image kinds are not judged (filtered —
    * an image rule says nothing about audio). One narrow header-only
    * pass (O(header) per payload, payloads never shuffle). Output:
    * (media_id, format, width, height, keep). */
  def imageQualityGate(media: Dataset[Media], minSide: Int = 64,
                       maxAspect: Int = 3): DataFrame = {
    require(minSide >= 1 && maxAspect >= 1,
      s"minSide/maxAspect must be positive, got $minSide/$maxAspect")
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image")
      .mapPartitions(_.map { m =>
        realImageMeta(m.payload) match {
          case Some(mt) =>
            val keep = mt.width >= minSide && mt.height >= minSide &&
              math.max(mt.width, mt.height).toLong <=
                maxAspect.toLong * math.min(mt.width, mt.height)
            (m.media_id, mt.format, mt.width, mt.height, keep)
          case None => (m.media_id, "", 0, 0, false)
        }
      })
      .toDF("media_id", "format", "width", "height", "keep")
  }

  /** Joint media↔text curation gate: keep only documents owning at
    * least ONE original image — i.e. an image that wins (or is alone
    * in) its byte-dedup group ([[dedupePayloads]]'s keep-min rule). A
    * document whose every image is a LOSING byte-duplicate of images
    * seen elsewhere is scraped-gallery spam / a mirror page in a
    * multimodal corpus — the media-side evidence gates the text side,
    * which no text-only stage can see. `media` carries
    * (mediaIdCol, docIdCol, payloadCol); docs with NO media rows at
    * all are KEPT (absence of images is not evidence of scraping —
    * the blocklist keep-the-unparseable convention).
    *
    * Plan shape: payloads reduce to a 16-byte fingerprint before the
    * one groupBy(fp) min-agg shuffle (payload bytes never shuffle),
    * keepers semi-join back media-id-sized, owner docs distinct, and
    * the corpus joins owner-doc-sized — the q26 fingerprint-dedup
    * cost class end to end. */
  def dropAllDuplicateImageDocs(docs: DataFrame, idCol: String,
                                media: DataFrame, mediaIdCol: String,
                                docIdCol: String,
                                payloadCol: String): DataFrame = {
    // NULL payloads are NOT evidence (failed fetches): fingerprinting
    // them would pool every null-payload image corpus-wide into one
    // "duplicate group" and drop docs on no bytes at all. They are
    // excluded outright, so a doc whose images are all NULL counts as
    // media-less and is KEPT (the keep-the-unparseable convention).
    val fp = media.filter(col(payloadCol).isNotNull)
      .select(col(mediaIdCol).as("__mid"),
        col(docIdCol).as("__did"),
        md5(col(payloadCol)).as("__fp"))
    val keepers = fp.groupBy(col("__fp"))
      .agg(min(col("__mid")).as("__mid"))
      .select(col("__mid"))
    gateDocsOnOriginals(docs, idCol, fp, keepers)
  }

  /** The shared gate tail of the originality family: keep docs owning
    * at least one `originals` media row; docs with NO evidence rows
    * in `fp` pass (keep-the-unparseable). ONE copy of the election
    * gate, every originality variant in lockstep. `fp` carries
    * (__mid, __did); `originals` carries (__mid). */
  private def gateDocsOnOriginals(docs: DataFrame, idCol: String,
                                  fp: DataFrame,
                                  originals: DataFrame): DataFrame = {
    val ownerDocs = fp.join(originals, Seq("__mid"), "left_semi")
      .select(col("__did")).distinct()
    val withMedia = fp.select(col("__did")).distinct()
    docs.join(
      withMedia.join(ownerDocs, Seq("__did"), "left_anti"),
      col(idCol) === col("__did"), "left_anti")
  }

  /** [[dropAllDuplicateImageDocs]] with PERCEPTUAL originality: an
    * image is original only if it wins its byte-dedup group AND its
    * decoded content is not a near-duplicate of a smaller-id byte
    * keeper ([[PerceptualHash.nearDupsByDualHash]] — aHash+dHash
    * summed confirmation). The byte gate alone is provably blind to
    * re-encoded copies (PNG→BMP of identical pixels shares zero
    * bytes — the q195 witness), so the exact scraped-gallery spam it
    * exists for survives it by re-encoding; here those re-encodes
    * collapse onto one keeper and galleries of them drop.
    *
    * Plan shape: perceptual hashes are computed for ALL media in the
    * same narrow decode pass class as the byte gate's md5 (payload
    * bytes NEVER shuffle — only 16-byte fingerprints and two 8-byte
    * hashes move; hashing keepers-only instead would semi-join the
    * payload column through a corpus-scale shuffle, the one thing a
    * 100 TB media gate cannot do). Election then runs entirely on
    * hash-sized relations: byte keepers (min-id per fingerprint),
    * their hash rows semi-joined in, banded near-dup among keepers,
    * anti-join to originals, owner docs distinct. NULL payloads are
    * excluded as evidence and undecodable keepers (NULL hashes) never
    * match anything — both keep-the-unparseable. `mediaIdCol` must be
    * integral (the near-dup id contract; the Media encoder refuses a
    * lossy upcast loudly). */
  def dropAllDuplicateImageDocsPerceptual(docs: DataFrame, idCol: String,
                                          media: DataFrame,
                                          mediaIdCol: String,
                                          docIdCol: String,
                                          payloadCol: String,
                                          maxDist: Int = 6,
                                          maxBucket: Int = 1024): DataFrame =
    // the image-only special case of the unified gate: a constant
    // 'image' kind routes every payload to the dual-hash election —
    // one copy of the byte election and gate tail instead of three.
    // enabledKinds = image SKIPS the audio/video legs entirely (each
    // would be an opaque typed filter over the full media Dataset that
    // Catalyst cannot prune — two payload-deserializing corpus scans
    // guaranteed to produce zero rows under a constant kind)
    dropAllDuplicateMediaDocs(docs, idCol,
      media.withColumn("__gate_kind", lit("image")),
      mediaIdCol, docIdCol, "__gate_kind", payloadCol,
      imageMaxDist = maxDist, maxBucket = maxBucket,
      enabledKinds = Set("image"))

  /** The UNIFIED multimodal originality gate: docs gate on evidence
    * from ANY media kind — images via the dual perceptual hash, audio
    * via the envelope hash, video via frame-set overlap — behind one
    * byte-level election. A media row is ORIGINAL iff it wins its
    * byte-dedup group (md5, kind-agnostic — container magics keep
    * kinds byte-disjoint) AND its kind's perceptual election does not
    * collapse it onto a smaller keeper; a doc survives iff it owns at
    * least one original (docs with no non-NULL media pass — the
    * keep-the-unparseable convention, as do docs whose media is
    * undecodable: NULL hashes never match).
    *
    * Plan shape: every hash family is computed over ALL media in its
    * kind's narrow decode pass (payload bytes NEVER shuffle — the
    * dropAllDuplicateImageDocsPerceptual rule), keepers restrict the
    * HASH relations, and the three dup sets union id-sized. The
    * per-kind thresholds are each family's documented defaults.
    * `enabledKinds` prunes whole perceptual legs: each leg is an
    * opaque typed filter over the full media Dataset (Catalyst cannot
    * prune inside it), so a caller that KNOWS a kind is absent — the
    * image-pinned wrapper, a single-modality corpus — skips that
    * kind's payload-deserializing scan entirely instead of paying it
    * to produce zero rows. A disabled kind's keepers are all ORIGINAL
    * (byte election still judges them — exact duplicates of a
    * disabled kind still collapse). */
  def dropAllDuplicateMediaDocs(docs: DataFrame, idCol: String,
                                media: DataFrame, mediaIdCol: String,
                                docIdCol: String, kindCol: String,
                                payloadCol: String,
                                imageMaxDist: Int = 6,
                                audioMaxDist: Int = 3,
                                videoMaxDist: Int = 3,
                                videoMinOverlapBp: Int = 6000,
                                maxBucket: Int = 1024,
                                enabledKinds: Set[String] =
                                  Set("image", "audio", "video")): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // loud configuration validation — the videoNearDups rules apply
    // here too (routing around them would let minOverlapBp = 0 mark
    // any single banded frame match a whole-video duplicate, and a
    // silent string-id cast would NULL every hash row)
    require(videoMinOverlapBp >= 1 && videoMinOverlapBp <= 10000,
      s"videoMinOverlapBp must be in 1..10000, got $videoMinOverlapBp")
    require(imageMaxDist >= 0 && audioMaxDist >= 0 && videoMaxDist >= 0,
      "per-kind maxDist thresholds must be non-negative, got " +
        s"$imageMaxDist/$audioMaxDist/$videoMaxDist")
    // a typo ('images') would silently disable a leg — fail loudly
    require(enabledKinds.subsetOf(Set("image", "audio", "video")),
      "enabledKinds must be a subset of {image, audio, video}, got " +
        enabledKinds.toSeq.sorted.mkString("{", ", ", "}"))
    locally {
      import org.apache.spark.sql.types._
      val dt = media.schema(mediaIdCol).dataType
      require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
        s"dropAllDuplicateMediaDocs needs an integral $mediaIdCol " +
          s"column, got ${dt.catalogString}")
    }
    val m = media.filter(col(payloadCol).isNotNull)
      .select(col(mediaIdCol).cast("long").as("__mid"),
        col(docIdCol).as("__did"), col(kindCol).as("kind"),
        col(payloadCol).as("payload"))
    val fp = m.select(col("__mid"), col("__did"),
      md5(col("payload")).as("__fp"))
    val keepers = fp.groupBy(col("__fp"))
      .agg(min(col("__mid")).as("__mid"))
      .select(col("__mid"))
    def keeperOnly(hashes: DataFrame): DataFrame =
      hashes.join(keepers.select(col("__mid").as("media_id")),
        Seq("media_id"), "left_semi")
    val typed = m.select(col("__mid").as("media_id"), col("kind"),
        col("payload"))
      .as[Media]
    val legs = Seq.newBuilder[DataFrame]
    if (enabledKinds("image"))
      legs += PerceptualHash.nearDupsByDualHash(
          keeperOnly(PerceptualHash.perceptualHashes(typed)),
          "media_id", "ahash", "dhash", imageMaxDist, maxBucket)
        .select(col("dup_id"))
    if (enabledKinds("audio"))
      legs += PerceptualHash.nearDupsByHash(
          keeperOnly(AudioWave.audioHashes(typed)),
          "media_id", "ehash", audioMaxDist, maxBucket)
        .select(col("dup_id"))
    if (enabledKinds("video"))
      legs += videoOverlapDups(
          keeperOnly(videoFrameAHashes(typed, stride = 1)),
          videoMaxDist, maxBucket, videoMinOverlapBp)
        .select(col("dup_id"))
    val dups = legs.result() match {
      // all legs disabled → byte election alone (no perceptual dups)
      case Nil => keepers.limit(0).select(col("__mid").as("dup_id"))
      case ds => ds.reduce(_ unionByName _)
    }
    val dupIds = dups.select(col("dup_id").as("__mid"))
    val originals = keepers.join(dupIds, Seq("__mid"), "left_anti")
    gateDocsOnOriginals(docs, idCol, fp, originals)
  }

  def metadataTable(media: Dataset[Media]): DataFrame =
    decodeAll(media).toDF().select(col("media_id"), col("kind"),
      col("meta.format").as("format"), col("meta.width").as("width"),
      col("meta.height").as("height"), col("meta.n_frames").as("n_frames"),
      col("meta.sample_rate").as("sample_rate"),
      col("meta.channels").as("channels"),
      octet_length(col("payload")).as("n_bytes"))
}

/** Stand-in for a native decoder handle (libjpeg/ffmpeg/soundfile
  * binding). Tracks open() calls so tests can assert the
  * once-per-partition lifecycle. */
private[multimodal] class DecoderSession private () extends Serializable {
  /** Images decode for REAL when the bytes are a format the JDK reads
    * (PNG/JPEG/GIF/BMP — [[Multimodal.realImageMeta]]), and audio
    * decodes for REAL when the bytes are RIFF/WAVE PCM
    * ([[AudioWave.parseWav]] — rate/channels/bit-depth off the real
    * header, n_frames carries the PCM frame count); everything else
    * (non-media payloads, compressed audio, video) falls back to the
    * deterministic stub, so existing fixtures and oracles see
    * identical metadata. */
  def decode(kind: String, payload: Array[Byte]): Multimodal.MediaMeta =
    if (kind == "image")
      Multimodal.realImageMeta(payload)
        .getOrElse(Multimodal.stubDecode(kind, payload))
    else if (kind == "audio")
      AudioWave.parseWav(payload).map { case (mt, _) =>
        Multimodal.MediaMeta("wav", 0, 0, mt.nSamples, mt.sampleRate,
          mt.channels)
      }.getOrElse(Multimodal.stubDecode(kind, payload))
    else Multimodal.stubDecode(kind, payload)

  /** Deterministic hash-derived pseudo-embedding in [-1, 1). */
  def embed(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L
    Multimodal.bytes(payload).foreach(b => h = h * 31 + (b & 0xff))
    var i = 0
    while (i < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17
      out(i) = (Math.floorMod(h, 2000000L) / 1000000.0f) - 1.0f
      i += 1
    }
    out
  }
}

private[multimodal] object DecoderSession {
  // Executor-side instrumentation: counts inits in this JVM (local-mode
  // tests share one JVM, so the count is observable from the driver).
  val opened = new java.util.concurrent.atomic.AtomicInteger(0)
  def open(): DecoderSession = { opened.incrementAndGet(); new DecoderSession() }
}
