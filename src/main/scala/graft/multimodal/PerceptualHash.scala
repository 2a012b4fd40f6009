package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Perceptual image fingerprints (aHash / dHash) + banded-Hamming
  * near-duplicate detection — the image-native analog of the text
  * family's MinHash: byte-level dedup ([[Multimodal.dedupePayloads]])
  * dies on the FIRST re-encode of an image (PNG→BMP of identical
  * pixels shares not one byte), while a perceptual hash is a function
  * of the DECODED luminance grid, so re-encoded / losslessly
  * re-packaged copies collapse and small retouches land within a few
  * Hamming bits (the classic aHash/dHash contract — see the pHash
  * family of algorithms; no external library involved, the JDK's
  * ImageIO is the decoder).
  *
  * Exact integer contract (what makes the q194/q195 oracles replay
  * bit-for-bit): luminance = (299·R + 587·G + 114·B) div 1000
  * (BT.601 in integer thousandths — for gray pixels R=G=B=v it is
  * exactly v); the grid is BANDED block-averaging — pixel (x, y) of a
  * W×H image belongs to block (x·GW div W, y·GH div H) and each block
  * value is floor(Σ luma / count) — deterministic for every image
  * size with no resampling kernel to disagree over; aHash bit i is
  * `block_i > floor-mean of all blocks`; dHash bit (y·8+x) is
  * `block(x+1, y) > block(x, y)` on a 9×8 grid. Bits pack LSB-first
  * into one BIGINT (bit 63 lands in the sign — both engines carry
  * the same two's-complement pattern).
  *
  * Scale shape: hashing is a narrow `mapPartitions` decode (payloads
  * never shuffle — only the 8-byte hash moves, the q26 fingerprint
  * rule); near-dup is 4×16-bit banding → equi-join buckets → exact
  * `bit_count(xor)` re-check — the q28 banded-LSH shape, never
  * all-pairs. Pigeonhole guarantee: Hamming ≤ 3 pairs share at least
  * one intact 16-bit band, so the default `maxDist = 3` misses
  * nothing (subject to the degenerate-bucket cap, documented below).
  */
object PerceptualHash {

  /** Decode an image payload to (width, height, row-major luminance)
    * — gray rasters read their sample directly (exact), color images
    * go through sRGB and the integer BT.601 luma. None when ImageIO
    * cannot decode (the caller's null-hash convention), and None for
    * bytes carrying NO image magic ([[Multimodal.hasImageMagic]]):
    * the JDK registers a WBMP reader whose format has no signature
    * at all, so arbitrary binary payloads — frame containers, WAVs,
    * corrupt fetches — "decode" as tiny garbage bitmaps, and two
    * unrelated payloads of similar length hash NEAR each other;
    * unsniffed, the perceptual election would merge genuinely
    * different media and drop innocent docs from the corpus. */
  private[multimodal] def lumaPixels(payload: Array[Byte])
      : Option[(Int, Int, Array[Int])] = {
    val pb = Multimodal.bytes(payload)
    if (pb.length < 8 || !Multimodal.hasImageMagic(pb)) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(pb))
      if (img == null || img.getWidth <= 0 || img.getHeight <= 0) return None
      val w = img.getWidth
      val h = img.getHeight
      val out = new Array[Int](w * h)
      // gray rasters read their raw sample, SCALED to 8 bits by the
      // raster's declared bit depth: a 16-bit grayscale sample is
      // 0..65535, and hashing it against the 0..255 luma of the RGB
      // path would stop a bit-depth-changing re-encode of identical
      // pixels from collapsing as a near-dup (the "function of the
      // decoded luminance grid" contract). Deep samples shift down
      // (v·257 >> 8 = v exactly, the 8→16 replication convention);
      // shallow ones (1/2/4-bit) stretch by 255/(2^b−1) — both exact
      // integer maps, no colorspace conversion to disagree over.
      val gray = img.getRaster.getNumBands == 1
      val bits = if (gray) img.getRaster.getSampleModel.getSampleSize(0)
        else 8
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          out(y * w + x) =
            if (gray) {
              val v = img.getRaster.getSample(x, y, 0)
              if (bits == 8) v
              else if (bits > 8) v >> (bits - 8)
              else v * 255 / ((1 << bits) - 1)
            } else {
              val rgb = img.getRGB(x, y)
              val r = (rgb >> 16) & 0xff
              val g = (rgb >> 8) & 0xff
              val b = rgb & 0xff
              (299 * r + 587 * g + 114 * b) / 1000
            }
          x += 1
        }
        y += 1
      }
      Some((w, h, out))
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Banded block grid: block (gx, gy) averages (floor) the pixels
    * with x·gw div W = gx and y·gh div H = gy. Row-major gw×gh. */
  private[multimodal] def blockGrid(w: Int, h: Int, px: Array[Int],
                                    gw: Int, gh: Int): Array[Long] = {
    val sums = new Array[Long](gw * gh)
    val counts = new Array[Long](gw * gh)
    var y = 0
    while (y < h) {
      val gy = y.toLong * gh / h
      var x = 0
      while (x < w) {
        val gx = x.toLong * gw / w
        val i = (gy * gw + gx).toInt
        sums(i) += px(y * w + x)
        counts(i) += 1
        x += 1
      }
      y += 1
    }
    Array.tabulate(gw * gh)(i => if (counts(i) == 0) 0L else sums(i) / counts(i))
  }

  /** aHash bits over an 8×8 block grid: bit i = block_i > mean. */
  private[multimodal] def aHashOfGrid(g: Array[Long]): Long = {
    val mean = g.sum / g.length
    var bits = 0L
    var i = 0
    while (i < g.length) {
      if (g(i) > mean) bits |= 1L << i
      i += 1
    }
    bits
  }

  /** dHash bits over a 9×8 grid: bit (y·8+x) = g(x+1, y) > g(x, y). */
  private[multimodal] def dHashOfGrid(g: Array[Long]): Long = {
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (g(y * 9 + x + 1) > g(y * 9 + x)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** 64-bit average hash of an image payload; None when undecodable. */
  def aHash64(payload: Array[Byte]): Option[Long] =
    lumaPixels(payload).map { case (w, h, px) =>
      aHashOfGrid(blockGrid(w, h, px, 8, 8)) }

  /** 64-bit difference hash (horizontal gradient) of an image payload. */
  def dHash64(payload: Array[Byte]): Option[Long] =
    lumaPixels(payload).map { case (w, h, px) =>
      dHashOfGrid(blockGrid(w, h, px, 9, 8)) }

  /** (media_id, ahash, dhash) for every IMAGE payload — one narrow
    * decode pass, the per-partition decoder lifecycle of the other
    * kernels; undecodable payloads keep their row with NULL hashes
    * (a corrupt image is a quality signal, not a dropped record).
    * Non-image kinds are filtered (a perceptual IMAGE hash of audio
    * bytes is noise). */
  def perceptualHashes(media: Dataset[Multimodal.Media]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image")
      .mapPartitions(_.map { m =>
        val g = lumaPixels(m.payload)
        (m.media_id,
          g.map { case (w, h, px) => aHashOfGrid(blockGrid(w, h, px, 8, 8)) },
          g.map { case (w, h, px) => dHashOfGrid(blockGrid(w, h, px, 9, 8)) })
      })
      .toDF("media_id", "ahash", "dhash")
  }

  /** Banded-Hamming near-duplicates over a 64-bit hash column:
    * (dup_id, keep_id, hamming) — for each id, the SMALLEST id below
    * it within `maxDist` Hamming bits (the dedup family's
    * keep-smallest rule; rows with no smaller neighbor are absent =
    * survivors). Candidates come from 4×16-bit band buckets (exact
    * equi-join, pigeonhole-complete for maxDist ≤ 3); buckets larger
    * than `maxBucket` are SKIPPED — a 16-bit band shared by thousands
    * of images is a degenerate region (flat borders, letterboxing)
    * whose pairs, if real, surface through their other three bands;
    * the cap bounds the worst bucket's pair fanout exactly as q28's
    * MinHash banding does. NULL hashes never match (undecodable
    * images are not each other's duplicates). */
  def nearDupsByHash(hashes: DataFrame, idCol: String, hashCol: String,
                     maxDist: Int = 3, maxBucket: Int = 1024): DataFrame =
    bandedNearDups(hashes, idCol, Seq(hashCol), maxDist, maxBucket)

  /** [[nearDupsByHash]] over BOTH perceptual hashes as one 128-bit
    * fingerprint: candidates come from 8 censused 16-bit bands (4 per
    * hash — pigeonhole-complete for total Hamming ≤ 7), and a pair
    * confirms on the SUM of the two Hamming distances. This closes
    * both degenerate edges the single-hash form documents:
    * flat/letterboxed regions collapse aHash bands into over-cap
    * buckets that the census SKIPS (a true near-dup whose only intact
    * aHash band is the degenerate one is invisible to aHash banding —
    * its gradient-domain dHash bands still surface it), and
    * conversely an aHash-only match between genuinely different
    * images (brightness layout agrees, gradient structure does not)
    * fails the summed confirmation instead of merging. NULL in
    * EITHER hash excludes the row (no half-fingerprint matches). */
  def nearDupsByDualHash(hashes: DataFrame, idCol: String,
                         aHashCol: String = "ahash",
                         dHashCol: String = "dhash",
                         maxDist: Int = 6,
                         maxBucket: Int = 1024): DataFrame =
    bandedNearDups(hashes, idCol, Seq(aHashCol, dHashCol), maxDist,
      maxBucket)

  /** The shared banding core: (dup_id, keep_id, hamming) — for each
    * id, the SMALLEST id below it within `maxDist` TOTAL Hamming bits
    * over `hashCols` (the dedup family's keep-smallest rule; rows
    * with no smaller neighbor are absent = survivors). Candidates
    * come from 16-bit band buckets, 4 per hash column (exact
    * equi-join, pigeonhole-complete for maxDist < 4·|hashCols|);
    * buckets larger than `maxBucket` are SKIPPED — a band shared by
    * thousands of images is a degenerate region (flat borders,
    * letterboxing) whose pairs, if real, surface through the other
    * bands; the cap bounds the worst bucket's pair fanout exactly as
    * q28's MinHash banding does. NULL hashes never match
    * (undecodable images are not each other's duplicates). */
  private def bandedNearDups(hashes: DataFrame, idCol: String,
                             hashCols: Seq[String], maxDist: Int,
                             maxBucket: Int): DataFrame = {
    // integral columns only, loudly: a silent cast('long') of string
    // ids would NULL them all and return an EMPTY result — near-dup
    // dedup quietly disabled is worse than a config error
    (idCol +: hashCols).foreach { c =>
      import org.apache.spark.sql.types._
      val dt = hashes.schema(c).dataType
      require(Seq(LongType, IntegerType, ShortType, ByteType).contains(dt),
        s"nearDupsByHash needs an integral $c column, got " +
          s"${dt.catalogString} (hash non-numeric ids to long first)")
    }
    val hCols = hashCols.indices.map(i => s"__h$i")
    val h = hashes.select(col(idCol).cast("long").as("__id") +:
        hashCols.zip(hCols).map { case (c, a) => col(c).cast("long").as(a) }: _*)
      .filter(hCols.map(col(_).isNotNull).reduce(_ && _))
    val capped = cappedBands(h, Seq("__id"), hCols, maxBucket)
    val totalHam = hCols.map(hc =>
      bit_count(col(s"a.$hc").bitwiseXOR(col(s"b.$hc")))).reduce(_ + _)
    val pairs = capped.as("a")
      .join(capped.as("b"),
        col("a.__b") === col("b.__b") && col("a.__v") === col("b.__v") &&
          col("a.__id") > col("b.__id"))
      .select(col("a.__id").as("dup_id"), col("b.__id").as("__nbr"),
        totalHam.as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
    pairs.groupBy(col("dup_id"))
      .agg(min(struct(col("__nbr"), col("hamming"))).as("__k"))
      .select(col("dup_id"), col("__k.__nbr").as("keep_id"),
        col("__k.hamming").cast("int").as("hamming"))
  }

  /** The shared candidacy stage of every banded near-dup in this
    * family (image single/dual hash, video frames, audio envelopes):
    * explode each long hash column into four 16-bit bands (arithmetic
    * shift + mask ≡ logical shift on the low 16 bits — both engines
    * agree), census the (band, value) buckets, and keep rows whose
    * bucket can pair and is under the degenerate-region cap (the q28
    * MinHash rule). Output: `keyCols ++ hashCols ++ (__b, __v)`. One
    * copy of the census logic, every caller in sync. */
  private[multimodal] def cappedBands(h: DataFrame, keyCols: Seq[String],
                                      hashCols: Seq[String],
                                      maxBucket: Int): DataFrame = {
    val bands = bandsOf(h, keyCols, hashCols)
    // bucket census (groupBy + join back, the q28 cap shape — no
    // window): singleton buckets can't pair, oversized ones are the
    // documented degenerate case
    val sizes = bands.groupBy(col("__b"), col("__v"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= 2 && col("__n") <= maxBucket)
      .select(col("__b"), col("__v"))
    bands.join(sizes, Seq("__b", "__v"))
  }

  /** The raw band explosion shared by [[cappedBands]] and the
    * cross-relation (incremental) matchers: each long hash column
    * becomes four (16·i-shifted & 0xffff) 16-bit band rows. A NARROW
    * ×(4·|hashCols|) projection — no shuffle, which is what lets the
    * incremental gate band a history index without moving it. */
  private[multimodal] def bandsOf(h: DataFrame, keyCols: Seq[String],
                                  hashCols: Seq[String]): DataFrame = {
    val bandStructs = hashCols.zipWithIndex.flatMap { case (hc, hi) =>
      (0 to 3).map(b => struct(lit(hi * 4 + b).as("b"),
        (shiftright(col(hc), b * 16) bitwiseAND lit(65535L)).as("v")))
    }
    h.select(keyCols.map(col) ++ hashCols.map(col) :+
        explode(array(bandStructs: _*)).as("__band"): _*)
      .select(keyCols.map(col) ++ hashCols.map(col) :+
        col("__band.b").as("__b") :+ col("__band.v").as("__v"): _*)
  }

  /** [[cappedBands]] for CROSS-relation matching (a small batch vs a
    * large history): singleton buckets are KEPT — a lone band row can
    * still pair with the other side — so only the degenerate-region
    * cap applies. Capping EACH side bounds the per-(band, value) join
    * output at `maxBucket²`, the cross-relation analog of the
    * self-join census's worst-bucket bound. `broadcastCensus` is for
    * the LARGE side: its bucket census is a map-side-combined
    * aggregate over a (band, value) world bounded at
    * 4·|hashCols|·65536 rows by construction, so broadcasting it back
    * keeps the large side's ROWS out of every exchange — only census
    * partials move. ONE copy of the census rule either way. */
  private[multimodal] def cappedBandsCross(h: DataFrame, keyCols: Seq[String],
                                           hashCols: Seq[String],
                                           maxBucket: Int,
                                           broadcastCensus: Boolean = false)
      : DataFrame = {
    val bands = bandsOf(h, keyCols, hashCols)
    val sizes = bands.groupBy(col("__b"), col("__v"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select(col("__b"), col("__v"))
    bands.join(if (broadcastCensus) broadcast(sizes) else sizes,
      Seq("__b", "__v"))
  }

  // ---- Oracle-replayable fixture rendering ------------------------------

  /** Render a W×H image whose pixel (x, y) has the gray value
    * min(floorMod(a + bx·x + cy·y + dxy·x·y, 256) + spot, 255) in all
    * three channels — `spot` (`spotBump`) applies only to the 2×2
    * top-right corner (x ≥ W−2, y < 2; exactly block (7,0) of the
    * 8×8 grid on a 16×16 canvas), the clean "small local retouch"
    * perturbation for near-dup fixtures — encoded with the given
    * LOSSLESS ImageIO format ("png" / "bmp"; gif is palette-limited —
    * avoid). The pixel FORMULA is what a DuckDB oracle replays
    * (integer arithmetic), while the Spark side round-trips through
    * real encode → real decode → luma — so an oracle-checked catalog
    * query proves the whole codec path without DuckDB ever seeing a
    * byte of image. RGB (not gray) BufferedImage on purpose: every
    * JDK writer handles it, and equal channels make luma exactly v. */
  def renderGrayImage(w: Int, h: Int, a: Long, bx: Long, cy: Long,
                      dxy: Long, spotBump: Long, format: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = java.lang.Math.floorMod(
          a + bx * x + cy * y + dxy * x * y, 256L)
        val spot = if (x >= w - 2 && y < 2) spotBump else 0L
        val v = math.min(base + spot, 255L).toInt
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(img, format, out),
      s"no ImageIO writer for format $format")
    out.toByteArray
  }

  /** [[renderGrayImage]] as a column function (deterministic UDF —
    * a codec call has no Catalyst expression): fixed 16×16 canvas,
    * coefficients, spot bump, and format from columns. */
  def renderGrayImage16(a: Column, bx: Column, cy: Column, dxy: Column,
                        spotBump: Column, format: Column): Column = {
    val f = udf((a: Long, bx: Long, cy: Long, dxy: Long, spot: Long,
                 fmt: String) =>
      renderGrayImage(16, 16, a, bx, cy, dxy, spot, fmt))
    f(a, bx, cy, dxy, spotBump, format)
  }

  /** Letterboxed fixture: rows y < 4 are black (the degenerate flat
    * region that collapses hash bands into one corpus-wide bucket),
    * rows y ≥ 4 carry floorMod(a + bx·x + cy·y + dxy·x·y, 200), and
    * `bump` adds to ENTIRE pixel-row pairs {4,5}, {8,9}, {12,13}
    * (capped at 255). Full-row bumps are the dual-hash fixture's
    * point: they flip aHash bits (blocks cross the global mean) in
    * every pattern band while flipping ZERO dHash bits (dHash
    * compares horizontally within a row — a uniform row shift
    * preserves every adjacent-block order), so the retouched pair is
    * exactly the class aHash banding can miss and dHash banding
    * rescues. 16×16, lossless formats only (the renderGrayImage
    * rule). */
  def renderLetterboxImage16(a: Column, bx: Column, cy: Column,
                             dxy: Column, bump: Column,
                             format: Column): Column = {
    val f = udf((a: Long, bx: Long, cy: Long, dxy: Long, bump: Long,
                 fmt: String) => {
      val img = new java.awt.image.BufferedImage(16, 16,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < 16) {
        var x = 0
        while (x < 16) {
          val v =
            if (y < 4) 0
            else {
              val base = java.lang.Math.floorMod(
                a + bx * x + cy * y + dxy * x * y, 200L)
              val b = if (y == 4 || y == 5 || y == 8 || y == 9 ||
                y == 12 || y == 13) bump else 0L
              math.min(base + b, 255L).toInt
            }
          img.setRGB(x, y, (v << 16) | (v << 8) | v)
          x += 1
        }
        y += 1
      }
      val out = new java.io.ByteArrayOutputStream()
      require(javax.imageio.ImageIO.write(img, fmt, out),
        s"no ImageIO writer for format $fmt")
      out.toByteArray
    })
    f(a, bx, cy, dxy, bump, format)
  }

  /** [[renderGrayImage]] with per-row canvas DIMENSIONS — the fixture
    * generator for size/aspect-sensitive paths (the q197 quality
    * gate: the oracle replays the dimension formulas while the Spark
    * side reads dims back off the REAL decoded header). */
  def renderGrayImageWH(w: Column, h: Column, a: Column,
                        format: Column): Column = {
    val f = udf((w: Int, h: Int, a: Long, fmt: String) =>
      renderGrayImage(w, h, a, 3, 5, 1, 0, fmt))
    f(w, h, a, format)
  }
}
