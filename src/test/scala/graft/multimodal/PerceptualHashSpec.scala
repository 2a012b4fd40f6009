package graft.multimodal

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[PerceptualHash]] — the image-native near-dup signal. q194/q195
  * prove engine parity on the formula fixture; this spec pins the
  * byte-true properties the SQL replay cannot reach: REAL codec
  * round-trips (the same pixels through two encoders), the hash
  * invariances that make a perceptual hash perceptual, and the
  * near-dup operator's election/cap/NULL rules on hand hashes. */
class PerceptualHashSpec extends SparkSpec {
  import spark.implicits._

  /** Independent reimplementation of the hash from the pixel formula
    * (no codec) — what the DuckDB oracle computes. */
  private def formulaHashes(a: Long, bx: Long, cy: Long, dxy: Long,
                            bump: Long = 0): (Long, Long) = {
    val px = Array.tabulate(16, 16)((y, x) =>
      math.min(java.lang.Math.floorMod(a + bx * x + cy * y + dxy * x * y,
        256L) + (if (x >= 14 && y < 2) bump else 0L), 255L).toInt)
    def grid(gw: Int, gh: Int): Array[Long] = {
      val s = new Array[Long](gw * gh); val c = new Array[Long](gw * gh)
      for (y <- 0 until 16; x <- 0 until 16) {
        val i = (y * gh / 16) * gw + (x * gw / 16)
        s(i) += px(y)(x); c(i) += 1
      }
      Array.tabulate(gw * gh)(i => s(i) / c(i))
    }
    val g8 = grid(8, 8)
    val mean = g8.sum / 64
    val ah = g8.zipWithIndex.foldLeft(0L) { case (acc, (v, i)) =>
      if (v > mean) acc | (1L << i) else acc }
    val g9 = grid(9, 8)
    var dh = 0L
    for (y <- 0 until 8; x <- 0 until 8)
      if (g9(y * 9 + x + 1) > g9(y * 9 + x)) dh |= 1L << (y * 8 + x)
    (ah, dh)
  }

  test("hash of the REAL codec round-trip equals the formula hash; PNG ≡ BMP") {
    for (gid <- Seq(0L, 7L, 13L, 42L, 49L)) {
      val (a, bx, cy, dxy) = (gid * 7, gid % 5 + 1, gid % 11 + 1, gid % 3)
      val expected = formulaHashes(a, bx, cy, dxy)
      for (fmt <- Seq("png", "bmp")) {
        val bytesImg = PerceptualHash.renderGrayImage(16, 16, a, bx, cy,
          dxy, 0, fmt)
        PerceptualHash.aHash64(bytesImg) shouldBe Some(expected._1)
        PerceptualHash.dHash64(bytesImg) shouldBe Some(expected._2)
      }
    }
  }

  test("bit-depth-changing re-encodes collapse: 16-bit and 8-bit gray of the same pixels hash identically") {
    // the same pixel formula rendered as TYPE_BYTE_GRAY (8-bit raster,
    // raw-sample path) and TYPE_USHORT_GRAY with the v·257 replication
    // convention (16-bit raster — the sample must scale down by bit
    // depth, not hash raw 0..65535 against 0..255)
    def grayPng(imgType: Int, scale: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(16, 16, imgType)
      for (y <- 0 until 16; x <- 0 until 16) {
        val v = java.lang.Math.floorMod(10L + 2L * x + 3L * y, 256L).toInt
        img.getRaster.setSample(x, y, 0, v * scale)
      }
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val b8 = grayPng(java.awt.image.BufferedImage.TYPE_BYTE_GRAY, 1)
    val b16 = grayPng(java.awt.image.BufferedImage.TYPE_USHORT_GRAY, 257)
    java.util.Arrays.equals(b8, b16) shouldBe false
    PerceptualHash.aHash64(b16) shouldBe PerceptualHash.aHash64(b8)
    PerceptualHash.dHash64(b16) shouldBe PerceptualHash.dHash64(b8)
    // and both agree with the RGB rendering of the same formula (the
    // three paths — raw 8-bit sample, scaled deep sample, BT.601 luma
    // of equal channels — are one luminance grid)
    val rgb = PerceptualHash.renderGrayImage(16, 16, 10, 2, 3, 0, 0, "png")
    PerceptualHash.aHash64(b16) shouldBe PerceptualHash.aHash64(rgb)
  }

  test("aHash is invariant to global brightness shift and to upscaling; md5 is not") {
    val base = PerceptualHash.renderGrayImage(16, 16, 10, 2, 3, 0, 0, "png")
    val brighter = PerceptualHash.renderGrayImage(16, 16, 50, 2, 3, 0, 0, "png")
    // +40 uniform brightness (a-coefficient shift, no 256-wrap in this
    // pattern: values stay < 256): every block and the mean shift
    // together, so all 64 comparisons are unchanged
    PerceptualHash.aHash64(base) shouldBe PerceptualHash.aHash64(brighter)
    // 2× nearest-neighbor upscale preserves the banded block grid
    // exactly: pixel (x, y) of the 32×32 copies value from (x/2, y/2)
    val big = {
      val img = new java.awt.image.BufferedImage(32, 32,
        java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      val src = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(base))
      for (y <- 0 until 32; x <- 0 until 32)
        img.setRGB(x, y, src.getRGB(x / 2, y / 2))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    PerceptualHash.aHash64(big) shouldBe PerceptualHash.aHash64(base)
    PerceptualHash.dHash64(big) shouldBe PerceptualHash.dHash64(base)
    java.util.Arrays.equals(base, big) shouldBe false
  }

  test("perceptualHashes: images only, undecodable rows keep NULL hashes, no shuffle") {
    val media = Seq(
      Multimodal.Media(1L, "image",
        PerceptualHash.renderGrayImage(16, 16, 3, 1, 2, 0, 0, "png")),
      Multimodal.Media(2L, "image", "not an image".getBytes("UTF-8")),
      Multimodal.Media(3L, "audio", Array[Byte](1, 2, 3)),
      Multimodal.Media(4L, "image", null)).toDS()
    val out = PerceptualHash.perceptualHashes(media)
      .orderBy("media_id")
      .select(col("media_id"), col("ahash").isNull, col("dhash").isNull)
      .as[(Long, Boolean, Boolean)].collect()
    out shouldBe Array((1L, false, false), (2L, true, true),
      (4L, true, true))
    PerceptualHash.perceptualHashes(media)
      .queryExecution.executedPlan.toString should not include "Exchange"
  }

  test("nearDupsByHash: min-id election, Hamming cutoff, NULL exclusion, bucket cap") {
    // hand hashes: 10 ≡ 11 (distance 0), 12 at distance 2 from both,
    // 13 at distance 9 from 10 but sharing bands (one flipped bit in
    // three of the four bands... keep it simple: far), 14 NULL
    val h10 = 0x0123456789abcdefL
    val h12 = h10 ^ 0x0000000000000003L // 2 low bits
    val far = h10 ^ 0x0101010101010101L // 8 bits, one per byte
    val hashes = Seq((10L, Some(h10)), (11L, Some(h10)),
      (12L, Some(h12)), (13L, Some(far)), (14L, None))
      .toDF("id", "h")
    val out = PerceptualHash.nearDupsByHash(hashes, "id", "h", maxDist = 3)
      .orderBy("dup_id")
      .as[(Long, Long, Int)].collect()
    // 11 dups 10 at 0; 12 dups 10 at 2; 13 within bands of 10/11/12?
    // far flips one bit in EVERY 16-bit band → no identical band → no
    // candidate; 14 never matches
    out shouldBe Array((11L, 10L, 0), (12L, 10L, 2))
    // bucket cap: three identical hashes with maxBucket = 2 → every
    // band bucket holds 3 > 2 entries → no pairs at all
    val trio = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("id", "h")
    PerceptualHash.nearDupsByHash(trio, "id", "h", maxDist = 3,
      maxBucket = 2).count() shouldBe 0L
    PerceptualHash.nearDupsByHash(trio, "id", "h", maxDist = 3,
      maxBucket = 3).count() shouldBe 2L
  }

  test("re-encoded copies: PNG and BMP of the same pixels share no bytes but collapse at Hamming 0") {
    val png = PerceptualHash.renderGrayImage(16, 16, 11, 3, 5, 1, 0, "png")
    val bmp = PerceptualHash.renderGrayImage(16, 16, 11, 3, 5, 1, 0, "bmp")
    java.util.Arrays.equals(png, bmp) shouldBe false
    // byte dedup (md5) sees two objects; the perceptual hash sees one
    val media = Seq(Multimodal.Media(1L, "image", png),
      Multimodal.Media(2L, "image", bmp)).toDS()
    Multimodal.dedupePayloads(media).count() shouldBe 2L
    val dups = PerceptualHash.nearDupsByHash(
      PerceptualHash.perceptualHashes(media), "media_id", "ahash")
      .as[(Long, Long, Int)].collect()
    dups shouldBe Array((2L, 1L, 0))
  }

  test("imageQualityGate: undecodable rejects, boundaries are inclusive, non-images not judged") {
    def img(w: Int, h: Int) =
      PerceptualHash.renderGrayImage(w, h, 7, 3, 5, 1, 0, "png")
    val media = Seq(
      Multimodal.Media(1L, "image", img(64, 64)),   // square, large: keep
      Multimodal.Media(2L, "image", img(64, 63)),   // one px under: drop
      Multimodal.Media(3L, "image", img(64, 192)),  // aspect exactly 3: keep
      Multimodal.Media(4L, "image", img(64, 193)),  // aspect over 3: drop
      Multimodal.Media(5L, "image", "junk".getBytes("UTF-8")), // undecodable
      Multimodal.Media(6L, "audio", Array[Byte](1, 2, 3))      // not judged
    ).toDS()
    val out = Multimodal.imageQualityGate(media, minSide = 64, maxAspect = 3)
      .orderBy("media_id")
      .select("media_id", "width", "height", "keep")
      .as[(Long, Int, Int, Boolean)].collect()
    out shouldBe Array((1L, 64, 64, true), (2L, 64, 63, false),
      (3L, 64, 192, true), (4L, 64, 193, false), (5L, 0, 0, false))
  }

  test("dropAllDuplicateImageDocs: all-losing docs drop; keeper owners and media-less docs survive") {
    val docs = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    // doc 1 owns originals of both pools; doc 2's images are ALL
    // losing copies of doc 1's → drops; doc 3 has one losing copy but
    // one unique image → survives; doc 4 has no media rows → kept
    val media = Seq(
      (10L, 1L, "A"), (11L, 1L, "B"),
      (20L, 2L, "A"), (21L, 2L, "B"),
      (30L, 3L, "A"), (31L, 3L, "C")).toDF("media_id", "doc_id", "p")
      .withColumn("payload", encode(col("p"), "UTF-8"))
    val kept = Multimodal.dropAllDuplicateImageDocs(docs, "doc_id",
        media, "media_id", "doc_id", "payload")
      .orderBy("doc_id").as[Long].collect()
    kept shouldBe Array(1L, 3L, 4L)
    // NULL payloads are NOT evidence: two docs whose only images are
    // failed fetches must BOTH be kept (they are media-less for the
    // gate's purposes), never pooled into one fake duplicate group
    val nullMedia = Seq((40L, 1L), (50L, 2L))
      .toDF("media_id", "doc_id")
      .withColumn("payload", lit(null).cast("binary"))
    Multimodal.dropAllDuplicateImageDocs(
        Seq(1L, 2L).toDF("doc_id"), "doc_id",
        nullMedia, "media_id", "doc_id", "payload")
      .orderBy("doc_id").as[Long].collect() shouldBe Array(1L, 2L)
  }

  test("media kernels under readStream: streamed hashes/gate ≡ batch (stateless narrow ops)") {
    // the crawl-to-media story streams like the text one: hashing and
    // the quality gate are stateless per-row kernels, so the SAME code
    // path serves batch backfill and live ingest — row for row
    import java.nio.file.Files
    val dir = Files.createTempDirectory("graft_media_stream")
    val media = Seq(
      Multimodal.Media(1L, "image",
        PerceptualHash.renderGrayImage(64, 64, 3, 1, 2, 0, 0, "png")),
      Multimodal.Media(2L, "image",
        PerceptualHash.renderGrayImage(64, 64, 3, 1, 2, 0, 0, "bmp")),
      Multimodal.Media(3L, "image",
        PerceptualHash.renderGrayImage(16, 200, 5, 2, 1, 0, 0, "png")))
    media.toDS().write.parquet(dir.toString + "/in")
    val schema = media.toDS().schema
    val streamed = spark.readStream.schema(schema)
      .parquet(dir.toString + "/in").as[Multimodal.Media]
    val out = Multimodal.imageQualityGate(streamed, minSide = 32,
        maxAspect = 3)
      .join(PerceptualHash.perceptualHashes(streamed.filter(_.kind == "image"))
        .select(col("media_id"), col("ahash")), Seq("media_id"))
    val q = out.writeStream.format("memory").queryName("media_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_media").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val live = spark.table("media_stream")
      .select("media_id", "keep", "ahash")
      .as[(Long, Boolean, Long)].collect().sortBy(_._1)
    val batch = Multimodal.imageQualityGate(media.toDS(), minSide = 32,
        maxAspect = 3)
      .join(PerceptualHash.perceptualHashes(media.toDS()),
        Seq("media_id"))
      .select("media_id", "keep", "ahash")
      .as[(Long, Boolean, Long)].collect().sortBy(_._1)
    live shouldBe batch
    live.map(r => (r._1, r._2)) shouldBe
      Array((1L, true), (2L, true), (3L, false)) // sliver drops
    live(0)._3 shouldBe live(1)._3 // PNG ≡ BMP hash, streamed
  }

  test("video and audio kernels under readStream: streamed frame/envelope hashes ≡ batch") {
    // the r12 kernels inherit the media-streaming story: the container
    // walk + per-frame decode (video) and the RIFF parse + envelope
    // hash (audio) are stateless narrow mapPartitions, so live ingest
    // and batch backfill share one code path row for row
    import java.nio.file.Files
    def frame(f: Int) = PerceptualHash.renderGrayImage(16, 16, 9 * 7,
      (9 + f) % 5 + 1, (9 + 2 * f) % 11 + 1, (9 + f) % 3, 0, "png")
    val wav = AudioWave.writeWav(
      Array.tabulate(1024)(t => ((13 + 3 * t) % 64 - 32) * 256), 16000, 16)
    val media = Seq(
      Multimodal.Media(1L, "video",
        Multimodal.packImageFrames((0 to 3).map(frame))),
      Multimodal.Media(2L, "audio", wav),
      Multimodal.Media(3L, "audio", "not audio".getBytes))
    val dir = Files.createTempDirectory("graft_av_stream")
    media.toDS().write.parquet(dir.toString + "/in")
    val streamed = spark.readStream.schema(media.toDS().schema)
      .parquet(dir.toString + "/in").as[Multimodal.Media]
    val out = Multimodal.videoFrameHashes(streamed)
      .select(col("media_id"), col("frame_idx").cast("long").as("k"),
        col("ahash").as("h"))
      .unionByName(AudioWave.audioHashes(streamed)
        .select(col("media_id"), lit(-1L).as("k"), col("ehash").as("h")))
    val q = out.writeStream.format("memory").queryName("av_stream")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_av").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val live = spark.table("av_stream")
      .as[(Long, Long, Option[Long])].collect().sortBy(r => (r._1, r._2))
    val batch = (Multimodal.videoFrameHashes(media.toDS())
        .select(col("media_id"), col("frame_idx").cast("long").as("k"),
          col("ahash").as("h"))
        .unionByName(AudioWave.audioHashes(media.toDS())
          .select(col("media_id"), lit(-1L).as("k"), col("ehash").as("h"))))
      .as[(Long, Long, Option[Long])].collect().sortBy(r => (r._1, r._2))
    live shouldBe batch
    live.count(_._1 == 1L) shouldBe 4 // all four frames, streamed
    live.find(_._1 == 3L).get._3 shouldBe None // unparseable stays NULL
  }

  test("dual-hash near-dup: rescues the letterbox pair single-hash banding misses AND rejects its false positive") {
    // letterboxed fixture (renderLetterboxImage16): ids 1/2 are the
    // SAME pattern (gid 4) base + full-row-bump retouch — aHash flips
    // one bit in EACH pattern band (Hamming 3) while dHash flips none,
    // so the pair's only intact aHash band is the degenerate letterbox
    // band 0 that every image shares; id 3 is a DIFFERENT pattern
    // (gid 37) whose brightness layout coincides with id 2 at aHash
    // Hamming 3 but whose gradient structure differs at dHash 5;
    // ids 10-13 are filler patterns that push the degenerate band-0
    // bucket past the cap (7 members > maxBucket 4)
    val media = Seq((1L, 4L, 0L), (2L, 4L, 20L), (3L, 37L, 0L),
        (10L, 10L, 0L), (11L, 20L, 0L), (12L, 30L, 0L), (13L, 33L, 0L))
      .toDF("media_id", "gid", "bump")
      .select(col("media_id"), lit("image").as("kind"),
        PerceptualHash.renderLetterboxImage16(col("gid") * 7,
          col("gid") % 5 + 1, col("gid") % 11 + 1, col("gid") % 3,
          col("bump"), lit("png")).as("payload"))
      .as[Multimodal.Media]
    val hashes = PerceptualHash.perceptualHashes(media).cache()
    // single-hash banding: the true pair (2, 1) is INVISIBLE (its only
    // intact band is the over-cap degenerate one) and the cross-pattern
    // coincidence (3, 2) CONFIRMS — the wrong answer on both counts
    val single = PerceptualHash.nearDupsByHash(hashes, "media_id",
        "ahash", maxDist = 3, maxBucket = 4)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    single shouldBe Array((3L, 2L, 3))
    // dual-hash: the true pair surfaces through its gid-specific dHash
    // bands (total Hamming 3+0), the coincidence fails the summed
    // confirmation (3+5 > 6)
    val dual = PerceptualHash.nearDupsByDualHash(hashes, "media_id",
        "ahash", "dhash", maxDist = 6, maxBucket = 4)
      .as[(Long, Long, Int)].collect().sortBy(_._1)
    dual shouldBe Array((2L, 1L, 3))
    hashes.unpersist()
  }

  test("non-image bytes NEVER image-hash: the magic sniff closes the WBMP false-decode hazard") {
    // the JDK's WBMP reader has NO magic — ImageIO.read accepts any
    // stream starting 00 00 + plausible dimension varints, so a
    // length-prefixed frame container (4-byte big-endian length of a
    // ~300-byte PNG = 00 00 01 xx) "decodes" as a 1×len garbage
    // bitmap. Two unrelated containers of similar length then hash
    // NEAR each other and the perceptual election drops innocent
    // docs. Pin: containers and WAVs hash NULL; real formats pass.
    val png = PerceptualHash.renderGrayImage(16, 16, 7, 2, 3, 0, 0, "png")
    // a RAW length-prefixed blob (the magic-less pre-GFV1 container
    // framing — any [00 00 len len][data] structure on a real crawl)
    val len = png.length
    val container = Array[Byte](((len >>> 24) & 0xff).toByte,
      ((len >>> 16) & 0xff).toByte, ((len >>> 8) & 0xff).toByte,
      (len & 0xff).toByte) ++ png
    javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(container)) should not be null // the hazard is real
    PerceptualHash.aHash64(container) shouldBe None                   // and closed
    // the GFV1 container is equally un-image-hashable
    PerceptualHash.aHash64(
      Multimodal.packImageFrames(Seq(png))) shouldBe None
    PerceptualHash.aHash64(
      AudioWave.writeWav(Array.fill(64)(256), 16000, 16)) shouldBe None
    PerceptualHash.aHash64(png) should not be None
    PerceptualHash.aHash64(
      PerceptualHash.renderGrayImage(16, 16, 7, 2, 3, 0, 0, "bmp")) should not be None
    // realImageMeta shares the sniff: no garbage 1×N metadata rows
    Multimodal.realImageMeta(container) shouldBe None
  }

  test("nearDupsByHash rejects non-integral id/hash columns loudly") {
    val bad = Seq(("m-1", 5L)).toDF("id", "h")
    an[IllegalArgumentException] should be thrownBy
      PerceptualHash.nearDupsByHash(bad, "id", "h")
    val bad2 = Seq((1L, "0xff")).toDF("id", "h")
    an[IllegalArgumentException] should be thrownBy
      PerceptualHash.nearDupsByHash(bad2, "id", "h")
  }
}
