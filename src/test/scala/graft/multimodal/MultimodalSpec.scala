package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val media = Multimodal.asMedia(Tables.documents(spark, sfDir))

  test("asMedia: binary payload + cycling kind, schema as declared") {
    val df = media.toDF()
    df.schema("payload").dataType.typeName shouldBe "binary"
    rows(df.select("kind").distinct()).map(_.getString(0)).toSet shouldBe
      Set("image", "audio", "video")
    media.count() shouldBe 500
  }

  test("decodeAll: typed metadata per kind, deterministic across runs") {
    val a = rows(Multimodal.decodeAll(media).toDF()
      .select("media_id", "meta.format", "meta.width", "meta.sample_rate")
      .orderBy("media_id"))
    val b = rows(Multimodal.decodeAll(media).toDF()
      .select("media_id", "meta.format", "meta.width", "meta.sample_rate")
      .orderBy("media_id"))
    a shouldBe b
    val byKind = rows(Multimodal.decodeAll(media).toDF()
      .groupBy("kind").agg(
        countDistinct(col("meta.format")).as("formats"),
        max(col("meta.width")).as("maxw")))
    byKind.foreach { r =>
      r.getLong(1) shouldBe 1L  // one stub format per kind
    }
  }

  test("decoder session opens once per partition, not per row") {
    DecoderSession.opened.set(0)
    val parts = 3
    Multimodal.decodeAll(media.repartition(parts)).count()
    val opened = DecoderSession.opened.get()
    assert(opened == parts, s"expected $parts decoder inits, got $opened")
  }

  test("extractFeatures: fixed dim, payload dropped, deterministic") {
    val f = Multimodal.extractFeatures(media, dim = 16)
    f.columns.toSeq shouldBe Seq("media_id", "kind", "features")
    val lens = rows(f.toDF().select(sql.functions.size(col("features"))).distinct())
    lens.map(_.getInt(0)) shouldBe Seq(16)
    val x = rows(f.toDF().select("media_id", "features").orderBy("media_id").limit(5))
    val y = rows(Multimodal.extractFeatures(media, dim = 16)
      .toDF().select("media_id", "features").orderBy("media_id").limit(5))
    x.map(_.toString) shouldBe y.map(_.toString)
  }

  test("extracted features feed the similarity operators (plumbing composes)") {
    val f = Multimodal.extractFeatures(media, dim = 16).toDF()
      .withColumnRenamed("media_id", "vec_id")
      .withColumnRenamed("features", "embedding")
    val knn = graft.operators.Similarity.bruteForceTopK(
      f.limit(50), f.limit(50), "vec_id", "embedding", 2)
    knn.count() shouldBe 100 // 50 queries × k=2
  }

  test("sampleFrames: only video rows, stride-sampled chunk indices") {
    val frames = Multimodal.sampleFrames(media, frameBytes = 64, stride = 4)
    val kinds = frames.toDF().join(media.toDF().select(col("media_id"), col("kind")),
      "media_id").select("kind").distinct()
    rows(kinds).map(_.getString(0)) shouldBe Seq("video")
    val idxs = rows(frames.toDF().select("frame_idx").distinct()
      .orderBy("frame_idx").limit(3)).map(_.getInt(0))
    idxs shouldBe idxs.map(i => i - i % 4) // all indices are stride multiples
    // every frame is a non-empty chunk of at most frameBytes (the last
    // chunk of a payload — which can be frame 0 on short payloads — may
    // be shorter)
    val badLens = frames.filter(f =>
      f.frame_bytes.length == 0 || f.frame_bytes.length > 64).count()
    badLens shouldBe 0
  }

  test("metadataTable: flat catalog columns with byte lengths") {
    val t = Multimodal.metadataTable(media)
    t.columns.toSeq shouldBe Seq("media_id", "kind", "format", "width",
      "height", "n_frames", "sample_rate", "channels", "n_bytes")
    rows(t.filter(col("n_bytes") <= 0)) shouldBe empty
  }

  test("resizeImages: images fit the box aspect-preserved, others untouched") {
    val decoded = Multimodal.decodeAll(media).collect()
      .map(d => d.media_id -> d).toMap
    val resized = Multimodal.resizeImages(media, maxW = 64, maxH = 64).collect()
    resized.foreach { r =>
      val orig = decoded(r.media_id)
      if (r.kind != "image") {
        r.meta shouldBe orig.meta
        r.payload shouldBe orig.payload
      } else {
        r.meta.width should be <= 64
        r.meta.height should be <= 64
        // aspect preserved within integer-floor rounding: w/h ratio
        // cannot invert
        (r.meta.width <= r.meta.height) shouldBe
          (orig.meta.width <= orig.meta.height)
        // payload shrinks with the pixel count, never grows, never empty
        r.payload.length should be <= orig.payload.length
        r.payload.length should be >= 1
      }
    }
    // deterministic across runs
    val again = Multimodal.resizeImages(media, maxW = 64, maxH = 64).collect()
    resized.map(r => (r.media_id, r.meta, r.payload.length)).sortBy(_._1) shouldBe
      again.map(r => (r.media_id, r.meta, r.payload.length)).sortBy(_._1)
  }

  test("decode → embed → quantized ANN composes end-to-end over media") {
    // the full multimodal retrieval shape: binary payloads become
    // embedding columns (per-partition decoder session), which feed the
    // same quantized top-k the text/embedding family uses — the plumbing
    // a real image-dedup / similar-media search runs, with only the
    // decoder stubbed
    import org.apache.spark.sql.functions._
    val media = Multimodal.asMedia(
      graft.Tables.documents(spark, sfDir).limit(64))
    val feats = Multimodal.extractFeatures(media, dim = 8)
      .toDF().select(col("media_id"), col("features"))
    val hits = graft.operators.Similarity.quantizedTopK(
      feats, "media_id", "features", k = 3)
    val byQuery = hits.groupBy("q_id").count().collect()
    byQuery.length shouldBe 64
    byQuery.foreach(_.getLong(1) shouldBe 3L)
    // self-retrieval sanity: embeddings are deterministic per payload,
    // so reruns return the identical hit set
    val again = graft.operators.Similarity.quantizedTopK(
      Multimodal.extractFeatures(media, dim = 8)
        .toDF().select(col("media_id"), col("features")),
      "media_id", "features", k = 3)
    hits.exceptAll(again).count() shouldBe 0L
  }

  test("dedupePayloads: byte-identical media collapse to the min-id copy, kind-agnostic") {
    import spark.implicits._
    // ids 1 and 4 carry identical BYTES under different kinds; 2 is a
    // second copy of the same text under the SAME kind as 1; 3 unique
    val m = Multimodal.asMedia(Seq(
      (1L, "same payload"), (2L, "other text"), (3L, "unique here"),
      (4L, "same payload"), (7L, "same payload"))
      .toDF("doc_id", "text"))
    val out = rows(Multimodal.dedupePayloads(m).orderBy("keep_id"))
      .map(r => (r.getLong(0), r.getLong(2), r.getSeq[Long](3)))
    out shouldBe Seq(
      (1L, 3L, Seq(1L, 4L, 7L)),
      (2L, 1L, Seq(2L)),
      (3L, 1L, Seq(3L)))
    // compositional near-dup subsumes these groups: identical payloads
    // embed identically, so the feature-space pass groups them too
    val feats = Multimodal.extractFeatures(m).toDF()
      .select(col("media_id").as("vec_id"), col("features").as("embedding"))
    val kept = graft.operators.Similarity
      .semanticDedupe(feats, "vec_id", "embedding", nCells = 1,
        threshold = 0.9999)
      .collect().map(_.getLong(0)).toSet
    kept shouldBe Set(1L, 2L, 3L)
  }

  // ---- the REAL image kernel -----------------------------------------

  /** Encode a tiny image in-memory with the JDK's own writers, so the
    * test is a true round-trip: ImageIO wrote it, our kernel reads it. */
  private def imageBytes(w: Int, h: Int, imgType: Int, fmt: String): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, imgType)
    (0 until w).foreach(x => (0 until h).foreach(y =>
      img.setRGB(x, y, (x * 31 + y * 17) & 0xffffff)))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, fmt, out)
    out.toByteArray
  }

  test("image kernel decodes REAL PNG/JPEG headers: exact dims, format, channels") {
    import spark.implicits._
    val payloads = Seq(
      (1L, "image", imageBytes(7, 5,
        java.awt.image.BufferedImage.TYPE_INT_RGB, "png")),
      (2L, "image", imageBytes(3, 4,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY, "png")),
      (3L, "image", imageBytes(16, 9,
        java.awt.image.BufferedImage.TYPE_INT_RGB, "jpg")),
      // not an image: must fall back to the deterministic stub
      (4L, "image", "just some text bytes".getBytes("UTF-8")))
      .toDF("media_id", "kind", "payload").as[Multimodal.Media]
    val metas = Multimodal.decodeAll(payloads).collect()
      .map(d => d.media_id -> d.meta).toMap
    metas(1L) shouldBe Multimodal.MediaMeta("png", 7, 5, 1, 0, 3)
    metas(2L) shouldBe Multimodal.MediaMeta("png", 3, 4, 1, 0, 1)
    metas(3L).format shouldBe "jpeg"
    metas(3L).width shouldBe 16
    metas(3L).height shouldBe 9
    metas(3L).channels shouldBe 3
    metas(4L) shouldBe Multimodal.stubDecode("image",
      "just some text bytes".getBytes("UTF-8"))
  }

  test("real image decode survives the full metadataTable path") {
    import spark.implicits._
    val m = Seq((10L, "image", imageBytes(32, 8,
      java.awt.image.BufferedImage.TYPE_INT_RGB, "png")))
      .toDF("media_id", "kind", "payload").as[Multimodal.Media]
    val row = Multimodal.metadataTable(m).collect().head
    row.getString(2) shouldBe "png"    // format
    row.getInt(3) shouldBe 32          // width
    row.getInt(4) shouldBe 8           // height
    row.getInt(7) shouldBe 3           // channels
  }

  test("truncated image bytes fall back to the stub instead of failing the task") {
    import spark.implicits._
    val full = imageBytes(20, 20, java.awt.image.BufferedImage.TYPE_INT_RGB, "png")
    val truncated = java.util.Arrays.copyOf(full, 12) // magic intact, header cut
    val m = Seq((11L, "image", truncated))
      .toDF("media_id", "kind", "payload").as[Multimodal.Media]
    val meta = Multimodal.decodeAll(m).collect().head.meta
    meta shouldBe Multimodal.stubDecode("image", truncated)
  }

  test("decodeAll: real WAV audio payloads carry REAL header metadata; text payloads keep the stub") {
    import spark.implicits._
    val wav = AudioWave.writeWav(
      Array.tabulate(500)(t => (t % 64 - 32) * 256), 22050, bits = 16,
      channels = 1)
    val rows = Multimodal.decodeAll(Seq(
        Multimodal.Media(1L, "audio", wav),
        Multimodal.Media(2L, "audio", "plain prose".getBytes))
      .toDS()).collect().sortBy(_.media_id)
    rows(0).meta shouldBe Multimodal.MediaMeta("wav", 0, 0, 500, 22050, 1)
    rows(1).meta shouldBe Multimodal.stubDecode("audio",
      "plain prose".getBytes) // non-WAV bytes keep the stub path
  }

  test("packImageFrames/splitImageFrames round-trip; corrupt tail keeps the good prefix") {
    val f1 = Array[Byte](1, 2, 3)
    val f2 = Array[Byte](4, 5)
    val packed = Multimodal.packImageFrames(Seq(f1, f2))
    val back = Multimodal.splitImageFrames(packed)
    back.map(_.toSeq) shouldBe Seq(f1.toSeq, f2.toSeq)
    // a corrupt third length (declared past end-of-data) drops only
    // the tail; a negative length likewise
    val corrupt = packed ++ Array[Byte](0, 0, 0, 99, 7)
    Multimodal.splitImageFrames(corrupt).map(_.toSeq) shouldBe
      Seq(f1.toSeq, f2.toSeq)
    Multimodal.splitImageFrames(Array[Byte](-1, 0, 0, 1, 7)) shouldBe empty
    Multimodal.splitImageFrames(null) shouldBe empty
    // adversarial declared length near 2³¹: the bounds compare must
    // not wrap Int (that threw IllegalArgumentException out of the
    // fail-soft walk); the good prefix before it still survives
    val evil = packed ++ Array[Byte](0x7F, -1, -1, -1) ++ Array[Byte](7)
    Multimodal.splitImageFrames(evil).map(_.toSeq) shouldBe
      Seq(f1.toSeq, f2.toSeq)
    // back-compat: a MAGIC-LESS container (the pre-GFV1 framing)
    // still walks from byte 0 — the magic read as a length would
    // declare a ~1.2 GB frame, so the two framings can't be confused
    Multimodal.splitImageFrames(packed.drop(4)).map(_.toSeq) shouldBe
      Seq(f1.toSeq, f2.toSeq)
    // and the magic routes the sniffer: containers are 'video' to a
    // binaryFile-fed gate, never 'bin'
    Multimodal.sniffKind(packed) shouldBe "video"
    Multimodal.sniffKind(packed.drop(4)) shouldBe "bin"
  }

  test("sniffKind routes RIFF by FORM tag: WAVE→audio, AVI→video, WEBP→image, unknown forms→bin") {
    def riff(form: String): Array[Byte] =
      "RIFF".getBytes("ISO-8859-1") ++ Array[Byte](16, 0, 0, 0) ++
        form.getBytes("ISO-8859-1") ++ new Array[Byte](8)
    Multimodal.sniffKind(riff("WAVE")) shouldBe "audio"
    Multimodal.sniffKind(riff("AVI ")) shouldBe "video"
    Multimodal.sniffKind(riff("WEBP")) shouldBe "image"
    // an unknown RIFF form must never be guessed into a kind
    Multimodal.sniffKind(riff("ACON")) shouldBe "bin"
    // a truncated RIFF header (no form tag yet) is bin, not a crash
    Multimodal.sniffKind("RIFF".getBytes("ISO-8859-1")) shouldBe "bin"
    // the shipped decoders aren't present for WEBP/AVI: the perceptual
    // kernels must fail-soft to NULL hashes (keep-the-unparseable),
    // never throw — routing is correct even where decoding is absent
    import spark.implicits._
    val m = Seq((1L, "image", riff("WEBP")), (2L, "video", riff("AVI ")))
      .toDF("media_id", "kind", "payload").as[Multimodal.Media]
    val ph = PerceptualHash.perceptualHashes(m)
      .select("ahash").as[Option[Long]].collect()
    ph shouldBe Array(None) // image leg sees only media_id 1, no hash
    Multimodal.videoFrameAHashes(m, stride = 1).count() shouldBe 0L
  }

  test("dropAllDuplicateMediaDocs: one gate over image+audio+video evidence; re-encodes of every kind drop") {
    import spark.implicits._
    def frame(g: Long, f: Int) = PerceptualHash.renderGrayImage(16, 16,
      g * 7, (g + f) % 5 + 1, (g + 2 * f) % 11 + 1, (g + f) % 3, 0, "png")
    def img(fmt: String) = PerceptualHash.renderLetterboxImage16(
      lit(4L * 7), lit(4L % 5 + 1), lit(4L % 11 + 1), lit(4L % 3),
      lit(0L), lit(fmt))
    val wav16 = AudioWave.writeWav(
      Array.tabulate(1024)(t => ((13 + 7 * t) % 64 - 32) * 256), 16000, 16)
    val wav8 = AudioWave.writeWav(
      Array.tabulate(1024)(t => ((13 + 7 * t) % 64 - 32) * 256), 16000, 8)
    val docs = (1L to 8L).toDF("doc_id")
    val media = Seq(
      (1L, "image"), (2L, "image"),   // PNG original / BMP re-encode
      (3L, "audio"), (4L, "audio"),   // 16-bit original / 8-bit re-master
      (5L, "video"), (6L, "video"),   // full / trimmed
      (7L, "image"),                  // NULL payload (failed fetch)
      (8L, "video"))                  // unrelated pattern family
      .toDF("media_id", "kind")
      .withColumn("doc_id", col("media_id"))
      .withColumn("payload",
        when(col("media_id") === 1, img("png"))
          .when(col("media_id") === 2, img("bmp"))
          .when(col("media_id") === 3, lit(wav16))
          .when(col("media_id") === 4, lit(wav8))
          .when(col("media_id") === 5,
            lit(Multimodal.packImageFrames((0 to 5).map(frame(9, _)))))
          .when(col("media_id") === 6,
            lit(Multimodal.packImageFrames((1 to 5).map(frame(9, _)))))
          .when(col("media_id") === 8,
            lit(Multimodal.packImageFrames((0 to 5).map(frame(23, _)))))
          .otherwise(lit(null).cast("binary")))
    val kept = Multimodal.dropAllDuplicateMediaDocs(docs, "doc_id",
        media, "media_id", "doc_id", "kind", "payload")
      .as[Long].collect().sorted
    // every re-encode class drops behind its kind's election; the
    // NULL-payload doc and the unrelated video survive
    kept shouldBe Array(1L, 3L, 5L, 7L, 8L)

    // enabledKinds prunes whole perceptual legs from the PLAN (each
    // leg is an opaque typed filter Catalyst cannot prune, so an
    // empty-by-construction leg would still deserialize-scan the
    // corpus): the image-pinned wrapper's plan carries NO audio
    // envelope column, NO video frame column, and strictly fewer
    // MapPartitions decode passes than the three-leg gate. The
    // ANALYZED plan is asserted: the optimizer collapses the toDF
    // renames (erasing the marker column names) and duplicates pushed
    // filters (making node counts report plan-printing artifacts)
    def plan(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.analyzed.toString
    val full = Multimodal.dropAllDuplicateMediaDocs(docs, "doc_id",
      media, "media_id", "doc_id", "kind", "payload")
    val imageOnly = Multimodal.dropAllDuplicateImageDocsPerceptual(
      docs, "doc_id", media, "media_id", "doc_id", "payload")
    plan(full) should include ("ehash")       // audio leg present
    plan(full) should include ("frame_idx")   // video leg present
    plan(imageOnly) should not include "ehash"
    plan(imageOnly) should not include "frame_idx"
    "MapPartitions".r.findAllIn(plan(imageOnly)).size should be <
      "MapPartitions".r.findAllIn(plan(full)).size
    // the image-only gate's verdict matches the unified gate run on
    // the same rows under a constant 'image' kind: audio/video
    // payloads are undecodable as images (NULL hashes, all original)
    imageOnly.as[Long].collect().sorted shouldBe
      Array(1L, 3L, 4L, 5L, 6L, 7L, 8L)
    // all legs disabled = byte election alone (exact dups still
    // collapse; everything byte-unique here, so everything passes)
    Multimodal.dropAllDuplicateMediaDocs(docs, "doc_id", media,
        "media_id", "doc_id", "kind", "payload",
        enabledKinds = Set.empty)
      .as[Long].collect().sorted shouldBe (1L to 8L).toArray
    // a typo'd kind fails loudly instead of silently disabling a leg
    an[IllegalArgumentException] should be thrownBy
      Multimodal.dropAllDuplicateMediaDocs(docs, "doc_id", media,
        "media_id", "doc_id", "kind", "payload",
        enabledKinds = Set("images"))
  }

  test("videoNearDups: re-encoded and trimmed copies collapse on the original; unrelated videos survive") {
    import spark.implicits._
    def frame(gid: Long, f: Int, fmt: String, bump: Long = 0L) =
      PerceptualHash.renderGrayImage(16, 16, gid * 7, (gid + f) % 5 + 1,
        (gid + 2 * f) % 11 + 1, (gid + f) % 3, bump, fmt)
    def video(gid: Long, fmt: String, frames: Range) =
      Multimodal.packImageFrames(frames.map(f => frame(gid, f, fmt)))
    val fixtures = Seq(
      // 1 = original; 2 = BMP re-encode (zero shared bytes per frame);
      // 3 = trimmed (first frame dropped, indices shift); 4 = a
      // different pattern family entirely
      Multimodal.Media(1L, "video", video(9L, "png", 0 to 5)),
      Multimodal.Media(2L, "video", video(9L, "bmp", 0 to 5)),
      Multimodal.Media(3L, "video", video(9L, "png", 1 to 5)),
      Multimodal.Media(4L, "video", video(33L, "png", 0 to 5)),
      // and a non-video row the walk must ignore
      Multimodal.Media(5L, "image", frame(9L, 0, "png")))
    val out = Multimodal.videoNearDups(fixtures.toDS(), stride = 1,
        maxDist = 3, maxBucket = 64, minOverlapBp = 6000)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // 2 matches 1 on all six frames; 3 matches 1 on all five of ITS
    // frames (the overlap floor is over the dup's own frame count —
    // trimming does not dilute it); 4 pairs with nothing
    out.map(r => (r._1, r._2)) shouldBe Array((2L, 1L), (3L, 1L))
    out.find(_._1 == 2L).get._3 shouldBe 6L
    out.find(_._1 == 3L).get._3 shouldBe 5L
    out.find(_._1 == 3L).get._4 shouldBe 5L
  }
}
