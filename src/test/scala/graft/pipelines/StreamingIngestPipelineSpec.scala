package graft.pipelines

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingIngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("streaming ingest: gate, in-stream content dedup, and index dedup compose") {
    implicit val ctx = spark.sqlContext
    val decent = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank"
    // historical index holds one known doc's fingerprint
    val indexDir = Files.createTempDirectory("ingest_index").toString
    Seq(s"$decent already ingested")
      .toDF("text")
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
      .write.mode("overwrite").parquet(indexDir)
    val corpusIndex = spark.read.parquet(indexDir)

    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingIngestPipeline
      .run(docs, corpusIndex, "ts", "text", minQuality = 0.3)
      .writeStream.format("memory").queryName("stream_ingest")
      .outputMode("append").start()
    try {
      in.addData(
        (ts(0), 1L, s"$decent fresh content"),         // survives
        (ts(1), 2L, s"$decent  FRESH   content"),      // in-stream dup of 1 (normalized)
        (ts(2), 3L, s"$decent already ingested"),      // in the index → dropped
        (ts(3), 4L, "a" * 30 + " " + "b" * 30),        // below quality floor
        (ts(4), 5L, s"$decent genuinely new text"))    // survives
      q.processAllAvailable()
      val out = spark.table("stream_ingest")
      out.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 5L)
      // audit columns from the gate are present on the sink rows
      out.columns should contain allOf ("quality", "n_pii")
    } finally q.stop()
  }

  test("near-dup gate: reworded re-crawls of index docs drop per batch; live ≡ backfill") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Decontaminate
    import graft.streaming.StreamOps
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank " +
      "while morning light spreads across the silent valley floor"
    // the historical corpus: one real doc (plus an unrelated one);
    // exact fingerprints cannot catch a REWORDED re-crawl of it
    val corpus = Seq(
      (100L, base),
      (101L, "completely different archival material about ancient trade " +
        "routes crossing the mountain passes in early winter snow"))
      .toDF("doc_id", "text")
    val index = Decontaminate.buildNearDupIndex(corpus, "doc_id", "text")
    try {
      // the fresh batch: a near-dup of index doc 100 (one word changed
      // → Jaccard ≫ 0.8), and a genuinely novel doc
      val nearDup = base.replace("distant", "nearby")
      val novel = "a brand new report on deep sea exploration vessels " +
        "mapping volcanic ridges under the southern ocean currents today"
      val in = MemoryStream[(Long, String)]
      val docs = in.toDF().toDF("doc_id", "text")
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = StreamOps.nearDupGateEachBatch(docs, index) { (b, _) =>
        got ++= b.select("doc_id").as[Long].collect()
      }.start()
      try {
        in.addData((1L, nearDup), (2L, novel))
        q.processAllAvailable()
      } finally q.stop()
      got.sorted.toSeq shouldBe Seq(2L)
      // live ≡ backfill: the batch decontaminator flags the same doc
      val backfill = Decontaminate.nearDupLeaksLsh(corpus,
          Seq((1L, nearDup), (2L, novel)).toDF("doc_id", "text"),
          "doc_id", "text")
        .select("eval_id").as[Long].collect().toSeq
      backfill shouldBe Seq(1L)
      // and the precomputed-index form is pairwise identical to the
      // from-scratch form on the same inputs
      val viaIndex = Decontaminate.nearDupLeaksAgainstIndex(index,
          Seq((1L, nearDup), (2L, novel)).toDF("doc_id", "text"),
          "doc_id", "text")
        .select("eval_id", "train_id").collect().map(r =>
          (r.getLong(0), r.getLong(1))).toSeq.sorted
      viaIndex shouldBe Seq((1L, 100L))
    } finally index.unpersist()
  }

  test("runWithNearDupGate: all four hygiene stages compose end-to-end") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Decontaminate
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank " +
      "while morning light spreads across the silent valley floor"
    val corpus = Seq((100L, s"$base already ingested")).toDF("doc_id", "text")
    val corpusIndex = corpus
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
    val index = Decontaminate.buildNearDupIndex(corpus, "doc_id", "text")
    try {
      val in = MemoryStream[(Timestamp, Long, String)]
      val docs = in.toDF().toDF("ts", "doc_id", "text")
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = StreamingIngestPipeline.runWithNearDupGate(
        docs, corpusIndex, index, "ts", "doc_id", "text") { (b, _) =>
        got ++= b.select("doc_id").as[Long].collect()
      }.start()
      try {
        in.addData(
          (ts(0), 1L, "a genuinely new survey of coastal weather stations " +
            "recording tide and wind measurements across the northern " +
            "islands during the long polar night"),         // survives
          (ts(1), 2L, s"$base already ingested"),           // exact index hit
          (ts(2), 3L, s"$base already  INGESTED"),          // fp-normalized dup of 2's content
          (ts(3), 4L, base.replace("distant", "nearby") +
            " already ingested"),                           // NEAR-dup of index doc → 3b drops
          (ts(4), 5L, "a" * 30 + " " + "b" * 30))           // quality floor
        q.processAllAvailable()
      } finally q.stop()
      got.sorted.toSeq shouldBe Seq(1L)
    } finally index.unpersist()
  }

  test("runWithNearDupGate + frozen quality model: all FIVE hygiene stages compose") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Decontaminate
    // frozen model trained offline (the QualityFilterSpec seed)
    val seed = ((1L to 20L).map(i =>
        (i, s"the committee published its annual report on policy $i outcomes", 1)) ++
      (21L to 40L).map(i =>
        (i, s"zzz qqq $i xx kk zz qq xk zx kq free free free click click", 0)))
      .toDF("doc_id", "text", "label")
    val model = graft.ml.QualityFilter.train(seed, "doc_id", "text", "label",
      dim = 256, maxIter = 20)
    val corpus = Seq((100L, "an unrelated already ingested page about rivers " +
      "and weather measured daily across many remote northern stations"))
      .toDF("doc_id", "text")
    val corpusIndex = corpus
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
    val index = Decontaminate.buildNearDupIndex(corpus, "doc_id", "text")
    try {
      val in = MemoryStream[(Timestamp, Long, String)]
      val docs = in.toDF().toDF("ts", "doc_id", "text")
      val got = scala.collection.mutable.ArrayBuffer.empty[Long]
      val q = StreamingIngestPipeline.runWithNearDupGate(
        docs, corpusIndex, index, "ts", "doc_id", "text",
        qualityModel = Some((model, 0.5))) { (b, _) =>
        got ++= b.select("doc_id").as[Long].collect()
      }.start()
      try {
        in.addData(
          (ts(0), 1L, "the committee published a careful report on local " +
            "policy outcomes and methods this year"),        // survives all gates
          (ts(1), 2L, "zz qq xx kk free free free click click zq xk here " +
            "today again"))                                  // model gate drops
        q.processAllAvailable()
      } finally q.stop()
      got.sorted.toSeq shouldBe Seq(1L)
    } finally index.unpersist()
  }

  test("soak: dedup state plateaus under the watermark across 100 micro-batches") {
    // The 100 TB streaming risk is unbounded state growth. Drive the
    // pipeline through 100 micro-batches of all-unique documents, event
    // time advancing one minute per batch with a 10-minute watermark:
    // dropDuplicatesWithinWatermark must evict fingerprints older than
    // the horizon, so state-store rows plateau near (horizon / batch
    // interval) instead of tracking the 100-doc cumulative input.
    implicit val ctx = spark.sqlContext
    val decent = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank"
    val emptyIndex = Seq.empty[String].toDF("text")
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))

    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
    val q = StreamingIngestPipeline
      .run(docs, emptyIndex, "ts", "text", minQuality = 0.3,
        lateness = "10 minutes")
      .writeStream.format("memory").queryName("soak_ingest")
      .outputMode("append").start()
    try {
      val stateRows = Array.newBuilder[Long]
      for (batch <- 0 until 100) {
        in.addData((new Timestamp(base + batch * 60000L), batch.toLong,
          s"$decent unique document number $batch"))
        q.processAllAvailable()
        val p = q.lastProgress
        if (p != null && p.stateOperators.nonEmpty)
          stateRows += p.stateOperators(0).numRowsTotal
      }
      val sizes = stateRows.result()
      assert(sizes.nonEmpty, "no state operator progress reported")
      // every batch's doc is unique and above the quality floor
      spark.table("soak_ingest").count() shouldBe 100
      // plateau: by batch 25 the watermark is deep into eviction; state
      // must never trend up afterwards (±2 slack for the eviction batch
      // boundary) and must sit far below the cumulative 100 inputs.
      // Retention per entry is ~2x the delay: the watermark lags max
      // event time by `lateness`, and the entry lives until the
      // watermark passes its own time + `lateness` — so at 1 batch/min
      // with a 10-minute delay the steady state is ~20 rows (measured:
      // exactly 20), NOT the 100 cumulative uniques.
      val early = sizes.slice(25, 45).max
      val late = sizes.takeRight(20).max
      assert(late <= early + 2,
        s"state grew across the soak: early max $early, late max $late")
      assert(late <= 25,
        s"state ($late rows) exceeds the ~20-row (2x watermark) horizon")
    } finally q.stop()
  }

  test("archive bytes to gated corpus, LIVE: WARC stream -> extraction -> ingest pipeline") {
    // the full crawl mouth composed with the streaming hygiene chain:
    // raw multi-record archive FILES arrive, toCrawlDocsTimed splits
    // them (event time = the archive's mtime), HtmlExtract pulls
    // prose, and StreamingIngestPipeline gates it — all one
    // continuous query, no batch step anywhere
    import graft.io.{BinaryFileSource, WarcRecords}
    val decent = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank"
    def rec(uri: String, html: String): Array[Byte] = {
      val p = html.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        p ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val dir = Files.createTempDirectory("warc_live")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir.toString, "c.warc"),
      rec("https://live.example/1",
        s"<html><body><p>$decent fresh page</p><script>junk()</script></body></html>") ++
        rec("https://live.example/2",                 // junk text: gated out
          "<html><body><p>" + "a" * 30 + " " + "b" * 30 + "</p></body></html>"))
    val emptyIndex = Seq.empty[String].toDF("text")
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
    val binSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val docsStream = WarcRecords.toCrawlDocsTimed(
      spark.readStream.format("binaryFile").schema(binSchema)
        .option("pathGlobFilter", "*.warc").load(dir.toString))
      .withColumn("__k", struct(col("doc_id"), col("url"), col("ts")))
    val extracted = graft.operators.HtmlExtract
      .extractText(docsStream, "__k", "html")
      .select(col("__k.doc_id").as("doc_id"), col("__k.url").as("url"),
        col("__k.ts").as("ts"), col("text"))
    val q = StreamingIngestPipeline
      .run(extracted, emptyIndex, "ts", "text", minQuality = 0.3)
      .writeStream.format("memory").queryName("warc_live_out")
      .outputMode("append")
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_warc_live").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("warc_live_out")
    out.count() shouldBe 1L
    val row = out.select("url", "text").as[(String, String)].collect().head
    row._1 shouldBe "https://live.example/1"
    // extraction really ran inside the stream: prose only
    row._2 should include ("fresh page")
    (row._2 should not).include("junk()")
    (row._2 should not).include("<p>")
    // the event time came from the archive file itself
    out.select("ts").collect().head.getTimestamp(0) should not be null
    // and the timed reader agrees with the untimed batch reader on
    // ids/urls/html for the same archive
    val timed = WarcRecords.toCrawlDocsTimed(
        BinaryFileSource(dir.toString, pathGlobFilter = Some("*.warc"))
          .read(spark))
      .select("doc_id", "url", "html").as[(Long, String, String)]
      .collect().sortBy(_._1)
    val untimed = WarcRecords.toCrawlDocs(
        BinaryFileSource(dir.toString, pathGlobFilter = Some("*.warc"))
          .read(spark))
      .select("doc_id", "url", "html").as[(Long, String, String)]
      .collect().sortBy(_._1)
    timed shouldBe untimed
  }

  test("runMediaIngest: on-disk media stream → kind sniff → incremental perceptual gate per micro-batch, survivors keep lineage columns") {
    import graft.multimodal.{AudioWave, MediaIndex, Multimodal, PerceptualHash}
    def img(gid: Long, fmt: String) =
      PerceptualHash.renderGrayImage(16, 16, gid * 7, gid % 5 + 1,
        gid % 11 + 1, gid % 3, 0, fmt)
    val samples = Array.tabulate(1024) { t =>
      val w = t / 16
      (t % 64 - 32) * (if ((w * w + 5 * w) % 97 < 32) 4 else 1) * 256
    }
    // HISTORY: the corpus already holds one image and one audio track
    val history = MediaIndex.mediaHashIndex(Seq(
      Multimodal.Media(100L, "image", img(4, "png")),
      Multimodal.Media(101L, "audio",
        AudioWave.writeWav(samples, 16000, 16))).toDS())
    // the live crawl delivers: a BMP re-encode of the known image, an
    // 8-bit re-master of the known track, and two fresh objects
    val dir = Files.createTempDirectory("media_live")
    def put(name: String, bytes: Array[Byte]): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(dir.toString, name), bytes); ()
    }
    put("known.bmp", img(4, "bmp"))
    put("remaster.wav", AudioWave.writeWav(samples, 16000, 8))
    put("fresh.png", img(21, "png"))
    // a WITHIN-batch byte copy of the fresh image: the batch-internal
    // election (intraBatchDups composed before the history judge)
    // must admit ONE survivor of the pair — the smaller media_id
    // (= xxhash64(path), so which file wins is hash order, not name)
    put("fresh_copy.png", img(21, "png"))
    // a genuinely different energy profile (NOT a negation — the
    // envelope hashes |s|, so -samples would collapse onto history)
    put("fresh.wav", AudioWave.writeWav(
      Array.tabulate(1024)(t => ((t * 31) % 64 - 32) *
        ((t / 16) % 3 + 1) * 256), 16000, 16))
    val binSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String, Long)]
    val deltas = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingIngestPipeline.runMediaIngestIndexed(
        spark.readStream.format("binaryFile").schema(binSchema)
          .load(dir.toString),
        () => history, maxBucket = 64) { (batch, delta, _) =>
        kept ++= batch.select("path", "kind", "media_id")
          .as[(String, String, Long)].collect()
          .map { case (p, k, m) => (p.split('/').last, k, m) }
        deltas ++= delta.select("media_id").as[Long].collect()
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_media_live").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    // the re-encode and the re-master drop against history; ONE of
    // the two fresh-image copies survives (batch-internal election);
    // the fresh track survives — with sniffed kinds + path lineage
    kept.count(_._2 == "audio") shouldBe 1
    kept.map(_._1) should contain ("fresh.wav")
    val freshImgs = kept.filter(_._2 == "image").map(_._1)
    freshImgs should have size 1
    Set("fresh.png", "fresh_copy.png") should contain (freshImgs.head)
    kept should have size 2
    // the sink also received the index DELTA: exactly one row per
    // survivor (what a production sink appends — no recompute)
    deltas.sorted.toSeq shouldBe kept.map(_._3).sorted.toSeq
  }

  test("runWithTextIndexGate: the persisted-index near-dup gate REMEMBERS across micro-batches (append delta → next batch sees it)") {
    implicit val ctx = spark.sqlContext
    import graft.operators.TextIndex
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank " +
      "while morning light spreads across the silent valley floor"
    // history corpus: one already-kept doc; its TextIndex relations
    // live on DISK (parquet) — the production state shape
    val dir = Files.createTempDirectory("graft_textgate")
    val (hb0, hs0) = TextIndex.buildIndex(
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text")
    hb0.write.parquet(s"$dir/bands"); hs0.write.parquet(s"$dir/sets")
    spark.catalog.clearCache()
    val emptyIndex = Seq.empty[String].toDF("text")
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
    // 32 tokens → 30 shingles: the one-word re-crawl below lands at
    // Jaccard 27/33 ≈ 0.818, above the 0.8 gate (3 shingles change
    // with one mid-text word)
    val novel = "a brand new report on deep sea exploration vessels " +
      "mapping volcanic ridges under the southern ocean currents today " +
      "with sonar sweeps charting the deepest trenches ever recorded " +
      "before the research vessel returns"
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val kept = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingIngestPipeline.runWithTextIndexGate(
        docs, emptyIndex,
        () => (spark.read.parquet(s"$dir/bands"),
          spark.read.parquet(s"$dir/sets")),
        "ts", "doc_id", "text") { (batch, delta, _) =>
        kept ++= batch.select("doc_id").as[Long].collect()
        // the production sink: append the replay-idempotent delta to
        // the index paths the textIndex function re-reads
        delta._1.write.mode("append").parquet(s"$dir/bands")
        delta._2.write.mode("append").parquet(s"$dir/sets")
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_textgate").toString)
      .start()
    try {
      // batch 1: a reworded re-crawl of the HISTORY doc drops; the
      // novel doc survives and its index rows append
      in.addData(
        (ts(0), 1L, base.replace("distant", "nearby")),
        (ts(1), 2L, novel))
      q.processAllAvailable()
      kept.sorted.toSeq shouldBe Seq(2L)
      // batch 2: a reworded re-crawl of BATCH 1's survivor — only the
      // appended delta can catch it (cross-batch memory); a fresh doc
      // still passes
      in.addData(
        (ts(10), 3L, novel.replace("sonar", "radar")),
        (ts(11), 4L, "entirely different prose about mountain weather " +
          "stations recording wind and snowfall across the high passes " +
          "during the long winter season this year"))
      q.processAllAvailable()
      kept.sorted.toSeq shouldBe Seq(2L, 4L)
    } finally q.stop()
    // the on-disk index now carries history + both survivors
    spark.read.parquet(s"$dir/sets").select("doc").as[Long]
      .collect().sorted shouldBe Array(2L, 4L, 100L)
  }

  test("runArchiveIngest: streamed archives feed BOTH legs from ONE scan — both indexes grow, and batch-2 re-crawls (reworded text, re-encoded media) drop via the appended deltas") {
    import graft.multimodal.{MediaIndex, Multimodal, PerceptualHash}
    def img(gid: Long, fmt: String) =
      PerceptualHash.renderGrayImage(16, 16, gid * 7, gid % 5 + 1,
        gid % 11 + 1, gid % 3, 0, fmt)
    def rec(uri: String, p: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-02-03T04:05:06Z\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        p ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank " +
      "while morning light spreads across the silent valley floor"
    val novel = "a brand new report on deep sea exploration vessels " +
      "mapping volcanic ridges under the southern ocean currents today " +
      "with sonar sweeps charting the deepest trenches ever recorded " +
      "before the research vessel returns"
    val fresh2 = "entirely different prose about mountain weather " +
      "stations recording wind and snowfall across the high passes " +
      "during the long winter season this year"
    // the FULL production wiring from IngestSinks: versioned index
    // roots (v0 built over the seed corpora), per-batch readers, and
    // archiveSink — idempotent corpus appends + delta appends + a
    // compaction after EVERY data batch, so cross-batch memory is
    // also proven to survive compaction
    val dir = Files.createTempDirectory("graft_archingest")
    IngestSinks.initTextIndex(spark, s"$dir/tidx",
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text")
    spark.catalog.clearCache()
    IngestSinks.initMediaIndex(spark, s"$dir/midx", Seq(
      Multimodal.Media(100L, "image", img(4, "png"))).toDS(),
      maxBucket = 64)
    // the crawler's drop directory: archive 1 lands before the stream
    // starts, archive 2 mid-run
    val drop = Files.createTempDirectory("graft_archdrop")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(drop.toString, "a1.warc"),
      rec("https://c.example/docA", s"$novel".getBytes("UTF-8")) ++
        rec("https://c.example/seedRewrite",
          base.replace("distant", "nearby").getBytes("UTF-8")) ++
        rec("https://c.example/junk",
          ("a" * 30 + " " + "b" * 30).getBytes("UTF-8")) ++
        rec("https://c.example/imgM", img(21, "png")) ++
        rec("https://c.example/seedReenc", img(4, "bmp")))
    val binSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val q = StreamingIngestPipeline.runArchiveIngest(
        spark.readStream.format("binaryFile").schema(binSchema)
          .option("pathGlobFilter", "*.warc").load(drop.toString),
        IngestSinks.textIndex(spark, s"$dir/tidx"),
        IngestSinks.mediaIndex(spark, s"$dir/midx"),
        mediaMaxBucket = 64)(
        IngestSinks.archiveSink(spark, s"$dir/dcorpus", s"$dir/mcorpus",
          s"$dir/tidx", s"$dir/midx", compactEvery = 1))
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_archingest").toString)
      .start()
    def docUrls() = spark.read.parquet(s"$dir/dcorpus")
      .select("url").as[String].collect().sorted.toSeq
    def mediaUrls() = spark.read.parquet(s"$dir/mcorpus")
      .select("url").as[String].collect().sorted.toSeq
    try {
      q.processAllAvailable()
      // batch 1: the novel doc and the fresh image survive; the
      // reworded re-crawl of the TEXT seed and the BMP re-encode of
      // the MEDIA seed drop against the prebuilt indexes; junk drops
      // at the quality floor — one scan fed both verdict legs
      docUrls() shouldBe Seq("https://c.example/docA")
      mediaUrls() shouldBe Seq("https://c.example/imgM")
      // archive 2: re-crawls of BATCH 1's survivors (text reworded,
      // media re-encoded) — only the APPENDED deltas can catch them,
      // and both indexes were COMPACTED after batch 1, so the memory
      // demonstrably rides through the compacted copies
      java.nio.file.Files.write(
        java.nio.file.Paths.get(drop.toString, "a2.warc"),
        rec("https://c.example/docA2",
          novel.replace("sonar", "radar").getBytes("UTF-8")) ++
          rec("https://c.example/docB", fresh2.getBytes("UTF-8")) ++
          rec("https://c.example/imgM2", img(21, "bmp")) ++
          rec("https://c.example/imgN", img(77, "png")))
      q.processAllAvailable()
      docUrls() shouldBe
        Seq("https://c.example/docA", "https://c.example/docB")
      mediaUrls() shouldBe
        Seq("https://c.example/imgM", "https://c.example/imgN")
    } finally q.stop()
    // both LIVE indexes GREW: seed + the two surviving docs / images
    // each — the continuous-crawl loop is closed end to end
    spark.read.parquet(
        s"${IngestSinks.currentIndexPath(spark, s"$dir/tidx")}/sets")
      .count() shouldBe 3L
    spark.read.parquet(
        s"${IngestSinks.currentIndexPath(spark, s"$dir/midx")}/index")
      .count() shouldBe 3L
  }

  test("runArchiveIngest extractHtml: crawl HTML bodies become PROSE before fingerprint/gate/judge — a re-serialized re-crawl of indexed prose drops; survivors carry extracted text") {
    import graft.multimodal.Multimodal
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank " +
      "while morning light spreads across the silent valley floor"
    val novel = "a brand new report on deep sea exploration vessels " +
      "mapping volcanic ridges under the southern ocean currents today " +
      "with sonar sweeps charting the deepest trenches ever recorded " +
      "before the research vessel returns"
    def rec(uri: String, html: String): Array[Byte] = {
      val p = html.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        p ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val dir = Files.createTempDirectory("graft_archhtml")
    // the text index holds PROSE (the extracted form — the scaladoc
    // contract when extractHtml is on)
    IngestSinks.initTextIndex(spark, s"$dir/tidx",
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text")
    spark.catalog.clearCache()
    IngestSinks.initMediaIndex(spark, s"$dir/midx",
      Seq.empty[Multimodal.Media].toDS(), maxBucket = 64)
    val drop = Files.createTempDirectory("graft_archhtml_drop")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(drop.toString, "a1.warc"),
      // a re-SERIALIZED re-crawl of the indexed prose: different tag
      // soup around near-identical text — WITHOUT extraction the
      // markup tokens depress Jaccard below the gate and it would
      // sail through; WITH extraction it judges as the near-dup it is
      rec("https://h.example/seedAgain",
        "<html><body><p>" + base.replace("distant", "nearby") +
          "</p><script>junk()</script></body></html>") ++
        rec("https://h.example/fresh",
          s"<html><body><p>$novel</p><script>var x=1;</script>" +
            "</body></html>"))
    val binSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val kept = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    val q = StreamingIngestPipeline.runArchiveIngest(
        spark.readStream.format("binaryFile").schema(binSchema)
          .option("pathGlobFilter", "*.warc").load(drop.toString),
        IngestSinks.textIndex(spark, s"$dir/tidx"),
        IngestSinks.mediaIndex(spark, s"$dir/midx"),
        extractHtml = true, mediaMaxBucket = 64) { b =>
        kept ++= b.docs.select("url", "text").as[(String, String)].collect()
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_archhtml").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    kept.map(_._1).toSeq shouldBe Seq("https://h.example/fresh")
    // extraction really ran inside the doc leg: prose only
    val text = kept.head._2
    text should include ("deep sea exploration")
    (text should not).include("<p>")
    (text should not).include("var x=1;")
  }

  test("runArchiveIngest URL gates: a blocked domain's docs AND media never pay content work; tracker-variant re-crawls collapse to one canonical survivor") {
    import graft.multimodal.{Multimodal, PerceptualHash}
    def img(gid: Long) =
      PerceptualHash.renderGrayImage(16, 16, gid * 7, gid % 5 + 1,
        gid % 11 + 1, gid % 3, 0, "png")
    def rec(uri: String, p: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        p ++ "\r\n\r\n".getBytes("ISO-8859-1")
    val novel = "a brand new report on deep sea exploration vessels " +
      "mapping volcanic ridges under the southern ocean currents today " +
      "with sonar sweeps charting the deepest trenches ever recorded " +
      "before the research vessel returns"
    val other = "completely different archival material about ancient " +
      "trade routes crossing the mountain passes in early winter snow " +
      "carried by caravans whose tolls the provincial ledgers recorded"
    val fresh2 = "entirely different prose about mountain weather " +
      "stations recording wind and snowfall across the high passes " +
      "during the long winter season while valley roads stayed closed " +
      "to traffic for six straight days"
    val dir = Files.createTempDirectory("graft_archurl")
    IngestSinks.initTextIndex(spark, s"$dir/tidx",
      Seq((100L, "an unrelated seed document about river dredging " +
        "surveys measured along the harbor channel late last autumn"))
        .toDF("doc_id", "text"), "doc_id", "text")
    spark.catalog.clearCache()
    IngestSinks.initMediaIndex(spark, s"$dir/midx",
      Seq.empty[Multimodal.Media].toDS(), maxBucket = 64)
    val drop = Files.createTempDirectory("graft_archurl_drop")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(drop.toString, "a1.warc"),
      rec("https://ok.example/a", novel.getBytes("UTF-8")) ++
        // a SUBDOMAIN of the blocked domain: suffix semantics
        rec("https://sub.blocked.example/x", other.getBytes("UTF-8")) ++
        // tracker variants of ONE canonical URL, distinct texts (the
        // exact-fp stage is blind to them) — exactly one survives
        rec("https://ok.example/p?utm_source=x",
          fresh2.getBytes("UTF-8")) ++
        rec("https://ok.example/p?utm_campaign=y",
          (fresh2 + " republished under a tracking campaign variant")
            .getBytes("UTF-8")) ++
        rec("https://blocked.example/i.png", img(21)) ++
        rec("https://ok.example/j.png", img(77)))
    val binSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val keptDocs = scala.collection.mutable.ArrayBuffer.empty[String]
    val keptMedia = scala.collection.mutable.ArrayBuffer.empty[String]
    val q = StreamingIngestPipeline.runArchiveIngest(
        spark.readStream.format("binaryFile").schema(binSchema)
          .option("pathGlobFilter", "*.warc").load(drop.toString),
        IngestSinks.textIndex(spark, s"$dir/tidx"),
        IngestSinks.mediaIndex(spark, s"$dir/midx"),
        urlBlocklist = Some(Seq("blocked.example").toDF("domain")),
        urlDedup = true, mediaMaxBucket = 64) { b =>
        keptDocs ++= b.docs.select("url").as[String].collect()
        keptMedia ++= b.media.select("url").as[String].collect()
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_archurl").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    keptMedia.toSeq shouldBe Seq("https://ok.example/j.png")
    keptDocs should contain ("https://ok.example/a")
    keptDocs.exists(_.startsWith("https://sub.blocked")) shouldBe false
    // exactly ONE of the two tracker variants survived (keep-first by
    // id; ids are path-position hashes, so which URL wins is hash
    // order — the CANONICAL identity is what collapsed)
    keptDocs.count(_.startsWith("https://ok.example/p")) shouldBe 1
    keptDocs should have size 2
  }

  test("IngestSinks text: idempotent corpus + versioned index appends + MID-RUN compaction — verdicts identical through the compacted copy") {
    implicit val ctx = spark.sqlContext
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank " +
      "while morning light spreads across the silent valley floor"
    val novel1 = "a brand new report on deep sea exploration vessels " +
      "mapping volcanic ridges under the southern ocean currents today " +
      "with sonar sweeps charting the deepest trenches ever recorded " +
      "before the research vessel returns"
    val novel2 = "entirely different prose about mountain weather " +
      "stations recording wind and snowfall across the high passes " +
      "during the long winter season while valley roads stayed closed " +
      "to traffic for six straight days"
    val novel3 = "the harbor council approved a plan to dredge the old " +
      "shipping channel next autumn after surveys showed silt levels " +
      "rising faster than the port authority had projected last year"
    val root = Files.createTempDirectory("graft_sinks").toString
    // the production wiring, END TO END from the helper: versioned
    // index root (v0 built from the seed corpus), per-batch reader,
    // documented sink with compaction every 2 batches
    IngestSinks.initTextIndex(spark, s"$root/idx",
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text")
    spark.catalog.clearCache()
    val emptyIndex = Seq.empty[String].toDF("text")
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingIngestPipeline.runWithTextIndexGate(
        docs, emptyIndex, IngestSinks.textIndex(spark, s"$root/idx"),
        "ts", "doc_id", "text")(
        IngestSinks.textSink(spark, s"$root/corpus", s"$root/idx",
          compactEvery = 2))
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_sinks").toString)
      .start()
    try {
      in.addData((ts(0), 1L, novel1))                 // batch 0: survives
      q.processAllAvailable()
      in.addData(
        (ts(1), 2L, novel1.replace("sonar", "radar")), // dup of batch 0's
                                                       // survivor via delta
        (ts(2), 3L, novel2))                           // survives
      q.processAllAvailable()                          // → compaction fires
      // the second DATA batch triggered compaction (no-data watermark
      // batches interleave with unpredictable ids — the cadence counts
      // data batches): the pointer left v0, and v0 is RETAINED for a
      // concurrent reader until the NEXT swap (the delete-on-next-swap
      // retention rule)
      IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
        s"$root/idx/v1"
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$root/idx/v0")) shouldBe true
      in.addData(
        (ts(10), 4L, novel2.replace("snowfall", "rainfall")), // dup through
                                                       // the COMPACTED copy
        (ts(11), 5L, base.replace("distant", "nearby")), // seed memory
                                                       // survived compaction
        (ts(12), 6L, novel3))                          // survives
      q.processAllAvailable()
    } finally q.stop()
    // the corpus holds exactly the survivors, batch-partitioned
    val corpus = spark.read.parquet(s"$root/corpus")
    corpus.select("doc_id").as[Long].collect().sorted shouldBe
      Array(1L, 3L, 6L)
    corpus.select("batch_id").distinct().count() shouldBe 3L
    // the live index: seed + the three survivors
    spark.read.parquet(
        s"${IngestSinks.currentIndexPath(spark, s"$root/idx")}/sets")
      .select("doc").as[Long].collect().sorted shouldBe
      Array(1L, 3L, 6L, 100L)
  }

  test("IngestSinks media: versioned appends + compaction — batch-2 re-encodes drop through the compacted copy") {
    import graft.multimodal.{Multimodal, PerceptualHash}
    def img(gid: Long, fmt: String) =
      PerceptualHash.renderGrayImage(16, 16, gid * 7, gid % 5 + 1,
        gid % 11 + 1, gid % 3, 0, fmt)
    val root = Files.createTempDirectory("graft_msinks").toString
    IngestSinks.initMediaIndex(spark, s"$root/idx", Seq(
      Multimodal.Media(100L, "image", img(4, "png"))).toDS(),
      maxBucket = 64)
    val drop = Files.createTempDirectory("graft_msinks_drop")
    def put(name: String, bytes: Array[Byte]): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(drop.toString, name), bytes); ()
    }
    put("m21.png", img(21, "png")) // batch 0: fresh, survives
    val binSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val q = StreamingIngestPipeline.runMediaIngestIndexed(
        spark.readStream.format("binaryFile").schema(binSchema)
          .load(drop.toString),
        IngestSinks.mediaIndex(spark, s"$root/idx"), maxBucket = 64)(
        IngestSinks.mediaSink(spark, s"$root/corpus", s"$root/idx",
          compactEvery = 1))
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_msinks").toString)
      .start()
    try {
      q.processAllAvailable() // data batch 1 → compaction (every 1)
      IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
        s"$root/idx/v1"
      // v0 retained for a straggling reader until the NEXT swap
      java.nio.file.Files.exists(
        java.nio.file.Paths.get(s"$root/idx/v0")) shouldBe true
      put("m21.bmp", img(21, "bmp")) // re-encode of batch 0's survivor:
                                     // only the delta THROUGH the
                                     // compacted copy can catch it
      put("m4.bmp", img(4, "bmp"))   // re-encode of the seed: its
                                     // memory survived compaction
      put("m77.png", img(77, "png")) // fresh, survives
      q.processAllAvailable()
    } finally q.stop()
    val corpus = spark.read.parquet(s"$root/corpus")
    corpus.select("path").as[String].collect()
      .map(_.split('/').last).sorted shouldBe Array("m21.png", "m77.png")
    // live index: seed + the two survivors
    spark.read.parquet(
        s"${IngestSinks.currentIndexPath(spark, s"$root/idx")}/index")
      .count() shouldBe 3L
    // the SECOND swap (v1 → v2) applied the retention rule: v1 is the
    // held-back reader version, v0 (two swaps old) is gone
    IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
      s"$root/idx/v2"
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/idx/v1")) shouldBe true
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/idx/v0")) shouldBe false
  }

  test("runArchiveIngest mediaGate: doc→media ownership re-derived from archive records — a scraped-gallery page (every referenced image a losing duplicate) DROPS and never enters the text index; one-original / unfetched-ref / no-media pages survive") {
    implicit val ctx = spark.sqlContext
    import graft.multimodal.{MediaIndex, Multimodal, PerceptualHash}
    import graft.operators.TextIndex
    def img(gid: Long, fmt: String) =
      PerceptualHash.renderGrayImage(16, 16, gid * 7, gid % 5 + 1,
        gid % 11 + 1, gid % 3, 0, fmt)
    def rec(uri: String, p: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        "WARC-Date: 2026-02-03T04:05:06Z\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        p ++ "\r\n\r\n".getBytes("ISO-8859-1")
    def page(prose: String, srcs: String*): Array[Byte] =
      (s"<html><body><p>$prose</p>" +
        srcs.map(s => s"""<img src="$s">""").mkString +
        "</body></html>").getBytes("UTF-8")
    val proseG = "a gallery of copied holiday pictures scraped from " +
      "other sites with short captions under every frame describing " +
      "the beaches and harbors someone else photographed last summer"
    val proseA = "an original field report on tidal measurements " +
      "collected along the northern shore over three weeks with one " +
      "new chart photographed by the author at the survey station"
    val proseP = "plain prose about the history of the lighthouse " +
      "keepers and the long winters they spent maintaining the lamp " +
      "before the station was finally automated in the seventies"
    val proseR = "an essay referencing a figure that the crawler " +
      "never fetched because the image host was offline during the " +
      "crawl window though the text itself reads perfectly well"
    val proseT = "a syndicated roundup whose single tracker tagged " +
      "image link points at the same copied photo every mirror of " +
      "this network serves under its own campaign parameters"
    val proseW = "a subdirectory page embedding its one copied image " +
      "through a path relative source attribute the way most static " +
      "site generators emit their asset references by default"
    // persisted-state seeds: the media index already holds two images
    // (ids 100/101); the text index one unrelated doc
    val (hb, hs) = TextIndex.buildIndex(
      Seq((100L, "completely unrelated archival seed material about " +
        "ancient trade routes crossing the mountain passes in winter"))
        .toDF("doc_id", "text"), "doc_id", "text")
    val mIdx = MediaIndex.mediaHashIndex(Seq(
      Multimodal.Media(100L, "image", img(4, "png")),
      Multimodal.Media(101L, "image", img(9, "png"))).toDS())
      .localCheckpoint(true)
    val drop = Files.createTempDirectory("graft_gallery")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(drop.toString, "a1.warc"),
      // the gallery page: BOTH referenced images are losing dups (a
      // byte copy and a BMP re-encode of index keepers) → doc drops
      rec("https://g.example/gallery", page(proseG, "/i/x.png", "/i/y.bmp")) ++
        // one original among a dup → survives
        rec("https://g.example/article", page(proseA, "/i/x.png", "/i/z.png")) ++
        // no media references → no evidence → survives
        rec("https://g.example/plain", page(proseP)) ++
        // ref resolves to a URL the crawler never fetched → no
        // evidence in the batch → survives (keep-the-unparseable)
        rec("https://g.example/ghost", page(proseR, "/i/never.png")) ++
        // TRACKER-VARIANT ref: the src carries a utm parameter the
        // fetch URL lacks — only the CANONICAL join finds the edge;
        // its one referenced object is a losing dup → doc DROPS (a
        // verbatim join would mis-read this page as no-evidence)
        rec("https://g.example/tracker",
          page(proseT, "/i/x.png?utm_source=feed")) ++
        // PATH-RELATIVE ref (the static-site default): resolves
        // against the page's directory — its one referenced object
        // is a losing re-encode dup → doc DROPS (the old href-only
        // resolver read path-relative srcs as no-evidence)
        rec("https://g.example/sub/rel", page(proseW, "img/w.bmp")) ++
        // the media records themselves (separate WARC records — the
        // ownership the gate re-derives via resolved <img src>)
        rec("https://g.example/i/x.png", img(4, "png")) ++
        rec("https://g.example/i/y.bmp", img(9, "bmp")) ++
        rec("https://g.example/i/z.png", img(77, "png")) ++
        rec("https://g.example/sub/img/w.bmp", img(4, "bmp")))
    val binSchema = org.apache.spark.sql.types.StructType.fromDDL(
      "path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
    val keptDocs = scala.collection.mutable.ArrayBuffer.empty[String]
    val keptMedia = scala.collection.mutable.ArrayBuffer.empty[String]
    val deltaDocIds = scala.collection.mutable.ArrayBuffer.empty[Long]
    var survivorIds: Map[String, Long] = Map.empty
    var summary: Option[org.apache.spark.sql.Row] = None
    var funnel: Option[org.apache.spark.sql.Row] = None
    val q = StreamingIngestPipeline.runArchiveIngest(
        spark.readStream.format("binaryFile").schema(binSchema)
          .load(drop.toString),
        () => (hb, hs), () => mIdx,
        extractHtml = true, mediaGate = true, mediaMaxBucket = 64) { b =>
        val rows = b.docs.select("url", "doc_id")
          .as[(String, Long)].collect()
        keptDocs ++= rows.map(_._1)
        survivorIds ++= rows.toMap
        keptMedia ++= b.media.select("url").as[String].collect()
        deltaDocIds ++= b.textDelta._2.select("doc")
          .as[Long].collect()
        // the monitoring surface: one row of per-batch drop-rate
        // inputs, computed INSIDE the sink off the pinned batch
        summary = Some(IngestSinks.archiveBatchSummary(b).collect().head)
        // the GATE-ATTRIBUTED funnel (opt-in thunk): every drop this
        // fixture plants lands in its OWN gate's column, and the row
        // reconciles (routed − Σdrops = survivors) by construction
        funnel = Some(b.funnel().collect().head)
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_gallery").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    keptDocs.sorted.toSeq shouldBe Seq("https://g.example/article",
      "https://g.example/ghost", "https://g.example/plain")
    keptMedia.sorted.toSeq shouldBe Seq("https://g.example/i/z.png")
    // the text-index delta carries EXACTLY the three doc survivors —
    // the gallery doc was gated BEFORE the text judge, so no index
    // entry can ever suppress a future re-crawl of its content
    deltaDocIds.sorted.toSeq shouldBe
      survivorIds.values.toSeq.sorted
    // the monitoring row: 6 routed pages / 4 media records in, 3 doc
    // + 1 media survivors out, deltas tracking the survivor sets
    val s = summary.get
    (s.getLong(1), s.getLong(2), s.getLong(3), s.getLong(4),
      s.getLong(5), s.getLong(6)) shouldBe (6L, 4L, 3L, 1L, 3L, 1L)
    // the attributed funnel: all three doc drops are GALLERY drops
    // (gallery + tracker + rel), all three media drops are election
    // dups (x byte-copy, y and w re-encodes); every other gate 0
    val f = funnel.get
    f.toSeq.drop(1) shouldBe Seq(6L, 0L, 0L, 0L, 0L, 3L, 0L, 3L,
      4L, 0L, 3L, 1L)
  }

  test("IngestSinks.backfillArchives: chunked AvailableNow backfill — cross-chunk memory through the deltas, checkpoint resume processes only new archives, completed rerun is a no-op") {
    import graft.multimodal.{Multimodal, PerceptualHash}
    def img(gid: Long) = PerceptualHash.renderGrayImage(16, 16, gid * 7,
      gid % 5 + 1, gid % 11 + 1, gid % 3, 0, "png")
    def rec(uri: String, p: Array[Byte]): Array[Byte] =
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        p ++ "\r\n\r\n".getBytes("ISO-8859-1")
    def page(prose: String): Array[Byte] =
      s"<html><body><p>$prose</p></body></html>".getBytes("UTF-8")
    val proseX = "a long form essay about the migration patterns of " +
      "arctic terns across two hemispheres and the instruments " +
      "researchers attach to track their yearly journeys"
    val fresh1 = "an original report on tidal measurements collected " +
      "along the northern shore over three weeks with one new chart " +
      "photographed by the author at the survey station"
    val fresh2 = "plain prose about the history of the lighthouse " +
      "keepers and the long winters they spent maintaining the lamp " +
      "before the station was finally automated in the seventies"
    val fresh3 = "a harbor council plan to dredge the old shipping " +
      "channel next autumn after surveys showed silt levels rising " +
      "faster than the port authority had projected last year"
    val root = Files.createTempDirectory("graft_backfill").toString
    val drop = Files.createTempDirectory("graft_backfill_drop").toString
    val ckpt = Files.createTempDirectory("graft_backfill_ckpt").toString
    IngestSinks.initTextIndex(spark, s"$root/tidx",
      Seq.empty[(Long, String)].toDF("doc_id", "text"), "doc_id", "text")
    IngestSinks.initMediaIndex(spark, s"$root/midx",
      Seq(Multimodal.Media(100L, "image", img(4))).toDS(), maxBucket = 64)
    def put(name: String, recs: Array[Byte]): Unit = {
      java.nio.file.Files.write(
        java.nio.file.Paths.get(drop, name), recs); ()
    }
    // two archives, ONE per chunk: a2 carries an EXACT re-crawl of
    // a1's essay under a new URL — only the chunk-1 delta, appended
    // and re-read between chunks, can catch it (whichever chunk runs
    // first: exactly one copy of the essay survives)
    put("a1.warc", rec("https://b.example/essay", page(proseX)) ++
      rec("https://b.example/fresh1", page(fresh1)) ++
      rec("https://b.example/i/new.png", img(21)))
    put("a2.warc", rec("https://b.example/essayCopy", page(proseX)) ++
      rec("https://b.example/fresh2", page(fresh2)) ++
      rec("https://b.example/i/seedReenc.bmp", img(4)))
    val n1 = IngestSinks.backfillArchives(spark, drop, ckpt,
      s"$root/dcorpus", s"$root/mcorpus", s"$root/tidx", s"$root/midx",
      maxFilesPerTrigger = 1, compactEvery = 1, urlDedup = false)
    n1 should be >= 2L
    def docUrls() = spark.read.parquet(s"$root/dcorpus")
      .select("url").as[String].collect().sorted.toSeq
    docUrls() should have size 3 // both fresh pages + ONE essay copy
    docUrls().count(_.startsWith("https://b.example/essay")) shouldBe 1
    // media: the fresh PNG survives; the seed re-encode drops against
    // the prebuilt index
    spark.read.parquet(s"$root/mcorpus").select("url").as[String]
      .collect().toSeq shouldBe Seq("https://b.example/i/new.png")
    // RESUME: one new archive lands; the same call processes ONLY it,
    // and its essay re-crawl drops via the PERSISTED cross-run memory
    put("a3.warc", rec("https://b.example/essayAgain", page(proseX)) ++
      rec("https://b.example/fresh3", page(fresh3)))
    IngestSinks.backfillArchives(spark, drop, ckpt,
      s"$root/dcorpus", s"$root/mcorpus", s"$root/tidx", s"$root/midx",
      maxFilesPerTrigger = 1, compactEvery = 1, urlDedup = false)
    docUrls() should have size 4
    docUrls() should contain ("https://b.example/fresh3")
    docUrls().count(_.startsWith("https://b.example/essay")) shouldBe 1
    // completed rerun: nothing new — corpus byte-stable
    IngestSinks.backfillArchives(spark, drop, ckpt,
      s"$root/dcorpus", s"$root/mcorpus", s"$root/tidx", s"$root/midx",
      maxFilesPerTrigger = 1, compactEvery = 1, urlDedup = false)
    docUrls() should have size 4
  }

  test("IngestSinks redelivery: a replayed batch whose compaction+swap already completed compacts FORWARD — no read-from-own-path crash, identical index") {
    // the crash-loop scenario: the stream fails AFTER the sink ran
    // (compaction done, pointer swapped) but BEFORE the checkpoint
    // commit, and the batch is redelivered with the SAME batchId. A
    // version named from the batchId would equal CURRENT and Spark
    // rejects compacting a path into itself — the sink must instead
    // derive v<N+1> from the pointer and converge.
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank"
    val root = Files.createTempDirectory("graft_redeliver").toString
    IngestSinks.initTextIndex(spark, s"$root/idx",
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text")
    val sink = IngestSinks.textSink(spark, s"$root/corpus", s"$root/idx",
      compactEvery = 1)
    val idx0 = IngestSinks.textIndex(spark, s"$root/idx")
    val batch = Seq((1L, base.replace("quick", "swift") + " plus fresh"))
      .toDF("doc_id", "text")
    val (_, delta) = graft.operators.TextIndex.ingestStep(
      batch, "doc_id", "text", idx0()._1, idx0()._2)
    sink(batch, delta, 7L)          // first attempt: append + compact
                                    // v0 → v1 + swap COMPLETE
    IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
      s"$root/idx/v1"
    // redelivery: ingestStep replays (delta now empty — the batch
    // matches its own appended rows), the sink runs again with the
    // SAME batchId and compacts v1 → v2 instead of crash-looping
    val idx1 = IngestSinks.textIndex(spark, s"$root/idx")
    val (_, replayDelta) = graft.operators.TextIndex.ingestStep(
      batch, "doc_id", "text", idx1()._1, idx1()._2)
    replayDelta._2.count() shouldBe 0L
    noException should be thrownBy sink(batch, replayDelta, 7L)
    IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
      s"$root/idx/v2"
    // converged: one corpus partition (overwritten, not duplicated),
    // index holds exactly seed + survivor
    spark.read.parquet(s"$root/corpus")
      .select("doc_id").as[Long].collect().sorted shouldBe Array(1L)
    spark.read.parquet(
        s"${IngestSinks.currentIndexPath(spark, s"$root/idx")}/sets")
      .select("doc").as[Long].collect().sorted shouldBe Array(1L, 100L)
  }

  test("IngestSinks multi-reader: a reader holding v<N> finishes after the swap to v<N+1>; CURRENT recovery self-heals from the highest version") {
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank"
    val root = Files.createTempDirectory("graft_reader").toString
    IngestSinks.initTextIndex(spark, s"$root/idx",
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text")
    // an EXTERNAL reader resolves the pointer and holds v0
    val held = graft.io.TextIndexArtifacts.load(spark,
      IngestSinks.currentIndexPath(spark, s"$root/idx"))
    val sink = IngestSinks.textSink(spark, s"$root/corpus", s"$root/idx",
      compactEvery = 1)
    val idx = IngestSinks.textIndex(spark, s"$root/idx")
    val batch = Seq((1L, "completely novel prose about harbor dredging " +
      "surveys and silt levels rising faster than projected"))
      .toDF("doc_id", "text")
    val (_, delta) = graft.operators.TextIndex.ingestStep(
      batch, "doc_id", "text", idx()._1, idx()._2)
    sink(batch, delta, 0L)          // compaction v0 → v1: v0 RETAINED
    // the held reader still works against v0 (complete on disk)
    held.sets.count() shouldBe 1L
    held.dups(Seq((2L, base)).toDF("doc_id", "text"),
      "doc_id", "text", cacheSets = false).count() shouldBe 1L
    // crash-window recovery: CURRENT lost → the highest complete
    // version is the live one, and the pointer self-heals
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$root/idx/CURRENT"))
    IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
      s"$root/idx/v1"
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/idx/CURRENT")) shouldBe true
  }

  test("IngestSinks retain-K: at retainVersions=3 a reader TWO swaps behind still reads a complete index; the third swap finally drops it") {
    val base = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank"
    val root = Files.createTempDirectory("graft_retaink").toString
    IngestSinks.initTextIndex(spark, s"$root/idx",
      Seq((100L, base)).toDF("doc_id", "text"), "doc_id", "text")
    // an EXTERNAL reader resolves and holds v0
    val held = graft.io.TextIndexArtifacts.load(spark,
      IngestSinks.currentIndexPath(spark, s"$root/idx"))
    val sink = IngestSinks.textSink(spark, s"$root/corpus", s"$root/idx",
      compactEvery = 1, retainVersions = 3)
    def ingest(id: Long, text: String): Unit = {
      val idx = IngestSinks.textIndex(spark, s"$root/idx")
      val batch = Seq((id, text)).toDF("doc_id", "text")
      val (_, delta) = graft.operators.TextIndex.ingestStep(
        batch, "doc_id", "text", idx()._1, idx()._2)
      sink(batch, delta, id)
    }
    ingest(1L, "novel prose about harbor dredging surveys and silt " +
      "levels rising faster than projected")          // v0 → v1
    ingest(2L, "different prose entirely on alpine glacier mass " +
      "balance and seasonal melt acceleration")       // v1 → v2
    // TWO swaps behind: v0 must still be complete on disk at K=3
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/idx/v0")) shouldBe true
    held.sets.count() shouldBe 1L
    held.dups(Seq((9L, base)).toDF("doc_id", "text"),
      "doc_id", "text", cacheSets = false).count() shouldBe 1L
    // the THIRD swap retires v0 (newest 3 = v1, v2, v3)
    ingest(3L, "a third unrelated passage concerning tidal turbine " +
      "arrays and estuary sediment transport modelling")  // v2 → v3
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/idx/v0")) shouldBe false
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$root/idx/v1")) shouldBe true
    IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
      s"$root/idx/v3"
  }

  test("IngestSinks.retractFromCorpus recovery: an UNCOMMITTED side copy (no _SUCCESS — crash mid-write) is discarded, never installed; a committed orphan completes its rename") {
    val root = Files.createTempDirectory("graft_takedown_crash").toString
    val corpus = s"$root/corpus"
    IngestSinks.appendCorpusIdempotent(
      Seq((1L, "keep one"), (2L, "take me down")).toDF("doc_id", "text"),
      corpus, 0L)
    IngestSinks.appendCorpusIdempotent(
      Seq((3L, "keep three"), (4L, "take me down too"))
        .toDF("doc_id", "text"), corpus, 1L)
    // simulate a crash DURING the side-copy write of batch 0: an
    // uncommitted partial dir (no _SUCCESS, a _temporary subtree and
    // a lone part file MISSING doc 1's row) while the ORIGINAL
    // partition is intact. Installing it would silently lose doc 1.
    val tmp0 = java.nio.file.Paths.get(s"$corpus/.retract_tmp/batch_id=0")
    java.nio.file.Files.createDirectories(tmp0.resolve("_temporary"))
    Seq((99L, "partial garbage")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$root/partial")
    val part = new java.io.File(s"$root/partial").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    java.nio.file.Files.copy(part.toPath, tmp0.resolve(part.getName))
    // and a COMMITTED orphan for batch 1 (crash BETWEEN delete and
    // rename: side copy complete with _SUCCESS, original gone)
    Seq((3L, "keep three")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$corpus/.retract_tmp/batch_id=1")
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$corpus/batch_id=1"))
    IngestSinks.retractFromCorpus(spark, corpus,
      Seq(2L, 4L).toDF("doc_id"), "doc_id")
    // batch 0: the partial was DISCARDED and the sweep re-ran from
    // the intact original — doc 1 survives, doc 2 retracted, the
    // garbage row never entered; batch 1: the committed orphan was
    // installed (doc 4 already swept by the crashed first attempt)
    spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted shouldBe Array(1L, 3L)
    new java.io.File(s"$corpus/.retract_tmp").exists() shouldBe false
  }

  test("IngestSinks.retractFromCorpus: takedown rows leave the corpus parquet; only affected partitions rewritten; idempotent") {
    val root = Files.createTempDirectory("graft_takedown").toString
    val corpus = s"$root/corpus"
    IngestSinks.appendCorpusIdempotent(
      Seq((1L, "keep one"), (2L, "take me down")).toDF("doc_id", "text"),
      corpus, 0L)
    IngestSinks.appendCorpusIdempotent(
      Seq((3L, "keep three"), (4L, "keep four")).toDF("doc_id", "text"),
      corpus, 1L)
    IngestSinks.appendCorpusIdempotent(
      Seq((5L, "take me down too")).toDF("doc_id", "text"), corpus, 2L)
    val before = new java.io.File(s"$corpus/batch_id=1").lastModified()
    // the operational front: takedowns arrive as KEYS (URLs, content
    // strings) — resolve them to ids with one corpus scan, then sweep
    val ids = IngestSinks.retractionIdsFor(spark, corpus,
      Seq("take me down", "take me down too", "never in corpus")
        .toDF("text"), "text", "doc_id")
    ids.as[Long].collect().sorted shouldBe Array(2L, 5L)
    IngestSinks.retractFromCorpus(spark, corpus,
      ids.unionByName(Seq(999L).toDF("doc_id")), "doc_id")
    // retracted content GONE; untouched rows intact
    spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted shouldBe Array(1L, 3L, 4L)
    // the untouched partition was NOT rewritten (targeted sweep)
    new java.io.File(s"$corpus/batch_id=1").lastModified() shouldBe before
    // idempotent: a re-run (same list) converges without error
    noException should be thrownBy IngestSinks.retractFromCorpus(
      spark, corpus, Seq(2L, 5L).toDF("doc_id"), "doc_id")
    spark.read.parquet(corpus).select("doc_id").as[Long]
      .collect().sorted shouldBe Array(1L, 3L, 4L)
  }

  test("runMediaGatedDocs: a streamed crawl drops scraped-gallery DOCS — every media object a history dup — and keeps docs with one original or no media") {
    implicit val ctx = spark.sqlContext
    import graft.multimodal.{AudioWave, MediaIndex, Multimodal, PerceptualHash}
    def img(gid: Long, fmt: String) =
      PerceptualHash.renderGrayImage(16, 16, gid * 7, gid % 5 + 1,
        gid % 11 + 1, gid % 3, 0, fmt)
    val decent = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank"
    // media HISTORY: the corpus already holds two images
    val history = MediaIndex.mediaHashIndex(Seq(
      Multimodal.Media(100L, "image", img(4, "png")),
      Multimodal.Media(101L, "image", img(9, "png"))).toDS())
    val emptyIndex = Seq.empty[String].toDF("text")
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
    val in = MemoryStream[(Timestamp, Long, String,
      Seq[(Long, Array[Byte])])]
    val docs = in.toDF().toDF("ts", "doc_id", "text", "media")
      .withColumn("media", transform(col("media"),
        m => struct(m.getField("_1").as("media_id"),
          m.getField("_2").as("payload"))))
    val keptDocs = scala.collection.mutable.ArrayBuffer.empty[Long]
    val deltas = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamingIngestPipeline.runMediaGatedDocs(
        docs, emptyIndex, () => history, "ts", "doc_id", "text", "media",
        maxBucket = 64) { (batch, delta, _) =>
        keptDocs ++= batch.select("doc_id").as[Long].collect()
        deltas ++= delta.select("media_id").as[Long].collect()
        ()
      }
      .option("checkpointLocation",
        Files.createTempDirectory("ckpt_media_docs").toString)
      .start()
    try {
      in.addData(
        // scraped gallery: BOTH media objects are history dups (a
        // byte copy and a BMP re-encode) → the DOC drops
        (ts(0), 1L, s"$decent gallery page with copied pictures",
          Seq((10L, img(4, "png")), (11L, img(9, "bmp")))),
        // one original among a dup → the DOC survives
        (ts(1), 2L, s"$decent article with one original photo",
          Seq((12L, img(4, "png")), (13L, img(77, "png")))),
        // no media at all → no media evidence → survives
        (ts(2), 3L, s"$decent plain prose page with no pictures",
          Seq.empty),
        // all media NULL-payload (failed fetches) → no evidence → survives
        (ts(3), 4L, s"$decent page whose image fetches all failed",
          Seq((14L, null.asInstanceOf[Array[Byte]]))))
      q.processAllAvailable()
    } finally q.stop()
    keptDocs.sorted.toSeq shouldBe Seq(2L, 3L, 4L)
    // the index delta carries exactly the surviving ORIGINAL media
    // object (13) — dups and NULL payloads never enter the index
    deltas.sorted.toSeq shouldBe Seq(13L)
  }
}
