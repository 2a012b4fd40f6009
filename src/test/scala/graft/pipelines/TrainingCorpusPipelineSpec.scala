package graft.pipelines

import graft.{SparkSpec, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** End-to-end invariants of the composed corpus build on the sf0.001
  * documents: every stage's guarantee must survive the composition. */
class TrainingCorpusPipelineSpec extends SparkSpec {
  import spark.implicits._

  // holdout = the md5-tail slice of the corpus (the q72 convention);
  // the rest is the raw training pool, so planted near-dups of the
  // holdout exist in the pool by construction of the testdata.
  private lazy val docs = Tables.documents(spark, sfDir)
  private lazy val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) < "2"
  private lazy val pool = docs.filter(!isEval).select("doc_id", "text")
  private lazy val holdout = docs.filter(isEval).select("doc_id", "text")

  private lazy val cfg = TrainingCorpusPipeline.Config(
    minQuality = 0.2, nearDupThreshold = 0.8,
    chunkWindow = 32, chunkStride = 16, packBudget = 128L, packGroups = 8)

  private lazy val out = TrainingCorpusPipeline
    .run(pool, holdout, "doc_id", "text", cfg)
    .persist()

  test("pipeline produces chunks with the declared schema and rows") {
    out.columns.toSet shouldBe Set("doc_id", "chunk_id", "n_chunk_tokens",
      "chunk_text", "pack_group", "bin", "truncated", "split")
    out.count() should be > 0L
  }

  // NOTE for the two zero-count LSH checks below: they hold because
  // band recall at threshold 0.8 with 128/32 is ~1−5·10⁻⁸ per pair on
  // this data. Lowering the threshold or hash/band counts in cfg turns
  // them probabilistic (a just-over-threshold pair can miss every
  // band) — don't weaken cfg without revisiting these.
  test("no surviving document near-duplicates another above the threshold") {
    val survivors = pool.join(out.select("doc_id").distinct(), Seq("doc_id"),
      "left_semi")
    val pairs = Dedup.ngramJaccardPairs(survivors, "doc_id", "text",
      cfg.shingleN, cfg.nearDupThreshold)
    pairs.count() shouldBe 0L
  }

  test("no surviving document leaks into the holdout (exact or near-dup)") {
    val survivors = pool.join(out.select("doc_id").distinct(), Seq("doc_id"),
      "left_semi")
    graft.operators.Decontaminate.exactLeaks(holdout, survivors,
      "doc_id", "text").count() shouldBe 0L
    graft.operators.Decontaminate.nearDupLeaks(holdout, survivors,
      "doc_id", "text", cfg.shingleN, cfg.nearDupThreshold)
      .count() shouldBe 0L
  }

  test("chunks respect the window size and every doc's chunks share one split") {
    rows(out.filter(col("n_chunk_tokens") > cfg.chunkWindow)) shouldBe empty
    val multiSplit = out.groupBy("doc_id")
      .agg(countDistinct(col("split")).as("n"))
      .filter(col("n") > 1)
    rows(multiSplit) shouldBe empty
  }

  test("packing respects the token budget per (pack_group, bin)") {
    val over = out.filter(!col("truncated"))
      .groupBy("pack_group", "bin")
      .agg(sum(col("n_chunk_tokens")).as("t"))
      .filter(col("t") > cfg.packBudget)
    rows(over) shouldBe empty
  }

  test("deterministic: a second run builds the identical corpus") {
    val again = TrainingCorpusPipeline.run(pool, holdout, "doc_id", "text", cfg)
    again.exceptAll(out).count() shouldBe 0L
    out.exceptAll(again).count() shouldBe 0L
  }

  test("opt-in stages: historical index, boilerplate ceiling, verbatim n-gram leaks") {
    // historical index = half the pool's docs: their content must not
    // re-enter the corpus
    val historic = pool.filter(pmod(col("doc_id"), lit(2)) === 0)
    val strictCfg = cfg.copy(maxBoilerplate = Some(0.999),
      ngramLeakN = Some(13), bloomExpectedItems = 10000L)
    val out2 = TrainingCorpusPipeline.run(pool, holdout, "doc_id", "text",
        strictCfg, historicalIndex = Some(historic))
      .persist()
    out2.count() should be > 0L
    // no surviving doc's content is in the historical index
    val survivors = pool.join(out2.select("doc_id").distinct(), Seq("doc_id"),
      "left_semi")
    graft.operators.Decontaminate.exactLeaks(historic, survivors,
      "doc_id", "text").count() shouldBe 0L
    // no surviving doc shares a verbatim 13-gram with the holdout
    graft.operators.Decontaminate.ngramLeaks(survivors, holdout,
      "doc_id", "text", 13).count() shouldBe 0L
    // NOT asserted: out2 ⊆ out. Removing docs earlier re-elects
    // near-dup survivors (min-id of a shrunken cluster) and can split
    // clusters, so the surviving-id SET legitimately differs — the
    // contract is the invariants above, not a particular id choice.
    // The near-dup invariant must still hold on the reshuffled set:
    Dedup.ngramJaccardPairs(survivors, "doc_id", "text",
      strictCfg.shingleN, strictCfg.nearDupThreshold).count() shouldBe 0L
  }

  test("opt-in incremental near-dup gate (stage 0.5): reworded re-crawls of the persisted index drop; fresh docs and stage-off behavior unchanged") {
    // index over half the pool, PERSISTED to parquet (production
    // state shape); the other half is the new crawl. By the testdata's
    // planted near-dup structure some crawl docs near-dup the indexed
    // half — exactly what the exact Bloom gate (stage 0) cannot see.
    val historic = pool.filter(pmod(col("doc_id"), lit(2)) === 0)
    val crawl = pool.filter(pmod(col("doc_id"), lit(2)) =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_tcp_tidx")
    // PERSISTED via the artifact layer (production state shape): the
    // loaded index carries its own build parameters — a non-default
    // seed here would band differently, and passing the relations
    // without the params sidecar is exactly the silent-pass
    // misconfiguration the PersistedTextIndex parameter type closes
    graft.io.TextIndexArtifacts.build(s"$dir/idx", historic,
      "doc_id", "text")
    spark.catalog.clearCache()
    val idx = graft.io.TextIndexArtifacts.load(spark, s"$dir/idx")
    val out3 = TrainingCorpusPipeline.run(crawl, holdout, "doc_id", "text",
      cfg, textNearDupIndex = Some(idx))
    val survivors = crawl.join(out3.select("doc_id").distinct(),
      Seq("doc_id"), "left_semi")
    // no survivor near-dups the INDEXED corpus (the gate's contract)
    graft.operators.Decontaminate.nearDupLeaks(historic, survivors,
      "doc_id", "text", cfg.shingleN, cfg.nearDupThreshold)
      .count() shouldBe 0L
    // the gate actually fired: the ungated run keeps at least one doc
    // that near-dups the index (planted structure), and drops it here
    val ungated = TrainingCorpusPipeline.run(crawl, holdout, "doc_id",
      "text", cfg)
    val ungatedSurv = crawl.join(ungated.select("doc_id").distinct(),
      Seq("doc_id"), "left_semi")
    graft.operators.Decontaminate.nearDupLeaks(historic, ungatedSurv,
      "doc_id", "text", cfg.shingleN, cfg.nearDupThreshold)
      .count() should be > 0L
    out3.count() should be > 0L
  }

  test("opt-in incremental semantic gate (stage 0.6): paraphrase re-embeds of the persisted index drop; fresh and NULL-embedding docs pass; stage-off unchanged") {
    import graft.functions.VectorFns
    // history: the first 200 embedding vectors, PERSISTED via the
    // artifact layer (production state shape — the loaded index
    // carries the threshold/nProbe/maxCell it was built with).
    // nProbe = nCells so the gate probes EVERY cell: its verdict set
    // then equals the brute-force cosine judge computed below, and
    // the assertions are exact set equalities, not samples.
    val emb = Tables.embeddings(spark, sfDir)
    val hist = emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val dir = java.nio.file.Files.createTempDirectory("graft_tcp_semidx")
    graft.io.SemanticIndexArtifacts.build(s"$dir/idx", hist, "id", "vec",
      nCells = 8, threshold = 0.9, nProbe = 8, maxCell = Int.MaxValue)
    val idx = graft.io.SemanticIndexArtifacts.load(spark, s"$dir/idx")
    // crawl: 120 docs with mutually-disjoint token sets (no text
    // stage can couple elections — survivor differences are the
    // gate's alone); embeddings by k%3: shifted re-embed of history
    // vec k (paraphrase re-crawl), reversed (fresh-ish — JUDGED by
    // the brute-force set, never presumed), NULL (no evidence)
    val crawl = emb.filter(col("vec_id") < 120)
      .select(col("vec_id").as("k"),
        col("embedding").cast("array<double>").as("e0"))
      .select((col("k") + 1000L).as("doc_id"),
        concat_ws(" ", transform(sequence(lit(1), lit(40)),
          j => concat(lit("w"), col("k").cast("string"), lit("x"),
            j.cast("string")))).as("text"),
        when(pmod(col("k"), lit(3)) === 0,
            transform(col("e0"), x => x + lit(0.01)))
          .when(pmod(col("k"), lit(3)) === 1, reverse(col("e0")))
          .as("emb"))
    val gCfg = cfg.copy(embeddingCol = Some("emb"))
    val (gatedOut, gatedFunnel) = TrainingCorpusPipeline.runWithFunnel(
      crawl, holdout, "doc_id", "text", gCfg, semanticIndex = Some(idx))
    val gated = gatedOut
      .select("doc_id").distinct().as[Long].collect().toSet
    val ungated = TrainingCorpusPipeline.run(crawl, holdout, "doc_id",
      "text", gCfg).select("doc_id").distinct().as[Long].collect().toSet
    // the brute-force judge: crawl docs with ANY history vector at
    // cosine ≥ the stored threshold
    val matched = crawl.filter(col("emb").isNotNull)
      .select(col("doc_id"), col("emb"))
      .crossJoin(hist.select(col("vec")))
      .filter(VectorFns.cosine(col("emb"), col("vec")) >= 0.9)
      .select("doc_id").distinct().as[Long].collect().toSet
    matched should not be empty
    // ONE equality carries the whole contract: gated = ungated minus
    // exactly the semantic matches (re-crawls drop; fresh docs,
    // NULL-embedding docs, and every text-stage verdict unchanged)
    gated shouldBe (ungated -- matched)
    // NULL-embedding docs (k%3==2) carry no evidence and survive
    gated.count(id => (id - 1000L) % 3 == 2) should be > 0
    // the funnel ATTRIBUTES the drops to the semantic gate: every
    // crawl doc reaches stage 0.6 (nothing drops above it on this
    // fixture), so semantic_gate_drops = the brute-force match count
    val fr = gatedFunnel().collect().head
    fr.getAs[Long]("semantic_gate_drops") shouldBe matched.size.toLong
    // misconfiguration fails loudly at the front door
    an[IllegalArgumentException] should be thrownBy
      TrainingCorpusPipeline.run(crawl, holdout, "doc_id", "text", cfg,
        semanticIndex = Some(idx))
  }

  test("runWithFunnel: the one-row funnel reconciles (docs_in − Σ drops = survivors = distinct output docs); disabled stages report 0") {
    val (out2, funnel) = TrainingCorpusPipeline.runWithFunnel(
      pool, holdout, "doc_id", "text", cfg)
    val survivors = out2.select("doc_id").distinct().count()
    val r = funnel().collect().head
    val dropCols = r.schema.fieldNames.filter(_.endsWith("_drops"))
    val drops = dropCols.map(c => r.getAs[Long](c))
    every(drops.toSeq) should be >= 0L
    r.getAs[Long]("docs_in") - drops.sum shouldBe
      r.getAs[Long]("survivors")
    r.getAs[Long]("survivors") shouldBe survivors
    // the default config leaves every opt-in gate OFF: zero drops
    Seq("url_blocklist_drops", "url_dedup_drops", "media_gate_drops",
      "html_extract_drops", "bloom_exact_gate_drops",
      "text_neardup_gate_drops", "semantic_gate_drops",
      "line_dedup_drops", "lang_filter_drops",
      "boilerplate_ceiling_drops", "lm_floor_drops", "ppl_tail_drops",
      "model_gate_drops", "span_excise_drops", "token_budget_drops")
      .foreach(c => r.getAs[Long](c) shouldBe 0L)
    // the mandatory stages did real work on this corpus
    (r.getAs[Long]("quality_floor_drops") +
      r.getAs[Long]("exact_dedup_drops") +
      r.getAs[Long]("near_dedup_drops")) should be > 0L
  }

  test("opt-in curation stages: LM floor, token budget, curriculum position") {
    import graft.functions.TextFns
    val curCfg = cfg.copy(
      lmLogProbFloor = Some(-10.0),   // corpus scores ≈ -3.4: keeps all
      tokenBudget = Some(8000L),
      curriculumBinChars = Some(250))
    val out2 = TrainingCorpusPipeline
      .run(pool, holdout, "doc_id", "text", curCfg).persist()
    out2.count() should be > 0L
    val survivors = pool.join(out2.select("doc_id").distinct(),
      Seq("doc_id"), "left_semi")
    // the budget bounds the SURVIVING DOCS' total tokens
    val totalTok = survivors
      .agg(sum(TextFns.tokenCount(col("text")).cast("long"))).collect()(0).getLong(0)
    totalTok should be <= 8000L
    // every chunk carries its doc's curriculum position; positions are
    // doc-constant and bin-major by length
    out2.filter(col("pos").isNull).count() shouldBe 0L
    out2.groupBy("doc_id").agg(countDistinct(col("pos")).as("n"))
      .filter(col("n") =!= 1).count() shouldBe 0L
    val posByLen = survivors
      .join(out2.select("doc_id", "pos").distinct(), Seq("doc_id"))
      .select(expr("cast(length(text) / 250 as int)").as("bin"), col("pos"))
    // max pos of bin b < min pos of bin b+1 for every adjacent pair
    val bins = posByLen.groupBy("bin")
      .agg(min("pos").as("lo"), max("pos").as("hi"))
      .orderBy("bin").collect()
    bins.sliding(2).foreach {
      case Array(a, b) =>
        a.getAs[Long]("hi") should be < b.getAs[Long]("lo")
      case _ =>
    }
    // an LM floor inside the score distribution (corpus scores span
    // [-3.72, -3.39]) drops the least-probable tail vs the default run
    val floorCfg = cfg.copy(lmLogProbFloor = Some(-3.41))
    val out3 = TrainingCorpusPipeline
      .run(pool, holdout, "doc_id", "text", floorCfg)
    val defaultDocs = out.select("doc_id").distinct().count()
    val flooredDocs = out3.select("doc_id").distinct().count()
    flooredDocs should be < defaultDocs
    flooredDocs should be > 0L
  }

  test("opt-in line dedup: a corpus-wide banner line survives in ONE doc; pure-boilerplate docs drop") {
    // plant the banner on every pool doc, plus a doc that IS only the
    // banner (doc -1, the min id — the deterministic first carrier)
    val banner = "bannerxyz subscribe to continue reading bannerxyz"
    val pool2 = pool
      .select(col("doc_id"), concat(lit(banner + "\n"), col("text")).as("text"))
      .union(Seq((-1L, banner)).toDF("doc_id", "text"))
    val out2 = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text",
        cfg.copy(lineDedupSep = Some("\n")))
      .persist()
    out2.count() should be > 0L
    // the banner text reaches the chunk stream from at most one doc —
    // its first carrier — instead of every doc
    out2.filter(col("chunk_text").contains("bannerxyz"))
      .select("doc_id").distinct().count() should be <= 1L
    // and a doc reduced to nothing by the strip is gone entirely
    // (doc -1 lost its only line to itself only if a smaller carrier
    // existed; with -1 the minimum, it RETAINS the banner — assert the
    // dual: every other doc's chunks are banner-free)
    out2.filter(col("chunk_text").contains("bannerxyz") &&
      col("doc_id") =!= -1L).count() shouldBe 0L
  }

  test("opt-in NFC normalization: canonically-equivalent spellings dedup to one survivor") {
    // two spellings of the same text: composed U+00E9 and decomposed
    // e+U+0301 — byte-different, canonically equivalent. Repeated
    // filler makes both pass the quality floor.
    val filler = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val composed = s"$filler caf\u00e9 terrace review"
    val decomposed = s"$filler cafe\u0301 terrace review"
    val pool2 = pool.union(Seq(
      (9000001L, composed), (9000002L, decomposed)).toDF("doc_id", "text"))
    // stage OFF: both spellings survive exact dedup (different bytes)
    val off = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text", cfg)
      .select("doc_id").distinct()
      .filter(col("doc_id") >= 9000000L)
    off.count() shouldBe 2L
    // stage ON: they collapse to the min-id survivor, and its chunks
    // carry the COMPOSED bytes
    val on = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text",
        cfg.copy(normalizeForm = Some("NFC")))
      .persist()
    val planted = on.filter(col("doc_id") >= 9000000L)
    planted.select("doc_id").distinct()
      .as[Long].collect() shouldBe Array(9000001L)
    planted.filter(col("chunk_text").contains("caf\u00e9")).count() should be > 0L
    planted.filter(col("chunk_text").contains("cafe\u0301")).count() shouldBe 0L
  }

  test("opt-in NFC normalization also normalizes the holdout: a decomposed leak of a composed holdout doc is caught") {
    // holdout doc in COMPOSED bytes; the pool carries its verbatim
    // DECOMPOSED spelling \u2014 byte-different, canonically identical.
    // Without holdout normalization the exact/near-dup detectors
    // compare normalized train vs raw holdout and ship the leak.
    val filler = ("contamination canary text unique to this probe " * 4).trim
    val composed = s"$filler caf\u00e9 benchmark answer"
    val decomposed = s"$filler cafe\u0301 benchmark answer"
    val holdout2 = holdout.union(Seq((9100001L, composed)).toDF("doc_id", "text"))
    val pool2 = pool.union(Seq((9100002L, decomposed)).toDF("doc_id", "text"))
    val on = TrainingCorpusPipeline.run(pool2, holdout2, "doc_id", "text",
      cfg.copy(normalizeForm = Some("NFC")))
    on.filter(col("doc_id") === 9100002L).count() shouldBe 0L
  }

  test("opt-in span excision: a planted repeated span survives only in its first carrier") {
    // plant a 6-token span on two DISSIMILAR pool docs (below the 0.8
    // near-dup threshold, so doc-level dedup keeps both) — the span
    // word pool is disjoint from the corpus vocabulary, so no corpus
    // doc can carry it
    val span = "spanqq spanrr spanss spantt spanuu spanvv"
    val fillerA = ("alpha filler words keep quality up " * 6).trim
    val fillerB = ("omega other content entirely different " * 6).trim
    val pool2 = pool.union(Seq(
      (9200001L, s"$fillerA $span"),
      (9200002L, s"$fillerB $span")).toDF("doc_id", "text"))
    val on = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text",
        cfg.copy(spanExciseN = Some(5)))
      .persist()
    // both docs survive doc-level dedup (dissimilar), but the span's
    // text reaches the chunk stream from ONLY the first carrier
    on.filter(col("doc_id") === 9200001L).count() should be > 0L
    on.filter(col("doc_id") === 9200002L).count() should be > 0L
    on.filter(col("chunk_text").contains("spanss") &&
      col("doc_id") =!= 9200001L).count() shouldBe 0L
    on.filter(col("chunk_text").contains("spanss") &&
      col("doc_id") === 9200001L).count() should be > 0L
    // stage off: both carriers ship the span (the dual proving the
    // stage, not the fixture, removes it)
    val off = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text", cfg)
    off.filter(col("chunk_text").contains("spanss"))
      .select("doc_id").distinct().count() shouldBe 2L
  }

  test("span excision keeps ORIGINAL text (newlines intact) for docs with zero cuts") {
    import spark.implicits._
    // one line-structured doc with no repeated spans, one pair sharing
    // a 5-gram: only the cut docs pay the tokenize+join whitespace
    // normalization; the untouched doc must ship byte-identical
    val code = "def main():\n\tprint('hi')\n\treturn zero one two three four five six"
    val span = "sharedaa sharedbb sharedcc shareddd sharedee"
    val docs = Seq(
      (1L, code),
      (2L, s"alpha beta gamma delta epsilon $span"),
      (3L, s"zeta eta theta iota kappa $span")).toDF("doc_id", "text")
    val out = TrainingCorpusPipeline
      .exciseSurvivors(docs, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    out(1L) shouldBe code // newlines/tabs preserved, not space-collapsed
    // first carrier keeps the span verbatim (n_removed = 0 ⇒ original)
    out(2L) shouldBe s"alpha beta gamma delta epsilon $span"
    // second carrier was cut, so it pays the rebuild and loses the span
    out(3L) shouldBe "zeta eta theta iota kappa"
  }

  test("opt-in language filter: an out-of-scope-language doc drops, stage off keeps it") {
    // a clearly-Russian doc (function-word dense, passes the quality
    // floor); keepLangs = everything EXCEPT ru, so the synthetic
    // English-token pool flows through regardless of which Latin
    // language each doc profiles to
    val ru = "это был он и она но мы не так как это было для них и " +
      "когда только он был с ней все они были не так как мы"
    val pool2 = pool.union(Seq((9300001L, ru)).toDF("doc_id", "text"))
    val langs = graft.operators.LangId.languages.toSet - "ru"
    val on = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text",
      cfg.copy(keepLangs = Some(langs + "und")))
    on.filter(col("doc_id") === 9300001L).count() shouldBe 0L
    on.count() should be > 0L
    val off = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text", cfg)
    off.filter(col("doc_id") === 9300001L).count() should be > 0L
  }

  test("crawl-to-tensor: URL blocklist + HTML extraction front the pipeline") {
    // raw crawl shape: (id, url, html) — the pipeline must go all the
    // way from this to packed chunks, dropping the blocked domain
    // WITHOUT reading its text and extracting prose for the rest
    val crawl = pool.limit(40)
      .withColumn("url", concat(lit("https://"),
        when(col("doc_id") % 5 === 0, lit("blocked.example"))
          .otherwise(lit("ok.example")),
        lit("/p/"), col("doc_id").cast("string")))
      .withColumn("html", concat(lit("<html><body><p>"), col("text"),
        lit("</p><script>junk()</script></body></html>")))
      .drop("text")
      .withColumn("text", lit(null).cast("string")) // raw crawl has no prose yet
    val blocked = Seq("blocked.example").toDF("domain")
    val out2 = TrainingCorpusPipeline.run(crawl, holdout, "doc_id", "text",
      cfg.copy(htmlCol = Some("html"), urlCol = Some("url")),
      urlBlocklist = Some(blocked))
    out2.count() should be > 0L
    // every blocked-domain doc is gone; survivors carry extracted prose
    out2.filter(col("doc_id") % 5 === 0).count() shouldBe 0L
    out2.filter(col("chunk_text").contains("junk()")).count() shouldBe 0L
    out2.filter(col("chunk_text").contains("<p>")).count() shouldBe 0L
    // extracted prose ≡ the original text for surviving docs: the
    // chunks equal a plain-text run over the same survivors
    val plain = TrainingCorpusPipeline.run(
      pool.limit(40).filter(col("doc_id") % 5 =!= 0), holdout,
      "doc_id", "text", cfg)
    val a = out2.select("doc_id", "chunk_id", "chunk_text")
    val b = plain.select("doc_id", "chunk_id", "chunk_text")
    a.except(b).count() shouldBe 0L
    b.except(a).count() shouldBe 0L
  }

  test("archive-to-tensor: raw WARC bytes → records → blocklist + extraction → packed chunks") {
    import graft.io.WarcRecords
    // the full mouth-to-tensor path: multi-record archive BYTES in,
    // packed training chunks out — no manual (url, html) step left
    def rec(uri: String, html: String): Array[Byte] = {
      val p = html.getBytes("UTF-8")
      (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
        s"Content-Length: ${p.length}\r\n\r\n").getBytes("ISO-8859-1") ++
        p ++ "\r\n\r\n".getBytes("ISO-8859-1")
    }
    val srcDocs = pool.limit(40).select("doc_id", "text")
      .as[(Long, String)].collect()
    val (blockedSrc, okSrc) = srcDocs.partition(_._1 % 5 == 0)
    def archive(rows: Seq[(Long, String)], host: String): Array[Byte] =
      rows.toArray.flatMap { case (id, text) =>
        rec(s"https://$host/p/$id",
          s"<html><body><p>$text</p><script>junk()</script></body></html>")
      }
    val archives = Seq(
      ("arch0", archive(blockedSrc.toSeq, "blocked.example")),
      ("arch1", archive(okSrc.take(okSrc.length / 2).toSeq, "ok.example")),
      ("arch2", archive(okSrc.drop(okSrc.length / 2).toSeq, "ok.example")))
      .toDF("path", "content")
    val crawl = WarcRecords.toCrawlDocs(archives)
    crawl.count() shouldBe 40L
    val outW = TrainingCorpusPipeline.run(crawl, holdout, "doc_id", "text",
      cfg.copy(htmlCol = Some("html"), urlCol = Some("url")),
      urlBlocklist = Some(Seq("blocked.example").toDF("domain")))
    outW.count() should be > 0L
    // the blocked archive's documents never reach the corpus: their
    // (archive, record position) ids (toCrawlDocs' id rule) are
    // absent from the output — all of arch0's record slots
    val blockedIds = blockedSrc.indices.toDF("ridx")
      .select(xxhash64(lit("arch0"), col("ridx").cast("int")).as("doc_id"))
    outW.join(blockedIds, Seq("doc_id"), "left_semi").count() shouldBe 0L
    // extraction really ran: no markup, no script bodies in chunks
    outW.filter(col("chunk_text").contains("junk()")).count() shouldBe 0L
    outW.filter(col("chunk_text").contains("<p>")).count() shouldBe 0L
  }

  test("opt-in media gate: a doc whose every image is a losing duplicate drops; media-less docs pass") {
    val crawl = pool.limit(3).select("doc_id", "text")
      .as[(Long, String)].collect()
    val fixture = Seq(
      (1L, crawl(0)._2),                           // owns both originals
      (2L, crawl(1)._2),                           // all images copies of 1's
      (3L, crawl(2)._2))                           // no media rows at all
      .toDF("doc_id", "text")
    val media = Seq(
      (10L, 1L, "imgA"), (11L, 1L, "imgB"),
      (20L, 2L, "imgA"), (21L, 2L, "imgB"))
      .toDF("media_id", "doc_id", "p")
      .withColumn("payload", encode(col("p"), "UTF-8"))
    val out = TrainingCorpusPipeline.run(fixture, holdout, "doc_id",
      "text", cfg.copy(nearDupThreshold = 0.99), media = Some(media))
    val ids = out.select("doc_id").distinct().as[Long].collect().sorted
    ids should contain allOf (1L, 3L)
    ids should not contain 2L
    // without the media relation the same doc survives (the gate is
    // opt-in, media evidence only)
    TrainingCorpusPipeline.run(fixture, holdout, "doc_id", "text",
        cfg.copy(nearDupThreshold = 0.99))
      .select("doc_id").distinct().as[Long].collect() should contain (2L)
  }

  test("mediaPerceptualDedup: a re-encoded gallery survives the byte gate and drops under the perceptual one") {
    import graft.multimodal.PerceptualHash
    val crawl = pool.limit(3).select("doc_id", "text")
      .as[(Long, String)].collect()
    val fixture = Seq(
      (1L, crawl(0)._2),   // owns the original rendering
      (2L, crawl(1)._2),   // same pixels re-encoded BMP: zero shared
                           // bytes, so it WINS its byte group — only
                           // perceptual election sees through it
      (3L, crawl(2)._2))   // a genuinely different image
      .toDF("doc_id", "text")
    val media = Seq((10L, 1L, 4L, "png"), (20L, 2L, 4L, "bmp"),
        (30L, 3L, 21L, "png"))
      .toDF("media_id", "doc_id", "gid", "fmt")
      .select(col("media_id"), col("doc_id"),
        PerceptualHash.renderLetterboxImage16(col("gid") * 7,
          col("gid") % 5 + 1, col("gid") % 11 + 1, col("gid") % 3,
          lit(0L), col("fmt")).as("payload"))
    val base = cfg.copy(nearDupThreshold = 0.99)
    // byte gate: every image is byte-unique → every doc an owner
    TrainingCorpusPipeline.run(fixture, holdout, "doc_id", "text", base,
        media = Some(media))
      .select("doc_id").distinct().as[Long].collect().sorted shouldBe
      Array(1L, 2L, 3L)
    // perceptual gate: doc 2's only image collapses onto doc 1's keeper
    TrainingCorpusPipeline.run(fixture, holdout, "doc_id", "text",
        base.copy(mediaPerceptualDedup = true), media = Some(media))
      .select("doc_id").distinct().as[Long].collect().sorted shouldBe
      Array(1L, 3L)
  }

  test("mediaKindCol seats the UNIFIED gate: PNG→BMP, 16→8-bit WAV, and trimmed-video galleries all drop; NULL-payload and media-less docs pass") {
    import graft.multimodal.{AudioWave, Multimodal, PerceptualHash}
    val crawl = pool.limit(8).select("doc_id", "text")
      .as[(Long, String)].collect()
    val fixture = (1L to 8L).map(i => (i, crawl(i.toInt - 1)._2))
      .toDF("doc_id", "text")
    def img(fmt: String) =
      PerceptualHash.renderGrayImage(16, 16, 28, 5, 5, 1, 0, fmt)
    // multiples of 256 in [-32768, 31744]: the 16→8-bit truncating
    // re-encode round-trips exactly (the AudioWave normalization
    // contract), so the re-master's envelope hash lands at Hamming 0
    val samples = Array.tabulate(1024) { t =>
      val w = t / 16
      (t % 64 - 32) * (if ((w * w + 5 * w) % 97 < 32) 4 else 1) * 256
    }
    def wav(bits: Int) = AudioWave.writeWav(samples, 16000, bits)
    def video(range: Range) = Multimodal.packImageFrames(
      range.map(f => PerceptualHash.renderGrayImage(16, 16, 7,
        f % 5 + 1, (2 * f) % 11 + 1, f % 3, 0, "png")))
    val media = Seq(
      (10L, 1L, "image", img("png")),
      (20L, 2L, "image", img("bmp")),     // same pixels, zero shared bytes
      (30L, 3L, "audio", wav(16)),
      (40L, 4L, "audio", wav(8)),         // quiet 8-bit re-master
      (50L, 5L, "video", video(0 to 5)),
      (60L, 6L, "video", video(1 to 5)),  // trimmed re-upload
      (70L, 7L, "audio", null.asInstanceOf[Array[Byte]])) // failed fetch
      .toDF("media_id", "doc_id", "kind", "payload")      // doc 8: no media
    val base = cfg.copy(nearDupThreshold = 0.99, mediaPerceptualDedup = true)
    // the image-pinned perceptual gate is BLIND to the audio/video
    // re-masters (NULL image-hashes → always "original"): only the
    // BMP re-encode drops — exactly the gap mediaKindCol closes
    TrainingCorpusPipeline.run(fixture, holdout, "doc_id", "text", base,
        media = Some(media))
      .select("doc_id").distinct().as[Long].collect().sorted shouldBe
      Array(1L, 3L, 4L, 5L, 6L, 7L, 8L)
    // the unified gate: every kind's re-master collapses onto its
    // keeper; the NULL-payload doc (no evidence) and the media-less
    // doc pass untouched
    TrainingCorpusPipeline.run(fixture, holdout, "doc_id", "text",
        base.copy(mediaKindCol = Some("kind")), media = Some(media))
      .select("doc_id").distinct().as[Long].collect().sorted shouldBe
      Array(1L, 3L, 5L, 7L, 8L)
    // kindCol without the perceptual legs is a config error, loudly
    an[IllegalArgumentException] should be thrownBy
      TrainingCorpusPipeline.run(fixture, holdout, "doc_id", "text",
        cfg.copy(mediaKindCol = Some("kind")), media = Some(media))
  }

  test("urlDedup stage: tracker-variant re-crawls collapse before any text stage; NULL urls pass") {
    // two crawls of the same page under tracking noise + one distinct
    // page + one NULL-url row: the keep-first rule must admit exactly
    // ids {1, 3, 4} into the pipeline proper
    val crawl = pool.limit(3).select("doc_id", "text")
      .as[(Long, String)].collect()
    val fixture = Seq(
      (1L, crawl(0)._2, "https://Site.example/p?utm_c=x"),
      (2L, crawl(1)._2, "https://site.example:443/p#top"), // ≡ id 1 canonical
      (3L, crawl(2)._2, "https://site.example/q"),
      (4L, crawl(0)._2 + " tail variation four", null.asInstanceOf[String]))
      .toDF("doc_id", "text", "url")
    val outD = TrainingCorpusPipeline.run(fixture, holdout, "doc_id",
      "text", cfg.copy(urlCol = Some("url"), urlDedup = true,
        nearDupThreshold = 0.99))
    val ids = outD.select("doc_id").distinct().as[Long].collect().sorted
    ids should contain (1L)
    ids should not contain 2L
    // urlDedup without urlCol is a config error, caught up front
    an[IllegalArgumentException] should be thrownBy
      TrainingCorpusPipeline.run(fixture, holdout, "doc_id", "text",
        cfg.copy(urlDedup = true))
  }

  test("htmlCol aliased to textCol or idCol fails loudly at the front door") {
    // the htmlCol path drops htmlCol after the extraction join — an
    // alias would silently delete a role column mid-pipeline; run()
    // must reject the config before any stage executes
    val crawl = pool.limit(5).withColumn("html", col("text"))
    an[IllegalArgumentException] should be thrownBy
      TrainingCorpusPipeline.run(crawl, holdout, "doc_id", "text",
        cfg.copy(htmlCol = Some("text")))
    an[IllegalArgumentException] should be thrownBy
      TrainingCorpusPipeline.run(crawl, holdout, "doc_id", "text",
        cfg.copy(htmlCol = Some("doc_id")))
  }

  test("tokenize: the built corpus encodes under a frozen vocabulary; artifacts round-trip") {
    import graft.operators.UnigramTokenizer
    import graft.io.TokenizerArtifacts
    // the production order: build the corpus, train the tokenizer on
    // the SURVIVING docs (EM to target), persist, encode the chunks
    val survivors = pool.join(out.select("doc_id").distinct(),
      Seq("doc_id"), "left_semi")
    val vocab = UnigramTokenizer.emTrain(survivors, "text",
      seedSize = 80, targetSize = 40, rounds = 2, maxPieceLen = 4)
    val dir = java.nio.file.Files.createTempDirectory("tok").toString + "/v"
    TokenizerArtifacts.saveUnigram(dir, vocab)
    val toks = TrainingCorpusPipeline.tokenize(out,
      TokenizerArtifacts.loadUnigram(spark, dir)).persist()
    // every chunk tokenizes; pieces reconstruct each chunk's words
    toks.select("doc_id", "chunk_id").distinct().count() shouldBe out.count()
    val rebuilt = toks
      .groupBy("doc_id", "chunk_id", "word_pos")
      .agg(concat_ws("", array_sort(collect_list(struct(col("piece_pos"),
        col("piece")))).getField("piece")).as("word"))
      .groupBy("doc_id", "chunk_id")
      .agg(concat_ws(" ", array_sort(collect_list(struct(col("word_pos"),
        col("word")))).getField("word")).as("text"))
    rebuilt.join(out, Seq("doc_id", "chunk_id"))
      .filter(col("text") =!= col("chunk_text")).count() shouldBe 0L
    // the corpus alphabet spells its own chunks: no unk rows here
    toks.filter(col("piece_id").isNull).count() shouldBe 0L
    toks.unpersist()
  }

  test("opt-in model quality gate: the classifier's junk drops; live ≡ backfill") {
    import graft.ml.QualityFilter
    // train a quality model on a labeled seed OUTSIDE the pipeline
    // (the DCLM shape: quality is judged against an external standard)
    val seed = ((1L to 20L).map(i =>
        (i, s"the committee published its annual report on policy $i outcomes", 1)) ++
      (21L to 40L).map(i =>
        (i, s"zzz qqq $i xx kk zz qq xk zx kq free free free click click", 0)))
      .toDF("doc_id", "text", "label")
    val m = QualityFilter.train(seed, "doc_id", "text", "label",
      dim = 256, maxIter = 20)
    // plant an unmistakable junk doc; it passes the structural quality
    // floor (mean token length in band) so only the model can drop it
    val junk = (9500001L,
      "zzz qqq xx kk zz qq xk zx kq free free free click click here")
    val pool2 = pool.union(Seq(junk).toDF("doc_id", "text"))
    val on = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text",
      cfg, qualityModel = Some((m, 0.5)))
    on.filter(col("doc_id") === junk._1).count() shouldBe 0L
    on.count() should be > 0L
    val off = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text", cfg)
    off.filter(col("doc_id") === junk._1).count() should be > 0L
    // live ≡ backfill: gating inside the pipeline produces the same
    // corpus as pre-filtering the pool with the same model+threshold
    val backfill = TrainingCorpusPipeline.run(
      QualityFilter.filter(m, pool2, "doc_id", "text", minP = 0.5),
      holdout, "doc_id", "text", cfg)
    val a = on.select("doc_id", "chunk_id", "chunk_text", "split")
    val b = backfill.select("doc_id", "chunk_id", "chunk_text", "split")
    a.except(b).count() shouldBe 0L
    b.except(a).count() shouldBe 0L
  }

  test("opt-in perplexity tail cut: the group's worst-cost doc drops; no-bigram docs pass") {
    // The LM is SELF-trained, so a repeated junk pattern would score
    // perfectly (its pairs are their own only context, p=1 — the
    // pathology CCNet avoids with an external LM). The reliable plant
    // alternates the corpus's most common context token with DISTINCT
    // one-shot tokens: half its bigrams cost −ln(c(the·)) ≈ −7.8
    // nats, mean ≈ 3.87 vs the natural corpus max 3.64 — measured
    // dead-last (percent_rank 1.0) on this pool, firmly in the tail
    // bucket. It passes the quality floor (mean token length in band
    // → 0.6) so only the perplexity stage can drop it.
    val junk = (9400001L, (1 to 8).map(i => s"the zq$i").mkString(" "), "web")
    val solo = (9400002L, "solo", "web") // 1 token: no bigram evidence
    val pool2 = pool.withColumn("source", lit("web"))
      .union(Seq(junk, solo).toDF("doc_id", "text", "source"))
    val on = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text",
      cfg.copy(pplTailGroupCol = Some("source")))
    on.filter(col("doc_id") === 9400001L).count() shouldBe 0L
    on.filter(col("doc_id") === 9400002L).count() should be > 0L
    on.count() should be > 0L
    val off = TrainingCorpusPipeline.run(pool2, holdout, "doc_id", "text", cfg)
    off.filter(col("doc_id") === 9400001L).count() should be > 0L
  }
}
