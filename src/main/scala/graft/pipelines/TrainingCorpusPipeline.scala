package graft.pipelines

import graft.functions.TextFns
import graft.operators.{Chunking, Decontaminate, Dedup, LineDedup, Packing, Sampling}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The end-to-end training-corpus build — the composition the
  * individual operators exist for, wired in the canonical order a
  * production data pipeline runs them:
  *
  *   -3. URL blocklist      (opt-in: UrlCuration.blocklistFilter —
  *                           suffix-semantics domain gate over the URL
  *                           alone; the RefinedWeb/FineWeb URL-FIRST
  *                           order — condemned domains never have a
  *                           byte of text read)
  *   -2. HTML extraction    (opt-in: HtmlExtract.extractText — raw
  *                           crawl pages become prose with the block
  *                           line breaks the line stages key on)
  *   0. incremental gate    (opt-in: Dedup.bloomDedupe vs a historical
  *                           corpus index — skip what's already kept)
  *   0.5 incremental NEAR-dup gate (opt-in: TextIndex.dedupeAgainstIndex
  *                           vs the persisted MinHash band index — skip
  *                           reworded re-crawls of what's already kept;
  *                           history streams, never shuffles)
  *   0.6 incremental SEMANTIC gate (opt-in: SemanticIndex
  *                           .dedupeAgainstIndex vs the persisted
  *                           vector-cell index — skip PARAPHRASE-level
  *                           re-crawls no shingle survives; cheapest
  *                           evidence first: exact < shingle < cosine)
  *   0b. line dedup         (opt-in: LineDedup.firstOccurrence — strip
  *                           corpus-wide boilerplate LINES before any
  *                           scoring sees them; the CCNet order)
  *   1. quality filter      (TextFns.qualityScore ≥ minQuality)
  *   1b. language filter    (opt-in: LangId.predict ∈ keepLangs — the
  *                           CCNet seating, before any dedup spend)
  *   2. exact dedup         (Dedup.exact — cheap, removes the bulk;
  *                           opt-in boilerplate ceiling AFTER it, so
  *                           shingle doc-frequency counts distinct
  *                           contents, not crawl copies)
  *   2c. LM floor           (opt-in: UnigramLm.selfScore over the
  *                           exact-deduped pool ≥ lmLogProbFloor —
  *                           the CCNet-style improbable-token gate)
  *   2d. perplexity tail    (opt-in: BigramLm.perplexityBuckets per
  *                           pplTailGroupCol — the RELATIVE CCNet
  *                           head/middle/tail cut; tail bucket drops)
  *   2e. model quality gate (opt-in: QualityFilter.filter — a TRAINED
  *                           classifier's P(quality) ≥ threshold, the
  *                           DCLM/FineWeb-Edu stage; scored on the
  *                           deduped pool, before the near-dup spend)
  *   3. near-dup dedup      (Dedup.nearDupGroups — MinHash-LSH +
  *                           connected components, min-id survivor)
  *   3b. span excision      (opt-in: Dedup.exciseRepeatedSpans — cut
  *                           cross-doc repeated n-gram runs from the
  *                           survivors, keeping each span's first
  *                           occurrence; the Lee et al. ExactSubstr
  *                           pass in the production order)
  *   4. decontamination     (exact + LSH near-dup leaks vs the eval
  *                           holdout, opt-in verbatim-n-gram detector —
  *                           leaked docs DROPPED)
  *   4c. token budget       (opt-in: Sampling.tokenBudgetSelect —
  *                           unbiased md5-order prefix of the clean
  *                           corpus to a total token budget)
  *   5. chunking            (Chunking.tokenWindows)
  *   6. sequence packing    (Packing.greedyPack on chunk token counts)
  *   7. deterministic split (Sampling.hashSplit on the doc id, so all
  *                           chunks of a document land in ONE split —
  *                           splitting per chunk would leak overlapping
  *                           windows of the same text across splits)
  *   8. curriculum order    (opt-in: Sampling.curriculumOrder — a
  *                           short-docs-first `pos` column, all chunks
  *                           of a doc sharing its position)
  *
  * Every stage is the already-verified operator — this object adds no
  * new math, only the composition and its ordering constraints
  * (dedup BEFORE chunking so near-dup detection sees whole documents;
  * decontamination before chunking for the same reason; the split key
  * is the surviving document, never the chunk).
  *
  * Scale shape: stages 1, 5 are narrow; 2 is one fingerprint shuffle;
  * 3 is the banded-LSH path; 4 crosses corpora on banded collisions
  * only; 6 shuffles once on the pack group; 7 is narrow. No stage
  * collects to the driver.
  */
object TrainingCorpusPipeline {

  case class Config(
      minQuality: Double = 0.3,
      shingleN: Int = 3,
      numHashes: Int = 128,
      bands: Int = 32,
      nearDupThreshold: Double = 0.8,
      chunkWindow: Int = 64,
      chunkStride: Int = 32,
      packBudget: Long = 256L,
      // matches greedyPack's own default: 0 = auto-size one group per
      // ~8k chunks (Packing.suggestGroups), so group count scales with
      // the corpus instead of a fixed constant
      packGroups: Int = 0,
      splits: Seq[(String, Double)] = Seq("train" -> 0.9, "eval" -> 0.1),
      // ---- opt-in curation stages (None/default = stage off, prior
      // pipeline behavior unchanged) ----
      // drop docs whose share of corpus-common shingles exceeds this
      // (Dedup.boilerplateFraction > maxBoilerplate → templated content)
      maxBoilerplate: Option[Double] = None,
      boilerplateMinDocs: Int = 10,
      // additionally drop docs sharing ANY verbatim n-gram with the
      // eval holdout (Decontaminate.ngramLeaks — the strict GPT-3-style
      // detector on top of the Jaccard ones)
      ngramLeakN: Option[Int] = None,
      // expected size hint for the historical-index Bloom filter
      bloomExpectedItems: Long = 1000000L,
      // drop docs whose mean log-prob under the corpus's own unigram
      // LM (UnigramLm.selfScore, built on the exact-deduped pool so
      // crawl copies don't bias the LM) falls below the floor —
      // gibberish/wrong-language tail (CCNet-style)
      lmLogProbFloor: Option[Double] = None,
      // cut the decontaminated corpus to a total token budget
      // (Sampling.tokenBudgetSelect — unbiased md5-order prefix)
      tokenBudget: Option[Long] = None,
      // emit a `pos` training-order column: sequence-length curriculum
      // (Sampling.curriculumOrder over n-char bins of this width,
      // short docs first; all chunks of a doc share its position)
      curriculumBinChars: Option[Int] = None,
      // rewrite every document to its corpus-unique lines BEFORE any
      // scoring (LineDedup.firstOccurrence on this separator) — the
      // CCNet boilerplate-line strip; docs reduced to nothing (pure
      // boilerplate) are dropped
      lineDedupSep: Option[String] = None,
      // canonically normalize text at ingest (UnicodeNorm.normalize,
      // usually "NFC") BEFORE every hashing stage — including the
      // historical-index gate, whose index must then also hold
      // normalized text — so byte-different spellings of identical
      // text dedup together instead of hashing apart
      normalizeForm: Option[String] = None,
      // excise cross-doc repeated word n-grams of this width from the
      // near-dup survivors (Dedup.exciseRepeatedSpans, the Lee et al.
      // ExactSubstr pass): each repeated span keeps its globally-first
      // occurrence; docs rebuilt to empty are dropped
      spanExciseN: Option[Int] = None,
      // keep only documents whose profile-scored language
      // (LangId.predict) lands in this set — the CCNet order: language
      // ID right after the quality floor, before any dedup spend.
      // "und" (no profile hit) is kept only if listed.
      keepLangs: Option[Set[String]] = None,
      // per-group CCNet perplexity cut (BigramLm.perplexityBuckets):
      // bucket docs by bigram-LM cost WITHIN each value of this
      // column (source/language — per-group cuts are the point:
      // absolute perplexity scales differ across groups) and drop the
      // tail bucket. Docs with no bigrams carry no LM evidence and
      // pass (the structural gates judge them). Runs on the
      // exact-deduped pool, same seating rationale as the LM floor.
      pplTailGroupCol: Option[String] = None,
      // bucket count for the perplexity cut: 3 = CCNet's
      // head/middle/tail, only the last bucket drops
      pplBuckets: Int = 3,
      // treat this input column as RAW HTML: the pipeline front-ends
      // with HtmlExtract.extractText and the extracted prose becomes
      // textCol for every later stage — the crawl-to-tensor form
      htmlCol: Option[String] = None,
      // URL column for the blocklist gate (used with run()'s
      // urlBlocklist) — the RefinedWeb/FineWeb URL-FIRST seating:
      // blocked domains drop before a byte of text is touched
      urlCol: Option[String] = None,
      // opt-in stage -2.5: canonical-URL keep-first dedup (UrlCuration
      // .canonicalUrlDedup) — re-crawls differing only in tracker
      // params / fragment / case / default port collapse BEFORE HTML
      // extraction or any text stage spends a cycle on them; the
      // cheapest dedup in the pipeline, seated earliest. Requires
      // urlCol; NULL-url rows all pass (gated elsewhere)
      urlDedup: Boolean = false,
      // upgrade the media originality gate (run()'s `media`) from
      // byte-fingerprint election to PERCEPTUAL election
      // (Multimodal.dropAllDuplicateImageDocsPerceptual): re-encoded
      // gallery copies (PNG→BMP shares zero bytes) collapse onto one
      // keeper instead of each counting as "original", so the
      // scraped-gallery spam the gate exists for actually drops.
      // Requires an integral media_id column in the media relation
      mediaPerceptualDedup: Boolean = false,
      // name of the media relation's KIND column ('image'/'audio'/
      // 'video') — set it to upgrade the perceptual gate from the
      // image-pinned special case to the UNIFIED gate
      // (Multimodal.dropAllDuplicateMediaDocs): audio re-masters
      // (16→8-bit, volume) and trimmed/re-encoded video galleries
      // then drop from the production pipeline exactly as re-encoded
      // images do, instead of riding through with NULL image-hashes
      // as always-"original". Requires mediaPerceptualDedup (byte
      // election is already kind-agnostic without it)
      mediaKindCol: Option[String] = None,
      // embedding column (array<float/double>) for the opt-in stage
      // 0.6 SEMANTIC incremental gate — used with run()'s
      // semanticIndex: docs whose embedding near-duplicates the
      // persisted vector-cell index (paraphrase-level re-crawls of
      // already-kept documents — evidence the exact Bloom gate and
      // the shingle near-dup gate are both blind to) drop before any
      // scoring is spent on them. Docs with a NULL/corrupt embedding
      // carry no semantic evidence and PASS (the SemanticIndex
      // cleanVecs convention — the text gates judge them)
      embeddingCol: Option[String] = None)

  /** docs(idCol, textCol) + evalHoldout(idCol, textCol) →
    * (doc_id, chunk_id, n_chunk_tokens, chunk_text, pack_group, bin,
    * truncated, split[, pos when curriculumBinChars is set]).
    * Deterministic: same inputs → same corpus, any cluster size.
    *
    * Cache contract (inherited from Dedup/Decontaminate and the
    * persists below): the returned plan holds MEMORY_AND_DISK
    * intermediates that Spark can only release after the result is
    * consumed — materialize, then `spark.catalog.clearCache()` in a
    * long-lived session. The dedup survivor set is additionally a
    * localCheckpoint (lineage truncation, see stage 3 — EAGER, which
    * is deadlock-load-bearing, not a convenience; the why lives at
    * the stage-3 comment): its
    * blocks are released by RDD garbage collection once the returned
    * Dataset is unreferenced — NOT by clearCache() — and, unlike a
    * persist, are not recomputable if an executor holding them is
    * lost mid-job (rerun the pipeline in that case; it is
    * deterministic). */
  def run(docs: DataFrame, evalHoldout: DataFrame, idCol: String,
          textCol: String, cfg: Config = Config(),
          historicalIndex: Option[DataFrame] = None,
          qualityModel: Option[(org.apache.spark.ml.classification.LogisticRegressionModel, Double)] = None,
          urlBlocklist: Option[DataFrame] = None,
          media: Option[DataFrame] = None,
          textNearDupIndex: Option[graft.io.TextIndexArtifacts.PersistedTextIndex] = None,
          semanticIndex: Option[graft.io.SemanticIndexArtifacts.PersistedSemanticIndex] = None): DataFrame =
    runStaged(docs, evalHoldout, idCol, textCol, cfg, historicalIndex,
      qualityModel, urlBlocklist, media, textNearDupIndex, semanticIndex)._1

  /** [[run]] plus the STAGE-ATTRIBUTED curation funnel — the
    * [[StreamingIngestPipeline.ArchiveIngestBatch.funnel]] pattern
    * for the batch pipeline: a thunk producing ONE row of per-stage
    * doc-level drop counts (docs_in, <stage>_drops…, survivors) that
    * reconciles BY CONSTRUCTION (docs_in − Σ drops = survivors —
    * each drop column is a frame-count DIFF between consecutive
    * stages). Disabled stages report 0 (their frame IS the previous
    * frame — detected by reference, counted once). A THUNK on
    * purpose: attribution counts every doc-level stage frame, and
    * stage i's count re-runs the sub-DAG above it (bounded by the
    * stage-3 checkpoint and the stage-4c persist), so only callers
    * that want the audit pay for it. Call it AFTER materializing the
    * corpus (the frames share the run's cached intermediates). */
  def runWithFunnel(docs: DataFrame, evalHoldout: DataFrame, idCol: String,
          textCol: String, cfg: Config = Config(),
          historicalIndex: Option[DataFrame] = None,
          qualityModel: Option[(org.apache.spark.ml.classification.LogisticRegressionModel, Double)] = None,
          urlBlocklist: Option[DataFrame] = None,
          media: Option[DataFrame] = None,
          textNearDupIndex: Option[graft.io.TextIndexArtifacts.PersistedTextIndex] = None,
          semanticIndex: Option[graft.io.SemanticIndexArtifacts.PersistedSemanticIndex] = None): (DataFrame, () => DataFrame) = {
    val (out, frames) = runStaged(docs, evalHoldout, idCol, textCol, cfg,
      historicalIndex, qualityModel, urlBlocklist, media, textNearDupIndex,
      semanticIndex)
    val spark = out.sparkSession
    val funnel = () => {
      val counts = new Array[Long](frames.length)
      frames.zipWithIndex.foreach { case ((_, f), i) =>
        counts(i) =
          if (i > 0 && (f eq frames(i - 1)._2)) counts(i - 1) else f.count()
      }
      val names = "docs_in" +:
        frames.tail.map(_._1 + "_drops") :+ "survivors"
      val values: Seq[Any] = counts.head +:
        (1 until frames.length).map(i => counts(i - 1) - counts(i)) :+
        counts.last
      spark.createDataFrame(
        java.util.Collections.singletonList(
          org.apache.spark.sql.Row.fromSeq(values)),
        org.apache.spark.sql.types.StructType(names.map(n =>
          org.apache.spark.sql.types.StructField(n,
            org.apache.spark.sql.types.LongType, nullable = false))))
    }
    (out, funnel)
  }

  private def runStaged(docs: DataFrame, evalHoldout: DataFrame, idCol: String,
          textCol: String, cfg: Config,
          historicalIndex: Option[DataFrame],
          qualityModel: Option[(org.apache.spark.ml.classification.LogisticRegressionModel, Double)],
          urlBlocklist: Option[DataFrame],
          media: Option[DataFrame],
          textNearDupIndex: Option[graft.io.TextIndexArtifacts.PersistedTextIndex],
          semanticIndex: Option[graft.io.SemanticIndexArtifacts.PersistedSemanticIndex]): (DataFrame, Seq[(String, DataFrame)]) = {
    // config sanity: the htmlCol path drops htmlCol after joining the
    // extracted text in as textCol — htmlCol colliding with either
    // role column would silently delete the column every later stage
    // reads. Fail loudly at the front door instead.
    require(cfg.htmlCol.forall(_ != textCol),
      s"Config.htmlCol must differ from textCol ('$textCol'): the " +
        "extracted text replaces textCol and the raw-HTML column is " +
        "dropped — aliasing them would drop the extracted text too")
    require(cfg.htmlCol.forall(_ != idCol),
      s"Config.htmlCol must differ from idCol ('$idCol')")
    // validated on cfg ALONE at the front door (not inside the media
    // branch): the misconfiguration must fail loudly even on a run
    // that happens to pass media = None — a silent no-op config would
    // misread as a seated gate on the next run that wires media in
    require(cfg.mediaKindCol.isEmpty || cfg.mediaPerceptualDedup,
      "Config.mediaKindCol requires mediaPerceptualDedup: the byte " +
        "election is already kind-agnostic — a kind column changes " +
        "nothing without the perceptual legs")
    // the semantic gate needs BOTH halves: an index without a column
    // name cannot be judged (fail loudly — a silently-skipped gate
    // would misread as seated on every later run)
    require(semanticIndex.isEmpty || cfg.embeddingCol.nonEmpty,
      "semanticIndex requires Config.embeddingCol: the semantic gate " +
        "cannot judge without knowing which column holds the embedding")
    // -3. (opt-in) URL blocklist gate: the FIRST stage — suffix-
    // semantics domain blocking over the URL column alone (the
    // RefinedWeb/FineWeb order: no text is read for docs whose
    // domain is already condemned). Requires cfg.urlCol.
    val urlGated = (urlBlocklist, cfg.urlCol) match {
      case (Some(blocked), Some(u)) =>
        graft.operators.UrlCuration.blocklistFilter(docs, u, blocked)
      case (Some(_), None) =>
        throw new IllegalArgumentException(
          "urlBlocklist requires Config.urlCol")
      case _ => docs
    }

    // -2.5 (opt-in) canonical-URL dedup: the cheapest dedup runs
    // before extraction — a re-crawled page differing only in
    // tracking noise never pays HTML extraction, normalization, or
    // any hashing stage. Keep-first by idCol (deterministic).
    val urlDeduped =
      if (!cfg.urlDedup) urlGated
      else {
        val u = cfg.urlCol.getOrElse(throw new IllegalArgumentException(
          "Config.urlDedup requires Config.urlCol"))
        graft.operators.UrlCuration.canonicalUrlDedup(urlGated, u, idCol)
      }

    // -2.25 (opt-in) media originality gate: when a media relation
    // (media_id, <idCol>, payload) rides along, documents whose EVERY
    // image is a LOSING byte-duplicate of media seen elsewhere drop
    // here (scraped-gallery/mirror evidence the text stages cannot
    // see) — media-side evidence, so it seats with the URL-level
    // gates, before a byte of text is read. Docs with no media rows
    // pass (Multimodal.dropAllDuplicateImageDocs's convention).
    val mediaGated = media match {
      case Some(m) if cfg.mediaPerceptualDedup =>
        cfg.mediaKindCol match {
          // UNIFIED gate: per-kind perceptual elections (image dual-
          // hash, audio envelope, video frame-set) behind one byte
          // election — audio/video re-masters drop here too
          case Some(kindCol) =>
            graft.multimodal.Multimodal.dropAllDuplicateMediaDocs(
              urlDeduped, idCol, m, "media_id", idCol, kindCol, "payload")
          case None =>
            graft.multimodal.Multimodal.dropAllDuplicateImageDocsPerceptual(
              urlDeduped, idCol, m, "media_id", idCol, "payload")
        }
      case Some(m) =>
        graft.multimodal.Multimodal.dropAllDuplicateImageDocs(
          urlDeduped, idCol, m, "media_id", idCol, "payload")
      case None => urlDeduped
    }

    // -2. (opt-in) HTML extraction: raw crawl pages become prose —
    // comments/script/style dropped, block structure preserved as
    // the line breaks the line-level stages (0b, C4) key on,
    // entities decoded. The extracted text REPLACES textCol.
    val docsText = cfg.htmlCol match {
      case Some(h) =>
        mediaGated
          .drop(textCol)
          .join(graft.operators.HtmlExtract
              .extractText(mediaGated, idCol, h)
              .select(col(idCol), col("text").as(textCol)),
            Seq(idCol))
          .drop(h)
      case None => mediaGated
    }

    // -1. (opt-in) Unicode normalization: the first text rewrite —
    // every later stage hashes text (Bloom gate, lines, shingles,
    // n-grams), and canonically-equivalent spellings must agree
    // before ANY of them (a narrow codegen'd expression; already-
    // normalized text passes through without copying). The HOLDOUT is
    // normalized with the same form: the decontamination detectors
    // compare train text against holdout text byte-wise, and a
    // normalized-vs-raw mismatch would let canonically-equivalent
    // leaks ship — the exact contamination class this stage exists to
    // close. (historicalIndex, per the Config doc, must already hold
    // normalized text — it is a product of a previous normalized run.)
    val (canon, holdoutCanon) = cfg.normalizeForm match {
      case Some(form) =>
        (docsText.withColumn(textCol,
          graft.functions.UnicodeNorm.normalize(col(textCol), form)),
         evalHoldout.withColumn(textCol,
           graft.functions.UnicodeNorm.normalize(col(textCol), form)))
      case None => (docsText, evalHoldout)
    }

    // 0. (opt-in) incremental dedup against a historical corpus index:
    // the "don't re-ingest what previous crawls kept" gate, before any
    // per-doc scoring is spent on rows that are already in the corpus
    val fresh = historicalIndex match {
      case Some(index) => Dedup.bloomDedupe(canon, index, idCol, textCol,
        cfg.bloomExpectedItems)
      case None => canon
    }

    // 0.5 (opt-in) incremental NEAR-dup gate vs the persisted MinHash
    // band index (a TextIndexArtifacts.PersistedTextIndex — the
    // (band rows, set rows) parquet relations a previous run
    // built/appended, LOADED so the judge runs with the parameters
    // the index was built with: an index built under a different
    // seed/shingle width bands and scores differently, and a silent
    // mismatch would pass everything): reworded/re-encoded re-crawls
    // of already-kept documents drop here, which the exact Bloom gate
    // above is blind to by construction. Seated right after the exact
    // gate, before any per-doc scoring: history streams map-side
    // (never shuffles — the q206 plan contract), so this costs the
    // batch-side banding plus three narrow index scans however large
    // the accumulated corpus is.
    val freshNear = textNearDupIndex match {
      case Some(index) => index.dedupe(fresh, idCol, textCol)
      case None => fresh
    }

    // 0.6 (opt-in) incremental SEMANTIC gate vs the persisted
    // vector-cell index (a SemanticIndexArtifacts
    // .PersistedSemanticIndex — centroids, admitted vectors, and the
    // judge parameters frozen together, so the gate always judges
    // with the threshold/nProbe/maxCell the index was built with):
    // PARAPHRASE-level re-crawls of already-kept documents drop here
    // — rewordings distant enough that no shingle survives, which
    // stage 0.5's Jaccard evidence is blind to (the SemDeDup insight
    // applied incrementally). Seated LAST of the three incremental
    // gates — cheapest evidence first: exact hash (0) < shingle
    // MinHash (0.5) < embedding cosine (0.6) — so the costliest
    // judge sees only what the cheaper two could not already drop.
    // Scale shape: the batch side assigns to nProbe cells and
    // BROADCASTS into the cell join; history streams map-side (the
    // q214 plan contract) — the gate costs |batch|·nCells cosines
    // however large the accumulated index is. Docs with NULL/corrupt
    // embeddings pass (no semantic evidence; the text gates judge
    // them). This gate judges against HISTORY only — batch-internal
    // semantic near-dups are not its job (stage 3's text near-dup
    // catches intra-batch rewordings with shared shingles; a batch-
    // internal embedding election belongs to the ingest path,
    // SemanticIndex.ingestStep, where survivors are indexed).
    val freshSem = (semanticIndex, cfg.embeddingCol) match {
      case (Some(index), Some(vecCol)) =>
        index.dedupe(freshNear, idCol, vecCol)
      case _ => freshNear
    }

    // 0b. (opt-in) line-level boilerplate strip: every distinct line
    // survives only at its corpus-wide first occurrence, documents are
    // rebuilt from their surviving lines. Runs BEFORE quality scoring
    // (the CCNet order) — nav bars and cookie banners would otherwise
    // both depress quality scores of good docs and inflate shingle
    // document-frequencies in every later dedup stage. Docs whose
    // every line is boilerplate rebuild to empty and are dropped.
    val lineClean = cfg.lineDedupSep match {
      case Some(sep) =>
        freshSem.drop(textCol)
          .join(LineDedup.firstOccurrence(freshSem, idCol, textCol, sep)
            .select(col(idCol), col("clean").as(textCol)), Seq(idCol))
          .filter(length(col(textCol)) > 0)
      case None => freshSem
    }

    // 1. quality floor — narrow scan
    val quality = lineClean.filter(
      TextFns.qualityScore(col(textCol)) >= cfg.minQuality)

    // 1b. (opt-in) language filter: the CCNet seating — right after
    // the quality floor, so no dedup/LM/decontamination work is spent
    // on out-of-scope languages. Profile scoring is linear and
    // broadcast-joined (LangId scale notes); survivors are semi-joined
    // back so the text column flows through untouched.
    val langGated = cfg.keepLangs match {
      case Some(langs) =>
        val keep = graft.operators.LangId.predict(quality, idCol, textCol)
          .filter(col("lang_pred").isin(langs.toSeq.sorted: _*))
          .select(col(idCol))
        quality.join(keep, Seq(idCol), "left_semi")
      case None => quality
    }

    // 2. exact dedup: keep the min-id survivor per distinct content
    val exactKeep = Dedup.exact(langGated, idCol, textCol)
      .select(col("keep_id").as(idCol))
    val exactDeduped0 = langGated.join(exactKeep, Seq(idCol), "left_semi")

    // 2b. (opt-in) boilerplate ceiling: drop templated content whose
    // shingles are mostly corpus-common. Runs AFTER exact dedup —
    // shingle document-frequency must count distinct CONTENTS: on the
    // raw pool, a unique article crawled ≥ minDocs times verbatim
    // would push every one of its own shingles over the threshold and
    // annihilate ALL copies, where dedup keeps one.
    val exactDeduped = cfg.maxBoilerplate match {
      case Some(maxFrac) =>
        val keep = Dedup.boilerplateFraction(exactDeduped0, idCol, textCol,
            cfg.shingleN, cfg.boilerplateMinDocs)
          .filter(col("boilerplate_frac") <= maxFrac)
          .select(col("doc").as(idCol))
        exactDeduped0.join(keep, Seq(idCol), "left_semi")
      case None => exactDeduped0
    }

    // 2c. (opt-in) unigram-LM floor: drop the improbable-token tail.
    // Runs on the exact-deduped pool — the LM trains on distinct
    // contents, so a million crawl copies of one page can't inflate
    // its tokens' probabilities (same reasoning as the boilerplate
    // ceiling's seating).
    val lmGated = cfg.lmLogProbFloor match {
      case Some(floor) =>
        val keep = graft.operators.UnigramLm
          .selfScore(exactDeduped, idCol, textCol)
          .filter(col("avg_logprob") >= floor)
          .select(col(idCol))
        exactDeduped.join(keep, Seq(idCol), "left_semi")
      case None => exactDeduped
    }

    // 2d. (opt-in) CCNet perplexity tail cut: per-group equal-
    // frequency buckets on the bigram-LM cost, tail bucket dropped.
    // Complements the ABSOLUTE unigram floor (2c) with the RELATIVE
    // cut CCNet actually ships — a uniformly hard group (rare
    // language, OCR source) keeps its best docs where a global floor
    // would empty it. Same exact-deduped seating: the LM trains on
    // distinct contents. No-bigram docs pass (NULL bucket, no LM
    // evidence either way).
    val pplGated = cfg.pplTailGroupCol match {
      case Some(grp) =>
        val keep = graft.operators.BigramLm
          .perplexityBuckets(lmGated, idCol, textCol, grp, cfg.pplBuckets)
          .filter(col("bucket").isNull || col("bucket") < cfg.pplBuckets)
          .select(col(idCol))
        lmGated.join(keep, Seq(idCol), "left_semi")
      case None => lmGated
    }

    // 2e. (opt-in) model-based quality gate: a TRAINED classifier
    // (graft.ml.QualityFilter — hashed-TF features + binary LR, the
    // DCLM/FineWeb-Edu stage) scores every surviving doc and only
    // P(quality) ≥ minP passes. Seated after the cheap structural and
    // LM gates (score fewer docs) and BEFORE the near-dup stage (the
    // most expensive one — don't band-hash docs the model will drop).
    // The model is trained OUT of band on a labeled seed
    // (QualityFilter.train) and passed in: quality is a property
    // judged against an external standard, not derivable from this
    // corpus alone — unlike the self-trained LM stages.
    val modelGated = qualityModel match {
      case Some((m, minP)) =>
        graft.ml.QualityFilter.filter(m, pplGated, idCol, textCol, minP)
      case None => pplGated
    }

    // 3. near-dup dedup: MinHash-LSH clusters, min-id survivor.
    // EAGER localCheckpoint: `deduped` is re-referenced by every
    // decontamination detector AND the final anti join — four copies
    // of the full stage-0..3 DAG in one logical plan. Truncating
    // lineage here turns them into leaf scans: analysis/AQE cost stays
    // bounded however many detectors are enabled (the same
    // plan-growth fix as Dedup.connectedComponents; without it the
    // fully-enabled pipeline's plan STRING alone is heap-threatening).
    // eager=true is LOAD-BEARING, not a convenience: a lazy
    // localCheckpoint materializes on whatever thread first computes
    // the relation, and when that consumer is a broadcast join the
    // checkpoint's RDD.doCheckpoint runs on a broadcast-exchange
    // thread — whose lock order (RDDCheckpointData$ class lock, then
    // each RDD monitor) DEADLOCKS against dag-scheduler-event-loop's
    // getCacheLocs (RDD monitor, then the class lock). Observed as a
    // hard application freeze (jstack "Found 1 deadlock", zero CPU) in
    // this suite; on a production cluster the same race freezes the
    // whole app. Eager checkpointing runs doCheckpoint on the driver
    // main thread at construction, where the inverted order cannot
    // arise. (Cost: the dedup job launches during run() instead of at
    // first consumption — run()'s callers always consume.) Trade-offs
    // vs persist, documented in run()'s scaladoc: checkpointed
    // partitions are released by RDD GC (not clearCache()), and are
    // not recomputable after an executor loss.
    val nearKeep = Dedup.nearDupGroups(modelGated, idCol, textCol,
        cfg.shingleN, cfg.numHashes, cfg.bands, cfg.nearDupThreshold)
      .select(col("keep_id").as(idCol))
    val deduped0 = modelGated.join(nearKeep, Seq(idCol), "left_semi")
      .localCheckpoint(true)

    // 3b. (opt-in) repeated-span excision: cut cross-doc repeated
    // n-gram runs from the SURVIVORS (the Lee et al. ExactSubstr pass,
    // the production order — doc-level dedup first so span frequency
    // counts distinct contents, then substring-level surgery on what
    // remains). Every repeated span keeps its globally-first
    // occurrence; docs rebuilt to empty (pure boilerplate) drop.
    // Runs BEFORE decontamination: detectors must see the text that
    // will actually ship. Derived from the checkpointed relation, so
    // the plan-growth bound of stage 3 is preserved.
    val deduped = cfg.spanExciseN match {
      case Some(n) => exciseSurvivors(deduped0, idCol, textCol, n)
      case None => deduped0
    }

    // 4. decontamination: drop OUR docs that leak into the eval
    // holdout — exact fingerprint matches plus banded near-dup
    // collisions. Seating differs per detector: exactLeaks /
    // nearDupLeaksLsh flag their SECOND ("eval") argument, so our
    // corpus takes that seat; ngramLeaks (4b) flags pairs with both
    // ids and BROADCASTS its second argument's exploded grams — the
    // small holdout MUST stay second there, and we read train_id.
    val leakedExact = Decontaminate
      .exactLeaks(holdoutCanon, deduped, idCol, textCol)
      .select(col("eval_id").as(idCol))
    val leakedNear = Decontaminate
      .nearDupLeaksLsh(holdoutCanon, deduped, idCol, textCol,
        cfg.shingleN, cfg.numHashes, cfg.bands, cfg.nearDupThreshold)
      .select(col("eval_id").as(idCol))
    // 4b. (opt-in) strict verbatim-span detector: any shared n-gram
    // with the holdout drops the doc, even when global similarity is
    // low (the quoted-benchmark-question case)
    val leakedNgram = cfg.ngramLeakN match {
      case Some(n) => Decontaminate
        .ngramLeaks(deduped, holdoutCanon, idCol, textCol, n)
        .select(col("train_id").as(idCol))
      case None => leakedExact.limit(0)
    }
    // persisted: `clean` feeds chunking AND would otherwise re-run the
    // whole quality→dedup→decontaminate DAG per downstream subtree
    // (identical subplans do not reliably hit ReuseExchange)
    val clean0 = deduped
      .join(leakedExact.union(leakedNear).union(leakedNgram).distinct(),
        Seq(idCol), "left_anti")

    // 4c. (opt-in) token-budget cut: an unbiased md5-order prefix of
    // the clean corpus — "this corpus, but N tokens of it". After
    // decontamination (a budget spent on leaked docs is wasted),
    // before chunking (budgets are FULL documents; cutting chunks
    // would truncate documents mid-text).
    val clean = (cfg.tokenBudget match {
      case Some(budget) => Sampling.tokenBudgetSelect(
          clean0.withColumn("__n_tok",
            TextFns.tokenCount(col(textCol)).cast("long")),
          idCol, "__n_tok", budget)
        .drop("__n_tok", "cum_tokens")
      case None => clean0
    }).persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 5. chunk to training windows — narrow. Persisted: both the pack
    // input and the final join read it.
    val chunks = Chunking.tokenWindows(clean, idCol, textCol,
        cfg.chunkWindow, cfg.chunkStride)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // 6. pack chunks to the token budget. Chunk key = xxhash64(doc,
    // chunk) — arithmetic packing (doc·2²⁰+chunk) would overflow for
    // 64-bit surrogate ids under ANSI and silently COLLIDE for
    // mega-documents; a 64-bit hash has neither failure mode (collision
    // odds are the corpus-scale-negligible birthday bound) and packing
    // needs only a deterministic, well-spread key. Pack identity =
    // (pack_group, bin) from greedyPack.
    val chunkKey = xxhash64(col(idCol), col("chunk_id"))
    val packed = Packing.greedyPack(
      chunks.select(chunkKey.as("__ck"), col("n_chunk_tokens")),
      "__ck", "n_chunk_tokens", cfg.packBudget, cfg.packGroups)

    // 7. split on the DOCUMENT id — overlapping windows of one text
    // must never straddle train/eval. hashSplit is a pure function of
    // the id column, so it applies directly to the joined chunk rows.
    val split = Sampling.hashSplit(
      chunks
        .join(packed.select(col("doc_id").as("__ck"),
          col("pack_group"), col("bin"), col("truncated")),
          chunkKey === col("__ck"))
        .drop("__ck"),
      idCol, cfg.splits)

    // 8. (opt-in) curriculum position: sequence-length order over the
    // surviving DOCUMENTS (short first, md5-shuffled within a bin);
    // every chunk carries its document's position — downstream orders
    // by (pos, chunk_id) for the curriculum epoch.
    val out = cfg.curriculumBinChars match {
      case Some(binChars) =>
        val pos = Sampling.curriculumOrder(
            clean.select(col(idCol),
              (length(col(textCol)) / lit(binChars)).cast("int").as("__bin")),
            idCol, "__bin")
          .select(col(idCol), col("pos"))
        split.join(pos, Seq(idCol), "left")
      case None => split
    }
    // the DOC-level stage frames, in pipeline order — what
    // runWithFunnel diffs into per-stage drop counts. Disabled
    // stages alias the previous frame (reference-equal → 0 drops,
    // counted once). The unicode-norm stage is deliberately absent:
    // it rewrites text and can drop nothing.
    (out, Seq(
      "input" -> docs, "url_blocklist" -> urlGated,
      "url_dedup" -> urlDeduped, "media_gate" -> mediaGated,
      "html_extract" -> docsText, "bloom_exact_gate" -> fresh,
      "text_neardup_gate" -> freshNear, "semantic_gate" -> freshSem,
      "line_dedup" -> lineClean, "quality_floor" -> quality,
      "lang_filter" -> langGated, "exact_dedup" -> exactDeduped0,
      "boilerplate_ceiling" -> exactDeduped, "lm_floor" -> lmGated,
      "ppl_tail" -> pplGated, "model_gate" -> modelGated,
      "near_dedup" -> deduped0, "span_excise" -> deduped,
      "decontamination" -> clean0, "token_budget" -> clean))
  }

  /** Stage 3b: repeated-span excision over the dedup survivors. Docs
    * with zero cuts keep their ORIGINAL text: the excision's `clean`
    * is rebuilt via tokenize+join, which collapses newlines/tabs to
    * single spaces — destructive for code or line-structured docs, so
    * that normalization is only paid where a span was actually cut.
    * The empty-after-rebuild drop still tests `clean`, so a doc with
    * no real tokens drops either way (pure boilerplate after cuts, or
    * whitespace-only before them). */
  private[pipelines] def exciseSurvivors(docs: DataFrame, idCol: String,
      textCol: String, n: Int): DataFrame =
    docs
      .join(Dedup.exciseRepeatedSpans(docs, idCol, textCol, n)
        .filter(length(col("clean")) > 0)
        .select(col(idCol), col("n_removed"), col("clean")), Seq(idCol))
      .withColumn(textCol,
        when(col("n_removed") === 0, col(textCol)).otherwise(col("clean")))
      .drop("n_removed", "clean")

  /** The final corpus→tensor step: token ids for [[run]]'s output
    * under a FROZEN unigram vocabulary
    * ([[graft.operators.UnigramTokenizer.encodeWith]] — learn once or
    * load via [[graft.io.TokenizerArtifacts]], never relearn on the
    * built corpus). One row per piece occurrence, keyed
    * (doc_id, chunk_id, word_pos, piece_pos) with the piece and its
    * vocabulary id (NULL id = unspellable `<unk>`); pack/split columns
    * re-join on (doc_id, chunk_id). Same scale shape as the applier:
    * chunk text pays one word-count shuffle, vocabulary broadcast. */
  def tokenize(corpus: DataFrame, vocab: DataFrame,
               maxPieceLen: Int = 4): DataFrame =
    graft.operators.UnigramTokenizer.encodeWith(
        corpus.withColumn("__ck", struct(col("doc_id"), col("chunk_id"))),
        "__ck", "chunk_text", vocab, maxPieceLen)
      .select(col("__ck.doc_id").as("doc_id"),
        col("__ck.chunk_id").as("chunk_id"),
        col("word_pos"), col("piece_pos"), col("piece"), col("piece_id"))

  /** [[tokenize]]'s BPE twin: frozen merge list + alphabet
    * ([[graft.operators.Vocabulary.bpeEncodeWith]]); unknown SYMBOLS
    * carry NULL ids (BPE is open-vocabulary — no unspellable words). */
  def tokenizeBpe(corpus: DataFrame, merges: Seq[(String, String)],
                  bpeVocab: DataFrame): DataFrame =
    graft.operators.Vocabulary.bpeEncodeWith(
        corpus.withColumn("__ck", struct(col("doc_id"), col("chunk_id"))),
        "__ck", "chunk_text", merges, bpeVocab)
      .select(col("__ck.doc_id").as("doc_id"),
        col("__ck.chunk_id").as("chunk_id"),
        col("word_pos"), col("sub_pos"), col("subword"), col("sub_id"))
}
