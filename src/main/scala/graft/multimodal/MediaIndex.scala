package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Incremental perceptual media dedup — the shape a CONTINUOUSLY
  * crawling pipeline actually runs: yesterday's corpus is not
  * re-gated, it is an INDEX (hash-sized, persisted between runs), and
  * each new batch is judged against it without a byte of history
  * moving. The q83 Bloom-gate pattern generalized from exact text
  * fingerprints to the whole perceptual family: byte fingerprints,
  * image dual-hash, audio envelope hash, video frame-set overlap.
  *
  * Scale contract (the reason this operator exists as more than a
  * re-run of the batch gate over `history ∪ batch`):
  *  - HISTORY ROWS never shuffle: index rows are banded by a narrow
  *    ×4-per-hash projection ([[PerceptualHash.bandsOf]]) and joined
  *    as the STREAMED side of broadcast joins. At 100 TB of
  *    accumulated corpus the index is billions of ~50-byte rows — a
  *    handful of narrow COLUMNAR scans per batch (each leg reads its
  *    own 8-byte hash column twice: band census + probe), no row
  *    exchange, no sort. The ONE exchange derived from history is
  *    that band-bucket census (map-side-combined groupBy over
  *    (band, value) — bounded at ≤ 4·|hashCols|·65536 rows BY
  *    CONSTRUCTION, ≤ 524k for the dual-hash leg, broadcast back),
  *    which is what caps degenerate history buckets: without it a
  *    flat/letterboxed band value shared by half the index would
  *    join against every matching batch band row.
  *  - The BATCH side broadcasts: a crawl batch is bounded by ingest
  *    cadence (minutes of crawling), so its banded hash relation fits
  *    the broadcast threshold the way q83 bounds its Bloom filter.
  *    Batch-side band buckets are census-capped
  *    ([[PerceptualHash.cappedBandsCross]] — singletons kept, they
  *    pair with history), bounding per-history-row join fanout at
  *    `maxBucket`.
  *  - Everything after the match runs on matched-pair relations
  *    (batch-bounded): one small groupBy elects the keeper.
  *
  * Semantics: a batch object is a DUPLICATE iff it byte-matches any
  * history object (kind-agnostic, the dedupePayloads rule) or its
  * kind's perceptual election matches it to any history object
  * (image: summed dual-hash Hamming ≤ `imageMaxDist`; audio: envelope
  * Hamming ≤ `audioMaxDist`; video: ≥ `videoMinOverlapBp` basis
  * points of the BATCH video's hashed frames match some single
  * history video at frame Hamming ≤ `videoMaxDist` — the
  * videoNearDups floor, alignment-free, so a trimmed re-upload of an
  * indexed video still collapses). Keeper = the smallest matching
  * history id, byte matches taking precedence (they are the stronger
  * evidence). NULL payloads and undecodable media carry no perceptual
  * evidence and pass (keep-the-unparseable); unknown kinds ('bin')
  * are judged by bytes alone. Batch-INTERNAL duplicates are the batch
  * gate's job ([[Multimodal.dropAllDuplicateMediaDocs]]) — this
  * operator compares only across the batch/history boundary, so the
  * two compose: gate the batch internally, dedupe it against history,
  * append the survivors' index rows to the index.
  *
  * Determinism note for integrators (the SCALE.md r16 ladder lesson,
  * root-caused there): greedy smallest-id elections are deterministic
  * GIVEN the ids, but their drop COUNTS are input-order-independent
  * only when the match relation is TRANSITIVE. Byte/exact legs are
  * transitive; the DISTANCE legs are not (dual-hash near-collisions
  * compose a~b, b~c with a≁c), so regenerating ids (e.g. hashing a
  * per-run path into rec_ids) can legitimately move the dup count at
  * equal inputs. Fixtures or replays that need a constant count must
  * either pin ids or pin the matching to an exact-equality leg
  * (imageMaxDist = 0).
  */
object MediaIndex {

  /** The persistable hash INDEX of a media corpus: one row per
    * non-NULL-payload object — (media_id, kind, fp md5-hex,
    * ahash/dhash for decodable images, ehash for parseable audio,
    * fhashes = frame-order array of per-frame aHashes for walkable
    * videos; hash columns NULL where the kind or a failed decode
    * makes them inapplicable). ~50 bytes a row: the relation a
    * pipeline persists between runs and appends each batch's
    * survivors to. Building it pays the per-kind narrow decode passes
    * plus hash-sized joins — payload bytes never shuffle (the
    * perceptual-gate rule). */
  def mediaHashIndex(media: Dataset[Multimodal.Media]): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    // COLUMNAR null filter, not a typed predicate: an opaque
    // `_.payload != null` would deserialize every payload byte array
    // through the encoder on the fingerprint pass and blind Catalyst
    // on all four downstream scans (the enabledKinds lesson); the
    // column form is a pushable IsNotNull over the scan
    val m = media.toDF().filter(col("payload").isNotNull)
    val typed = m.as[Multimodal.Media]
    val fp = m.select(col("media_id"), col("kind"),
      md5(col("payload")).as("fp"))
    val img = PerceptualHash.perceptualHashes(typed)
    val aud = AudioWave.audioHashes(typed)
    val vid = Multimodal.videoFrameAHashes(typed, stride = 1)
      .groupBy(col("media_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("frame_idx"), col("ahash")))),
        f => f("ahash")).as("fhashes"))
    fp.join(img, Seq("media_id"), "left")
      .join(aud, Seq("media_id"), "left")
      .join(vid, Seq("media_id"), "left")
  }

  /** Batch objects that duplicate HISTORY: (dup_id = batch media_id,
    * keep_id = smallest matching history media_id, via ∈ {'byte',
    * 'image', 'audio', 'video'} — byte precedence). Both arguments
    * are [[mediaHashIndex]] relations; `history` streams (never
    * shuffles, see the object doc), `batch` broadcasts. */
  def incrementalMediaDups(batch: DataFrame, history: DataFrame,
                           imageMaxDist: Int = 6, audioMaxDist: Int = 3,
                           videoMaxDist: Int = 3,
                           videoMinOverlapBp: Int = 6000,
                           maxBucket: Int = 1024): DataFrame = {
    require(videoMinOverlapBp >= 1 && videoMinOverlapBp <= 10000,
      s"videoMinOverlapBp must be in 1..10000, got $videoMinOverlapBp")
    require(imageMaxDist >= 0 && audioMaxDist >= 0 && videoMaxDist >= 0,
      "per-kind maxDist thresholds must be non-negative, got " +
        s"$imageMaxDist/$audioMaxDist/$videoMaxDist")

    // ---- byte leg: exact fingerprint equality, kind-agnostic -------
    val byteDups = history
      .select(col("fp"), col("media_id").as("__h"))
      .join(broadcast(batch.select(col("media_id").as("dup_id"),
        col("fp"))), Seq("fp"))
      .select(col("dup_id"), col("__h"), lit(0).as("__p"),
        lit("byte").as("via"))

    // shared banded cross-match: history bands narrow, batch bands
    // censused + broadcast, exact Hamming confirmation. BOTH sides
    // are bucket-capped (one shared census rule —
    // PerceptualHash.cappedBandsCross): capping only the batch side
    // bounds fanout per history row, but a degenerate band value
    // shared by a large fraction of HISTORY (flat/letterboxed media —
    // the family's documented degenerate class) would still join
    // |histBucket| × |batchBucket| rows pre-Hamming; two-sided caps
    // bound each (band, value) at maxBucket². The history census is
    // the ONE exchange over history-derived data this operator
    // permits: a map-side-combined (band, value) aggregate whose
    // world is ≤ 4·|hashCols|·65536 rows (≤ 524k for the dual-hash
    // leg) BY CONSTRUCTION, broadcast back — history ROWS (ids,
    // hashes, fingerprints) never shuffle. Cost accounting, honest:
    // each leg reads the index twice (census + probe), but both are
    // narrow COLUMNAR scans of the leg's own 8-byte hash column on a
    // ~50-byte-row relation — row-linear, column-pruned, never
    // payload-sized.
    def crossLeg(batchRows: DataFrame, histRows: DataFrame,
                 hashCols: Seq[String], ham: Column, maxDist: Int,
                 extraBatchCols: Seq[String] = Nil): DataFrame = {
      val bBands = PerceptualHash.cappedBandsCross(batchRows,
        "dup_id" +: extraBatchCols, hashCols, maxBucket)
        .select(("dup_id" +: extraBatchCols).map(col) ++
          hashCols.map(c => col(c).as(s"b_$c")) :+
          col("__b") :+ col("__v"): _*)
      PerceptualHash.cappedBandsCross(histRows, Seq("__h"), hashCols,
          maxBucket, broadcastCensus = true)
        .join(broadcast(bBands), Seq("__b", "__v"))
        .filter(ham <= maxDist)
        .select(("dup_id" +: extraBatchCols).map(col) :+ col("__h"): _*)
        .distinct()
    }
    def hamOf(c: String): Column =
      bit_count(col(c).bitwiseXOR(col(s"b_$c")))

    // ---- image leg: summed dual-hash distance -----------------------
    def imgRows(idx: DataFrame, idAs: String) =
      idx.filter(col("ahash").isNotNull && col("dhash").isNotNull)
        .select(col("media_id").as(idAs), col("ahash"), col("dhash"))
    val imgDups = crossLeg(imgRows(batch, "dup_id"), imgRows(history, "__h"),
        Seq("ahash", "dhash"), hamOf("ahash") + hamOf("dhash"), imageMaxDist)
      .select(col("dup_id"), col("__h"), lit(1).as("__p"),
        lit("image").as("via"))

    // ---- audio leg: envelope hash ------------------------------------
    def audRows(idx: DataFrame, idAs: String) =
      idx.filter(col("ehash").isNotNull)
        .select(col("media_id").as(idAs), col("ehash"))
    val audDups = crossLeg(audRows(batch, "dup_id"), audRows(history, "__h"),
        Seq("ehash"), hamOf("ehash"), audioMaxDist)
      .select(col("dup_id"), col("__h"), lit(1).as("__p"),
        lit("audio").as("via"))

    // ---- video leg: frame-set overlap vs ONE history video ----------
    def vidRows(idx: DataFrame, idAs: String) =
      idx.filter(col("fhashes").isNotNull && size(col("fhashes")) > 0)
        .select(col("media_id").as(idAs),
          posexplode(col("fhashes")).as(Seq("__f", "fh")))
    val bN = batch.filter(col("fhashes").isNotNull)
      .select(col("media_id").as("dup_id"),
        size(col("fhashes")).as("__n"))
    val vidDups = crossLeg(vidRows(batch, "dup_id"),
        vidRows(history, "__h").drop("__f"),
        Seq("fh"), hamOf("fh"), videoMaxDist, extraBatchCols = Seq("__f"))
      .groupBy(col("dup_id"), col("__h"))
      .agg(count(lit(1)).as("__m")) // distinct batch frames matched
      .join(broadcast(bN), Seq("dup_id"))
      .filter(col("__m") * 10000 >= lit(videoMinOverlapBp.toLong) *
        col("__n"))
      .select(col("dup_id"), col("__h"), lit(1).as("__p"),
        lit("video").as("via"))

    // keeper election on matched pairs only (batch-bounded): byte
    // precedence, then smallest history id
    byteDups.unionByName(imgDups).unionByName(audDups).unionByName(vidDups)
      .groupBy(col("dup_id"))
      .agg(min(struct(col("__p"), col("__h"), col("via"))).as("__k"))
      .select(col("dup_id"), col("__k.__h").as("keep_id"),
        col("__k.via").as("via"))
  }

  /** Batch-INTERNAL duplicate election over ONE [[mediaHashIndex]]
    * relation — the composition partner [[incrementalMediaDups]]'s
    * scaladoc prescribes: gate the batch internally FIRST, then judge
    * the internal keepers against history. Runs entirely on the
    * hash-sized index rows (no second decode pass — the batch paid
    * its per-kind decodes once, building the index): byte election =
    * min-id per fingerprint; perceptual elections among byte KEEPERS
    * per kind via the family's banded operators (image dual-hash,
    * audio envelope, video frame-set overlap — each already electing
    * the smallest keeper per dup). Output (dup_id, keep_id, via) —
    * byte losers and perceptual dups are disjoint by construction
    * (a perceptual leg only sees byte keepers), and the kind-routed
    * hash columns keep the perceptual legs disjoint from each other,
    * so no cross-leg precedence election is needed. */
  def intraBatchDups(batchIdx: DataFrame, imageMaxDist: Int = 6,
                     audioMaxDist: Int = 3, videoMaxDist: Int = 3,
                     videoMinOverlapBp: Int = 6000,
                     maxBucket: Int = 1024): DataFrame = {
    val k = batchIdx.groupBy(col("fp")).agg(min(col("media_id")).as("keep_id"))
    val byteDups = batchIdx.select(col("media_id"), col("fp"))
      .join(k, Seq("fp"))
      .filter(col("media_id") =!= col("keep_id"))
      .select(col("media_id").as("dup_id"), col("keep_id"),
        lit("byte").as("via"))
    val keepers = batchIdx
      .join(k.select(col("keep_id").as("media_id")), Seq("media_id"),
        "left_semi")
    val img = PerceptualHash.nearDupsByDualHash(
        keepers.filter(col("ahash").isNotNull && col("dhash").isNotNull)
          .select(col("media_id"), col("ahash"), col("dhash")),
        "media_id", "ahash", "dhash", imageMaxDist, maxBucket)
      .select(col("dup_id"), col("keep_id"), lit("image").as("via"))
    val aud = PerceptualHash.nearDupsByHash(
        keepers.filter(col("ehash").isNotNull)
          .select(col("media_id"), col("ehash")),
        "media_id", "ehash", audioMaxDist, maxBucket)
      .select(col("dup_id"), col("keep_id"), lit("audio").as("via"))
    val vid = Multimodal.videoOverlapDups(
        keepers.filter(col("fhashes").isNotNull && size(col("fhashes")) > 0)
          .select(col("media_id"),
            posexplode(col("fhashes")).as(Seq("frame_idx", "ahash"))),
        videoMaxDist, maxBucket, videoMinOverlapBp)
      .select(col("dup_id"), col("keep_id"), lit("video").as("via"))
    byteDups.unionByName(img).unionByName(aud).unionByName(vid)
  }

  /** ONE ingest step over a PINNED batch index: batch-internal
    * election, then the history judge over the internal keepers.
    * Returns (dups — internal ∪ cross-history (dup_id, keep_id, via),
    * indexDelta — the surviving rows of `batchIdx`, i.e. exactly what
    * a production sink appends to the persisted index). `batchIdx`
    * is consumed by three subtrees — pin it (eager localCheckpoint /
    * persist) before calling, as [[mediaHashIndex]]'s callers do for
    * media.
    *
    * REPLAY-IDEMPOTENT append (foreachBatch redelivers a batch on
    * failure, and a double-appended index row would silently shadow
    * future keeper elections by id order): on redelivery every
    * batch row's fingerprint byte-matches its own already-appended
    * index row, so the byte leg flags it and the delta is EMPTY —
    * content identity is the id guard. (An explicit media_id
    * anti-join against the index would buy the same guarantee by
    * shuffling the corpus-sized index on id — the one thing this
    * family never does; rows WITHOUT index presence are exactly the
    * NULL-payload rows, which never produce index rows either time.)
    * Spec-pinned: the same batch applied twice yields an identical
    * final index. */
  def ingestStep(batchIdx: DataFrame, history: DataFrame,
                 imageMaxDist: Int = 6, audioMaxDist: Int = 3,
                 videoMaxDist: Int = 3, videoMinOverlapBp: Int = 6000,
                 maxBucket: Int = 1024): (DataFrame, DataFrame) = {
    // both verdict relations are pinned (eager, id-sized): each is
    // consumed by two+ subtrees below, and an unpinned `cross` would
    // re-run the whole history judge per consumer
    val intra = intraBatchDups(batchIdx, imageMaxDist, audioMaxDist,
      videoMaxDist, videoMinOverlapBp, maxBucket).localCheckpoint(true)
    val pruned = batchIdx.join(intra.select(col("dup_id").as("media_id")),
      Seq("media_id"), "left_anti")
    val cross = incrementalMediaDups(pruned, history, imageMaxDist,
      audioMaxDist, videoMaxDist, videoMinOverlapBp, maxBucket)
      .localCheckpoint(true)
    // the returned verdicts exclude SELF-matches (keep_id == dup_id —
    // possible only on a foreachBatch REDELIVERY, when a survivor's
    // own appended index rows match it back): a replayed batch then
    // gates to the SAME survivor set as the original delivery, so a
    // batchId-idempotent corpus sink loses nothing whichever of its
    // writes completed before the failure. The DELTA still excludes
    // self-matched ids (full `cross`), so redelivery appends nothing.
    val dups = intra.unionByName(
      cross.filter(col("dup_id") =!= col("keep_id")))
    val delta = pruned.join(cross.select(col("dup_id").as("media_id")),
      Seq("media_id"), "left_anti")
    (dups, delta)
  }

  /** The index-maintenance wrapper ([[ingestStep]] from raw media):
    * judge `batch` against `history` (batch-internal election
    * included) and return the REPLAY-IDEMPOTENT index delta — the
    * rows to append to the persisted index. The batch is pinned here
    * (it is re-referenced ~5× by the index build; the
    * [[dedupeAgainstHistory]] rule). */
  def appendSurvivors(history: DataFrame, batch: Dataset[Multimodal.Media],
                      imageMaxDist: Int = 6, audioMaxDist: Int = 3,
                      videoMaxDist: Int = 3, videoMinOverlapBp: Int = 6000,
                      maxBucket: Int = 1024): DataFrame = {
    val pinnedIdx = mediaHashIndex(batch.localCheckpoint(true))
      .localCheckpoint(true)
    ingestStep(pinnedIdx, history, imageMaxDist, audioMaxDist,
      videoMaxDist, videoMinOverlapBp, maxBucket)._2
  }

  /** The gate wrapper: the batch with every history-duplicate dropped
    * — what a streaming ingest appends to the corpus (and whose
    * [[mediaHashIndex]] rows it appends to the index). The batch is
    * PINNED here (eager localCheckpoint — the q203 rule): the index
    * build re-references payloads ~5× (fingerprint + three kind legs)
    * and the anti join reads the batch once more, so an expensively
    * derived batch relation would otherwise recompute per leg.
    * Callers composing the pieces directly ([[mediaHashIndex]] +
    * [[incrementalMediaDups]]) must pin their own batch — as
    * [[graft.pipelines.StreamingIngestPipeline.runMediaIngest]] does
    * with a persist it can release. Eager on purpose (materializes at
    * call time): checkpoint blocks release by RDD GC once the result
    * is unreferenced, and a LAZY localCheckpoint first materialized
    * under a broadcast-exchange thread can deadlock against the DAG
    * scheduler (the TrainingCorpusPipeline stage-3 lock-order note). */
  def dedupeAgainstHistory(batch: Dataset[Multimodal.Media],
                           history: DataFrame,
                           imageMaxDist: Int = 6, audioMaxDist: Int = 3,
                           videoMaxDist: Int = 3,
                           videoMinOverlapBp: Int = 6000,
                           maxBucket: Int = 1024): Dataset[Multimodal.Media] = {
    val spark = batch.sparkSession
    import spark.implicits._
    val pinned = batch.localCheckpoint(true)
    val dups = incrementalMediaDups(mediaHashIndex(pinned), history,
      imageMaxDist, audioMaxDist, videoMaxDist, videoMinOverlapBp,
      maxBucket)
    pinned.toDF()
      .join(dups.select(col("dup_id").as("media_id")),
        Seq("media_id"), "left_anti")
      .as[Multimodal.Media]
  }

  /** Band-OCCUPANCY drift report — the
    * [[graft.operators.SemanticIndex.cellOccupancyReport]] /
    * [[graft.operators.TextIndex.bucketOccupancyReport]] twin for the
    * media family, completing the alarm matrix: history (band, value)
    * buckets crossing `maxBucket` stop generating candidates (the
    * two-sided degenerate-region cap), so batch probe mass landing
    * there is evidence the perceptual judge silently refuses — the
    * family's documented degenerate class (flat/letterboxed media)
    * measured instead of assumed. One row, per-LEG accounting plus
    * the combined alarm: (image_probes, image_capped, audio_probes,
    * audio_capped, video_probes, video_capped, n_probes,
    * capped_probes, capped_bp, rebuild) — probes are the batch's
    * band rows per leg AFTER its own batch-side cap (self-pathology
    * never reads as history drift), capped_bp is exact integer basis
    * points over all legs. Both arguments are HASH-INDEX relations
    * ([[mediaHashIndex]] / the persisted index) — payload bytes are
    * never touched. Remedy, as for text: a rebuild with a larger
    * maxBucket — or acceptance where the capped mass really is the
    * degenerate class the cap exists for; there is no recell analog
    * (bands are hash-structural). Scale shape: each leg's census is
    * batch-key-restricted and map-side-combined; history rows never
    * shuffle. */
  def bandOccupancyReport(batchIdx: DataFrame, history: DataFrame,
                          maxBucket: Int = 1024,
                          alarmBp: Long = 2500): DataFrame = {
    def legReport(bRows: DataFrame, hRows: DataFrame,
                  keyCols: Seq[String], hashCols: Seq[String],
                  prefix: String): DataFrame = {
      val probes = PerceptualHash.cappedBandsCross(bRows, keyCols,
          hashCols, maxBucket)
        .select(col("__b"), col("__v"))
        .localCheckpoint(true)
      val capped = PerceptualHash.bandsOf(hRows, Seq("__h"), hashCols)
        .join(broadcast(probes.distinct()), Seq("__b", "__v"))
        .groupBy(col("__b"), col("__v"))
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBucket)
        .select(col("__b"), col("__v"))
      probes.agg(count(lit(1)).as(s"${prefix}_probes"))
        .crossJoin(probes.join(broadcast(capped), Seq("__b", "__v"))
          .agg(count(lit(1)).as(s"${prefix}_capped")))
    }
    def imgRows(idx: DataFrame, idAs: String) =
      idx.filter(col("ahash").isNotNull && col("dhash").isNotNull)
        .select(col("media_id").as(idAs), col("ahash"), col("dhash"))
    def audRows(idx: DataFrame, idAs: String) =
      idx.filter(col("ehash").isNotNull)
        .select(col("media_id").as(idAs), col("ehash"))
    def vidRows(idx: DataFrame, idAs: String) =
      idx.filter(col("fhashes").isNotNull && size(col("fhashes")) > 0)
        .select(col("media_id").as(idAs),
          posexplode(col("fhashes")).as(Seq("__f", "fh")))
    legReport(imgRows(batchIdx, "dup_id"), imgRows(history, "__h"),
        Seq("dup_id"), Seq("ahash", "dhash"), "image")
      .crossJoin(legReport(audRows(batchIdx, "dup_id"),
        audRows(history, "__h"), Seq("dup_id"), Seq("ehash"), "audio"))
      .crossJoin(legReport(vidRows(batchIdx, "dup_id"),
        vidRows(history, "__h"), Seq("dup_id", "__f"), Seq("fh"), "video"))
      .select(col("image_probes"), col("image_capped"),
        col("audio_probes"), col("audio_capped"),
        col("video_probes"), col("video_capped"),
        (col("image_probes") + col("audio_probes") + col("video_probes"))
          .as("n_probes"),
        (col("image_capped") + col("audio_capped") + col("video_capped"))
          .as("capped_probes"))
      .withColumn("capped_bp",
        expr("case when n_probes > 0 " +
          "then (capped_probes * 10000) div n_probes end"))
      .withColumn("rebuild", coalesce(col("capped_bp") > alarmBp, lit(false)))
  }
}
