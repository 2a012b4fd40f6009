package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental TEXT near-dup against a PERSISTED MinHash band index —
  * the [[graft.multimodal.MediaIndex]] shape for documents, and the
  * single most common operation a continuously-crawling text pipeline
  * runs: yesterday's corpus is not re-banded and re-shuffled per
  * ingest cycle (what re-running [[Dedup.minhashPairs]] over
  * `history ∪ batch` would do), it is an INDEX persisted between runs
  * — two narrow relations, `(doc, band, sig)` band rows (~24 bytes a
  * row, `bands` rows per doc) and `(doc, shs)` hashed shingle sets —
  * and each new batch is judged against it without a row of history
  * ever entering an exchange.
  *
  * Scale contract (why this operator exists as more than a re-run of
  * the within-corpus pair operator):
  *  - HISTORY ROWS never shuffle. The band index is probed by TWO
  *    BroadcastHashJoins with history streaming map-side (a census
  *    leg and the candidate leg — each a narrow columnar scan of the
  *    24-byte-row band relation), and the set index streams once
  *    through the verification BroadcastHashJoin. At 100 TB of
  *    accumulated corpus these are three row-linear scans per batch;
  *    no history sort, no history exchange.
  *  - The ONE exchange over history-DERIVED data is the band-bucket
  *    census, and it is bounded by the BATCH by construction: history
  *    bands are first semi-joined against the broadcast batch band
  *    keys, so the map-side-combined (band, sig) aggregate's world is
  *    ≤ |batch band rows| distinct keys — batch-sized, not
  *    history-sized. (MinHash band hashes are 64-bit, so an
  *    unrestricted census would be ~|history|·bands distinct keys —
  *    the restriction is what keeps the media family's
  *    bounded-by-construction census property when the band-value
  *    domain is no longer 16-bit.)
  *  - The BATCH side broadcasts: a crawl batch is bounded by ingest
  *    cadence, so its banded signature relation fits the broadcast
  *    threshold (the q83 Bloom-gate argument). Candidate pairs are
  *    batch-bounded: ≤ |batch band rows| · maxBucket by the two-sided
  *    cap.
  *  - Degenerate buckets are capped on BOTH sides (the
  *    [[Dedup.minhashCandidates]] guard, cross-relation form): batch
  *    buckets through the bounded-collect aggregate (singletons KEPT
  *    — a lone batch band row still pairs with history), history
  *    buckets through the census (a (band, sig) shared by > maxBucket
  *    history docs is boilerplate-degenerate content, not near-dup
  *    evidence — its pairs, if real, surface through the other
  *    bands).
  *  - Verification is EXACT Jaccard per candidate pair
  *    ([[Dedup.verifyJaccard]]'s math — the q27 operator in its
  *    intended candidate-grading role), so precision is 1.0 and
  *    recall follows the band curve (miss ≈ (1−t^r)^b ≈ 5·10⁻⁸ at
  *    t = 0.8 with 128 hashes / 32 bands — the q28 argument).
  *
  * Semantics: a batch doc is a DUPLICATE iff its exact shingle-set
  * Jaccard against some history doc is ≥ `threshold`; keeper = the
  * smallest matching history id (carrying that pair's Jaccard). NULL
  * text carries no signature and passes (its content is UNKNOWN, the
  * [[Dedup.exact]] singleton rule). The bare judge
  * ([[incrementalTextDups]]) compares only across the batch/history
  * boundary; [[ingestStep]] COMPOSES the batch-internal near-dup
  * election before it (the [[graft.multimodal.MediaIndex
  * .intraBatchDups]] composition), because the streamed micro-batch
  * path has no other defense against two REWORDED copies of one
  * fresh doc arriving together — the in-stream fingerprint dedup is
  * exact-only, so without the election both would survive and BOTH
  * enter the index.
  *
  * Replay idempotency (foreachBatch redelivers on failure): a
  * replayed batch's docs exact-match their own appended index rows at
  * Jaccard 1.0 — content identity IS the id guard — so
  * [[survivorIndexRows]]' delta is empty on replay; NULL-text docs,
  * the only rows the content argument cannot cover, are never
  * indexable and contribute no rows either time (spec-pinned).
  *
  * Index parameters (shingleN, numHashes, bands, seed) must match
  * between [[buildIndex]] and the judge — they are plain arguments
  * here because the index is two PARQUET RELATIONS a pipeline loads
  * back across runs (a carrier object cannot persist); store them
  * alongside the index paths ([[graft.io.TextIndexArtifacts]] is the
  * worked persistence layer — params sidecar, tombstones, compaction).
  *
  * Ids must be INTEGRAL (the bounded-collect bucket aggregate's
  * contract, and what keeps every shuffle here on 8-byte keys). Real
  * crawls key by URL/string: mint a surrogate with
  * [[Dedup.withSurrogateId]] (deterministic xxhash64 — the
  * [[graft.io.WarcRecords.toCrawlDocs]] id discipline; collision math
  * in its scaladoc) or [[Dedup.withUniqueSurrogateId]]
  * (collision-free) before building or judging.
  */
object TextIndex {

  private def requireIntegralId(df: DataFrame, idCol: String,
                                who: String): Unit = {
    val t = df.schema(df.schema.fieldIndex(idCol)).dataType
    require(t == org.apache.spark.sql.types.LongType
        || t == org.apache.spark.sql.types.IntegerType,
      s"$who needs an integral doc id, got ${t.catalogString}; " +
        "mint one with Dedup.withSurrogateId (deterministic xxhash64) " +
        "or Dedup.withUniqueSurrogateId (collision-free)")
  }

  /** Build the two persistable index relations over a corpus:
    * (band rows `(doc, band, sig)`, set rows `(doc, shs)`). Write
    * both to parquet and read them back for the judge — the band
    * relation is what the per-batch probes scan (banding work paid
    * ONCE at build, never per batch), the set relation is what exact
    * verification reads. NULL-text docs are EXCLUDED from both (no
    * signature → not indexable evidence; they also keep
    * [[survivorIndexRows]] replay-idempotent). One tokenization pass
    * feeds both relations (the persisted [[Dedup.shingleSets]] —
    * release with `spark.catalog.clearCache()` once written).
    *
    * Deployment note for the 100 TB corpus: the per-batch probes are
    * row-linear scans of the band relation — already cheap (24-byte
    * rows, column-pruned), and reducible further by writing the index
    * `sortWithinPartitions(band, sig)`: parquet row-group min/max
    * stats on `sig` then let Spark's runtime Bloom-filter join
    * pushdown (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
    * skip most row groups for a batch's few thousand probe keys, and
    * compacted appends inherit the ordering. Correctness never
    * depends on layout — an unsorted index is just a full (still
    * narrow) scan per probe. */
  def buildIndex(corpus: DataFrame, idCol: String, textCol: String,
                 shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
                 seed: Long = 42L,
                 // cache=false for write-once builders (two
                 // tokenization passes instead of a session-global
                 // cache entry only clearCache could release)
                 cache: Boolean = true): (DataFrame, DataFrame) = {
    requireIntegralId(corpus, idCol, "TextIndex.buildIndex")
    val sets = Dedup.shingleSets(corpus, idCol, textCol, shingleN, "doc",
        cache = cache)
      .filter(col("shs").isNotNull)
    (bandRowsOf(sets, numHashes, bands, seed), sets)
  }

  /** Band rows `(doc, band, sig)` from a set relation (`(doc, shs)`,
    * id column FIRST — [[buildIndex]]'s second output or a parquet
    * read of it): the MinHash signature kernel + LSH banding, narrow
    * (no shuffle). This is also the append path: survivors' set rows
    * → their band rows. */
  def bandRowsOf(sets: DataFrame, numHashes: Int = 128, bands: Int = 32,
                 seed: Long = 42L): DataFrame =
    Dedup.bandBuckets(
      Dedup.minhashSignaturesFromSets(sets, numHashes, seed), bands)

  /** Batch docs that near-duplicate HISTORY: (dup_id, keep_id =
    * smallest matching history id, jaccard = that pair's exact
    * Jaccard, rounded to 6). `histBands`/`histSets` are
    * [[buildIndex]] relations (typically parquet reads); see the
    * object doc for the plan contract. `maxBucket` is the two-sided
    * degenerate-bucket cap — oracle-checked call sites disable it
    * (Int.MaxValue) because an exact oracle computes the uncapped
    * pair set (the q28 call-site split). */
  def incrementalTextDups(batch: DataFrame, idCol: String, textCol: String,
                          histBands: DataFrame, histSets: DataFrame,
                          shingleN: Int = 3, numHashes: Int = 128,
                          bands: Int = 32, threshold: Double = 0.8,
                          seed: Long = 42L, maxBucket: Int = 1000,
                          // cacheSets=false for repeated bounded-batch
                          // callers (the ingestStep parameter doc)
                          cacheSets: Boolean = true): DataFrame = {
    requireIntegralId(batch, idCol, "TextIndex.incrementalTextDups")
    val bSets = Dedup.shingleSets(batch, idCol, textCol, shingleN,
      "dup_id", cache = cacheSets)
    dupsFromSets(bSets, batch.schema(idCol).dataType, histBands, histSets,
      numHashes, bands, threshold, seed, maxBucket)
  }

  /** The judge over a PRECOMPUTED batch set relation — shared by
    * [[incrementalTextDups]] and [[survivorIndexRows]] so the batch
    * pays one tokenization pass however it is consumed. `bSets` is
    * the (persisted) [[Dedup.shingleSets]] relation with id column
    * `dup_id`. */
  private def dupsFromSets(bSets: DataFrame,
                           idType: org.apache.spark.sql.types.DataType,
                           histBands: DataFrame, histSets: DataFrame,
                           numHashes: Int, bands: Int, threshold: Double,
                           seed: Long, maxBucket: Int): DataFrame = {
    // batch band rows, degenerate buckets dropped whole INSIDE the
    // bounded-collect buffer (the minhashCandidates guard; singletons
    // kept — cross-relation matching, not self-pairing). One shuffle
    // over batch band rows — batch-bounded.
    val bBands = bandRowsOf(bSets, numHashes, bands, seed)
      .groupBy(col("band"), col("sig"))
      .agg(BoundedCollectLong.boundedCollect(maxBucket)(col("doc")).as("bc"))
      .filter(col("bc.n") <= maxBucket)
      .select(col("band"), col("sig"), explode(col("bc.items")).as("dup_id"))
    val bKeys = bBands.select(col("band"), col("sig")).distinct()
    // history bucket census RESTRICTED to the batch's keys: history
    // bands stream through a BroadcastHashJoin against the broadcast
    // key set, then the map-side-combined aggregate's world is
    // ≤ |bKeys| distinct keys — the one history-DERIVED exchange,
    // batch-bounded by construction (object doc).
    val hOkKeys = histBands
      .join(broadcast(bKeys), Seq("band", "sig"))
      .groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket)
      .select(col("band"), col("sig"))
    // candidate pairs: history streams once more against the
    // census-approved broadcast batch bands; distinct() shuffles only
    // candidate pairs (≤ |batch band rows| · maxBucket)
    val bOk = bBands.join(broadcast(hOkKeys), Seq("band", "sig"))
    val cands = histBands
      .join(broadcast(bOk), Seq("band", "sig"))
      .select(col("dup_id"), col("doc").as("__h"))
      .distinct()
    // exact-Jaccard verification (Dedup.verifyJaccard's math): the
    // batch-bounded candidate relation carries its batch-side shingle
    // sets and broadcasts; the history SET index streams through the
    // one BroadcastHashJoin — candidate history docs' sets are read
    // in place, never shuffled
    val withBatchSets = cands
      .join(bSets.select(col("dup_id"), col("shs").as("__sa")), Seq("dup_id"))
    val verified = histSets
      .select(col("doc").as("__h"), col("shs").as("__sb"))
      .join(broadcast(withBatchSets), Seq("__h"))
      .withColumn("__inter", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("__j", col("__inter").cast("double")
        / (size(col("__sa")) + size(col("__sb")) - col("__inter")))
      .filter(col("__j") >= threshold)
    // keeper election on matched pairs only (batch-bounded): smallest
    // history id, carrying that pair's jaccard
    verified.groupBy(col("dup_id"))
      .agg(min(struct(col("__h"), col("__j"))).as("__k"))
      .select(col("dup_id").cast(idType).as("dup_id"),
        col("__k.__h").as("keep_id"),
        round(col("__k.__j"), 6).as("jaccard"))
  }

  /** Batch-INTERNAL near-dup election over the precomputed batch set
    * relation — the [[graft.multimodal.MediaIndex.intraBatchDups]]
    * twin for text, composed by [[ingestStep]] BEFORE the history
    * judge: two reworded copies of one fresh doc arriving in a single
    * micro-batch must admit one survivor and one set of index rows,
    * not two. Pure within-corpus LSH over batch-bounded relations
    * ([[Dedup.minhashCandidates]] → exact-Jaccard verification — the
    * [[Dedup.minhashPairs]] chain sharing the step's one tokenization
    * pass): one bucket shuffle over batch band rows, one candidate
    * verification join, one election groupBy — all batch-sized, so
    * the composition leaves the step's FLAT-vs-history ladder
    * untouched. Election rule: a doc is a dup iff some SMALLER batch
    * id matches it at ≥ threshold; keeper = the smallest such
    * directly-matching id (pairwise — a chain A~B~C with A≁C keeps A,
    * drops B and C: B to A, C to B — the family's greedy rule, which
    * never wrongly merges and is exactly replayable in SQL, unlike a
    * transitive closure). NULL-text docs carry no signature and never
    * participate. */
  private def intraDupsFromSets(bSets: DataFrame, numHashes: Int,
                                bands: Int, threshold: Double, seed: Long,
                                maxBucket: Int): DataFrame =
    Dedup.verifyJaccard(
        Dedup.minhashCandidates(
          Dedup.minhashSignaturesFromSets(bSets, numHashes, seed),
          bands, maxBucket),
        "id_a", "id_b", bSets, bSets, threshold)
      .groupBy(col("id_b").as("dup_id"))
      .agg(min(struct(col("id_a"), col("jaccard"))).as("__k"))
      .select(col("dup_id"), col("__k.id_a").as("keep_id"),
        col("__k.jaccard").as("jaccard"))

  /** The gate wrapper: the batch with every history near-duplicate
    * dropped — what a streaming ingest appends to the corpus. */
  def dedupeAgainstIndex(batch: DataFrame, idCol: String, textCol: String,
                         histBands: DataFrame, histSets: DataFrame,
                         shingleN: Int = 3, numHashes: Int = 128,
                         bands: Int = 32, threshold: Double = 0.8,
                         seed: Long = 42L, maxBucket: Int = 1000,
                         cacheSets: Boolean = true): DataFrame =
    batch.join(
      incrementalTextDups(batch, idCol, textCol, histBands, histSets,
        shingleN, numHashes, bands, threshold, seed, maxBucket, cacheSets)
        .select(col("dup_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** The INDEX MAINTENANCE step: the survivors' index rows — (band
    * rows, set rows) to append to the persisted relations after
    * judging a batch. Replay-idempotent ([[ingestStep]]'s contract).
    * NULL-text docs are excluded (never indexable). Same parameters
    * as the judge — the appended rows must band identically to the
    * build. */
  def survivorIndexRows(batch: DataFrame, idCol: String, textCol: String,
                        histBands: DataFrame, histSets: DataFrame,
                        shingleN: Int = 3, numHashes: Int = 128,
                        bands: Int = 32, threshold: Double = 0.8,
                        seed: Long = 42L,
                        maxBucket: Int = 1000): (DataFrame, DataFrame) =
    ingestStep(batch, idCol, textCol, histBands, histSets, shingleN,
      numHashes, bands, threshold, seed, maxBucket)._2

  /** Bucket-OCCUPANCY drift report — the
    * [[SemanticIndex.cellOccupancyReport]] twin for the text family:
    * band buckets crossing `maxBucket` stop generating candidates
    * (the degenerate-bucket guard), and as HISTORY grows, more
    * buckets cross it — incoming batch probes landing there are
    * evidence the judge silently refuses. One row of exact-integer
    * accounting: (n_probes = batch band rows actually probing,
    * n_probed_keys, n_capped_keys = probed (band, sig) keys whose
    * HISTORY count exceeds maxBucket, capped_probes, capped_bp =
    * capped_probes·10⁴ div n_probes, batch_capped_rows = band rows
    * the BATCH's own bucket cap dropped — self-pathology, reported
    * separately, and `rebuild` when capped_bp > alarmBp).
    *
    * Interpreting it differs from the cell alarm: a crowded TEXT
    * bucket usually IS boilerplate (near-identical templated
    * content), so a few capped keys are the guard working as
    * intended — the alarm keys on the probe-MASS fraction, the
    * signal that the judge is refusing ordinary content at scale.
    * And there is no recell analog: bands are hash-structural, not
    * data-adaptive, so the remedy is a REBUILD with a larger
    * maxBucket (or more bands / a different seed) at compaction
    * cadence — or accepting the cap where the capped mass really is
    * boilerplate. Scale shape: the census is batch-key-restricted
    * and map-side-combined (history band rows stream — the
    * incrementalTextDups contract); the probe relation pins once
    * for its three consumers. */
  def bucketOccupancyReport(batch: DataFrame, idCol: String,
      textCol: String, histBands: DataFrame, shingleN: Int = 3,
      numHashes: Int = 128, bands: Int = 32, seed: Long = 42L,
      maxBucket: Int = 1000, alarmBp: Long = 2500,
      cacheSets: Boolean = true): DataFrame = {
    requireIntegralId(batch, idCol, "TextIndex.bucketOccupancyReport")
    val bSets = Dedup.shingleSets(batch, idCol, textCol, shingleN,
      "dup_id", cache = cacheSets)
    val bBuckets = bandRowsOf(bSets, numHashes, bands, seed)
      .groupBy(col("band"), col("sig"))
      .agg(BoundedCollectLong.boundedCollect(maxBucket)(col("doc")).as("bc"))
      .localCheckpoint(true)
    val probes = bBuckets.filter(col("bc.n") <= maxBucket)
      .select(col("band"), col("sig"), explode(col("bc.items")).as("doc"))
      .localCheckpoint(true)
    val cappedKeys = histBands
      .join(broadcast(probes.select(col("band"), col("sig")).distinct()),
        Seq("band", "sig"))
      .groupBy(col("band"), col("sig"))
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .select(col("band"), col("sig"))
    val pAgg = probes.agg(count(lit(1)).as("n_probes"),
      countDistinct(col("band"), col("sig")).as("n_probed_keys"))
    val cAgg = probes.join(broadcast(cappedKeys), Seq("band", "sig"))
      .agg(count(lit(1)).as("capped_probes"),
        countDistinct(col("band"), col("sig")).as("n_capped_keys"))
    val sAgg = bBuckets.filter(col("bc.n") > maxBucket)
      .agg(coalesce(sum(col("bc.n")), lit(0L)).as("batch_capped_rows"))
    pAgg.crossJoin(cAgg).crossJoin(sAgg)
      .select(col("n_probes"), col("n_probed_keys"), col("n_capped_keys"),
        col("capped_probes"),
        expr("case when n_probes > 0 " +
          "then (capped_probes * 10000) div n_probes end").as("capped_bp"),
        col("batch_capped_rows"))
      .withColumn("rebuild",
        coalesce(col("capped_bp") > alarmBp, lit(false)))
  }

  /** ONE ingest step (the [[graft.multimodal.MediaIndex.ingestStep]]
    * twin for text): batch-internal near-dup election
    * ([[intraDupsFromSets]]), then the history judge over the
    * internal keepers, returning BOTH the verdicts and the
    * replay-idempotent index delta — (dups (dup_id, keep_id,
    * jaccard) = internal ∪ cross-history, (band-row delta, set-row
    * delta)). The batch pays ONE tokenization pass for everything
    * (the persisted shingle sets feed the intra election's signature
    * kernel, the history judge, both verification joins, and the
    * survivor delta). A production sink appends the delta to the two
    * index paths its history functions re-read — no recomputation,
    * and redelivered batches append nothing.
    *
    * Replay idempotency is guaranteed by TWO independent mechanisms:
    * a redelivered doc usually matches its own appended rows at
    * Jaccard 1.0 (content identity), but that alone has a hole — a
    * degenerate doc whose EVERY band bucket is over the census cap
    * (e.g. >maxBucket identical templated docs already indexed)
    * produces no candidates and would re-append on every redelivery.
    * The delta therefore ALSO excludes ids already PRESENT in the
    * index: presence is detected by streaming the set index's `doc`
    * column through a BroadcastHashJoin against the broadcast batch
    * ids (one extra narrow column scan of the index; history rows
    * still never shuffle — the anti-join-on-id a naive formulation
    * would shuffle the corpus-sized index for).
    *
    * The returned `dups` excludes SELF-matches (keep_id == dup_id —
    * possible only on replay, when a survivor's own appended rows are
    * in the index): a replayed batch then yields the SAME survivor
    * set as the original delivery, so a sink whose corpus append is
    * batchId-idempotent loses nothing whichever write completed
    * before the failure. The intra election is what makes that
    * contract hold for batch-INTERNAL near-dup pairs too: it judges
    * the same batch content identically on every delivery, BEFORE
    * any appended rows can reshape the verdicts (without it, a
    * reworded pair {A, B} would both survive on first delivery, then
    * on redelivery B would match A's appended rows and silently drop
    * from a partially-failed corpus append). The verdicts are pinned
    * (eager localCheckpoint — id-sized) before fanning out to the
    * gate and the two delta relations, so the judge's history scans
    * run ONCE per batch however many outputs are consumed. */
  def ingestStep(batch: DataFrame, idCol: String, textCol: String,
                 histBands: DataFrame, histSets: DataFrame,
                 shingleN: Int = 3, numHashes: Int = 128,
                 bands: Int = 32, threshold: Double = 0.8,
                 seed: Long = 42L, maxBucket: Int = 1000,
                 // cacheSets=false for PER-MICRO-BATCH callers: the
                 // persisted shingle sets are keyed by logical plan,
                 // so a long-lived stream would accumulate one cache
                 // entry per batch (and clearCache would evict OTHER
                 // pipelines' state); re-tokenizing a bounded batch
                 // ~3× is the cheaper, leak-free trade there
                 cacheSets: Boolean = true): (DataFrame, (DataFrame, DataFrame)) = {
    requireIntegralId(batch, idCol, "TextIndex.ingestStep")
    val bSets = Dedup.shingleSets(batch, idCol, textCol, shingleN,
      "dup_id", cache = cacheSets)
    // batch-internal election FIRST (pinned — eager, id-sized:
    // consumed by the prune below and the returned verdicts); its
    // losers never reach the history judge, exactly as
    // MediaIndex.ingestStep prunes before its cross judge
    val intra = intraDupsFromSets(bSets, numHashes, bands, threshold,
      seed, maxBucket).localCheckpoint(true)
    val pruned = bSets.join(intra.select(col("dup_id")),
      Seq("dup_id"), "left_anti")
    // pinned (eager, id-sized): consumed by the self-split below, the
    // survivor delta, and the caller's gate — one history pass total
    val cross = dupsFromSets(pruned, batch.schema(idCol).dataType,
      histBands, histSets, numHashes, bands, threshold, seed, maxBucket)
      .localCheckpoint(true)
    // ids already IN the index (replay detection past the census-cap
    // hole): index `doc` column streamed against the broadcast batch
    // id set — batch-bounded output, no history shuffle. Pruned ids
    // only: intra losers never append, so their presence is moot.
    val present = histSets.select(col("doc").as("dup_id"))
      .join(broadcast(pruned.select(col("dup_id")).distinct()),
        Seq("dup_id"))
      .distinct()
    val survivorSets = pruned
      .filter(col("shs").isNotNull)
      .join(cross.select(col("dup_id")).unionByName(present).distinct(),
        Seq("dup_id"), "left_anti")
      .withColumnRenamed("dup_id", "doc")
    (intra.unionByName(cross.filter(col("dup_id") =!= col("keep_id"))),
      (bandRowsOf(survivorSets, numHashes, bands, seed), survivorSets))
  }
}
