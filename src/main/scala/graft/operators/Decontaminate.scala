package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Train/eval decontamination: find evaluation documents whose content
  * leaks into the training corpus — the gate every LLM data pipeline
  * runs before a benchmark number is believable. Two detectors:
  *
  *  - [[exactLeaks]]: normalized-content fingerprint equi-join. One
  *    hash shuffle on the (128-bit, engine-portable md5) fingerprint;
  *    at 100 TB this is the cheap first pass that removes the bulk.
  *  - [[nearDupLeaks]]: word-shingle Jaccard ACROSS the corpus
  *    boundary only — same kernel as Dedup.ngramJaccardPairs but the
  *    join is train-side × eval-side, so cost is O(cross pairs sharing
  *    a shingle), never within-corpus quadratic. At full scale run
  *    MinHash banding per corpus first and verify only cross-corpus
  *    candidates; this exact form is the verifier and the oracle
  *    anchor.
  *
  * Both return eval-side identities (plus evidence), because the
  * action taken is always "drop/flag the eval doc", never "fix train".
  *
  * Cache lifecycle (same contract as [[Dedup]]'s pair operators): the
  * returned plan holds persisted shingle intermediates, which Spark
  * can only release AFTER the plan is consumed — in a long-lived
  * session, unpersist via `spark.catalog.clearCache()` (or unpersist
  * the specific RDDs) once results are materialized.
  */
object Decontaminate {

  /** Eval docs whose normalized text appears verbatim in train.
    * Output: (eval_id, train_id) with train_id the smallest matching
    * train doc (deterministic evidence), one row per leaked eval doc. */
  def exactLeaks(train: DataFrame, eval: DataFrame,
                 idCol: String, textCol: String): DataFrame = {
    val t = train.select(col(idCol).as("train_id"),
      TextFns.fingerprint(col(textCol)).as("__fp"))
    val e = eval.select(col(idCol).as("eval_id"),
      TextFns.fingerprint(col(textCol)).as("__fp"))
    e.join(t, "__fp")
      .groupBy(col("eval_id"))
      .agg(min(col("train_id")).as("train_id"))
  }

  /** Eval docs near-duplicated in train: word n-gram Jaccard ≥
    * threshold across the corpus boundary. Output one row per
    * (eval_id, train_id) leak pair with the score. */
  def nearDupLeaks(train: DataFrame, eval: DataFrame, idCol: String,
                   textCol: String, n: Int, threshold: Double): DataFrame = {
    // shared shingle-set kernel: per-corpus sizes are NARROW size(shs)
    // projections of the persisted sets — not counting shuffles over
    // the exploded view (same migration as Dedup.ngramJaccardPairs)
    val tSets = Dedup.shingleSets(train, idCol, textCol, n, "train_id")
    val eSets = Dedup.shingleSets(eval, idCol, textCol, n, "eval_id")
    val ts = tSets.select(col("train_id"), explode(col("shs")).as("sh"))
    val es = eSets.select(col("eval_id"), explode(col("shs")).as("sh"))
    val tSizes = tSets.select(col("train_id"), size(col("shs")).as("sz_t"))
    val eSizes = eSets.select(col("eval_id"), size(col("shs")).as("sz_e"))
    es.join(ts, "sh")
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("inter"))
      .join(eSizes, "eval_id")
      .join(tSizes, "train_id")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_e") + col("sz_t") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("eval_id"), col("train_id"),
        round(col("jaccard"), 6).as("jaccard"))
  }

  /** Exact shared-n-gram contamination (the GPT-3-style "any shared
    * 13-gram" detector): every (eval, train) pair sharing at least one
    * distinct word n-gram, with the shared-gram count as evidence.
    * Stricter evidence than Jaccard — ONE verbatim 13-token span flags
    * the pair even when the documents are otherwise unrelated (the
    * quoted-benchmark-question case a global similarity score dilutes
    * away).
    *
    * Scale shape: eval benchmark suites are tiny next to a 100 TB
    * train corpus, so the eval side's exploded (gram, eval_id) view is
    * BROADCAST and the train corpus streams through a broadcast hash
    * join — the train side is never shuffled; the one shuffle is the
    * per-pair count aggregation over matches only. Grams travel as
    * 64-bit hashes from [[Dedup.shingleSets]] (8-byte join keys,
    * per-doc distinct at birth — so `n_shared` counts DISTINCT shared
    * grams).
    *
    * Docs shorter than n tokens degrade to whole-text matching (the
    * shingle kernel's fallback), i.e. a short eval doc is only flagged
    * when some short train doc equals it verbatim. NULL text yields no
    * grams and is never flagged. */
  def ngramLeaks(train: DataFrame, eval: DataFrame, idCol: String,
                 textCol: String, n: Int = 13): DataFrame = {
    val tg = Dedup.shingleSets(train, idCol, textCol, n, "train_id",
        cache = false)
      .select(col("train_id"), explode(col("shs")).as("g"))
    val eg = Dedup.shingleSets(eval, idCol, textCol, n, "eval_id",
        cache = false)
      .select(col("eval_id"), explode(col("shs")).as("g"))
    tg.join(broadcast(eg), "g")
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).cast("int").as("n_shared"))
  }

  /** Per-TRAIN-doc contamination fraction: what share of each train
    * document's DISTINCT word n-grams appears ANYWHERE in the eval
    * suite (union over eval docs). [[ngramLeaks]] answers "which eval
    * docs leaked, and from where" (pair evidence); this answers the
    * operational question on the other side — "which TRAIN docs do I
    * drop, and at what threshold" (the PaLM-style rule marks a train
    * doc contaminated when ≥70% of its 8-grams hit the eval set; the
    * caller applies their cut on `frac_bp`).
    *
    * Output: one row per train doc — (train_id, n_grams,
    * n_contaminated, frac_bp) with frac_bp the exact-integer basis
    * points `n_contaminated·10⁴ div n_grams` (NULL only when the doc
    * produced no grams, i.e. NULL text), so any engine reproduces the
    * score bit for bit.
    *
    * Scale shape (the [[ngramLeaks]] argument): the eval side's
    * distinct-gram set is tiny next to a 100 TB train corpus and is
    * BROADCAST; the train side streams through one narrow
    * explode→broadcast-semi-join→per-doc count — the only shuffle is
    * the per-train-doc aggregation, partial-combined map-side. */
  def contaminationFraction(train: DataFrame, eval: DataFrame,
                            idCol: String, textCol: String,
                            n: Int = 13): DataFrame = {
    // cache=true: the train sets feed TWO consumers of the returned
    // lazy plan (totals + hits) — uncached, the tokenize+shingle pass
    // over the 100 TB side would run twice (the round-7 multi-consumer
    // audit). Totals come from a NARROW size(shs) — the sets are
    // distinct at birth, so no explode and no counting shuffle at all.
    val tSets = Dedup.shingleSets(train, idCol, textCol, n, "train_id")
    val eg = Dedup.shingleSets(eval, idCol, textCol, n, "eval_id",
        cache = false)
      .select(explode(col("shs")).as("g"))
      .distinct()
    // NULL sets filtered BEFORE size(): under non-ANSI sessions
    // size(NULL) is legacy -1, which would leak into n_grams where
    // the old exploded form (and the oracle) yield 0 via the
    // left-join coalesce
    val tot = tSets.filter(col("shs").isNotNull)
      .select(col("train_id"), size(col("shs")).cast("long").as("n_grams"))
    val hits = tSets.select(col("train_id"), explode(col("shs")).as("g"))
      .join(broadcast(eg), Seq("g"), "left_semi")
      .groupBy(col("train_id"))
      .agg(count(lit(1)).as("n_contaminated"))
    train.select(col(idCol).as("train_id"))
      .join(tot, Seq("train_id"), "left")
      .join(hits, Seq("train_id"), "left")
      .select(col("train_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"))
      .withColumn("frac_bp",
        when(col("n_grams") > 0L,
          expr("n_contaminated * 10000 div n_grams")))
  }

  /** [[nearDupLeaks]]'s LSH-banded scale form: MinHash-band both
    * corpora, candidates = cross-corpus bucket collisions only, exact
    * Jaccard verification per candidate pair — so precision is exactly
    * 1.0 and recall follows the band curve (≈1−5·10⁻⁸ missing
    * probability at j=0.8 with 128/32, the q28 argument). At 100 TB
    * the exact form's shingle join touches every co-shingle pair
    * across corpora; this touches only banded collisions, and the
    * shingle sets are tokenized ONCE and reused for signatures and
    * verification alike. */
  def nearDupLeaksLsh(train: DataFrame, eval: DataFrame, idCol: String,
                      textCol: String, n: Int = 3, numHashes: Int = 128,
                      bands: Int = 32, threshold: Double = 0.8,
                      maxBucket: Int = 1000): DataFrame = {
    // fail fast on non-integral ids, same hazard as minhashCandidates:
    // the bounded-collect bucket aggregate casts ids to long — string
    // keys would die mid-shuffle under ANSI, or (ANSI off) null out
    // every bucket member and SILENTLY report zero leaks, the worst
    // possible failure mode for a contamination gate
    Seq(train, eval).foreach { side =>
      val idType = side.schema(side.schema.fieldIndex(idCol)).dataType
      require(idType == org.apache.spark.sql.types.LongType
          || idType == org.apache.spark.sql.types.IntegerType,
        s"nearDupLeaksLsh needs an integral doc id, got " +
          s"${idType.catalogString}; map string keys to a surrogate id first")
    }
    val tSets = Dedup.shingleSets(train, idCol, textCol, n, "train_id")
    val eSets = Dedup.shingleSets(eval, idCol, textCol, n, "eval_id")
    val cands = cappedBuckets(eSets, "eval_id", numHashes, bands, maxBucket)
      .join(cappedBuckets(tSets, "train_id", numHashes, bands, maxBucket),
        Seq("band", "sig"))
      .select(col("eval_id"), col("train_id"))
      .distinct()
    Dedup.verifyJaccard(cands, "eval_id", "train_id", eSets, tSets, threshold)
  }

  /** Per-side degenerate-bucket cap BEFORE the cross join — the same
    * guard as minhashCandidates, same bounded_collect mechanics: all
    * boilerplate/empty docs share one signature, so an uncapped
    * (band, sig) join key would materialize |eval bucket|·|train
    * bucket| rows. A bucket larger than maxBucket on EITHER side is
    * dropped whole (its members are not near-dup evidence, they are
    * degenerate content). */
  private def cappedBuckets(sets: DataFrame, id: String, numHashes: Int,
                            bands: Int, maxBucket: Int): DataFrame =
    Dedup.bandBuckets(
        Dedup.minhashSignaturesFromSets(sets, numHashes), bands)
      .groupBy(col("band"), col("sig"))
      .agg(BoundedCollectLong.boundedCollect(maxBucket)(col("doc")).as("bc"))
      .filter(col("bc.n") <= maxBucket)
      .select(col("band"), col("sig"), explode(col("bc.items")).as(id))

  /** A historical corpus's near-dup detection side, precomputed ONCE
    * and reused across calls — the repeated-gating shape (continuous
    * ingest checks every micro-batch against the same index;
    * recomputing the index's tokenize→shingle→signature→bucket chain
    * per batch would dominate the gate's cost). Both relations are
    * persisted; call [[NearDupIndex.unpersist]] when retiring it. */
  final case class NearDupIndex private[operators] (
      sets: DataFrame, buckets: DataFrame,
      n: Int, numHashes: Int, bands: Int, maxBucket: Int) {
    def unpersist(): Unit = { sets.unpersist(); buckets.unpersist() }
  }

  /** Build a [[NearDupIndex]] over the historical corpus (same id/
    * hash/band parameters the gate will use — they are carried on the
    * index so a mismatched gate call cannot happen silently). */
  def buildNearDupIndex(corpus: DataFrame, idCol: String, textCol: String,
                        n: Int = 3, numHashes: Int = 128, bands: Int = 32,
                        maxBucket: Int = 1000): NearDupIndex = {
    val idType = corpus.schema(corpus.schema.fieldIndex(idCol)).dataType
    require(idType == org.apache.spark.sql.types.LongType
        || idType == org.apache.spark.sql.types.IntegerType,
      s"buildNearDupIndex needs an integral doc id, got " +
        s"${idType.catalogString}; map string keys to a surrogate id first")
    val sets = Dedup.shingleSets(corpus, idCol, textCol, n, "train_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = cappedBuckets(sets, "train_id", numHashes, bands, maxBucket)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    NearDupIndex(sets, buckets, n, numHashes, bands, maxBucket)
  }

  /** [[nearDupLeaksLsh]] against a PRECOMPUTED index side: identical
    * semantics and output shape ((eval_id, train_id, jaccard), the
    * fresh side flagged), but the historical corpus's relations come
    * from the persisted [[NearDupIndex]] — only the fresh batch pays
    * tokenize→signature work. The candidate join and verification are
    * byte-for-byte the nearDupLeaksLsh tail, so live gating and a
    * batch backfill flag the same pairs (asserted in
    * StreamingIngestPipelineSpec). */
  def nearDupLeaksAgainstIndex(index: NearDupIndex, fresh: DataFrame,
                               idCol: String, textCol: String,
                               threshold: Double = 0.8): DataFrame = {
    val idType = fresh.schema(fresh.schema.fieldIndex(idCol)).dataType
    require(idType == org.apache.spark.sql.types.LongType
        || idType == org.apache.spark.sql.types.IntegerType,
      s"nearDupLeaksAgainstIndex needs an integral doc id, got " +
        s"${idType.catalogString}; map string keys to a surrogate id first")
    val eSets = Dedup.shingleSets(fresh, idCol, textCol, index.n, "eval_id")
    val cands = cappedBuckets(eSets, "eval_id", index.numHashes, index.bands,
        index.maxBucket)
      .join(index.buckets, Seq("band", "sig"))
      .select(col("eval_id"), col("train_id"))
      .distinct()
    Dedup.verifyJaccard(cands, "eval_id", "train_id", eSets, index.sets,
      threshold)
  }

  /** SEMANTIC decontamination: eval docs whose EMBEDDING lands within
    * cosine `threshold` of any train embedding — the detector for
    * paraphrased/translated/reworded benchmark leakage that every
    * lexical detector above (fingerprints, shingles, n-grams) is blind
    * to by construction. Output: (eval_id, train_id, sim) per leaking
    * cross-corpus pair at sim ≥ threshold, eval-side identity first
    * (the family convention — the action is "drop/flag the eval doc").
    *
    * Candidate generation is IVF shared-cell pairing over the UNION of
    * both corpora (one centroid broadcast + one cell shuffle — never
    * an all-pairs cross join; the same sub-quadratic shape and
    * nProbe/nCells recall trade as [[Similarity.ivfTopK]], with
    * nCells = 0 auto-sizing via the measured √n rule). Sides are
    * disambiguated by packing ids into `2·id + isEval` — integral ids
    * required (same guard and reason as [[nearDupLeaksLsh]]) and ids
    * must fit 62 bits — so the boundary predicate (train parity ×
    * eval parity) sits below the cell join and same-side pairs never
    * reach the cosine kernel. NULL/corrupt embeddings are excluded up
    * front ([[Similarity]]'s "excluded from the index" contract). */
  def semanticLeaks(train: DataFrame, eval: DataFrame, idCol: String,
                    vecCol: String, threshold: Double,
                    nCells: Int = 0, nProbe: Int = 2,
                    centroidRank: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                      id => pmod(xxhash64(id), lit(1000000L))): DataFrame = {
    def side(df: DataFrame, tag: Int) = {
      val idType = df.schema(idCol).dataType
      require(idType == org.apache.spark.sql.types.LongType
          || idType == org.apache.spark.sql.types.IntegerType,
        s"semantic decontamination needs an integral id, got ${idType.catalogString}")
      // ids outside ±2^62 would silently overflow the 2·id+tag packing
      // and mislabel pairs — fail loudly instead (explicit bounds, not
      // abs(): abs(Long.MinValue) overflows back to negative and would
      // slip the guard)
      val idL = col(idCol).cast("long")
      val bound = 1L << 62
      val uid = when(idL > -bound && idL < bound, idL * 2 + tag)
        .otherwise(raise_error(concat(
          lit(s"semanticLeaks: $idCol must fit 62 bits, got "),
          idL.cast("string"))))
      df.filter(col(vecCol).isNotNull && !exists(col(vecCol), x => x.isNull))
        .select(uid.as("uid"), col(vecCol).as("vec"))
    }
    val all = side(train, 0).union(side(eval, 1))
    // persisted: the cell relation feeds both join sides (ivfTopK's rule)
    val cells = Similarity.ivfCells(all, "uid", "vec", nCells, nProbe, centroidRank)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = cells.as("t").join(cells.as("e"),
        col("t.cell") === col("e.cell")
          && pmod(col("t.id"), lit(2)) === 0 && pmod(col("e.id"), lit(2)) === 1)
      .select(col("t.id").as("t_uid"), col("e.id").as("e_uid"))
      .distinct()
    pairs
      .join(all.select(col("uid").as("t_uid"), col("vec").as("__tv")), "t_uid")
      .join(all.select(col("uid").as("e_uid"), col("vec").as("__ev")), "e_uid")
      // integer `div`, not `/`: float division loses exactness past
      // 2^53 and these are ids (the Tables.events ns→µs precedent)
      .select(expr("(e_uid - 1) div 2").as("eval_id"),
        expr("t_uid div 2").as("train_id"),
        graft.functions.VectorFns.cosine(col("__tv"), col("__ev")).as("sim"))
      .filter(col("sim") >= threshold)
  }
}
