package graft.operators

import graft.functions.{ScalarFns, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus-composition statistics for training-mix design: pairwise
  * n-gram overlap between corpus partitions (sources/domains) and
  * Zipf head-mass per group. Both are data-card numbers — they tell
  * you whether two sources are near-copies of each other (crawl
  * overlap) and how repetitive each slice's token distribution is.
  */
object CorpusStats {

  /** Pairwise word-n-gram-shingle Jaccard between values of `partCol`
    * (e.g. sources): the source-level contamination/diversity matrix.
    * Output: (src_a, src_b, n_common: long, jaccard: double(6)) for
    * every unordered pair sharing at least one shingle, src_a < src_b.
    *
    * 100 TB design: the corpus collapses to DISTINCT (source, shingle)
    * with map-side combine — output is vocabulary-sized per source, not
    * corpus-sized. The self-join key is the shingle; each key carries at
    * most one row per source, so per-key fan-out is bounded by S²/2 for
    * S sources — the size of the answer itself. Set sizes join back by
    * source (S rows, broadcast). Nothing here scales with document
    * count beyond the initial distinct.
    */
  def sourceNgramOverlap(docs: DataFrame, partCol: String, textCol: String,
                         n: Int = 3): DataFrame = {
    // persisted: feeds both the per-source set sizes and the pair join.
    // Empty/NULL docs produce wordShingles' "" / NULL fallback entry —
    // filtered out here: an empty doc carries no content, so it must
    // neither inflate a source's set size nor let two sources "overlap"
    // on shared emptiness.
    val sh = docs
      .select(col(partCol).as("src"),
        explode(TextFns.wordShingles(col(textCol), n)).as("s"))
      .filter(col("s").isNotNull && col("s") =!= "")
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sizes = sh.groupBy(col("src")).agg(count(lit(1)).as("sz"))
    val union = col("sa.sz") + col("sb.sz") - col("n_common")
    sh.as("a")
      .join(sh.as("b"), col("a.s") === col("b.s") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("n_common"))
      .join(broadcast(sizes.as("sa")), col("src_a") === col("sa.src"))
      .join(broadcast(sizes.as("sb")), col("src_b") === col("sb.src"))
      .select(col("src_a"), col("src_b"), col("n_common"),
        ScalarFns.roundFrac(col("n_common"), union, 6).as("jaccard"))
  }

  /** Zipf head mass: per group, the fraction of all token occurrences
    * covered by the k most frequent tokens (ties broken alphabetically),
    * plus the single most frequent token. High coverage = repetitive /
    * templated slice. Output: (grp, n_tokens: long, top_token,
    * topk_frac: double(4)).
    *
    * 100 TB design: the corpus reduces to (group, token, count) with
    * map-side combine before any window — the ranked relation is
    * vocabulary-sized per group. The rank window sorts that relation,
    * not the corpus; for a 10⁸-token vocabulary prefer a bounded top-k
    * aggregate (operators.TopKAgg) for the head and a plain sum for the
    * denominator — same output, no full vocabulary sort.
    */
  def topTokenCoverage(docs: DataFrame, groupCol: String, textCol: String,
                       k: Int = 10): DataFrame = {
    val tc = docs
      .select(col(groupCol).as("grp"),
        explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy(col("grp"), col("token"))
      .agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("grp"))
      .orderBy(col("c").desc, col("token").asc)
    tc.withColumn("rk", row_number().over(w))
      .groupBy(col("grp"))
      .agg(
        sum(col("c")).as("n_tokens"),
        sum(when(col("rk") <= k, col("c")).otherwise(lit(0L))).as("topk"),
        max(when(col("rk") === 1, col("token"))).as("top_token"))
      .select(col("grp"), col("n_tokens"), col("top_token"),
        ScalarFns.roundFrac(col("topk"), col("n_tokens"), 4).as("topk_frac"))
  }

  /** Per-source corpus profile in SKETCH form — the fixed-memory
    * estimators a 100 TB data card actually runs: HLL++ for the
    * vocabulary size (`approx_count_distinct`, relative sd `rsd`) and a
    * GK quantile sketch for the p90 document length
    * (`percentile_approx`). Both aggregate map-side into constant-size
    * partial states and merge associatively — the exact forms below
    * keep a per-key hash set / a full value multiset per partition,
    * which is fine per-source but pathological for high-cardinality
    * keys. Estimates are deterministic for a given dataset (hash-based,
    * no RNG), but NOT engine-portable — the catalog checks this query
    * rows-only and oracles its exact twin [[distinctProfile]];
    * ApproxSpec pins the error bound differentially.
    *
    * Output: (source, n_docs: long, approx_distinct_tokens: long,
    * approx_p90_chars: double). NULL source groups as '(none)',
    * all-empty sources report 0 distinct tokens.
    */
  def sketchProfile(docs: DataFrame, sourceCol: String, textCol: String,
                    rsd: Double = 0.05): DataFrame = {
    val src = coalesce(col(sourceCol).cast("string"), lit("(none)"))
    val lens = docs.groupBy(src.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        percentile_approx(length(coalesce(col(textCol), lit(""))),
          lit(0.9), lit(10000)).cast("double").as("approx_p90_chars"))
    val vocab = docs
      .select(src.as("source"),
        explode(TextFns.tokens(col(textCol))).as("tok"))
      .groupBy(col("source"))
      .agg(approx_count_distinct(col("tok"), rsd).as("approx_distinct_tokens"))
    lens.join(vocab, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("approx_distinct_tokens"), lit(0L))
          .as("approx_distinct_tokens"),
        col("approx_p90_chars"))
  }

  /** Exact twin of [[sketchProfile]]: same shape, `count(DISTINCT)` and
    * the q53 p·(n−1)-interpolated exact percentile — engine-portable,
    * so this is the oracle-checked form. At scale the exact distinct is
    * the expensive one (its partial state is the per-source hash SET of
    * tokens, not a constant-size register bank); run it when auditing
    * the sketches, run the sketches in production.
    *
    * Output: (source, n_docs: long, n_distinct_tokens: long,
    * p90_chars: double).
    */
  def distinctProfile(docs: DataFrame, sourceCol: String,
                      textCol: String): DataFrame = {
    val src = coalesce(col(sourceCol).cast("string"), lit("(none)"))
    val lens = docs.groupBy(src.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        expr(s"percentile(length(coalesce($textCol, '')), 0.9)")
          .as("p90_chars"))
    val vocab = docs
      .select(src.as("source"),
        explode(TextFns.tokens(col(textCol))).as("tok"))
      .groupBy(col("source"))
      .agg(countDistinct(col("tok")).as("n_distinct_tokens"))
    lens.join(vocab, Seq("source"), "left")
      .select(col("source"), col("n_docs"),
        coalesce(col("n_distinct_tokens"), lit(0L)).as("n_distinct_tokens"),
        col("p90_chars"))
  }

  /** Per-group distribution drift between two corpus snapshots: total
    * variation distance over `bucketWidth`-wide histograms of
    * `valueCol` — the alarm an ingest pipeline checks after the
    * [[SnapshotDiff]] delta (membership can be stable while the SHAPE
    * of a source silently shifts: truncated extractions, encoding
    * damage, a crawler suddenly favoring short pages).
    *
    * Integer-exact for engine portability: with per-bucket counts cA/cB
    * and totals NA/NB,
    * `tvd_u = (Σ_i |cA_i·NB − cB_i·NA| · 10000) div (2·NA·NB)` —
    * 10000 ≙ TVD 1.0 (disjoint), 0 ≙ identical shape. Cross-products
    * run in DECIMAL(38,0) (the temperatureMixture precedent): cA·NB ≤
    * NA·NB needs int128-class headroom long before any real corpus
    * overflows 38 digits (NA·NB < 10³⁸ holds to ~10¹⁹ docs/side). A
    * group empty on either side has no distribution to compare → NULL
    * tvd_u (existence changes are [[SnapshotDiff]]'s job); NULL group
    * keys bucket under "(none)", NULL values are excluded.
    *
    * Scale shape: each side collapses to (group, bucket, count) with
    * map-side combine — histogram-sized, not corpus-sized — before the
    * full-outer join; totals and the TVD sum are two more aggregates
    * over that same tiny relation. Nothing after the first groupBy
    * scales with document count.
    * Output: (grp, n_prev, n_cur, tvd_u).
    */
  def distributionDrift(prev: DataFrame, cur: DataFrame, groupCol: String,
                        valueCol: String, bucketWidth: Long): DataFrame = {
    // the histogram relations are each read twice downstream (totals
    // + the TVD term join); persisted — histogram-sized, released by
    // the session's next clearCache (Bench/Verify do this per query).
    // Long-lived repeated comparisons (the streaming monitor) manage
    // their own histogram lifecycle via the two pieces directly.
    val ha = valueHistogram(prev, groupCol, valueCol, bucketWidth)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val hb = valueHistogram(cur, groupCol, valueCol, bucketWidth)
      .persist(StorageLevel.MEMORY_AND_DISK)
    driftFromHistograms(ha, hb)
  }

  /** The (grp, bucket, c) histogram side of [[distributionDrift]]:
    * NULL group keys under "(none)", NULL values excluded, buckets by
    * truncating division. Exposed so a long-lived comparison (the
    * streaming drift monitor) builds its REFERENCE histogram once
    * instead of re-aggregating the reference corpus per comparison. */
  def valueHistogram(df: DataFrame, groupCol: String, valueCol: String,
                     bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    df.filter(col(valueCol).isNotNull)
      .select(coalesce(col(groupCol).cast("string"), lit("(none)")).as("grp"),
        expr(s"CAST($valueCol AS BIGINT) div ${bucketWidth}L").as("bucket"))
      .groupBy(col("grp"), col("bucket"))
      .agg(count(lit(1)).as("c"))
  }

  /** Windowed collocation mining: unordered token pairs co-occurring
    * within `window` positions, counted corpus-wide, with an
    * integer-exact association lift — the collocation/PMI-class signal
    * that drives tokenizer-vocabulary merges and phrase-list building.
    * `lift_micro = (4·T·n_ab·10⁶) div (m_a·m_b)` where T = total
    * windowed pairs and m = slot-marginals — the exact argument of
    * PMI's log as a rational in 1e-6 units (monotone in PMI, so
    * thresholding/ranking on it is thresholding on PMI), with no
    * floating log for an engine to disagree over. 10⁶ ≙ independence;
    * above ⇒ attraction. Self-pairs ("table table") are legitimate
    * collocations and count their marginal twice.
    *
    * Scale shape: pair GENERATION is scan-local — a per-document
    * indexed HOF pairs each token with its next `window` neighbors
    * inside the projection (no corpus self-join, no shuffle) — and the
    * single shuffle is the (w1, w2) count with map-side combine, a
    * vocabulary²-bounded relation in practice dominated by the
    * `minCount` filter. Marginals and T derive from the AGGREGATED
    * pair relation (persisted; three consumers), never a second corpus
    * pass; products run in DECIMAL(38,0) (headroom to ~10¹⁴ windowed
    * pairs per the drift operator's argument).
    * Output: top-`topN` by (n_pairs desc, w1, w2) —
    * (w1, w2, n_pairs, lift_micro), w1 ≤ w2.
    */
  def collocations(docs: DataFrame, textCol: String, window: Int,
                   minCount: Long, topN: Int): DataFrame = {
    require(window >= 1, s"window must be >= 1, got $window")
    val D = "decimal(38,0)"
    val pairs = docs
      .select(TextFns.tokens(col(textCol)).as("ts"))
      .select(explode(flatten(transform(col("ts"), (t, i) =>
        transform(slice(col("ts"), i + lit(2), lit(window)), u =>
          struct(least(t, u).as("w1"), greatest(t, u).as("w2"))))))
        .as("p"))
      .select(col("p.w1"), col("p.w2"))
    // persisted: totals, marginals, and the lift join all read it
    val agg = pairs.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_pairs"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val marg = agg.select(col("w1").as("w"),
        (col("n_pairs") * when(col("w1") === col("w2"), 2L).otherwise(1L))
          .as("m"))
      .unionAll(agg.filter(col("w1") =!= col("w2"))
        .select(col("w2").as("w"), col("n_pairs").as("m")))
      .groupBy(col("w")).agg(sum(col("m")).as("m"))
    val tot = agg.agg(sum(col("n_pairs")).as("t"))
    agg.filter(col("n_pairs") >= minCount)
      .crossJoin(broadcast(tot))
      .join(marg.select(col("w").as("w1"), col("m").as("m1")), "w1")
      .join(marg.select(col("w").as("w2"), col("m").as("m2")), "w2")
      .select(col("w1"), col("w2"), col("n_pairs"),
        expr(s"(CAST(4 AS $D) * CAST(t AS $D) * CAST(n_pairs AS $D) * CAST(1000000 AS $D))" +
          s" div (CAST(m1 AS $D) * CAST(m2 AS $D))").as("lift_micro"))
      .orderBy(col("n_pairs").desc, col("w1"), col("w2"))
      .limit(topN)
  }

  /** [[distributionDrift]]'s comparison tail over two prebuilt
    * [[valueHistogram]] relations (same bucketWidth on both sides is
    * the caller's contract). Persists NOTHING itself: each input is
    * read twice (per-group totals + the TVD term join), so pass
    * persisted histograms when either side is expensive or the
    * comparison repeats. */
  def driftFromHistograms(ha: DataFrame, hb: DataFrame): DataFrame = {
    val D = "decimal(38,0)"
    val j = ha.withColumnRenamed("c", "ca")
      .join(hb.withColumnRenamed("c", "cb"), Seq("grp", "bucket"), "full_outer")
      .na.fill(0L, Seq("ca", "cb"))
    val tot = j.groupBy(col("grp"))
      .agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    j.join(tot, "grp")
      .withColumn("term",
        abs(col("ca").cast(D) * col("nb").cast(D)
          - col("cb").cast(D) * col("na").cast(D)))
      .groupBy(col("grp"), col("na"), col("nb"))
      .agg(sum(col("term")).as("num"))
      .select(col("grp"),
        col("na").as("n_prev"), col("nb").as("n_cur"),
        when(col("na") === 0 || col("nb") === 0, lit(null).cast("long"))
          .otherwise(expr(s"(num * CAST(10000 AS $D)) div (CAST(2 AS $D) * CAST(na AS $D) * CAST(nb AS $D))"))
          .as("tvd_u"))
  }
}
