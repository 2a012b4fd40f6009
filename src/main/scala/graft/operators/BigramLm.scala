package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus bigram language model + per-document mean conditional
  * log-probability — the CCNet-class LM quality gate one order up from
  * [[UnigramLm]]: `Σ log p(wᵢ | wᵢ₋₁)` over a doc's adjacent token
  * pairs catches scrambled/concatenated text that unigram frequency
  * cannot (every token common, no two ever adjacent in real prose),
  * while staying cheap enough to run corpus-wide. Unseen bigrams back
  * off to the unigram probability of the continuation token plus a
  * fixed penalty (the stupid-backoff shape, Brants et al. 2007 — no
  * discount renormalization, which large-corpus LMs skip anyway);
  * unigram-OOV continuations take the [[UnigramLm]] OOV floor.
  *
  * Cross-engine determinism: same contract as [[UnigramLm]] — each
  * DISTINCT bigram's conditional log-prob is quantized ONCE to integer
  * micro-units (`round(ln(c(w₁w₂)/c(w₁·))·10⁶)`, context counts from
  * the bigram table itself, so Σ_w₂ p(w₂|w₁) = 1 exactly over observed
  * continuations), per-doc sums are integer dot products, and only the
  * final display division floats, in the same operation order
  * everywhere. The q134 oracle replays build and scoring end to end.
  *
  * 100 TB design: identical shape to [[UnigramLm]] — the LM build is
  * one pair groupBy with map-side combine (bigram-vocabulary-sized
  * output; Heaps' law keeps even web-corpus bigram vocabularies ≪
  * corpus), scoring aggregates per-(doc, pair) tf FIRST, and the two
  * LM joins are one-row-per-key (no fan-out; AQE broadcasts small LMs
  * under the threshold automatically).
  */
object BigramLm {

  /** Default penalty added to the unigram log-prob of an unseen
    * bigram's continuation (−5 nats in micro-units). */
  val BackoffMicro: Long = -5000000L

  /** Floor for a continuation token absent from the unigram LM too
    * (matches [[UnigramLm]]'s OOV convention: −20 nats). */
  val OovMicro: Long = -20000000L

  /** Adjacent-pair extraction shared by build and scoring — the single
    * tokenization site (w1 = wᵢ, w2 = wᵢ₊₁, 1 row per position). */
  private def pairsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFns.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
      .select(col(idCol), explode(transform(
        sequence(lit(1), size(col("w")) - 1),
        i => struct(element_at(col("w"), i).as("w1"),
          element_at(col("w"), i + 1).as("w2")))).as("b"))
      .select(col(idCol), col("b.w1").as("w1"), col("b.w2").as("w2"))

  /** Build the bigram LM: (w1, w2, cnt, lp_micro) with lp_micro the
    * micro-quantized conditional log-probability ln(c(w1,w2)/c(w1·)). */
  def build(docs: DataFrame, textCol: String): DataFrame =
    lmFromPairCounts(
      pairsOf(docs.select(lit(0L).as("__id"), col(textCol)), "__id", textCol)
        .groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("cnt")))

  /** (w1, w2, cnt) → the LM projection — the single place conditional
    * log-probs are quantized. Eager localCheckpoint: the count
    * relation feeds BOTH the context aggregation and the probability
    * join, and ReuseExchange does NOT rescue the shape (plan census:
    * zero ReusedExchange/ReusedQueryStage nodes; the corpus pair
    * explode appeared 6× in one uncached selfScore plan — the round-7
    * multi-consumer audit). Checkpoint is bigram-vocabulary-sized. */
  private def lmFromPairCounts(bc0: DataFrame): DataFrame = {
    val bc = bc0.localCheckpoint()
    val ctx = bc.groupBy(col("w1")).agg(sum(col("cnt")).as("ctx_cnt"))
    bc.join(ctx, "w1")
      .select(col("w1"), col("w2"), col("cnt"),
        round(log(col("cnt").cast("double") / col("ctx_cnt")) * lit(1e6), 0)
          .cast("long").as("lp_micro"))
  }

  /** Score every document under `lm` (+ `uniLm` backoff): (idCol,
    * n_bigrams, lp_sum_micro, avg_logprob). Docs with < 2 tokens keep
    * a row (n_bigrams 0, sums 0, avg NULL). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            lm: DataFrame, uniLm: DataFrame,
            backoffMicro: Long = BackoffMicro,
            oovMicro: Long = OovMicro): DataFrame =
    scoreTf(docs, idCol,
      pairsOf(docs, idCol, textCol)
        .groupBy(col(idCol), col("w1"), col("w2"))
        .agg(count(lit(1)).as("tf")),
      lm, uniLm, backoffMicro, oovMicro)

  /** [[score]] over a PRECOMPUTED per-(doc, pair) tf relation — lets
    * [[selfScore]] feed one shared tf to both the LM build and the
    * scoring join. */
  private def scoreTf(docs: DataFrame, idCol: String, tf: DataFrame,
                      lm: DataFrame, uniLm: DataFrame,
                      backoffMicro: Long, oovMicro: Long): DataFrame = {
    val lp: Column = coalesce(col("lp_micro"),
      coalesce(col("__uni_lp"), lit(oovMicro)) + lit(backoffMicro))
    val sc = tf
      .join(lm.select(col("w1"), col("w2"), col("lp_micro")),
        Seq("w1", "w2"), "left")
      .join(uniLm.select(col("token").as("w2"),
        col("lp_micro").as("__uni_lp")), Seq("w2"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).cast("int").as("n_bigrams"),
        sum(col("tf") * lp).as("lp_sum_micro"))
    docs.select(col(idCol))
      .join(sc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0)).as("n_bigrams"),
        coalesce(col("lp_sum_micro"), lit(0L)).as("lp_sum_micro"))
      .withColumn("avg_logprob",
        when(col("n_bigrams") > 0,
          round(col("lp_sum_micro").cast("double") / col("n_bigrams") / lit(1e6), 4)))
  }

  /** Score the corpus under its OWN bigram LM (+ its own unigram LM
    * for backoff) — the q134 self-scoring quality signal. The corpus
    * pays the pair explode ONCE: the per-(doc, pair) tf relation is
    * persisted and the LM derives from it (corpus pair counts = Σ of
    * per-doc tf — identical numbers, one less corpus pass), the
    * [[UnigramLm.selfScore]] trick; the backoff unigram LM is the one
    * remaining separate tokenize. */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = pairsOf(docs, idCol, textCol)
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
      // eager localCheckpoint (the round-7 multi-consumer rule): the
      // blocks are owned by the checkpointed RDD and released by the
      // ContextCleaner when the returned plan is unreferenced — same
      // lifetime contract as every sibling operator, no persist that
      // the caller would have to unpersist
      .localCheckpoint()
    scoreTf(docs, idCol, tf,
      lmFromPairCounts(
        tf.groupBy(col("w1"), col("w2")).agg(sum(col("tf")).as("cnt"))),
      UnigramLm.build(docs, textCol), BackoffMicro, OovMicro)
  }

  /** CCNet-style perplexity bucketing (Wenzek et al., "CCNet:
    * Extracting High Quality Monolingual Datasets from Web Crawl
    * Data", 2020 §3 — the head/middle/tail split): score every
    * document under the corpus's own LM ([[selfScore]]), then cut
    * each group (source, language) into `nBuckets` equal-frequency
    * buckets by ascending per-bigram cost. Bucket 1 = head (most
    * fluent), `nBuckets` = tail; CCNet trains on head+middle and
    * drops or down-weights tail. Per-group (not global) cuts are the
    * point: perplexity scales differ by language/source, and a global
    * cut would empty the hard groups.
    *
    * Determinism: the score is exact-integer milli-micro cost per
    * bigram (`(−lp_sum_micro)·1000 div n_bigrams` — non-negative, so
    * truncating division agrees across engines), total order
    * (cost asc, id asc), and the bucket is the ANSI NTILE arithmetic
    * applied to that rank — first `count mod n` buckets get the extra
    * row, exactly what both engines' `ntile` computes.
    *
    * Scale shape: NO per-group window — a corpus-hot group (one
    * source = half the corpus) would serialize through one task (the
    * q130 window class). Ranks come from the [[Sampling.deterministicShuffle]]
    * two-phase pattern instead: rows rank inside (group, score-band)
    * sub-windows in parallel — the band `cost div 2²⁴` is a monotone
    * PREFIX of the sort key, so band-local order ≡ group order — and
    * a broadcast (group, band)-count relation supplies each band's
    * starting offset; the ntile arithmetic then needs only the rank
    * and the group total. Degenerate corpora whose docs all share ONE
    * score land in one band and re-serialize — a real spread (any
    * natural corpus; scores span ~10³ distinct values per group even
    * at sf0.001) parallelizes. Docs with no bigrams (< 2 tokens) keep
    * their row with NULL score and NULL bucket — they carry no LM
    * evidence either way; gate them with the structural rule sets
    * instead ([[QualityRules]]).
    *
    * Output: (idCol, groupCol, n_bigrams, cost_milli, bucket). */
  def perplexityBuckets(docs: DataFrame, idCol: String, textCol: String,
                        groupCol: String, nBuckets: Int = 3): DataFrame = {
    require(nBuckets >= 2, s"nBuckets must be >= 2, got $nBuckets")
    import org.apache.spark.sql.expressions.Window
    // eager localCheckpoint: the scored relation feeds THREE consumers
    // of the returned lazy plan (banded ranking, band counts, the
    // unscored union branch) — uncheckpointed, each re-ran the whole
    // bigram-LM build+score chain (measured ×22 superlinear at
    // WeakScale 16×; 47.7 s → 4.5 s). The checkpoint is doc-sized
    // (id + three numbers + group), far smaller than the corpus text
    // it replaces re-reading.
    val s = selfScore(docs, idCol, textCol)
      .join(docs.select(col(idCol), col(groupCol)), Seq(idCol))
      .localCheckpoint()
    val scored = s.filter(col("n_bigrams") > 0)
      .withColumn("cost_milli",
        expr("(-lp_sum_micro) * 1000 div n_bigrams"))
      .withColumn("__band", expr("cost_milli div 16777216"))
    val wBand = Window.partitionBy(col(groupCol), col("__band"))
      .orderBy(col("cost_milli"), col(idCol))
    val ranked = scored.withColumn("__rk", row_number().over(wBand))
    val bandCounts = scored.groupBy(col(groupCol), col("__band"))
      .agg(count(lit(1)).as("__c"))
    // offsets + totals live on the (groups × bands)-sized relation —
    // its own cumulative window is the tiny-relation class
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = bandCounts
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .withColumn("__tot", sum(col("__c"))
        .over(Window.partitionBy(col(groupCol))))
      .select(col(groupCol).as("__og"), col("__band").as("__ob"),
        col("__off"), col("__tot"))
    val bucketed = ranked
      .join(broadcast(offsets),
        col(groupCol) <=> col("__og") && col("__band") === col("__ob"))
      .withColumn("__grk", col("__off") + col("__rk"))
      // ANSI NTILE from (rank, total): q = tot div n, r = tot mod n;
      // the first r buckets hold q+1 rows, the rest q
      .withColumn("bucket",
        when(col("__grk") <= expr(s"(__tot % $nBuckets) * (__tot div $nBuckets + 1)"),
          expr(s"(__grk - 1) div (__tot div $nBuckets + 1) + 1"))
          .otherwise(expr(
            s"(__tot % $nBuckets) + (__grk - (__tot % $nBuckets) * " +
              s"(__tot div $nBuckets + 1) - 1) div (__tot div $nBuckets) + 1"))
          .cast("int"))
      .select(col(idCol), col(groupCol), col("n_bigrams"),
        col("cost_milli"), col("bucket"))
    bucketed.unionByName(
      s.filter(col("n_bigrams") <= 0)
        .select(col(idCol), col(groupCol), col("n_bigrams"),
          lit(null).cast("long").as("cost_milli"),
          lit(null).cast("int").as("bucket")))
  }
}
