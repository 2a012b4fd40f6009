package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Corpus unigram language model + per-document mean-log-probability
  * scoring — the classic CCNet/Gopher-family "LM quality" signal: a
  * document whose tokens are improbable under the corpus distribution
  * (gibberish, wrong language, OCR noise) scores low; boilerplate made
  * of ultra-frequent tokens scores high. Both tails are filter targets.
  *
  * Cross-engine determinism: a float `avg(ln p)` is irreproducible —
  * engines sum partial aggregates in different orders and land on
  * opposite sides of rounding boundaries. Instead each DISTINCT token's
  * log-probability is quantized ONCE to an integer (`lp_micro =
  * round(ln(c/N)·10⁶)` — one `ln` call per vocabulary entry, the same
  * risk class as q58's tf·idf), and per-document scores are then exact
  * integer dot products Σ tf·lp_micro whose value is independent of
  * summation order. Only the final display division is floating point,
  * performed in the same operation order by every engine.
  *
  * 100 TB design: the LM build is one token groupBy with map-side
  * combine — vocabulary-sized output (10⁶–10⁸ rows), tiny next to the
  * corpus. Scoring aggregates tf per (doc, token) FIRST (corpus →
  * per-doc-distinct rows), then joins the LM on token. The LM side has
  * exactly one row per key, so the join output equals its left input —
  * no fan-out — and hot tokens ("the") cost only partition imbalance,
  * which AQE skew-split absorbs; a small LM broadcasts and skips the
  * shuffle entirely (AQE picks this automatically under the threshold).
  *
  * Every entry point shares ONE tf aggregation ([[tfOf]]) and ONE LM
  * quantization ([[lmFromCounts]]) — the tokenization and micro-log
  * conventions that the q93/q97 oracles mirror live in exactly one
  * place each.
  */
object UnigramLm {

  /** The shared per-(doc, token) frequency relation — the single place
    * the operator tokenizes. */
  private def tfOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** (token, cnt) → (token, cnt, lp_micro): the single place the
    * micro-quantized log-probability is defined. */
  private def lmFromCounts(counts0: DataFrame): DataFrame = {
    // eager localCheckpoint: counts feeds BOTH the scalar total and
    // the probability projection — uncheckpointed, the token-count
    // pass beneath it runs twice per build (round-7 multi-consumer
    // audit); the checkpoint is vocabulary-sized
    val counts = counts0.localCheckpoint()
    val total = counts.agg(sum(col("cnt")).as("n_total"))
    counts.crossJoin(broadcast(total))
      .select(
        col("token"),
        col("cnt"),
        round(log(col("cnt").cast("double") / col("n_total")) * lit(1e6), 0)
          .cast("long").as("lp_micro"))
  }

  /** The shared scoring aggregate over a joined (idCol, tf, lp) frame. */
  private def aggScore(joined: DataFrame, idCol: String,
                       lp: org.apache.spark.sql.Column): DataFrame =
    joined
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).cast("int").as("n_tokens"),
        sum(col("tf") * lp).as("lp_sum_micro"))
      .withColumn("avg_logprob",
        round(col("lp_sum_micro").cast("double") / col("n_tokens") / lit(1e6), 4))

  /** Build the unigram LM over `textCol`: one row per token with its
    * corpus count and micro-quantized log-probability.
    * Output: (token, cnt: long, lp_micro: long). */
  def build(docs: DataFrame, textCol: String): DataFrame =
    lmFromCounts(docs
      .select(explode(TextFns.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt")))

  /** Score each document by its mean token log-probability under `lm`
    * (built by [[build]], or externally — any (token, lp_micro) table).
    * Documents with zero tokens (empty/NULL text) produce NO row; keep
    * them with a left join at the call site if required. The inner join
    * assumes the LM covers the corpus (true when self-built); for an
    * external LM use [[scoreWithOov]].
    * Output: (idCol, n_tokens: int, lp_sum_micro: long,
    * avg_logprob: double rounded to 4). */
  def score(docs: DataFrame, idCol: String, textCol: String,
            lm: DataFrame): DataFrame =
    aggScore(
      tfOf(docs, idCol, textCol)
        .join(lm.select(col("token"), col("lp_micro")), Seq("token")),
      idCol, col("lp_micro"))

  /** [[score]] against an EXTERNAL LM whose vocabulary may not cover
    * the documents: out-of-vocabulary tokens take `oovLpMicro` (a
    * strong improbability penalty by default — ln p ≈ −20), keeping
    * scores total over any input. This is the form streaming ingest
    * applies per micro-batch ([[graft.streaming.StreamOps.lmScoreEachBatch]]);
    * same output schema as [[score]]. */
  def scoreWithOov(docs: DataFrame, idCol: String, textCol: String,
                   lm: DataFrame, oovLpMicro: Long = -20000000L): DataFrame =
    aggScore(
      tfOf(docs, idCol, textCol)
        .join(lm.select(col("token"), col("lp_micro")), Seq("token"), "left"),
      idCol, coalesce(col("lp_micro"), lit(oovLpMicro)))

  /** Per-document log-likelihood ratio between a TARGET-domain LM and
    * a SOURCE (general) LM — the importance weight of DSIR-style data
    * selection (Xie et al. 2023, "Data Selection for Language Models
    * via Importance Resampling"): documents that look more like the
    * target domain than the background corpus get positive weight.
    * Both lookups are left joins with the OOV penalty, so the ratio is
    * total; the per-token average divides exact integer sums, making
    * ranking deterministic. Output: (idCol, n_tokens: int,
    * llr_sum_micro: long, llr_per_token: double(4)).
    *
    * 100 TB design: identical shape to [[score]] run twice — two
    * one-row-per-key joins on the tf relation, no fan-out; both LMs
    * are vocabulary-sized. */
  def logLikelihoodRatio(docs: DataFrame, idCol: String, textCol: String,
                         targetLm: DataFrame, sourceLm: DataFrame,
                         oovLpMicro: Long = -20000000L): DataFrame =
    tfOf(docs, idCol, textCol)
      .join(targetLm.select(col("token"), col("lp_micro").as("__lp_t")),
        Seq("token"), "left")
      .join(sourceLm.select(col("token"), col("lp_micro").as("__lp_s")),
        Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(
        sum(col("tf")).cast("int").as("n_tokens"),
        sum(col("tf") * (coalesce(col("__lp_t"), lit(oovLpMicro))
          - coalesce(col("__lp_s"), lit(oovLpMicro)))).as("llr_sum_micro"))
      .withColumn("llr_per_token",
        round(col("llr_sum_micro").cast("double") / col("n_tokens") / lit(1e6), 4))

  /** DSIR-style selection: the k documents most like the target domain
    * by per-token log-likelihood ratio (ties by id — fully
    * deterministic). Global top-k compiles to TakeOrderedAndProject
    * (bounded per-partition heaps), never a full sort. */
  def dsirTopK(docs: DataFrame, idCol: String, textCol: String,
               targetLm: DataFrame, sourceLm: DataFrame, k: Int,
               oovLpMicro: Long = -20000000L): DataFrame =
    logLikelihoodRatio(docs, idCol, textCol, targetLm, sourceLm, oovLpMicro)
      .orderBy(
        (col("llr_sum_micro").cast("double") / col("n_tokens")).desc,
        col(idCol))
      .limit(k)

  /** Token-distribution drift between two corpora as per-token KL
    * contributions — the corpus-version alarm ([[graft.operators.SnapshotDiff]]
    * tells you WHICH docs changed; this tells you whether the LANGUAGE
    * changed): D(P‖Q) = Σ p(t)·(ln p(t) − ln q(t)) decomposed into the
    * k tokens driving it, so an ingest regression (a new boilerplate
    * flood, a language shift, a lost source) is attributable to
    * vocabulary, not just a scalar.
    *
    * Determinism: contributions are exact integers
    * `cnt_p·(lp_p − lp_q)` in micro-nats over the micro-quantized LMs
    * (P-tokens absent from Q take `oovLpMicro` — the standard floor;
    * true KL is undefined there); only the final per-token
    * normalization (`kl_nats` = Σ contrib / Σ cnt / 10⁶) divides, as
    * a double both engines compute identically. Ranking is
    * (contrib desc, token asc).
    *
    * Scale: two LM builds (one token-count shuffle each,
    * vocabulary-sized outputs via [[lmFromCounts]]'s checkpoint), a
    * vocab-sized left join, TakeOrdered top-k, and a broadcast scalar
    * total — the corpora are each touched once.
    *
    * Output: (rank, token, cnt_p, lp_p_micro, lp_q_micro — NULL when
    * absent from Q, contrib_micro, kl_nats — the corpus-level total,
    * constant across rows). */
  def klDrift(p: DataFrame, q: DataFrame, textCol: String, k: Int,
              oovLpMicro: Long = -20000000L): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val contrib = build(p, textCol)
      .select(col("token"), col("cnt").as("cnt_p"),
        col("lp_micro").as("lp_p_micro"))
      .join(build(q, textCol)
        .select(col("token"), col("lp_micro").as("lp_q_micro")),
        Seq("token"), "left")
      .withColumn("contrib_micro",
        col("cnt_p") * (col("lp_p_micro")
          - coalesce(col("lp_q_micro"), lit(oovLpMicro))))
      // checkpointed: feeds the top-k slice AND the corpus total — and
      // each side's LM build beneath it must not re-run per consumer
      // (the round-7 multi-consumer audit)
      .localCheckpoint()
    val totals = contrib.agg(sum(col("contrib_micro")).as("__s"),
      sum(col("cnt_p")).as("__n"))
    TopK.global(contrib, k, col("contrib_micro").desc, col("token").asc)
      .crossJoin(broadcast(totals))
      .withColumn("kl_nats",
        round(col("__s").cast("double") / col("__n") / lit(1e6), 6))
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("contrib_micro").desc, col("token").asc)).cast("int"))
      .select(col("rank"), col("token"), col("cnt_p"), col("lp_p_micro"),
        col("lp_q_micro"), col("contrib_micro"), col("kl_nats"))
  }

  /** Self-scoring convenience: build the LM over the corpus and score
    * the same corpus, tokenizing once — the persisted tf relation feeds
    * both the LM aggregation and the scoring dot product, through the
    * same [[lmFromCounts]] projection [[build]] uses. */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tf = tfOf(docs, idCol, textCol)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val lm = lmFromCounts(
      tf.groupBy(col("token")).agg(sum(col("tf")).as("cnt")))
    aggScore(tf.join(lm.select(col("token"), col("lp_micro")), Seq("token")),
      idCol, col("lp_micro"))
  }
}
