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
  def build(docs: DataFrame, textCol: String): DataFrame = {
    val bc = pairsOf(docs.select(lit(0L).as("__id"), col(textCol)), "__id", textCol)
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("cnt"))
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
            oovMicro: Long = OovMicro): DataFrame = {
    val tf = pairsOf(docs, idCol, textCol)
      .groupBy(col(idCol), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
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
    * for backoff) — the q134 self-scoring quality signal. */
  def selfScore(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    score(docs, idCol, textCol,
      build(docs, textCol), UnigramLm.build(docs, textCol))
}
