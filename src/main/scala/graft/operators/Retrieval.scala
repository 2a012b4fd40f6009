package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword and hybrid retrieval over a document corpus — the selection
  * tools a training-data pipeline uses to pull topical slices ("find
  * the k docs most about X") and to combine lexical with embedding
  * evidence: Okapi BM25 scoring and reciprocal-rank fusion.
  *
  * Cross-engine determinism follows the [[UnigramLm]] playbook: each
  * term's idf is quantized ONCE to an integer (`idf_micro`), each
  * (doc, term) contribution is rounded to an integer micro-score in a
  * single fixed-shape IEEE expression, and per-document totals are
  * integer sums — order-free, so any SQL engine reproduces the ranking
  * bit for bit. RRF needs no quantization at all: `10⁶ div (c + rank)`
  * is pure integer arithmetic.
  *
  * 100 TB design: BM25 against a FIXED query filters the exploded
  * token stream to the query's terms before any shuffle — the grouped
  * relation is at most |docs|·|query| rows regardless of corpus size;
  * document length and corpus stats ride along as one narrow
  * projection plus a broadcast single-row aggregate. The global top-k
  * compiles to TakeOrderedAndProject (bounded per-partition heaps),
  * never a full sort. RRF unions ranking relations that are already
  * top-k-sized (thousands of rows), so its cost is nil next to the
  * rankings that feed it.
  */
object Retrieval {

  /** Okapi BM25 top-k for one keyword query: score =
    * Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)) over the
    * query's terms, idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5)) (the
    * Robertson/Lucene always-positive form). Documents matching no
    * query term are absent (score would be 0). Ties break by id.
    *
    * Output: (rank: int, idCol, n_hits: int — distinct query terms
    * present, score_micro: long — exact integer total,
    * score: double — display value rounded to 4).
    */
  def bm25TopK(docs: DataFrame, idCol: String, textCol: String,
               queryTerms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // one narrow pass: per-doc length, then the token stream filtered
    // to the query's terms BEFORE the grouping shuffle. Both relations
    // feed TWO consumers of the returned lazy plan (lengths → corpus
    // stats + the contribution join; hits → df counts + contributions)
    // — eager localCheckpoints keep each corpus pass at ONE (the
    // round-7 multi-consumer audit): `hits` is query-filtered
    // (≤ docs·|terms| rows) and `lengths` is id+long, both far
    // smaller than re-tokenizing the corpus
    val lengths = docs.select(col(idCol),
      TextFns.tokenCount(col(textCol)).cast("long").as("__dl"))
      .localCheckpoint()
    val hits = docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("token"))
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    // corpus stats: N and avgdl (one row, broadcast); df per query term
    // (≤ |query| rows, broadcast). avgdl is the same exact-integer
    // division in the oracle: CAST(Σdl AS DOUBLE) / N.
    val stats = lengths.agg(
      count(lit(1)).as("__n_docs"), sum(col("__dl")).as("__dl_sum"))
    val dfRel = hits.groupBy(col("token"))
      .agg(count(lit(1)).as("__df"))
      .crossJoin(broadcast(stats))
      .select(col("token"),
        round(log(lit(1.0) +
            (col("__n_docs").cast("double") - col("__df") + lit(0.5)) /
              (col("__df") + lit(0.5))) * lit(1e6), 0)
          .cast("long").as("__idf_micro"))
    // per-(doc, term) micro contribution: ONE fixed-shape double
    // expression, rounded to an integer so the per-doc sum is order-free
    val contrib = hits
      .join(lengths, Seq(idCol))
      .crossJoin(broadcast(stats))
      .join(broadcast(dfRel), Seq("token"))
      .withColumn("__avgdl",
        col("__dl_sum").cast("double") / col("__n_docs"))
      .withColumn("__c_micro",
        round(col("__idf_micro").cast("double") *
          (col("tf") * lit(k1 + 1) /
            (col("tf") + lit(k1) *
              (lit(1.0) - lit(b) + lit(b) * col("__dl") / col("__avgdl")))), 0)
          .cast("long"))
    val scored = contrib.groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_hits"),
        sum(col("__c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
    scored
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_micro").desc, col(idCol)))
          .cast("int"))
      .withColumn("score",
        round(col("score_micro").cast("double") / lit(1e6), 4))
      .select(col("rank"), col(idCol), col("n_hits"), col("score_micro"),
        col("score"))
  }

  /** Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    * Lafferty, "A Study of Smoothing Methods for Language Models
    * Applied to Ad Hoc Information Retrieval", 2001) — the language-
    * model ranking next to [[bm25TopK]]'s probabilistic one:
    * score(q, d) = Σ_t ln((tf(t,d) + µ·p(t|C)) / (|d| + µ)), summed
    * over the query's corpus-present terms INCLUDING those absent
    * from d (absence is evidence — BM25 skips absent terms, QL
    * penalizes them through the collection prior). Query terms absent
    * from the whole corpus carry no signal for ranking (their
    * contribution is a per-doc function of |d| only and p(t|C)=0
    * breaks the log) and are dropped.
    *
    * Determinism: each per-(doc, term) contribution is computed as
    * one fixed-order double expression and micro-quantized
    * (`round(ln(·)·10⁶)`) — the [[UnigramLm]] convention — so per-doc
    * sums are exact integer additions and the q164 oracle replays the
    * ranking bit for bit.
    *
    * Scale: lengths (id + long) and per-doc query-term tf (≤
    * docs·|q| rows) both checkpoint for their two consumers; the
    * |q|-row term-stats relation broadcasts into a corpus × |q|
    * narrow cross join; top-k is TakeOrdered. Output:
    * (rank, idCol, n_hits, score_micro, score). */
  def queryLikelihoodTopK(docs: DataFrame, idCol: String, textCol: String,
                          queryTerms: Seq[String], k: Int,
                          mu: Double = 2000.0): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(mu > 0, s"mu must be positive, got $mu")
    val lengths = docs.select(col(idCol),
      TextFns.tokenCount(col(textCol)).cast("long").as("__dl"))
      .localCheckpoint()
    val hits = docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("token"))
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(col(idCol), col("token"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val ctot = lengths.agg(sum(col("__dl")).as("__ct"))
    val stats = hits.groupBy(col("token"))
      .agg(sum(col("tf")).as("__cf"))
      .crossJoin(broadcast(ctot))
    val contrib = lengths
      .crossJoin(broadcast(stats))
      .join(hits, Seq(idCol, "token"), "left")
      .withColumn("__tf", coalesce(col("tf"), lit(0L)))
      .withColumn("__c_micro",
        round(log(
          (col("__tf").cast("double")
            + (lit(mu) * col("__cf")) / col("__ct"))
            / (col("__dl").cast("double") + lit(mu))) * lit(1e6), 0)
          .cast("long"))
    val scored = contrib.groupBy(col(idCol))
      .agg(sum(when(col("__tf") > 0, 1).otherwise(0)).cast("int")
          .as("n_hits"),
        sum(col("__c_micro")).as("score_micro"))
      .orderBy(col("score_micro").desc, col(idCol))
      .limit(k)
    scored
      .withColumn("rank",
        row_number().over(Window.orderBy(col("score_micro").desc, col(idCol)))
          .cast("int"))
      .withColumn("score",
        round(col("score_micro").cast("double") / lit(1e6), 4))
      .select(col("rank"), col(idCol), col("n_hits"), col("score_micro"),
        col("score"))
  }

  /** DuckDB replay of [[queryLikelihoodTopK]]. */
  def queryLikelihoodOracle(table: String, idCol: String, textCol: String,
                            queryTerms: Seq[String], k: Int,
                            mu: Double = 2000.0): String = {
    val termList = queryTerms.map(t => s"'$t'").mkString(", ")
    s"""
      WITH lengths AS (
        SELECT $idCol, CAST(len(list_filter(string_split_regex(
          coalesce($textCol, ''), '\\s+'), x -> x <> '')) AS BIGINT) AS dl
        FROM $table),
      toks AS (
        SELECT $idCol, unnest(list_filter(string_split_regex(
          coalesce($textCol, ''), '\\s+'), x -> x <> '')) AS token
        FROM $table),
      hits AS (
        SELECT $idCol, token, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE token IN ($termList)
        GROUP BY $idCol, token),
      ct AS (SELECT CAST(sum(dl) AS BIGINT) AS ct FROM lengths),
      stats AS (
        SELECT token, CAST(sum(tf) AS BIGINT) AS cf FROM hits GROUP BY token),
      contrib AS (
        SELECT l.$idCol,
               coalesce(h.tf, 0) AS tf,
               CAST(round(ln(
                 (CAST(coalesce(h.tf, 0) AS DOUBLE)
                   + ($mu * s.cf) / (SELECT ct FROM ct))
                 / (CAST(l.dl AS DOUBLE) + $mu)) * 1000000, 0) AS BIGINT)
                 AS c_micro
        FROM lengths l
        CROSS JOIN stats s
        LEFT JOIN hits h ON h.$idCol = l.$idCol AND h.token = s.token),
      scored AS (
        SELECT $idCol,
               CAST(sum(CASE WHEN tf > 0 THEN 1 ELSE 0 END) AS INTEGER)
                 AS n_hits,
               CAST(sum(c_micro) AS BIGINT) AS score_micro
        FROM contrib GROUP BY $idCol)
      SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, $idCol)
               AS INTEGER) AS rank,
             $idCol, n_hits, score_micro,
             round(CAST(score_micro AS DOUBLE) / 1000000.0, 4) AS score
      FROM scored
      ORDER BY score_micro DESC, $idCol
      LIMIT $k"""
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of any number of
    * (id, rank) relations: fused score = Σ_lists 10⁶ div (c + rank) —
    * pure integer arithmetic, reproducible by construction. An id
    * appearing in only some lists simply collects fewer terms (the
    * standard RRF treatment of non-retrieved items). Ties break by id.
    *
    * Output: (rank: int, idCol, n_lists: int, rrf_micro: long,
    * rrf_score: double rounded to 6).
    */
  def rrfFuse(rankings: Seq[DataFrame], idCol: String, k: Int,
              c: Int = 60): DataFrame =
    rrfFuseWeighted(rankings.map(r => (r, 10000L)), idCol, k, c)

  /** [[rrfFuse]] with CALLER-SUPPLIED per-ranker weights — fusion
    * weights as data, so users tune the ranker mix (lexical-heavy,
    * semantic-heavy, drop a modality) without editing the operator.
    * Weights are integer BASIS POINTS (10000 = 1.0): each list's
    * contribution is (wBp · ⌊10⁶/(c+rank)⌋) div 10⁴ — exact integer
    * arithmetic end to end, and at wBp = 10000 the division is the
    * identity, so [[rrfFuse]] delegates here bit-for-bit (q105/q165
    * unchanged). Ties and output shape identical to [[rrfFuse]]. */
  def rrfFuseWeighted(rankings: Seq[(DataFrame, Long)], idCol: String,
                      k: Int, c: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    require(c >= 0, "rank constant must be non-negative")
    require(rankings.forall(_._2 > 0),
      "ranker weights must be positive basis points")
    val contribs = rankings.map { case (r, wBp) =>
      r.select(col(idCol),
        expr(s"($wBp * (1000000L div (${c}L + cast(rank as long)))) div 10000")
          .as("__rrf"))
    }
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_lists"),
        sum(col("__rrf")).as("rrf_micro"))
      .orderBy(col("rrf_micro").desc, col(idCol))
      .limit(k)
    fused
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf_micro").desc, col(idCol)))
          .cast("int"))
      .withColumn("rrf_score",
        round(col("rrf_micro").cast("double") / lit(1e6), 6))
      .select(col("rank"), col(idCol), col("n_lists"), col("rrf_micro"),
        col("rrf_score"))
  }

  /** Exact consecutive-phrase search via positional-posting alignment:
    * a document matches at anchor position s iff its token at s+i
    * equals phrase(i) for EVERY i — the classic inverted-index phrase
    * query, here as one relational pass. Every token occurrence that
    * matches any phrase word votes for its implied anchor (pos − i);
    * an anchor with all |phrase| votes is an occurrence. Repeated
    * phrase words are handled exactly — each (pos, i) pair votes once,
    * and (doc, anchor, i) is unique by construction (anchor is a
    * function of pos and i), so a run of the same word scores its
    * OVERLAPPING matches separately ("x x x" contains "x x" twice) —
    * standard positional-index semantics.
    *
    * Scale shape: the token stream is filtered to the phrase's
    * (distinct) words BEFORE anything wide — for a selective phrase
    * that is a tiny fraction of the corpus — then one (doc, anchor)
    * shuffle counts votes; the per-doc rollup aggregates the strictly
    * smaller anchor relation. The phrase table broadcasts. NULL texts
    * have no tokens and simply never match.
    * Output: (idCol, n_occ) for matching documents only.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val spark = docs.sparkSession
    import spark.implicits._
    val ph = phrase.zipWithIndex.map { case (w, i) => (w, i) }.toDF("w", "i")
    val toks = docs.select(col(idCol).as("__doc"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase.distinct: _*))
    toks.join(broadcast(ph), col("tok") === col("w"))
      .select(col("__doc"), (col("pos") - col("i")).as("anchor"))
      .groupBy(col("__doc"), col("anchor"))
      .agg(count(lit(1)).as("__nmatch"))
      .filter(col("__nmatch") === phrase.length)
      .groupBy(col("__doc"))
      .agg(count(lit(1)).as("n_occ"))
      .select(col("__doc").as(idCol), col("n_occ"))
  }
}
