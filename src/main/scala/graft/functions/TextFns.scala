package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, n-gram shingling, quality stats, language-ID heuristics,
  * document fingerprinting, PII redaction, repetition signals.
  *
  * Pure Column expressions (whole-stage codegen, fully distributed, no
  * driver round-trips) with ONE exception: [[repetitionStats]] is a
  * typed UDF, because its multiset counting (top-token frequency,
  * distinct bigrams) would otherwise need either a shuffle or a
  * per-row interpreted-HOF chain — the same justified-UDF trade as
  * Dedup's shingle/signature kernels. Everything here runs as a single
  * narrow stage over the scan at any corpus size.
  */
object TextFns {

  /** Whitespace tokenization; empty strings removed so "a  b" → ["a","b"].
    */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Token count without materializing the token array twice. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-word segment count: runs of letters, digits, or single
    * punctuation — a cheap proxy for tokenizer cost accounting. */
  def bpeishTokenCount(text: Column): Column =
    size(filter(split(text, "(?=[^a-zA-Z0-9])|(?<=[^a-zA-Z0-9])"),
      t => length(trim(t)) > 0))

  /** Word n-gram shingles as space-joined strings, e.g. n=3:
    * "a b c d" → ["a b c", "b c d"]. Built from built-in higher-order
    * functions only (transform over an index sequence + slice), so it
    * stays codegen-friendly and never leaves the executor.
    */
  def wordShingles(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(
        sequence(lit(1), size(toks) - (n - 1)),
        i => array_join(slice(toks, i, lit(n)), " ")))
      .otherwise(array(array_join(toks, " ")))
  }

  /** Character n-gram shingles over the normalized text. */
  def charShingles(text: Column, n: Int): Column = {
    val t = normalize(text)
    when(length(t) >= n,
      transform(sequence(lit(1), length(t) - (n - 1)),
        i => substring(t, i, lit(n))))
      .otherwise(array(t))
  }

  /** Whitespace-collapse + trim + lowercase — canonical form for
    * fingerprinting and near-dup shingling. */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(text, "\\s+", " ")))

  /** Deterministic 128-bit content fingerprint of the normalized text.
    * md5 (not xxhash) so external systems can reproduce it. */
  def fingerprint(text: Column): Column = md5(normalize(text))

  /** Punctuation character ratio ∈ [0,1]. */
  def punctRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast("double")
        / length(text).cast("double"))
      .otherwise(lit(0.0))

  /** Digit character ratio ∈ [0,1]. */
  def digitRatio(text: Column): Column =
    when(length(text) > 0,
      (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("double")
        / length(text).cast("double"))
      .otherwise(lit(0.0))

  private val englishStopwords = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "that", "for", "on", "with", "as", "was", "at", "by", "this")

  /** Fraction of tokens that are (English) stopwords — a standard
    * quality-filter feature (C4/Gopher-style heuristics). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(lower(text))
    when(size(toks) > 0,
      size(filter(toks, t => t.isin(englishStopwords: _*))).cast("double")
        / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  /** Mean token length — short-token spam / boilerplate indicator. */
  def meanTokenLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) > 0,
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double")
        / size(toks).cast("double"))
      .otherwise(lit(0.0))
  }

  // ---- exact (integer-arithmetic) variants ---------------------------
  // Ratio outputs meant for cross-engine comparison: computed as
  // round-half-up in integer space via ScalarFns.roundFrac, so two
  // engines can never disagree at a rounding boundary (see roundFrac).

  private def sumTokenLen(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, t) => acc + length(t))

  private def stopwordHits(text: Column): Column =
    size(filter(tokens(lower(text)), t => t.isin(englishStopwords: _*)))

  /** meanTokenLen rounded half-up at 4 decimals, exactly. */
  def meanTokenLenExact(text: Column): Column =
    coalesce(graft.functions.ScalarFns.roundFrac(
      sumTokenLen(text), size(tokens(text)).cast("long"), 4), lit(0.0))

  /** stopwordRatio rounded half-up at 4 decimals, exactly. */
  def stopwordRatioExact(text: Column): Column =
    coalesce(graft.functions.ScalarFns.roundFrac(
      stopwordHits(text).cast("long"), size(tokens(text)).cast("long"), 4),
      lit(0.0))

  // ---- tokens-column variants -----------------------------------------
  // The text-based forms above each rebuild split(text) internally —
  // convenient for one-off columns, but a stats projection computing
  // five ratios re-splits the text ~10× per row. These take the token
  // array as a column the caller materializes ONCE (Catalyst keeps a
  // multiply-referenced non-trivial projection column materialized
  // rather than inlining it).

  /** meanTokenLenExact over a precomputed token array. */
  def meanTokenLenExactFromTokens(toks: Column): Column =
    coalesce(graft.functions.ScalarFns.roundFrac(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)),
      size(toks).cast("long"), 4), lit(0.0))

  /** stopwordRatioExact over precomputed (case-normalized) tokens. */
  def stopwordRatioExactFromTokens(lowerToks: Column): Column =
    coalesce(graft.functions.ScalarFns.roundFrac(
      size(filter(lowerToks, t => t.isin(englishStopwords: _*))).cast("long"),
      size(lowerToks).cast("long"), 4), lit(0.0))

  /** digitRatio rounded half-up at 4 decimals, exactly. */
  def digitRatioExact(text: Column): Column =
    coalesce(graft.functions.ScalarFns.roundFrac(
      (length(text) - length(regexp_replace(text, "[0-9]", ""))).cast("long"),
      length(text).cast("long"), 4), lit(0.0))

  /** Composite quality score ∈ [0,1] quantized to 4 decimals: rewards
    * stopword presence and sane token lengths, penalizes punct/digit
    * noise (Gopher-rule flavor):
    *   0.4·min(4·sw, 1) + 0.4·[2 ≤ meanTokLen ≤ 12] + 0.2·(1 − min(2·noise, 1))
    *
    * Computed ENTIRELY in integer space over the common denominator
    * n_tokens·n_chars, then rounded half-up to 1e-4 via integer division
    * — bit-reproducible in any engine (see ScalarFns.roundFrac). Empty
    * or whitespace-only text scores 0.
    */
  def qualityScore(text: Column): Column = {
    val n0 = size(tokens(text)).cast("long")
    val m0 = stopwordHits(text).cast("long")
    val s = sumTokenLen(text)
    val c0 = length(text).cast("long")
    // punct+digit chars: ASCII punctuation (= Java \p{Punct}) and digits
    val pd0 = (length(text)
      - length(regexp_replace(text, "[!-/:-@\\[-`{-~0-9]", ""))).cast("long")
    // Overflow guard: every product below is (token count) × (char
    // count) × (≤16000), which exceeds Long for multi-MB documents
    // (n·c > ~5.7e14) and would throw under ANSI mode mid-scan. Scaling
    // ALL token counts by kt and ALL char counts by kc divides each
    // product — numerator terms and the denominator d alike — by the
    // same kt·kc, so the score is unchanged; the integer truncation in
    // the scaling only engages past 2^22 (≈4.2M) tokens or chars, where
    // a ±1e-4 wobble on a degenerate mega-document is irrelevant. The
    // capped counts bound every product at 2^44·16000·2 ≈ 5.6e17 < 2^62.
    val Cap = 1L << 22
    val kt = greatest(lit(1L), floor(n0 / lit(Cap)).cast("long"))
    val kc = greatest(lit(1L), floor(c0 / lit(Cap)).cast("long"))
    val n = floor(n0 / kt).cast("long")
    val m1 = floor(m0 / kt).cast("long")
    val c = floor(c0 / kc).cast("long")
    val pd = floor(pd0 / kc).cast("long")
    val d = n * c
    // mean-token-length test on the RAW counts (s/n0 ∈ [2,12]); s and
    // n0·12 are both < 2^35, no overflow possible here
    val lenOkTerm = when(s >= n0 * 2 && s <= n0 * 12, d * 4000L).otherwise(lit(0L))
    val num = least(m1 * c * 16000L, d * 4000L) + lenOkTerm +
      (d * 2000L - least(pd * n * 4000L, d * 2000L))
    coalesce(
      when(n0 > 0 && c0 > 0,
        graft.functions.ScalarFns.roundFrac(num, d, 0) / lit(10000.0)),
      lit(0.0))
  }

  /** Language-ID via stopword-marker voting. Returns the language whose
    * marker tokens occur most (ties → lexicographically first), "und" when
    * nothing matches. Pure expression: one pass over the token array per
    * language; for a handful of languages this beats shipping a model.
    * The production path is [[graft.operators.LangId.predict]] (20
    * languages, character-n-gram profiles, per-doc score + margin) —
    * this stays as the zero-join expression-only form for quick gating
    * on a known small language set. */
  def languageId(text: Column): Column = {
    val markers: Seq[(String, Seq[String])] = Seq(
      "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
      "en" -> Seq("the", "and", "is", "of", "to", "in", "that", "it"),
      "es" -> Seq("el", "la", "los", "las", "es", "y", "en", "que"),
      "fr" -> Seq("le", "la", "les", "et", "est", "que", "des", "une"),
      "ru" -> Seq("и", "в", "не", "на", "что", "это"))
    val toks = tokens(lower(text))
    // struct(-hits, lang) ascending: max hits first, ties broken by
    // lexicographically-first language.
    val scored = markers.map { case (langName, ws) =>
      struct(
        (size(filter(toks, t => t.isin(ws: _*))) * -1).as("neg_hits"),
        lit(langName).as("lang"))
    }
    val best = sort_array(array(scored: _*))(0)
    when(best.getField("neg_hits") < 0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  // ---- PII redaction ----------------------------------------------------
  // Conservative patterns written in the regex subset Java and RE2
  // (DuckDB) interpret identically — no backrefs, no lookaround, no
  // possessive quantifiers — so the oracle can reproduce the redaction
  // byte for byte. Deliberately high-precision/lower-recall: a training
  // pipeline redacts what it is SURE about and routes the rest to
  // review; an over-eager pattern silently destroys clean text at scale.

  /** Email addresses (user@host.tld). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dotted-quad IPv4 (syntactic: each octet 1-3 digits). */
  val ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"

  /** International-prefix phone numbers, +CC-XXX-XXXX shape. */
  val phoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"

  /** Replace emails, IPv4s, and phone numbers with typed placeholder
    * tags. Email first (its local part could otherwise half-match after
    * another rule rewrites neighbors); the three patterns cannot match
    * each other's replacements, so the chain is order-stable. Narrow,
    * codegen'd regexp_replace — no shuffle, scales linearly. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        ipv4Re, "<IP>"),
      phoneRe, "<PHONE>")

  /** Count of matches of `pattern` in `text` (regexp_count is
    * codegen'd; used for PII audit columns). */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("int")

  // ---- Encoding-damage signals (mojibake / transcode audit) ------------

  /** U+FFFD REPLACEMENT CHARACTER — the scar a lossy decode leaves. */
  val replacementCharRe = "\uFFFD"

  /** C0/C1-ish control characters EXCLUDING \t \n \r (legitimate
    * whitespace) — raw controls in text mean binary contamination or a
    * charset mix-up. */
  val controlCharRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F\\x7F]"

  /** Strip encoding damage: replacement + control chars become spaces
    * (not deletions — deleting can fuse neighboring words). Narrow
    * regexp work only. */
  def stripEncodingDamage(text: Column): Column =
    regexp_replace(
      regexp_replace(text, replacementCharRe, " "),
      controlCharRe, " ")

  // ---- Repetition signals (Gopher-style quality filters) ---------------

  /** Per-doc repetition statistics in ONE narrow typed-UDF pass:
    * struct<n_tokens, top_token_count, n_bigrams, n_distinct_bigrams>.
    * `top_token_count` = occurrences of the most frequent token;
    * bigrams are word 2-gram shingles with [[wordShingles]]'s whole-text
    * fallback for sub-2-token docs. The downstream fractions
    * (top-token share, duplicate-bigram share) are exact rationals via
    * ScalarFns.roundFrac. Map-only — no shuffle at any corpus size;
    * NULL text → NULL struct. */
  def repetitionStats(text: Column): Column = {
    val statsUdf = udf { t: String =>
      if (t == null) null
      else {
        val toks = t.split("\\s+").filter(_.nonEmpty)
        val counts = new java.util.HashMap[String, Int]()
        var top = 0
        toks.foreach { w =>
          val c = counts.merge(w, 1, (a, b) => a + b)
          if (c > top) top = c
        }
        val bigrams: Array[String] =
          if (toks.length >= 2) toks.sliding(2).map(_.mkString(" ")).toArray
          else Array(toks.mkString(" "))
        val distinct = new java.util.HashSet[String]()
        bigrams.foreach(distinct.add)
        (toks.length, top, bigrams.length, distinct.size)
      }
    }
    // the tuple encoder names fields _1.._4; cast to the documented
    // names so callers bind col("r.n_tokens"), not positional aliases
    statsUdf(text).cast(
      "struct<n_tokens:int,top_token_count:int," +
        "n_bigrams:int,n_distinct_bigrams:int>")
  }
}
