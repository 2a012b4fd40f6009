package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The Gopher document-quality rule set (Rae et al., "Scaling Language
  * Models: Methods, Analysis & Insights from Training Gopher", 2021,
  * Appendix A1.1) — the rule-based pre-filter most production corpus
  * builds run BEFORE any learned quality model: cheap structural tests
  * that kill machine-generated and boilerplate pages outright. The
  * existing curation family scores documents ([[graft.functions.TextFns.qualityScore]]
  * q36, repetition q78, boilerplate q87); this one reports each RULE
  * as its own flag so a pipeline can tune thresholds per source and a
  * curation funnel can attribute kills to individual rules.
  *
  * Every rule is evaluated with INTEGER arithmetic (`a·10 <= b`-style
  * cross-multiplied thresholds, never a float ratio), so any engine
  * replays the flags exactly — the q144 oracle does. Scale: one
  * narrow projection over the corpus — no shuffle, no join; at 100 TB
  * this is a map stage fused into whatever scan feeds it.
  *
  * Rules (doc fails the filter when any flag is false):
  *  - `r_word_count`: 50 <= word count <= 100000;
  *  - `r_mean_word_len`: mean word length in [3, 10] characters
  *    (3·n <= total_len <= 10·n; false for empty docs);
  *  - `r_symbol_ratio`: (# of `#` + `…` + `...`) <= 10% of words;
  *  - `r_bullet_lines`: <= 10% of lines start with a bullet
  *    (`- `, `* `, `• ` after left-trim);
  *  - `r_ellipsis_lines`: < 30% of lines end with `...` or `…`;
  *  - `r_alpha_words`: >= 80% of words contain an ASCII letter;
  *  - `r_stopwords`: >= 2 distinct members of the 8-word presence
  *    list (the, be, to, of, and, that, have, with) appear as tokens.
  */
object QualityRules {

  private val stopList =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private def words(text: Column): Column =
    filter(split(coalesce(text, lit("")), "\\s+"), w => w =!= "")

  /** Occurrences of literal `pat` (non-overlapping, left-to-right —
    * both engines' replace semantics) in `text`. */
  private def occurrences(text: Column, pat: String): Column =
    (length(text) - length(replace(text, lit(pat), lit("")))) / pat.length

  /** Per-document rule report:
    * (idCol, n_lines, n_words, the seven rule flags, pass). */
  def report(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    val w = words(t)
    val lines = split(t, "\n", -1)
    val nW = size(w).cast("long")
    val nL = size(lines).cast("long")
    val sumLen = aggregate(w, lit(0L), (acc, x) => acc + length(x))
    val nSym = (occurrences(t, "#") + occurrences(t, "…") +
      occurrences(t, "...")).cast("long")
    val nBullet = size(filter(lines, l =>
      Seq("- ", "* ", "• ")
        .map(b => startswith(ltrim(l), lit(b)))
        .reduce(_ || _))).cast("long")
    val nEllipsis = size(filter(lines, l =>
      endswith(rtrim(l), lit("...")) || endswith(rtrim(l), lit("…"))))
      .cast("long")
    val nAlpha = size(filter(w, x => x.rlike("[A-Za-z]"))).cast("long")
    val wl = transform(w, x => lower(x))
    val nStops = stopList
      .map(s => when(array_contains(wl, s), 1).otherwise(0))
      .reduce(_ + _)
    val flags: Seq[(String, Column)] = Seq(
      "r_word_count" -> (nW >= 50L && nW <= 100000L),
      "r_mean_word_len" ->
        (nW > 0L && lit(3L) * nW <= sumLen && sumLen <= lit(10L) * nW),
      "r_symbol_ratio" -> (nSym * 10L <= nW),
      "r_bullet_lines" -> (nBullet * 10L <= nL),
      "r_ellipsis_lines" -> (nEllipsis * 10L < nL * 3L),
      "r_alpha_words" -> (nW > 0L && nAlpha * 5L >= nW * 4L),
      "r_stopwords" -> (nStops >= 2))
    docs.select(
      col(idCol) +: nL.as("n_lines") +: nW.as("n_words") +:
        flags.map { case (n, c) => c.as(n) } :+
        flags.map(_._2).reduce(_ && _).as("pass"): _*)
  }

  /** The C4 cleaning rules (Raffel et al., "Exploring the Limits of
    * Transfer Learning with a Unified Text-to-Text Transformer", 2020,
    * §2.2) — LINE-level surgery plus document kills, the other
    * canonical rule set next to Gopher's document-level [[report]]:
    *
    * A line is RETAINED iff it ends in a terminal punctuation mark
    * (`.` `!` `?` `"` after right-trim), has at least
    * `minWordsPerLine` whitespace words, and does not contain the
    * word "javascript" (case-insensitive). A document PASSES iff it
    * retains at least `minKeptLines` lines (`r_min_lines`), does not
    * contain "lorem ipsum" (case-insensitive, `r_lorem`), and does
    * not contain a curly brace (`r_brace` — the code-page tell).
    * (The paper's three-sentence dedup is [[graft.operators.Dedup.exciseRepeatedSpans]];
    * its badwords list is an input-data concern, not re-encoded here.)
    *
    * Output: (idCol, n_lines, n_kept, r_min_lines, r_lorem, r_brace,
    * pass, clean_text) with `clean_text` the retained lines re-joined
    * by newline — reported for every doc so a pipeline can gate on
    * `pass` and still inspect near-misses. Pure string predicates,
    * replayed exactly by any engine (the q148 oracle). Scale: one
    * narrow projection, no shuffle, no join — fused into the feeding
    * scan at 100 TB. */
  def c4Clean(docs: DataFrame, idCol: String, textCol: String,
              minWordsPerLine: Int = 3, minKeptLines: Int = 3): DataFrame = {
    require(minWordsPerLine >= 1, s"minWordsPerLine must be >= 1")
    require(minKeptLines >= 1, s"minKeptLines must be >= 1")
    val t = coalesce(col(textCol), lit(""))
    val lines = split(t, "\n", -1)
    val keptLines = filter(lines, l =>
      Seq(".", "!", "?", "\"")
        .map(p => endswith(rtrim(l), lit(p)))
        .reduce(_ || _) &&
        size(filter(split(l, "\\s+"), x => x =!= "")) >= minWordsPerLine &&
        !lower(l).contains("javascript"))
    val nKept = size(keptLines).cast("long")
    val rMinLines = nKept >= minKeptLines.toLong
    val rLorem = !lower(t).contains("lorem ipsum")
    val rBrace = !(t.contains("{") || t.contains("}"))
    docs.select(
      col(idCol),
      size(lines).cast("long").as("n_lines"),
      nKept.as("n_kept"),
      rMinLines.as("r_min_lines"),
      rLorem.as("r_lorem"),
      rBrace.as("r_brace"),
      (rMinLines && rLorem && rBrace).as("pass"),
      array_join(keptLines, "\n").as("clean_text"))
  }
}
