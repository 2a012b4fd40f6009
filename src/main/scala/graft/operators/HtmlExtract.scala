package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** HTML → text extraction — the crawl-to-text step every web-corpus
  * pipeline runs BEFORE any curation sees the document (C4/CCNet both
  * start from extracted text; this is the extractor those pipelines
  * assume). Pure narrow regexp/HOF expressions (whole-stage codegen,
  * no UDF, no shuffle — fused into the feeding scan at 100 TB):
  *
  *   1. drop `<!-- -->` comments, `<script>`/`<style>` elements
  *      (content and all — executable/style text is never prose);
  *   2. `<title>` captured separately (catalog metadata);
  *   3. block-element ends (`</p> </div> </li> </h1..6> </tr>
  *      </table> </ul> </ol> </blockquote>`, `<br>`) become line
  *      breaks — structure the line-level curation stages
  *      (LineDedup, C4 cleaning) need;
  *   4. every remaining tag strips to a space;
  *   5. entities decode: the named set (`&lt; &gt; &quot; &apos;
  *      &nbsp;` first, `&amp;` LAST — the standard order, so
  *      `&amp;lt;` yields the literal `&lt;` and never double-decodes)
  *      plus numeric `&#NN;`/`&#xHH;` for PRINTABLE ASCII (32–126)
  *      only — Spark's `chr` is byte-valued above 127 while other
  *      engines emit the code point, so non-ASCII numeric entities
  *      pass through UNDECODED identically in both engines rather
  *      than diverging;
  *   6. lines whitespace-collapse and trim; empty lines drop.
  *
  * Deterministic and engine-portable throughout — [[extractOracle]]
  * replays the whole chain in DuckDB (both dialects are regex-
  * compatible on these patterns: RE2 and java.util.regex agree on
  * `(?is)`, non-greedy, and character classes).
  */
object HtmlExtract {

  private val BlockEnds =
    "(?i)</(?:p|div|li|h[1-6]|tr|table|ul|ol|blockquote)>|<br[^>]*>"
  private val Sep = ""

  /** Strip comments/script/style, break blocks to newlines, strip
    * remaining tags. */
  private def stripTags(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComment,
      "(?is)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style>", " ")
    val blocked = regexp_replace(noStyle, BlockEnds, "\n")
    regexp_replace(blocked, "<[^>]*>", " ")
  }

  private def decodeNamed(text: Column): Column =
    Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&apos;" -> "'", "&nbsp;" -> " ")
      .foldLeft(text) { case (c, (e, r)) =>
        regexp_replace(c, java.util.regex.Pattern.quote(e), r)
      }

  /** Decode named entities + printable-ASCII numeric entities (see
    * class doc for the &amp;-last order and the ASCII-only rule).
    *
    * Documented invariant: literal U+0001 bytes in the input are
    * DELETED from the extracted text. The decoder uses U+0001 as its
    * internal split marker, so the strip is explicit (not a side
    * effect of the split): U+0001 is a C0 control character with no
    * legitimate place in prose — crawl bytes carrying it are
    * encoding damage, and both engines ([[extractOracle]] mirrors the
    * strip) delete it identically. */
  private[operators] def decodeEntities(text: Column): Column = {
    val named = regexp_replace(decodeNamed(text), Sep, "")
    // numeric entities: mark each candidate, split, decode piece heads
    val marked = regexp_replace(named, "&#", Sep + "&#")
    val decoded = aggregate(split(marked, Sep), lit(""), (acc, p) => {
      val dec = regexp_extract(p, "^&#([0-9]{1,7});", 1)
      val hex = regexp_extract(p, "^&#[xX]([0-9a-fA-F]{1,6});", 1)
      val decCode = when(dec =!= "", dec.cast("long")).otherwise(lit(-1L))
      val hexCode = when(hex =!= "", conv(hex, 16, 10).cast("long"))
        .otherwise(lit(-1L))
      val piece =
        when(decCode.between(32, 126),
          concat(chr(decCode), regexp_replace(p, "^&#[0-9]{1,7};", "")))
        .when(hexCode.between(32, 126),
          concat(chr(hexCode),
            regexp_replace(p, "^&#[xX][0-9a-fA-F]{1,6};", "")))
        .otherwise(p)
      concat(acc, piece)
    })
    // &amp; decodes LAST so already-escaped entities stay literal
    regexp_replace(decoded, java.util.regex.Pattern.quote("&amp;"), "&")
  }

  /** Collapse intra-line whitespace, trim, drop empty lines. */
  private def cleanLines(text: Column): Column =
    array_join(
      filter(
        transform(split(text, "\n"),
          l => trim(regexp_replace(l, "[ \\t\\r]+", " "))),
        l => l =!= ""),
      "\n")

  /** (idCol, title, text): the extracted prose and the `<title>`
    * content (empty string when absent) — both entity-decoded and
    * whitespace-normalized. NULL html yields an empty title and
    * empty text (a row per input, never a dropped crawl record). */
  def extractText(df: DataFrame, idCol: String, htmlCol: String): DataFrame = {
    val html = coalesce(col(htmlCol), lit(""))
    // title: NAMED entities only (numeric entities in titles pass
    // through on both engines — the body decoder handles prose)
    val title = trim(regexp_replace(regexp_replace(decodeNamed(
      regexp_extract(html, "(?is)<title[^>]*>(.*?)</title>", 1)),
      java.util.regex.Pattern.quote("&amp;"), "&"),
      "[ \\t\\r\\n]+", " "))
    df.select(col(idCol), title.as("title"),
      cleanLines(decodeEntities(stripTags(html))).as("text"))
  }

  // ---- Page-level meta signals ----------------------------------------
  // The two <head> directives every production crawl processor
  // honors BEFORE content is considered: robots noindex (the page
  // asked not to be indexed — ethically and legally load-bearing for
  // a training corpus) and <link rel=canonical> (the SITE's own
  // statement of which URL is the real one — a stronger dedup signal
  // than anything derivable from the URL string). Both attribute
  // orders handled; RE2-safe patterns (no lookahead), so DuckDB
  // replays them verbatim (q188).

  // the patterns, shared verbatim with the q188 oracle (RE2 and
  // Java regex read them identically — no lookahead, no backrefs).
  // Each attribute-value token is followed by a REQUIRED terminator
  // class ["'\s/>]: `name="robots-nocontent"` and `rel="canonical-alt"`
  // are different declarations and must NOT match a prefix. Because
  // that terminator class may consume the tag's closing '>', every
  // filler AFTER it is [^<>]* (never the looser [^>]*): the pair of
  // attributes must sit in ONE tag — `<meta name=robots><meta
  // content="…">` is two declarations, not one.
  private[graft] val CommentPat: String = "(?s)<!--.*?-->"
  private[graft] val NoindexPatA: String =
    "(?is)<meta[^>]*name\\s*=\\s*[\"']?robots[\"'\\s/>][^<>]*" +
      "content\\s*=\\s*[\"']?([^\"'>]*)"
  private[graft] val NoindexPatB: String =
    "(?is)<meta[^>]*content\\s*=\\s*[\"']?([^\"'>]*)[\"']?[^<>]*" +
      "name\\s*=\\s*[\"']?robots[\"'\\s/>]"
  private[graft] val CanonicalPatA: String =
    "(?is)<link[^>]*rel\\s*=\\s*[\"']?canonical[\"'\\s/>][^<>]*" +
      "href\\s*=\\s*[\"']?([^\"'\\s>]+)"
  private[graft] val CanonicalPatB: String =
    "(?is)<link[^>]*href\\s*=\\s*[\"']?([^\"'\\s>]+)[\"']?[^<>]*" +
      "rel\\s*=\\s*[\"']?canonical[\"'\\s/>]"

  /** Comments removed before any meta-signal match: a directive
    * inside `<!-- -->` is not a declaration. */
  private def signalSource(html: Column): Column =
    regexp_replace(html, CommentPat, " ")

  /** Evaluate `f` over `x` materialized ONCE per row (the UrlCuration
    * let-binding trick: a lambda variable is a leaf, so the engine
    * cannot inline `x` into each of `f`'s references) — here it keeps
    * the O(doc) comment-strip scan at one pass per row instead of one
    * per regexp_extract, including in interpreted/fallback contexts
    * where whole-stage-codegen subexpression elimination is absent. */
  private def letBound(x: Column)(f: Column => Column): Column =
    element_at(transform(array(x), f), 1)

  /** true when the page carries a robots noindex directive (either
    * attribute order, any case, token anywhere in content). NULL html
    * → false: absence of evidence is not a directive. Commented-out
    * directives do not count. */
  def noindex(html: Column): Column =
    letBound(signalSource(html)) { src =>
      val m1 = regexp_extract(src, NoindexPatA, 1)
      val m2 = regexp_extract(src, NoindexPatB, 1)
      coalesce(lower(m1).contains("noindex") || lower(m2).contains("noindex"),
        lit(false))
    }

  /** The `<link rel=canonical>` target: '' when the page declares
    * none, NULL html → NULL (the regexp-extract '' convention —
    * matches the title rule). Either attribute order, both quote
    * styles; commented-out declarations ignored. */
  def canonicalHref(html: Column): Column =
    letBound(signalSource(html)) { src =>
      val c1 = regexp_extract(src, CanonicalPatA, 1)
      val c2 = regexp_extract(src, CanonicalPatB, 1)
      when(c1 =!= "", c1).otherwise(c2)
    }

  /** Drop pages that asked not to be indexed ([[noindex]]) — a narrow
    * filter, seated with the URL-level gates (before extraction
    * spends a cycle on refused content). */
  def dropNoindex(df: DataFrame, htmlCol: String): DataFrame =
    df.filter(!noindex(col(htmlCol)))

  /** (idCol, pos, href): every `<a href=...>` target in document
    * order (0-based pos) — fragment-only links (`#...`) excluded, the
    * raw edge list a crawl graph ([[GraphOps.pageRank]]) consumes. */
  def links(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        posexplode(regexp_extract_all(coalesce(col(htmlCol), lit("")),
          lit("(?is)<a\\s[^>]*href=[\"']([^\"'#][^\"']*)[\"']"), lit(1)))
          .as(Seq("pos", "href")))
      .select(col(idCol), col("pos").cast("int").as("pos"), col("href"))

  /** The media-reference pattern — shared verbatim with the q212
    * oracle (RE2 and java.util.regex read it identically: no
    * lookahead, no backrefs): the quoted `src` attribute of the five
    * media-embedding tags. */
  private[graft] val MediaRefPat: String =
    "(?is)<(?:img|source|video|audio|embed)\\s[^>]*src\\s*=\\s*" +
      "[\"']([^\"']+)[\"']"

  /** (idCol, ref): the DISTINCT media objects a page embeds — the
    * `src` targets of `<img> <source> <video> <audio> <embed>` tags —
    * the doc→media OWNERSHIP edge a crawl pipeline needs to run the
    * doc-level media-originality gate from archive records (a page
    * and its images arrive as separate WARC records; this is what
    * re-associates them). Distinct per (doc, ref): a page repeating
    * one image contributes one evidence edge — the election counts
    * OBJECTS, not occurrences. Refs come out raw (often relative);
    * resolve against the fetch URL with
    * [[UrlCuration.resolveHref]] (or key joins on
    * [[UrlCuration.canonicalRef]]) before joining to media URLs.
    * Attribute names ENDING in `src` match too (`data-src` — the
    * lazy-loading convention): deliberate, spec-pinned — a lazily
    * loaded image is a real reference in a crawled page. */
  def mediaRefs(df: DataFrame, idCol: String, htmlCol: String): DataFrame =
    df.select(col(idCol),
        explode(regexp_extract_all(coalesce(col(htmlCol), lit("")),
          lit(MediaRefPat), lit(1))).as("ref"))
      .distinct()

  /** DuckDB replay of [[extractText]]. */
  def extractOracle(table: String, idCol: String, htmlExpr: String): String = s"""
      WITH raw AS (SELECT $idCol, coalesce($htmlExpr, '') AS h FROM $table),
      stripped AS (
        SELECT $idCol,
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(
                  regexp_replace(h, '(?s)<!--.*?-->', ' ', 'g'),
                  '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
              '(?i)</(?:p|div|li|h[1-6]|tr|table|ul|ol|blockquote)>|<br[^>]*>',
              chr(10), 'g'),
            '<[^>]*>', ' ', 'g') AS t,
          regexp_extract(h, '(?is)<title[^>]*>(.*?)</title>', 1) AS ttl
        FROM raw),
      named AS (
        SELECT $idCol,
          replace(replace(replace(replace(replace(t,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
            '&apos;', ''''), '&nbsp;', ' ') AS t,
          replace(replace(replace(replace(replace(ttl,
            '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
            '&apos;', ''''), '&nbsp;', ' ') AS ttl
        FROM stripped),
      dec AS (
        SELECT $idCol,
          replace(list_aggregate(list_transform(
            string_split(replace(replace(t, chr(1), ''),
              '&#', chr(1) || '&#'), chr(1)),
            p -> CASE
              WHEN regexp_extract(p, '^&#([0-9]{1,7});', 1) <> ''
                   AND CAST(regexp_extract(p, '^&#([0-9]{1,7});', 1) AS BIGINT)
                     BETWEEN 32 AND 126
                THEN chr(CAST(regexp_extract(p, '^&#([0-9]{1,7});', 1) AS INT))
                     || regexp_replace(p, '^&#[0-9]{1,7};', '')
              WHEN regexp_extract(p, '^&#[xX]([0-9a-fA-F]{1,6});', 1) <> ''
                   AND CAST(('0x' || regexp_extract(p,
                     '^&#[xX]([0-9a-fA-F]{1,6});', 1)) AS BIGINT)
                     BETWEEN 32 AND 126
                THEN chr(CAST(('0x' || regexp_extract(p,
                       '^&#[xX]([0-9a-fA-F]{1,6});', 1)) AS INT))
                     || regexp_replace(p, '^&#[xX][0-9a-fA-F]{1,6};', '')
              ELSE p END), 'string_agg', ''), '&amp;', '&') AS t,
          replace(ttl, '&amp;', '&') AS ttl
        FROM named)
      SELECT $idCol,
        trim(regexp_replace(ttl, '[ \\t\\r\\n]+', ' ', 'g')) AS title,
        array_to_string(list_filter(list_transform(
          string_split(t, chr(10)),
          l -> trim(regexp_replace(l, '[ \\t\\r]+', ' ', 'g'))),
          l -> l <> ''), chr(10)) AS text
      FROM dec
      ORDER BY $idCol"""
}
