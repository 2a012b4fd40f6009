package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL-level curation — the FIRST gate of every web-corpus pipeline
  * (RefinedWeb §3.1, FineWeb: URL filtering runs before a single byte
  * of text is scored): extract the host, reduce it to its registered
  * domain, aggregate per-domain triage statistics, and drop documents
  * whose domain sits on a blocklist — with SUFFIX semantics, so
  * blocking `spam.example` also blocks `a.b.spam.example`.
  *
  * Engine-portable by construction: the host comes from one regexp
  * (not `parse_url`, which DuckDB lacks), the registered domain is a
  * label-arithmetic expression over a caller-supplied multi-part-TLD
  * list (the public-suffix idea with the data as an argument — pass
  * the real PSL for production; the default covers the common
  * two-label suffixes), and the blocklist gate is an EXPLODED
  * suffix/semi-join — the blocklist joins as data, never a per-row
  * regex loop over a million patterns.
  *
  * Scale: host/domain are narrow codegen expressions; the report is
  * one domain-key aggregate with map-side combine; the gate explodes
  * each host to its ≤ label-count suffixes and broadcast-semi-joins
  * the (small) blocklist. Nothing touches the text column until the
  * survivors are decided — which is the point of URL-first ordering.
  */
object UrlCuration {

  /** Common multi-part public suffixes (the PSL's most-used entries);
    * pass the full list for production fidelity. */
  val DefaultMultiPartTlds: Seq[String] = Seq(
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au", "org.au",
    "co.jp", "or.jp", "ne.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tr", "com.ar", "co.za")

  /** Lower-cased host of a URL ('' when unparseable): scheme-optional,
    * credentials and port stripped. */
  def host(url: Column): Column =
    lower(regexp_extract(url,
      "^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)", 1))

  /** Registered domain of a host: the last two labels, or the last
    * THREE when the last two form a listed multi-part suffix
    * (`a.b.co.uk` → `b.co.uk`; `a.b.example.com` → `example.com`).
    * Hosts with ≤ the needed labels pass through whole. */
  def registeredDomain(hostCol: Column,
                       multiPartTlds: Seq[String] = DefaultMultiPartTlds): Column = {
    val labels = split(hostCol, "\\.")
    val n = size(labels)
    val lastTwo = array_join(slice(labels, -2, 2), ".")
    val keep = when(lastTwo.isin(multiPartTlds: _*), lit(3)).otherwise(lit(2))
    // slice(-keep, 3): negative start counts from the end; length 3 caps
    // the window (a 2-label keep still yields exactly the last 2)
    when(n <= keep, hostCol)
      .otherwise(array_join(slice(labels, -keep, lit(3)), "."))
  }

  /** Per-domain triage report — the FineWeb-style table a curator cuts
    * on: (domain, n_docs, n_tokens, mean_quality_bp), quality in
    * half-up integer basis points of [[TextFns.qualityScore]]. */
  def domainReport(df: DataFrame, urlCol: String, textCol: String,
                   multiPartTlds: Seq[String] = DefaultMultiPartTlds): DataFrame =
    df.select(
        registeredDomain(host(col(urlCol)), multiPartTlds).as("domain"),
        coalesce(TextFns.tokenCount(col(textCol)), lit(0)).cast("long")
          .as("__nt"),
        coalesce(round(TextFns.qualityScore(col(textCol)) * 10000), lit(0.0))
          .cast("long").as("__q"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        // half-up integer mean of the 1e-4-quantized scores (the
        // CorpusReport rule): (2·Σq + n) div (2n)
        expr("(2 * sum(__q) + count(1)) div (2 * count(1))")
          .as("mean_quality_bp"))

  /** Every suffix of a host that could match a blocklist entry:
    * `a.b.co` → [a.b.co, b.co, co]. */
  private def hostSuffixes(hostCol: Column): Column = {
    val labels = split(hostCol, "\\.")
    transform(sequence(lit(1), size(labels)),
      i => array_join(slice(labels, i, size(labels)), "."))
  }

  /** Drop documents whose host or ANY parent domain is blocked —
    * `blocked` is a one-column (domain) relation (read it from a file
    * at production scale); matching is exact on exploded suffixes and
    * the blocklist broadcasts. Rows with no parseable host are KEPT
    * (a missing URL is not evidence of spam; gate them elsewhere).
    *
    * Plan shape: DISTINCT corpus hosts (one narrow string column,
    * map-side partial aggregation) explode to their suffixes and
    * broadcast-HASH-semi-join the blocklist — per-suffix cost is one
    * hash probe, O(labels) per host, NOT an `array_contains` scan of
    * the whole blocklist (that predicate is non-equi and plans as a
    * nested-loop over every broadcast row — O(|docs|·|blocklist|) at
    * the million-pattern scale this gate exists for). The corpus
    * itself never shuffles: the hit-host set broadcasts back into a
    * hash anti join (it is bounded by the blocked-host fanout; for a
    * pathological list that condemns a large fraction of all distinct
    * hosts, drop the broadcast hint and let the gate shuffle on
    * host — still an equi join). */
  def blocklistFilter(df: DataFrame, urlCol: String,
                      blocked: DataFrame): DataFrame = {
    val b = broadcast(blocked.select(col(blocked.columns.head).as("__b")))
    val hitHosts = df.select(host(col(urlCol)).as("__h")).distinct()
      .select(col("__h"), explode(hostSuffixes(col("__h"))).as("__s"))
      .join(b, col("__s") === col("__b"), "left_semi")
      .select(col("__h"))
    df.join(broadcast(hitHosts), host(col(urlCol)) === col("__h"), "left_anti")
  }

  // ---- URL canonicalization + canonical dedup --------------------------
  // The crawl-dedup FRONT stage (CCNet/RefinedWeb-class pipelines run
  // URL dedup before any content dedup): the same page arrives under
  // mixed-case scheme/host, default ports, fragments, tracking
  // parameters, and shuffled query order — canonicalize first and the
  // cheap exact-key dedup catches what would otherwise burn MinHash
  // budget downstream.

  /** Exact-name query parameters dropped by [[canonicalUrl]] — the
    * common click/campaign trackers; extend per deployment. */
  val DefaultTrackingParams: Seq[String] =
    Seq("gclid", "fbclid", "msclkid", "mc_eid", "igshid")

  /** Canonical form of a URL (NULL in → NULL out), engine-portable
    * string/array arithmetic only (each step replayed by the q186
    * oracle): fragment dropped; scheme and host lower-cased; default
    * ports stripped (`:80` under http, `:443` under https); an empty
    * path becomes `/`; query parameters drop when empty, when the
    * `k=v` string starts with a `trackingPrefixes` entry (`utm_`), or
    * when the name is in `trackingExact`; survivors SORT
    * lexicographically (full `k=v` binary order — both engines
    * compare UTF-8 bytes) and re-join. Credentials/userinfo are NOT
    * handled (crawl URLs do not carry them; a URL with `@` keeps it
    * verbatim and simply canonicalizes to itself consistently).
    * Narrow codegen-friendly expressions; no UDF, no shuffle. */
  def canonicalUrl(url: Column,
                   trackingExact: Seq[String] = DefaultTrackingParams,
                   trackingPrefixes: Seq[String] = Seq("utm_")): Column = {
    val base = element_at(split(url, "#"), 1)
    val p = locate("://", base)
    val scheme = lower(base.substr(lit(1), p - 1))
    val rest = base.substr(p + 3, length(base))
    // authority ends at the EARLIEST of '/' and '?': a legal URL may
    // carry a query with no path (https://a.com?b=2), and cutting at
    // '/' alone would swallow that query into the host (lowercased,
    // unsorted, trackers kept). least() skips NULLs in both engines.
    val cut = least(nullif(locate("/", rest), lit(0)),
      nullif(locate("?", rest), lit(0)))
    val hostport = lower(when(cut.isNotNull, rest.substr(lit(1), cut - 1))
      .otherwise(rest))
    val tail = when(cut.isNotNull, rest.substr(cut, length(rest)))
      .otherwise(lit(""))
    // '' → '/', '?…' → '/?…', '/…' stays — the empty path becomes '/'
    val pathq = when(tail.startsWith("/"), tail)
      .otherwise(concat(lit("/"), tail))
    val q = locate("?", pathq)
    val path = when(q > 0, pathq.substr(lit(1), q - 1)).otherwise(pathq)
    val query = when(q > 0, pathq.substr(q + 1, length(pathq)))
      .otherwise(lit(""))
    val host = when(scheme === "http" && hostport.endsWith(":80"),
        hostport.substr(lit(1), length(hostport) - 3))
      .when(scheme === "https" && hostport.endsWith(":443"),
        hostport.substr(lit(1), length(hostport) - 4))
      .otherwise(hostport)
    val kept = array_sort(filter(split(query, "&"), x => {
      val name = element_at(split(x, "="), 1)
      val prefixHit = trackingPrefixes
        .map(pre => x.startsWith(pre)).reduce(_ || _)
      x =!= "" && !prefixHit && !name.isin(trackingExact: _*)
    }))
    // no "://" ⇒ out of contract (crawl URLs carry schemes): pass
    // through VERBATIM rather than assemble from undefined substrings
    // — the host('')/blocklist keep-the-unparseable convention
    when(p > 0,
      concat(scheme, lit("://"), host, path,
        when(size(kept) > 0, concat(lit("?"), array_join(kept, "&")))
          .otherwise(lit(""))))
      .otherwise(url)
  }

  /** The DuckDB replay of [[canonicalUrl]] as a CTE chain over
    * `srcRel` (which must yield `$idCol` and `$urlExpr` per row),
    * ending in CTE `ccanon ($idCol, canonical)` — shared by the
    * q186/q187 oracles. Tracking lists interpolate from the SAME
    * defaults the Spark side uses. */
  def canonicalUrlCtes(srcRel: String, idCol: String, urlExpr: String,
                       trackingExact: Seq[String] = DefaultTrackingParams,
                       trackingPrefixes: Seq[String] = Seq("utm_")): String = {
    val exactList = trackingExact.map(t => s"'$t'").mkString("[", ", ", "]")
    val prefixHit = trackingPrefixes
      .map(pre => s"starts_with(x, '$pre')").mkString(" OR ")
    s"""cb AS (
        SELECT $idCol, $urlExpr AS __u,
               string_split($urlExpr, '#')[1] AS b FROM $srcRel),
      cparts AS (
        SELECT $idCol, __u, strpos(b, '://') AS sp,
               lower(substring(b, 1, strpos(b, '://') - 1)) AS scheme,
               substring(b, strpos(b, '://') + 3) AS rest
        FROM cb),
      ccut AS (
        SELECT $idCol, __u, sp, scheme, rest,
               least(nullif(strpos(rest, '/'), 0),
                     nullif(strpos(rest, '?'), 0)) AS cut
        FROM cparts),
      chp AS (
        SELECT $idCol, __u, sp, scheme,
               lower(CASE WHEN cut IS NOT NULL
                    THEN substring(rest, 1, cut - 1)
                    ELSE rest END) AS hostport,
               CASE WHEN cut IS NULL THEN '/'
                    WHEN substring(rest, cut, 1) = '/'
                    THEN substring(rest, cut)
                    ELSE '/' || substring(rest, cut) END AS pathq
        FROM ccut),
      cpq AS (
        SELECT $idCol, __u, sp, scheme,
               CASE WHEN scheme = 'http' AND hostport LIKE '%:80'
                    THEN substring(hostport, 1, length(hostport) - 3)
                    WHEN scheme = 'https' AND hostport LIKE '%:443'
                    THEN substring(hostport, 1, length(hostport) - 4)
                    ELSE hostport END AS host,
               CASE WHEN strpos(pathq, '?') > 0
                    THEN substring(pathq, 1, strpos(pathq, '?') - 1)
                    ELSE pathq END AS path,
               CASE WHEN strpos(pathq, '?') > 0
                    THEN substring(pathq, strpos(pathq, '?') + 1)
                    ELSE '' END AS query
        FROM chp),
      ck AS (
        SELECT $idCol, __u, sp, scheme, host, path,
               list_sort(list_filter(string_split(query, '&'),
                 x -> x <> '' AND NOT ($prefixHit)
                      AND NOT list_contains($exactList,
                            string_split(x, '=')[1]))) AS ps
        FROM cpq),
      ccanon AS (
        SELECT $idCol,
               CASE WHEN sp > 0
                    THEN scheme || '://' || host || path ||
                         CASE WHEN len(ps) > 0
                              THEN '?' || array_to_string(ps, '&')
                              ELSE '' END
                    ELSE __u END AS canonical
        FROM ck)"""
  }

  /** Keep-first dedup on the canonical URL: one survivor per
    * canonical form — the row with the SMALLEST `idCol` (the
    * dedup family's deterministic keep-best rule) — with NULL-url
    * rows all KEPT (no URL is no evidence of duplication; the
    * [[blocklistFilter]] convention). Plan: the canonical key is a
    * narrow expression, the keeper election one groupBy(canonical)
    * min-aggregate (map-side combined), and survivors come back via
    * an equi join on (canonical, id) — the corpus's one shuffle, the
    * same cost class any exact dedup pays. Output: the input rows,
    * survivors only. */
  def canonicalUrlDedup(df: DataFrame, urlCol: String,
                        idCol: String): DataFrame =
    dedupByCanonicalKey(df, canonicalUrl(col(urlCol)), idCol)

  /** Resolve a declared canonical href against the page's fetch URL —
    * real pages routinely declare RELATIVE canonicals (`href="/"`,
    * `/article`), and keying a cross-site dedup on the raw relative
    * string would collapse unrelated hosts onto one key (silent
    * cross-site data loss). Rules, in order: empty/NULL href → the
    * fetch URL; href with `://` → trusted absolute, used verbatim;
    * unparseable fetch URL (no LEADING scheme) → the fetch URL (a
    * relative href has no base to resolve against); protocol-relative
    * `//h/p` → fetch scheme + `:` + href; root-relative `/p` → fetch
    * origin (scheme://hostport, authority cut at the earliest of `/`
    * and `?`) + href; any other relative form (path-relative, `../`)
    * → the fetch URL (conservative: never invent a cross-host key).
    * "Absolute" means a scheme AT THE START (`^scheme://`), not a
    * `://` anywhere — `/login?next=https://sso.example/x` is a
    * RELATIVE href whose query embeds a URL, and trusting it verbatim
    * would collapse unrelated hosts onto one key (the exact cross-site
    * loss this function exists to prevent). Narrow expressions;
    * [[resolveHrefSql]] is the DuckDB replay. */
  def resolveHref(url: Column, href: Column): Column = {
    val p = locate("://", url)
    val scheme = url.substr(lit(1), p - 1)
    val rest = url.substr(p + 3, length(url))
    val cut = least(nullif(locate("/", rest), lit(0)),
      nullif(locate("?", rest), lit(0)))
    val hostport = when(cut.isNotNull, rest.substr(lit(1), cut - 1))
      .otherwise(rest)
    when(href.isNull || href === "", url)
      .when(href.rlike(SchemePrefixPat), href)
      .when(!url.rlike(SchemePrefixPat), url)
      .when(href.startsWith("//"), concat(scheme, lit(":"), href))
      .when(href.startsWith("/"),
        concat(scheme, lit("://"), hostport, href))
      .otherwise(url)
  }

  /** A URL-like string's LEADING scheme (RFC 3986 scheme grammar) —
    * shared by both engines' absolute-href tests (RE2-safe). */
  private val SchemePrefixPat = "^[A-Za-z][A-Za-z0-9+.-]*://"

  /** DuckDB replay of [[resolveHref]] as one scalar expression over
    * column names `u` (fetch URL) and `h` (declared href) — branch
    * order and semantics identical to the Spark side. */
  def resolveHrefSql(u: String, h: String): String = {
    val rest = s"substring($u, strpos($u, '://') + 3)"
    val cut = s"least(nullif(strpos($rest, '/'), 0), " +
      s"nullif(strpos($rest, '?'), 0))"
    val pat = s"'$SchemePrefixPat'"
    s"""CASE WHEN $h IS NULL OR $h = '' THEN $u
         WHEN regexp_matches($h, $pat) THEN $h
         WHEN NOT regexp_matches(coalesce($u, ''), $pat) THEN $u
         WHEN starts_with($h, '//')
           THEN substring($u, 1, strpos($u, '://') - 1) || ':' || $h
         WHEN starts_with($h, '/')
           THEN substring($u, 1, strpos($u, '://') - 1) || '://' ||
                (CASE WHEN $cut IS NOT NULL
                      THEN substring($rest, 1, $cut - 1)
                      ELSE $rest END) || $h
         ELSE $u END"""
  }

  /** [[canonicalUrlDedup]] upgraded with the page's OWN canonical
    * declaration: the dedup key is the canonical form of the
    * `<link rel=canonical>` target where the page declares one
    * ([[HtmlExtract.canonicalHref]], '' = none) — RESOLVED against
    * the fetch URL ([[resolveHref]]), so a relative declared target
    * keys within its own host and never collapses documents across
    * sites — else of the page URL. A mirror, an AMP variant, and a
    * tracker-noised re-crawl of the same article all collapse onto
    * the article's declared URL — the dedup signal the site itself
    * publishes, stronger than anything derivable from the fetch URL.
    * Same keep-smallest-id / NULL-key-rows-all-kept rules and plan
    * shape. */
  def canonicalLinkDedup(df: DataFrame, urlCol: String, hrefCol: String,
                         idCol: String): DataFrame =
    dedupByCanonicalKey(df,
      letBound(resolveHref(col(urlCol), col(hrefCol)))(canonicalUrl(_)),
      idCol)

  /** `canonicalUrl ∘ resolveHref`, LET-BOUND (see [[canonicalLinkDedup]]
    * and the letBound note below — the naive composition pastes the
    * resolveHref tree ~15×): the canonical join key for any
    * page-declared reference (canonical links, media `src` edges —
    * the [[graft.pipelines.StreamingIngestPipeline.archiveIngestStep]]
    * ownership join). */
  def canonicalRef(url: Column, href: Column): Column =
    letBound(resolveHref(url, href))(canonicalUrl(_))

  /** MEDIA-reference resolution — [[resolveHref]]'s rules EXTENDED
    * with the path-relative forms real pages use for `src`
    * attributes (`img/x.png`, `../shared/x.png`, `./x.png`), which
    * resolveHref deliberately refuses (it keys cross-site DEDUP, and
    * a mis-resolved relative form must never invent a cross-host
    * key). Media-ref resolution is same-host BY CONSTRUCTION —
    * a relative src can only name an object on the page's own
    * origin — so the conservatism doesn't apply; what DOES apply is
    * the no-self rule: where resolveHref falls back to the page URL
    * (empty ref, unparseable base), a media resolver must yield
    * NULL — a page is not its own media object, and NULL keys join
    * no evidence. Rules, in order: empty/NULL ref → NULL; `^scheme://`
    * ref → verbatim; unparseable base (no leading scheme) → NULL;
    * `//h/p` → base scheme + ref; `/p` → base origin + ref; any
    * other form → base DIRECTORY (query/fragment stripped, last
    * path segment dropped; empty path → origin + `/`) + ref, with
    * `./` segments collapsed and up to FOUR `segment/../` parent
    * hops folded (regex iterations — RE2-safe, no lookahead, so
    * [[resolveMediaRefSql]] replays them verbatim; deeper nesting
    * and dot-leading segments stay UNCOLLAPSED, which can only
    * under-match: an unjoined ref reads as no-evidence and the doc
    * PASSES — the safe direction). */
  def resolveMediaRef(url: Column, ref: Column): Column = {
    val p = locate("://", url)
    val scheme = url.substr(lit(1), p - 1)
    val rest = url.substr(p + 3, length(url))
    val cut = least(nullif(locate("/", rest), lit(0)),
      nullif(locate("?", rest), lit(0)))
    val hostport = when(cut.isNotNull, rest.substr(lit(1), cut - 1))
      .otherwise(rest)
    val origin = concat(scheme, lit("://"), hostport)
    // base directory: strip query/fragment, drop the last segment;
    // an empty path leaves only "scheme://" behind — fall back to
    // origin + "/"
    val noq = element_at(split(element_at(split(url, "\\?"), 1), "#"), 1)
    val dirRaw = regexp_replace(noq, "[^/]*$", "")
    val dir = when(length(dirRaw) > length(origin), dirRaw)
      .otherwise(concat(origin, lit("/")))
    val joined = concat(dir, ref)
    val dotless = regexp_replace(joined, "/(\\./)+", "/")
    val collapsed = (1 to 4).foldLeft(dotless)((c, _) =>
      regexp_replace(c, "/[^/.][^/]*/\\.\\./", "/"))
    when(ref.isNull || ref === "", lit(null))
      .when(ref.rlike(SchemePrefixPat), ref)
      .when(!url.rlike(SchemePrefixPat) || url.isNull, lit(null))
      .when(ref.startsWith("//"), concat(scheme, lit(":"), ref))
      .when(ref.startsWith("/"), concat(origin, ref))
      .otherwise(collapsed)
  }

  /** DuckDB replay of [[resolveMediaRef]] over column names `u`
    * (fetch URL) and `h` (ref) — branch order, directory rule, and
    * the bounded dot-collapse iterations identical. */
  def resolveMediaRefSql(u: String, h: String): String = {
    val rest = s"substring($u, strpos($u, '://') + 3)"
    val cut = s"least(nullif(strpos($rest, '/'), 0), " +
      s"nullif(strpos($rest, '?'), 0))"
    val hostport = s"(CASE WHEN $cut IS NOT NULL " +
      s"THEN substring($rest, 1, $cut - 1) ELSE $rest END)"
    val origin =
      s"(substring($u, 1, strpos($u, '://') - 1) || '://' || $hostport)"
    val noq = s"string_split(string_split($u, '?')[1], '#')[1]"
    val dirRaw = s"regexp_replace($noq, '[^/]*$$', '')"
    val dir = s"(CASE WHEN length($dirRaw) > length($origin) " +
      s"THEN $dirRaw ELSE $origin || '/' END)"
    val joined = s"($dir || $h)"
    val dotless = s"regexp_replace($joined, '/(\\./)+', '/', 'g')"
    // 'g' on every pass: Spark's regexp_replace replaces ALL
    // non-overlapping occurrences per call, so each of the four
    // iterations must too — both engines then collapse one NESTING
    // level per pass with unlimited sibling hops
    val collapsed = (1 to 4).foldLeft(dotless)((c, _) =>
      s"regexp_replace($c, '/[^/.][^/]*/\\.\\./', '/', 'g')")
    val pat = s"'$SchemePrefixPat'"
    s"""CASE WHEN $h IS NULL OR $h = '' THEN NULL
         WHEN regexp_matches($h, $pat) THEN $h
         WHEN $u IS NULL OR NOT regexp_matches($u, $pat) THEN NULL
         WHEN starts_with($h, '//')
           THEN substring($u, 1, strpos($u, '://') - 1) || ':' || $h
         WHEN starts_with($h, '/') THEN $origin || $h
         ELSE $collapsed END"""
  }

  /** `canonicalUrl ∘ resolveMediaRef`, let-bound — the ownership-join
    * key for doc→media evidence edges (NULL stays NULL: canonicalUrl
    * of a NULL resolution never matches a record). */
  def canonicalMediaRef(url: Column, ref: Column): Column =
    letBound(resolveMediaRef(url, ref))(r =>
      when(r.isNull, lit(null)).otherwise(canonicalUrl(r)))

  /** Let-binding for expression composition: `f`'s references to its
    * argument become LAMBDA-VARIABLE leaves instead of copies of
    * `x`'s tree. canonicalUrl references its input ~15 times and
    * resolveHref ~18, so `canonicalUrl(resolveHref(bigTree))` pastes
    * `bigTree` hundreds of times — and predicate pushdown then
    * inlines the whole product into filter conditions (a measured
    * 148 MB plan string → driver OOM on q189). Binding through a
    * one-element `transform` keeps the composition LINEAR in tree
    * size. Cost: higher-order functions are CodegenFallback — pay it
    * only where composition depth demands it (a per-row scalar in a
    * dedup-key projection, not a hot inner loop). */
  private def letBound(x: Column)(f: Column => Column): Column =
    element_at(transform(array(x), f), 1)

  /** Keep-first per non-NULL canonical key; NULL-key rows all pass. */
  private def dedupByCanonicalKey(df: DataFrame, key: Column,
                                  idCol: String): DataFrame = {
    val withC = df.withColumn("__curl", key)
    val keepers = withC.filter(col("__curl").isNotNull)
      .groupBy(col("__curl")).agg(min(col(idCol)).as(idCol))
    withC.filter(col("__curl").isNotNull)
      .join(keepers, Seq("__curl", idCol), "left_semi")
      .unionByName(withC.filter(col("__curl").isNull))
      .drop("__curl")
  }

  // ---- Full public-suffix-list support -------------------------------

  /** One parsed PSL rule. `kind`: 0 = normal (`co.uk`), 1 = wildcard
    * (`*.ck` — every single label under the stem is itself a public
    * suffix), 2 = exception (`!www.ck` — carved OUT of a wildcard;
    * prevails over every other matching rule, per the PSL algorithm). */
  final case class PslRule(suffix: String, kind: Int) {
    def labels: Int = suffix.count(_ == '.') + 1
  }

  /** Parse publicsuffix.org-format lines: `//` comments and blanks
    * skip; `*.stem` → wildcard on the stem; `!suffix` → exception;
    * anything else a normal rule. Lower-cased (PSL hosts are);
    * anything after whitespace on a rule line is ignored (the format
    * allows trailing comments). Driver-side and model-sized by
    * contract — the full published list is ~10⁴ rules, the same
    * order as every other loaded artifact (TokenizerArtifacts rule). */
  def parsePsl(lines: IterableOnce[String]): Seq[PslRule] =
    lines.iterator
      .map(_.takeWhile(!_.isWhitespace).trim.toLowerCase)
      .filter(l => l.nonEmpty && !l.startsWith("//"))
      .map {
        case l if l.startsWith("*.") => PslRule(l.drop(2), 1)
        case l if l.startsWith("!")  => PslRule(l.drop(1), 2)
        case l                       => PslRule(l, 0)
      }
      .toSeq

  /** The shipped FULL published list (resources/graft/psl.dat — the
    * verbatim publicsuffix.org public_suffix_list.dat, MPL 2.0, ICANN
    * + private sections, ~9.5k rules): the long tail of third-level
    * registries and platform suffixes (s3.amazonaws.com, github.io,
    * the blogspot.* family) is exactly where registered-domain
    * mistakes hide, so the real list ships rather than a curated
    * core. Still model-sized: ~10⁴ broadcast rows, the same order as
    * a PQ codebook. To pin a different snapshot, swap the resource
    * file (or call [[parsePsl]] on any lines) — parser and join path
    * are list-agnostic. IDN rules are matched in the FORM the list
    * carries them (unicode labels); punycode hosts match the xn--
    * rules — normalize hosts to one form upstream. */
  def defaultPsl(): Seq[PslRule] = {
    val in = getClass.getResourceAsStream("/graft/psl.dat")
    require(in != null, "graft/psl.dat missing from classpath")
    try parsePsl(scala.io.Source.fromInputStream(in, "UTF-8").getLines())
    finally in.close()
  }

  /** Rules as the broadcast JOIN relation (jkey, ps_len, exc): the
    * kind is encoded INTO the key (`n:`/`w:`/`e:` prefixes) so
    * suffix matching is a pure equi join — a host probes with
    * `n:`+suffix and `e:`+suffix (exact-rule hits) and `w:`+suffix
    * (a wildcard whose stem is this suffix makes the CHILD public).
    * `ps_len` is the public-suffix label count the match implies:
    * rule labels for normal, stem labels + 1 for wildcard, rule
    * labels − 1 for exception (the PSL "prevailing exception" rule
    * strips the leftmost label). */
  def pslRuleRelation(spark: org.apache.spark.sql.SparkSession,
                      rules: Seq[PslRule]): DataFrame = {
    import spark.implicits._
    rules.map { r =>
      r.kind match {
        case 0 => ("n:" + r.suffix, r.labels, false)
        case 1 => ("w:" + r.suffix, r.labels + 1, false)
        case 2 => ("e:" + r.suffix, r.labels - 1, true)
      }
    }.toDF("jkey", "ps_len", "exc")
  }

  /** (host, domain): the registered domain of every DISTINCT host in
    * `hosts` under the full PSL algorithm — longest matching rule
    * wins, wildcards count their stem + 1, a matching exception
    * prevails over everything, no match falls back to the implicit
    * `*` rule (last label is public). Hosts with ≤ public-suffix
    * labels pass through whole (the [[registeredDomain]] convention —
    * a bare public suffix has no registrant, and passing it through
    * keeps the report total-preserving).
    *
    * Scale shape: one distinct-host aggregate (narrow string column,
    * map-side combined), ≤ 3·labels candidate keys per host
    * broadcast-hash-LEFT-joined to the rule relation, one per-host
    * re-aggregate. The corpus never enters — join the returned map
    * back on host (see [[domainReportPsl]] for the
    * aggregate-then-join order that keeps that join host-sized). */
  def registeredDomainsPsl(hosts: DataFrame, hostCol: String,
                           rules: DataFrame): DataFrame = {
    val h = hosts.select(col(hostCol).as("__h")).distinct()
      .withColumn("__n", size(split(col("__h"), "\\.")))
    val cand = h
      .select(col("__h"), col("__n"),
        explode(hostSuffixes(col("__h"))).as("__s"))
      .select(col("__h"), col("__n"),
        explode(array(concat(lit("n:"), col("__s")),
          concat(lit("w:"), col("__s")),
          concat(lit("e:"), col("__s")))).as("__jk"))
    val ps = cand
      .join(broadcast(rules), col("__jk") === col("jkey"), "left")
      .groupBy(col("__h"), col("__n"))
      .agg(coalesce(
        max(when(col("exc"), col("ps_len"))),
        max(when(!col("exc"), col("ps_len"))),
        lit(1)).as("__ps"))
    ps.select(col("__h").as("host"),
      when(col("__n") <= col("__ps"), col("__h"))
        .otherwise(array_join(
          slice(split(col("__h"), "\\."),
            -(col("__ps") + 1), col("__ps") + 1), "."))
        .as("domain"))
  }

  /** [[domainReport]] under the FULL PSL algorithm — the
    * quota-gaming-proof form: subdomain-sharded hosts (`a.x.gov.au`,
    * `b.x.gov.au`) collapse to one registered-domain row, so
    * per-domain caps (q80-style) cannot be dodged by sharding.
    *
    * Plan: per-HOST partial aggregate first (host-keyed, map-side
    * combined — the corpus's one shuffle), then the host→domain map
    * joins host-sized rows, then the small per-domain re-aggregate.
    * The exact-integer measure composes: mean_quality_bp re-derives
    * from Σq/Σn, so the two-stage aggregation loses nothing. */
  def domainReportPsl(df: DataFrame, urlCol: String, textCol: String,
                      rules: DataFrame): DataFrame = {
    val perHost = df.select(
        host(col(urlCol)).as("host"),
        coalesce(TextFns.tokenCount(col(textCol)), lit(0)).cast("long")
          .as("__nt"),
        coalesce(round(TextFns.qualityScore(col(textCol)) * 10000), lit(0.0))
          .cast("long").as("__q"))
      .groupBy(col("host"))
      .agg(count(lit(1)).as("__c"), sum(col("__nt")).as("__t"),
        sum(col("__q")).as("__s"))
    perHost
      .join(registeredDomainsPsl(perHost, "host", rules), Seq("host"))
      .groupBy(col("domain"))
      .agg(sum(col("__c")).cast("long").as("n_docs"),
        sum(col("__t")).cast("long").as("n_tokens"),
        expr("(2 * sum(__s) + sum(__c)) div (2 * sum(__c))")
          .as("mean_quality_bp"))
  }

  /** DuckDB rendering of [[pslRuleRelation]] + the per-host PSL
    * resolution — shared by [[domainReportPslOracle]]. Yields CTEs
    * `rules`, `hp` (doc-grain: host, n, ps). `h` must provide
    * (host, …) at document grain. */
  private def pslResolveSql(rules: Seq[PslRule]): String = {
    val vals = rules.map { r =>
      r.kind match {
        case 0 => s"('n:${r.suffix}', ${r.labels}, false)"
        case 1 => s"('w:${r.suffix}', ${r.labels + 1}, false)"
        case 2 => s"('e:${r.suffix}', ${r.labels - 1}, true)"
      }
    }.mkString(", ")
    s"""
      rules(jkey, ps_len, exc) AS (VALUES $vals),
      cand AS (
        SELECT rid, host,
               unnest(flatten(list_transform(
                 range(1, len(string_split(host, '.')) + 1),
                 i -> ['n:' || array_to_string(string_split(host, '.')[i:], '.'),
                       'w:' || array_to_string(string_split(host, '.')[i:], '.'),
                       'e:' || array_to_string(string_split(host, '.')[i:], '.')])))
                 AS jk
        FROM h),
      hp AS (
        SELECT rid, host,
               len(string_split(host, '.')) AS n,
               coalesce(max(CASE WHEN r.exc THEN r.ps_len END),
                        max(CASE WHEN NOT r.exc THEN r.ps_len END),
                        1) AS ps
        FROM cand LEFT JOIN rules r ON cand.jk = r.jkey
        GROUP BY rid, host),
      dom AS (
        SELECT rid,
               CASE WHEN n <= ps THEN host
                    ELSE array_to_string(string_split(host, '.')[-(ps+1):], '.')
               END AS domain
        FROM hp)"""
  }

  /** DuckDB replay of [[domainReportPsl]]: the host regexp, the full
    * PSL resolution (equi-keyed rule join, exception-prevails,
    * longest-match, implicit `*`), then the q36 quality integer —
    * document-grain end to end (the two-stage host aggregation is an
    * exactness-preserving regrouping, so the one-stage replay
    * matches bit for bit). */
  def domainReportPslOracle(table: String, urlExpr: String,
                            textCol: String, rules: Seq[PslRule],
                            idCol: String): String = s"""
      WITH h AS (
        SELECT $idCol AS rid,
               lower(regexp_extract($urlExpr,
                 '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)',
                 1)) AS host,
               $textCol AS txt,
               list_filter(string_split_regex(coalesce($textCol, ''), '\\s+'),
                 x -> x <> '') AS toks
        FROM $table),
      ${pslResolveSql(rules)},
      d AS (
        SELECT dom.domain, h.txt, h.toks
        FROM h JOIN dom ON h.rid = dom.rid),
      m AS (${qualityMeasureSql()}
      SELECT domain,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST((2 * sum(q) + count(*)) // (2 * count(*)) AS BIGINT)
               AS mean_quality_bp
      FROM k
      GROUP BY domain
      ORDER BY domain"""

  /** The q36 quality integer over CTE `d`(domain, txt, toks) —
    * the m/k measure tail shared by both domain-report oracles.
    * Emits the BODY of `m AS (` through `k AS (…)`. */
  private def qualityMeasureSql(): String = s"""
        SELECT domain,
          CAST(coalesce(len(toks), 0) AS BIGINT) AS n,
          CAST(len(list_filter(string_split_regex(lower(txt), '\\s+'),
            x -> x <> '' AND x IN ('the','a','an','and','or','of','to',
            'in','is','it','that','for','on','with','as','was','at','by','this')))
            AS BIGINT) AS m1,
          CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
            AS BIGINT) AS s,
          CAST(length(txt) AS BIGINT) AS c,
          CAST(length(txt)
            - length(regexp_replace(txt, '[!-/:-@\\[-`{-~0-9]', '', 'g'))
            AS BIGINT) AS pd
        FROM d),
      k AS (
        SELECT domain, n,
          CASE WHEN n > 0 AND c > 0 THEN
            (2 * (least(m1 * c * 16000, n * c * 4000)
                  + (CASE WHEN s >= n * 2 AND s <= n * 12
                     THEN n * c * 4000 ELSE 0 END)
                  + (n * c * 2000 - least(pd * n * 4000, n * c * 2000)))
             + n * c) // (n * c * 2)
          ELSE 0 END AS q
        FROM m)"""

  /** DuckDB replay of [[domainReport]] — host regexp, label-arithmetic
    * registered domain, and the q36 quality integer inline. */
  def domainReportOracle(table: String, urlExpr: String, textCol: String,
                         multiPartTlds: Seq[String] = DefaultMultiPartTlds): String = {
    val tldList = multiPartTlds.map(t => s"'$t'").mkString(", ")
    s"""
      WITH h AS (
        SELECT lower(regexp_extract($urlExpr,
                 '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)',
                 1)) AS host,
               $textCol AS txt,
               list_filter(string_split_regex(coalesce($textCol, ''), '\\s+'),
                 x -> x <> '') AS toks
        FROM $table),
      d AS (
        SELECT CASE WHEN len(string_split(host, '.')) <=
                 (CASE WHEN array_to_string(string_split(host, '.')[-2:], '.')
                         IN ($tldList) THEN 3 ELSE 2 END)
               THEN host
               ELSE array_to_string(string_split(host, '.')[
                 -(CASE WHEN array_to_string(string_split(host, '.')[-2:], '.')
                     IN ($tldList) THEN 3 ELSE 2 END):], '.') END AS domain,
               txt, toks
        FROM h),
      m AS (
        SELECT domain,
          CAST(coalesce(len(toks), 0) AS BIGINT) AS n,
          CAST(len(list_filter(string_split_regex(lower(txt), '\\s+'),
            x -> x <> '' AND x IN ('the','a','an','and','or','of','to',
            'in','is','it','that','for','on','with','as','was','at','by','this')))
            AS BIGINT) AS m1,
          CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
            AS BIGINT) AS s,
          CAST(length(txt) AS BIGINT) AS c,
          CAST(length(txt)
            - length(regexp_replace(txt, '[!-/:-@\\[-`{-~0-9]', '', 'g'))
            AS BIGINT) AS pd
        FROM d),
      k AS (
        SELECT domain, n,
          CASE WHEN n > 0 AND c > 0 THEN
            (2 * (least(m1 * c * 16000, n * c * 4000)
                  + (CASE WHEN s >= n * 2 AND s <= n * 12
                     THEN n * c * 4000 ELSE 0 END)
                  + (n * c * 2000 - least(pd * n * 4000, n * c * 2000)))
             + n * c) // (n * c * 2)
          ELSE 0 END AS q
        FROM m)
      SELECT domain,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(n) AS BIGINT) AS n_tokens,
             CAST((2 * sum(q) + count(*)) // (2 * count(*)) AS BIGINT)
               AS mean_quality_bp
      FROM k
      GROUP BY domain
      ORDER BY domain"""
  }
}
