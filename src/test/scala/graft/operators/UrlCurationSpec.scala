package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[UrlCuration]] — URL-first curation. q175/q176 prove engine
  * parity; this spec pins host parsing, registered-domain label
  * arithmetic, and the suffix-blocking contract on hand fixtures. */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def hostOf(url: String): String =
    Seq(Tuple1(url)).toDF("u")
      .select(UrlCuration.host(col("u"))).collect().head.getString(0)

  private def domainOf(h: String): String =
    Seq(Tuple1(h)).toDF("h")
      .select(UrlCuration.registeredDomain(col("h"))).collect().head.getString(0)

  test("host: scheme optional, credentials/port/path/query/fragment stripped, lowercased") {
    hostOf("https://WWW.Example.COM/path?q=1#f") shouldBe "www.example.com"
    hostOf("http://user:pw@site.org:8080/x") shouldBe "site.org"
    hostOf("site.org/bare/no/scheme") shouldBe "site.org"
    hostOf("ftp://files.example.net") shouldBe "files.example.net"
    hostOf("") shouldBe ""
  }

  test("registered domain: 2 labels normally, 3 over multi-part suffixes, short hosts whole") {
    domainOf("a.b.example.com") shouldBe "example.com"
    domainOf("news.bbc.co.uk") shouldBe "bbc.co.uk"
    domainOf("deep.sub.bbc.co.uk") shouldBe "bbc.co.uk"
    domainOf("example.com") shouldBe "example.com"
    domainOf("bbc.co.uk") shouldBe "bbc.co.uk"
    domainOf("localhost") shouldBe "localhost"
    domainOf("co.uk") shouldBe "co.uk" // a bare suffix stays itself
  }

  test("blocklist: suffix semantics — a blocked domain takes its subdomains; unparseable hosts kept") {
    val docs = Seq(
      (1L, "https://spam.example/x"),
      (2L, "https://a.b.spam.example/y"),       // subdomain of blocked
      (3L, "https://notspam.example/z"),         // suffix must match on LABELS,
                                                 // not substrings
      (4L, "https://fine.org/ok"),
      (5L, null.asInstanceOf[String]))           // no URL → kept
      .toDF("doc_id", "url")
    val blocked = Seq("spam.example").toDF("domain")
    val kept = UrlCuration.blocklistFilter(docs, "url", blocked)
      .select("doc_id").as[Long].collect().sorted
    kept shouldBe Array(3L, 4L, 5L)
  }

  test("canonicalUrl: hand-computed rule classes — case, ports, fragments, trackers, param sort") {
    val cases = Seq(
      // scheme+host fold, default https port, tracker drops, fragment drops
      "HTTPS://Example.COM:443/Path/p?utm_source=x&id=7#frag" ->
        "https://example.com/Path/p?id=7",
      // default http port, params sort lexicographically
      "http://a.com:80/a?b=2&a=1" -> "http://a.com/a?a=1&b=2",
      // non-default port SURVIVES; :8080 must not be mistaken for :80
      "http://a.com:8080/x" -> "http://a.com:8080/x",
      // bare host → "/" path; https on port 80 keeps the port
      "https://a.com" -> "https://a.com/",
      "https://a.com:80/x" -> "https://a.com:80/x",
      // exact-name trackers drop wherever they sit; empties drop
      "https://a.com/p?gclid=1&&x=2&fbclid=3" -> "https://a.com/p?x=2",
      // all-tracker query → no '?' at all
      "https://a.com/p?utm_a=1&utm_b=2" -> "https://a.com/p",
      // PATH case is preserved (paths are case-sensitive); query value
      // case preserved; duplicate names keep both, sorted
      "https://A.com/CaSe?z=B&z=A" -> "https://a.com/CaSe?z=A&z=B",
      // out of contract (no scheme): verbatim pass-through
      "a.com/x?utm_a=1" -> "a.com/x?utm_a=1")
    val got = cases.map(_._1).toDF("url")
      .select(UrlCuration.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    got shouldBe cases.map(_._2)
    // NULL in → NULL out
    Seq(Tuple1(null.asInstanceOf[String])).toDF("url")
      .select(UrlCuration.canonicalUrl(col("url")))
      .collect().head.isNullAt(0) shouldBe true
  }

  test("canonicalUrlDedup: smallest id survives per canonical form; NULL-url rows ALL kept") {
    val docs = Seq(
      (5L, "https://A.com:443/p?utm_x=1"), // ≡ id 2's canonical? no — https default port is 443
      (2L, "https://a.com/p"),
      (9L, "https://a.com/p#other"),        // ≡ canonical of id 2
      (3L, "https://b.com/q"),
      (7L, null.asInstanceOf[String]),
      (8L, null.asInstanceOf[String]))
      .toDF("doc_id", "url")
    val kept = UrlCuration.canonicalUrlDedup(docs, "url", "doc_id")
      .select("doc_id").as[Long].collect().sorted
    // canonical group {2, 5, 9} → keep 2; {3} → keep 3; NULLs 7, 8 kept
    kept shouldBe Array(2L, 3L, 7L, 8L)
  }

  // ---- full PSL path ---------------------------------------------------

  private def pslDomainOf(hosts: String*): Map[String, String] = {
    val rules = UrlCuration.pslRuleRelation(spark, UrlCuration.defaultPsl())
    UrlCuration.registeredDomainsPsl(
        hosts.map(Tuple1(_)).toDF("h"), "h", rules)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
  }

  test("resolveHref: relative forms resolve against the fetch URL; embedded URLs in queries don't fool the absolute test") {
    def resolve(url: String, href: String): String =
      Seq((url, href)).toDF("u", "h")
        .select(UrlCuration.resolveHref(col("u"), col("h")))
        .collect().head.getString(0)
    // absolute href: trusted verbatim
    resolve("https://a.com/p", "https://b.org/x") shouldBe "https://b.org/x"
    // root-relative: fetch ORIGIN + href (authority cut handles
    // query-no-path fetch URLs too)
    resolve("https://a.com/p/q?z=1", "/Article") shouldBe
      "https://a.com/Article"
    resolve("https://a.com?z=1", "/Article") shouldBe "https://a.com/Article"
    // protocol-relative: fetch scheme
    resolve("https://a.com/p", "//cdn.example/x") shouldBe
      "https://cdn.example/x"
    // a RELATIVE href whose QUERY embeds a URL is still relative —
    // '://' anywhere must not make it "absolute" (trusting it would
    // collapse unrelated hosts onto one cross-site key)
    resolve("https://a.com/p", "/login?next=https://sso.example/x") shouldBe
      "https://a.com/login?next=https://sso.example/x"
    // path-relative: conservative fetch-URL fallback
    resolve("https://a.com/p", "article") shouldBe "https://a.com/p"
    // empty/NULL href: fetch URL
    resolve("https://a.com/p", "") shouldBe "https://a.com/p"
    // unparseable fetch URL (no LEADING scheme): can't resolve
    resolve("not a url ://x", "/Article") shouldBe "not a url ://x"
  }

  test("parsePsl: comments skip, wildcard and exception markers parse, case folds") {
    val rules = UrlCuration.parsePsl(Seq(
      "// a comment", "", "CO.UK", "*.ck", "!www.ck", "com.sg"))
    rules shouldBe Seq(
      UrlCuration.PslRule("co.uk", 0), UrlCuration.PslRule("ck", 1),
      UrlCuration.PslRule("www.ck", 2), UrlCuration.PslRule("com.sg", 0))
    rules.head.labels shouldBe 2
  }

  test("defaultPsl: long-tail suffixes the 18-entry literal list gets wrong") {
    val d = pslDomainOf("sub.agency.act.edu.au", "sub.agency.act.gov.au",
      "shop.mall.com.sg", "a.b.example.org", "blog.user.blogspot.com")
    // third-level registration under a state suffix: act.edu.au is the
    // public suffix, agency.act.edu.au the registrant
    d("sub.agency.act.edu.au") shouldBe "agency.act.edu.au"
    // the published list's long tail is authoritative where a curated
    // core guesses wrong: act.gov.au was REMOVED from the list
    // (publicsuffix Bug 984824), so gov.au is the suffix and
    // act.gov.au itself the registrant
    d("sub.agency.act.gov.au") shouldBe "act.gov.au"
    d("shop.mall.com.sg") shouldBe "mall.com.sg"
    d("a.b.example.org") shouldBe "example.org"
    // private-section platform: each blogspot subdomain is a registrant
    d("blog.user.blogspot.com") shouldBe "user.blogspot.com"
  }

  test("defaultPsl: full published list — private-section platform suffixes resolve registrants") {
    // the long-tail classes only the real publicsuffix.org list
    // carries: cloud-storage suffixes (s3.amazonaws.com), pages
    // platforms (github.io), ccTLD platform variants
    // (blogspot.com.ar) — each bucket/user is its own registrant,
    // which is what keeps per-domain quotas honest on platform hosts
    val d = pslDomainOf("mybucket.s3.amazonaws.com", "s3.amazonaws.com",
      "assets.mybucket.s3.amazonaws.com", "user.github.io",
      "www.user.github.io", "blog.user.blogspot.com.ar")
    d("mybucket.s3.amazonaws.com") shouldBe "mybucket.s3.amazonaws.com"
    // a bare public suffix has no registrant: passes through whole
    d("s3.amazonaws.com") shouldBe "s3.amazonaws.com"
    d("assets.mybucket.s3.amazonaws.com") shouldBe "mybucket.s3.amazonaws.com"
    d("user.github.io") shouldBe "user.github.io"
    d("www.user.github.io") shouldBe "user.github.io"
    d("blog.user.blogspot.com.ar") shouldBe "user.blogspot.com.ar"
    // rule-count sanity: the shipped resource is the real list
    UrlCuration.defaultPsl().size should be > 9000
  }

  test("defaultPsl: wildcard rules make every child a public suffix; exceptions carve back out") {
    val d = pslDomainOf("a.b.ck", "www.ck", "sub.www.ck",
      "shop.other.kobe.jp", "www.city.kobe.jp", "unlisted.example")
    d("a.b.ck") shouldBe "a.b.ck"              // *.ck → b.ck public
    d("www.ck") shouldBe "www.ck"              // !www.ck → ck public
    d("sub.www.ck") shouldBe "www.ck"
    d("shop.other.kobe.jp") shouldBe "shop.other.kobe.jp" // *.kobe.jp
    d("www.city.kobe.jp") shouldBe "city.kobe.jp"         // !city.kobe.jp
    d("unlisted.example") shouldBe "unlisted.example"     // implicit `*`
  }

  test("domainReportPsl: subdomain-sharded hosts collapse to ONE domain row") {
    // the quota-gaming fixture: one registrant sharded across
    // subdomains must aggregate as one domain, with the exact
    // integer mean matching a single-host run of the same docs
    val docs = Seq(
      (1L, "https://a.x.gov.au/1", "the report was solid and it was read"),
      (2L, "https://b.x.gov.au/2", "the data is in the annual table"),
      (3L, "https://www.x.gov.au/3", "zz qq xk"),
      (4L, "https://other.org/4", "plain fine text here"))
      .toDF("doc_id", "url", "text")
    val rules = UrlCuration.pslRuleRelation(spark, UrlCuration.defaultPsl())
    val rows = UrlCuration.domainReportPsl(docs, "url", "text", rules)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    rows.keySet shouldBe Set("x.gov.au", "other.org")
    rows("x.gov.au")._1 shouldBe 3L
    // two-stage (host → domain) aggregation is exactness-preserving:
    // the same docs on one host yield the identical integer mean
    val oneHost = UrlCuration.domainReportPsl(
        docs.withColumn("url",
          regexp_replace(col("url"), "(a|b|www)\\.x\\.gov", "x.gov")),
        "url", "text", rules)
      .collect().map(r => r.getString(0) -> r.getLong(3)).toMap
    rows("x.gov.au")._3 shouldBe oneHost("x.gov.au")
  }

  test("domainReport aggregates by registered domain with exact integer means") {
    val docs = Seq(
      (1L, "https://a.site.com/1", "the report was solid and it was read"),
      (2L, "https://b.site.com/2", "the data is in the annual table"),
      (3L, "https://other.org/3", "zz qq xk"))
      .toDF("doc_id", "url", "text")
    val rows = UrlCuration.domainReport(docs, "url", "text")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows("site.com")._1 shouldBe 2L
    rows("site.com")._2 shouldBe 15L // 8 + 7 tokens
    rows("other.org")._1 shouldBe 1L
  }
}
