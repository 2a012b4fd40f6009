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
