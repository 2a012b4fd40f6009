package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[HtmlExtract]] — crawl-to-text extraction. q173/q174 prove engine
  * parity over the synthetic page; this spec pins the RULES on hand
  * fixtures: element dropping, block line breaks, the entity decode
  * order, the ASCII-only numeric rule, link exclusion, and the
  * composition into the existing curation/graph operators. */
class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): (String, String) = {
    val r = HtmlExtract.extractText(
      Seq((1L, html)).toDF("id", "html"), "id", "html").collect().head
    (r.getString(1), r.getString(2))
  }

  test("script/style/comments drop with CONTENT; block ends become lines; tags strip") {
    val (_, text) = extract(
      "<body><p>first para</p><script>alert('x \"quoted\" y')</script>" +
        "<style>.c{}</style><!-- <p>ghost</p> --><div>second   block</div>" +
        "<span>inline <b>bold</b> run</span></body>")
    text shouldBe "first para\nsecond block\ninline bold run"
  }

  test("entity decode: named set, &amp; last, ASCII numerics, non-ASCII passthrough") {
    val (_, text) = extract(
      "<p>&lt;x&gt; &quot;q&quot; &apos;a&apos; A&nbsp;B</p>" +
        "<p>&#65;&#x42; &#955; &#9; &amp;lt; &amp;&#65;</p>")
    // &#955; (λ) and &#9; (tab) are outside 32..126: pass through;
    // &amp;lt; must yield the LITERAL '&lt;' (no double decode)
    text shouldBe "<x> \"q\" 'a' A B\nAB &#955; &#9; &lt; &A"
  }

  test("title extracted and cleaned; NULL html yields empty row, never a crash") {
    val (title, _) = extract(
      "<head><title>  My &amp;\n Site  </title></head><body><p>b</p></body>")
    title shouldBe "My & Site"
    val r = HtmlExtract.extractText(
      Seq((1L, null.asInstanceOf[String])).toDF("id", "html"), "id", "html")
      .collect().head
    r.getString(1) shouldBe ""
    r.getString(2) shouldBe ""
  }

  test("links: document order, both quote styles, fragment-only excluded") {
    val rows = HtmlExtract.links(Seq((1L,
      "<a href=\"/a\">1</a><a href='/b?q=1'>2</a>" +
        "<a href='#top'>skip</a><a class=\"x\" href=\"/c#frag\">3</a>"))
      .toDF("id", "html"), "id", "html")
      .collect().map(r => (r.getInt(1), r.getString(2)))
    rows.toSeq shouldBe Seq((0, "/a"), (1, "/b?q=1"), (2, "/c#frag"))
  }

  test("mediaRefs: the five embedding tags' src, distinct per (doc, ref); anchors and repeats excluded") {
    val html =
      """<img src="/i/a.png"><IMG alt="x" SRC='/i/b.jpg'>
        |<video controls src="/v/c.mp4"></video>
        |<audio src="/a/d.wav"></audio><embed src="/e/f.pdf">
        |<source src="/v/c.webm" type="video/webm">
        |<img src="/i/a.png">
        |<img data-src="/i/lazy.png">
        |<a href="/not-media.html">link</a>""".stripMargin
    val refs = HtmlExtract.mediaRefs(
        Seq((1L, html), (2L, null.asInstanceOf[String])).toDF("id", "html"),
        "id", "html")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    // doc 1: six src tags + the lazy-loading data-src (DOCUMENTED
    // behavior: `[^>]*src=` matches attribute names ENDING in src,
    // so data-src lazy images — real refs in crawled pages — are
    // edges too), one repeat collapsed; doc 2 (NULL html): nothing
    refs.map(_._1).toSet shouldBe Set(1L)
    refs.map(_._2).sorted.toSeq shouldBe Seq("/a/d.wav", "/e/f.pdf",
      "/i/a.png", "/i/b.jpg", "/i/lazy.png", "/v/c.mp4", "/v/c.webm")
  }

  test("composition: extracted text feeds qualityScore; links feed PageRank") {
    val docs = graft.Tables.documents(spark, sfDir).limit(50)
      .withColumn("html", concat(lit("<p>"), col("text"), lit("</p>"),
        lit("<a href=\"/doc/"), (col("doc_id") % 10).cast("string"),
        lit("\"></a>")))
    val extracted = HtmlExtract.extractText(docs, "doc_id", "html")
    // extraction preserves the TOKEN STREAM of the plain prose (its
    // whitespace normalizes — that's the extractor's job), so every
    // token-level curation operator sees identical input
    val drift = extracted.join(docs.select(col("doc_id"), col("text").as("orig")),
        "doc_id")
      .filter(graft.functions.TextFns.tokens(col("text")) =!=
        graft.functions.TextFns.tokens(col("orig")))
    drift.count() shouldBe 0L
    val edges = HtmlExtract.links(docs, "doc_id", "html")
      .select(col("doc_id").as("src"),
        regexp_extract(col("href"), "/doc/([0-9]+)", 1).cast("long").as("dst"))
    val pr = GraphOps.pageRank(edges, "src", "dst", iters = 2)
    pr.count() should be > 0L
  }

  test("meta signals: noindex both orders/cases, canonicalHref both orders/quotes, NULL html") {
    import spark.implicits._
    val cases = Seq(
      ("""<head><meta name="robots" content="nofollow, noindex"></head>""",
        true, ""),
      ("""<head><META CONTENT='NOINDEX' NAME='Robots'></head>""", true, ""),
      // noindex must match the robots meta, not any meta
      ("""<head><meta name="viewport" content="noindex"></head>""",
        false, ""),
      // a robots meta WITHOUT noindex stays indexable
      ("""<head><meta name="robots" content="nofollow"></head>""",
        false, ""),
      ("""<head><link rel="canonical" href="https://x.example/p"></head>""",
        false, "https://x.example/p"),
      ("""<head><link href='https://y.example/q' rel='canonical'></head>""",
        false, "https://y.example/q"),
      // rel=stylesheet links are not canonical declarations
      ("""<head><link rel="stylesheet" href="s.css"></head>""", false, ""),
      // prefix declarations are DIFFERENT declarations (terminator rule)
      ("""<head><meta name="robots-nocontent" content="noindex"></head>""",
        false, ""),
      ("""<head><link rel="canonical-alt" href="https://alt.example/x"></head>""",
        false, ""),
      // commented-out directives are not declarations
      ("""<head><!-- <meta name="robots" content="noindex"> --></head>""",
        false, ""),
      // attribute pairs must sit in ONE tag: the robots meta closing
      // '>' must not let the pattern run into the NEXT tag's content
      ("""<head><meta name=robots><meta name="description" content="how to noindex pages"></head>""",
        false, ""),
      ("""<head><link rel=canonical><a href="https://other.example/x">t</a></head>""",
        false, ""))
    val got = cases.map(_._1).toDF("html")
      .select(HtmlExtract.noindex(col("html")).as("nix"),
        HtmlExtract.canonicalHref(col("html")).as("cl"))
      .collect().map(r => (r.getBoolean(0), r.getString(1))).toSeq
    got shouldBe cases.map(c => (c._2, c._3))
    // NULL html: no directive (false), no declaration (NULL)
    val nullRow = Seq(Tuple1(null.asInstanceOf[String])).toDF("html")
      .select(HtmlExtract.noindex(col("html")).as("nix"),
        HtmlExtract.canonicalHref(col("html")).as("cl"))
      .collect().head
    nullRow.getBoolean(0) shouldBe false
    nullRow.isNullAt(1) shouldBe true
    // dropNoindex composes as the gate
    HtmlExtract.dropNoindex(
      cases.map(_._1).toDF("html"), "html").count() shouldBe 10L
  }
}
