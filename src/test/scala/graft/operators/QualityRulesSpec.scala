package graft.operators

import graft.SparkSpec

/** Gopher rule report: hand-built documents where each rule's
  * pass/fail outcome is known by construction. q144 carries the full
  * DuckDB oracle over the planted corpus. */
class QualityRulesSpec extends SparkSpec {
  import spark.implicits._

  // 60 ordinary words incl. several stopwords — passes every rule
  private val goodText =
    (1 to 6).map(_ => "the quick brown fox jumps over that lazy dog and " +
      "sleeps with some hay").mkString(" ")

  private def flagsOf(text: String): Map[String, Any] = {
    val row = QualityRules.report(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text")
      .collect().head
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  test("a clean prose doc passes all rules") {
    val f = flagsOf(goodText)
    f.filterKeys(k => k.startsWith("r_") || k == "pass").values
      .foreach(_ shouldBe true)
    f("n_lines") shouldBe 1L
  }

  test("word-count bounds: short and absurdly long docs fail r_word_count") {
    flagsOf("too short")("r_word_count") shouldBe false
    flagsOf(goodText)("r_word_count") shouldBe true
  }

  test("mean word length: single-char and very long words fail the band") {
    val shorty = (1 to 60).map(_ => "a b").mkString(" ")
    flagsOf(shorty)("r_mean_word_len") shouldBe false
    val longy = (1 to 60).map(_ => "pneumonoultramicroscopic").mkString(" ")
    flagsOf(longy)("r_mean_word_len") shouldBe false
    flagsOf("")("r_mean_word_len") shouldBe false
  }

  test("symbol ratio counts #, unicode ellipsis, and dot-dot-dot") {
    // goodText is 84 words; 10 symbol words push past the 10% bound
    // (10·10 > 94) while 5 stay under (5·10 <= 89)
    val f = flagsOf(goodText + " # … ... # # # # # # #")
    f("r_symbol_ratio") shouldBe false
    flagsOf(goodText + " # … ... # #")("r_symbol_ratio") shouldBe true
  }

  test("bullet lines: >10% bulleted lines fail, ltrim applies") {
    val bulleted = goodText + "\n  - one\n  * two\n• three\nplain"
    flagsOf(bulleted)("r_bullet_lines") shouldBe false
    flagsOf(goodText + "\n" + (1 to 30).map(_ => "plain line").mkString("\n")
      + "\n- single bullet")("r_bullet_lines") shouldBe true
  }

  test("ellipsis lines: >=30% ellipsis-terminated lines fail, rtrim applies") {
    flagsOf(goodText + "\nwell...  \nhmm…")("r_ellipsis_lines") shouldBe false
    flagsOf(goodText + "\nplain\nalso plain\nfine\nwell...")(
      "r_ellipsis_lines") shouldBe true
  }

  test("alpha words: >20% letterless words fail") {
    // 84 alpha words + 25 numeric = 109 words: 84·5 < 109·4 fails;
    // at 20 numeric (104 words) 84·5 >= 104·4 still passes
    val nums = (1 to 25).map(_ => "12345").mkString(" ")
    flagsOf(goodText + " " + nums)("r_alpha_words") shouldBe false
    flagsOf(goodText + " " + (1 to 20).map(_ => "12345").mkString(" "))(
      "r_alpha_words") shouldBe true
  }

  test("stopword presence needs >=2 distinct members, case-insensitive") {
    val salad = (1 to 60).map(i => s"w$i").mkString(" ")
    flagsOf(salad)("r_stopwords") shouldBe false
    flagsOf(salad + " THE the the")("r_stopwords") shouldBe false
    flagsOf(salad + " THE with")("r_stopwords") shouldBe true
  }

  test("pass is the conjunction of all seven flags") {
    val f = flagsOf(goodText + "\n- b1\n- b2")
    f("r_bullet_lines") shouldBe false
    f("pass") shouldBe false
    flagsOf(goodText)("pass") shouldBe true
  }

  test("null text behaves as empty (no NULL flags)") {
    val row = QualityRules.report(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    row.getAs[Boolean]("pass") shouldBe false
    row.getAs[Long]("n_words") shouldBe 0L
    (0 until row.length).foreach(i => row.isNullAt(i) shouldBe false)
  }

  // ---- c4Clean (q148 carries the full planted-corpus oracle) ---------

  private def c4Of(text: String, minWords: Int = 3, minLines: Int = 1) =
    QualityRules.c4Clean(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text",
      minWordsPerLine = minWords, minKeptLines = minLines)
      .collect().head

  test("c4Clean: line retention needs terminal punctuation, enough words, no javascript") {
    val row = c4Of(Seq(
      "a proper sentence right here.",   // kept
      "no terminal punctuation here",    // killed: punctuation
      "two words.",                      // killed: < 3 words
      "enable javascript to read on.",   // killed: javascript
      "Enable JAVASCRIPT to read on.",   // killed: case-insensitive
      "is this a question?",             // kept: '?'
      "watch out!",                      // killed: 2 words
      "he said \"fine by me.\"",         // kept: end quote
      "trailing spaces count too.   "    // kept: rtrim before the check
    ).mkString("\n"))
    row.getAs[Long]("n_lines") shouldBe 9L
    row.getAs[Long]("n_kept") shouldBe 4L
    row.getAs[String]("clean_text") shouldBe Seq(
      "a proper sentence right here.",
      "is this a question?",
      "he said \"fine by me.\"",
      "trailing spaces count too.   ").mkString("\n")
  }

  test("c4Clean: document kills — lorem ipsum and curly braces, case-insensitive") {
    val good = "a proper sentence right here."
    c4Of(good).getAs[Boolean]("pass") shouldBe true
    val lorem = c4Of(good + "\nLorem Ipsum dolor sit amet.")
    lorem.getAs[Boolean]("r_lorem") shouldBe false
    lorem.getAs[Boolean]("pass") shouldBe false
    val brace = c4Of(good + "\nif (x) { y(); }")
    brace.getAs[Boolean]("r_brace") shouldBe false
    brace.getAs[Boolean]("pass") shouldBe false
    // the kill is doc-level, but clean_text still reports kept lines
    lorem.getAs[Long]("n_kept") shouldBe 2L
  }

  test("c4Clean: minKeptLines gates the doc; thresholds are parameters") {
    val two = "first proper sentence here.\nsecond proper sentence here."
    c4Of(two, minLines = 2).getAs[Boolean]("pass") shouldBe true
    c4Of(two, minLines = 3).getAs[Boolean]("pass") shouldBe false
    // minWordsPerLine raises the bar: 4-word lines die at 5
    c4Of(two, minWords = 5, minLines = 1).getAs[Long]("n_kept") shouldBe 0L
  }

  test("c4Clean: null text is one empty line, zero kept, no NULL columns") {
    val row = QualityRules.c4Clean(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      "doc_id", "text").collect().head
    row.getAs[Long]("n_lines") shouldBe 1L
    row.getAs[Long]("n_kept") shouldBe 0L
    row.getAs[Boolean]("pass") shouldBe false
    row.getAs[String]("clean_text") shouldBe ""
    (0 until row.length).foreach(i => row.isNullAt(i) shouldBe false)
  }
}
