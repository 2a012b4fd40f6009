package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PiiRepetitionSpec extends SparkSpec {
  import spark.implicits._

  private def redact(s: String): String =
    eval1(Seq(s).toDF("t").select(TextFns.redactPii(col("t")))).asInstanceOf[String]

  test("redactPii replaces emails, IPv4s, and phones with typed tags") {
    redact("mail a.b+c@ex-1.example.org now") shouldBe "mail <EMAIL> now"
    redact("host 192.168.0.1 down") shouldBe "host <IP> down"
    redact("call +44-555-0123 today") shouldBe "call <PHONE> today"
    redact("x@y.io and 10.0.0.1 and +1-555-0000") shouldBe
      "<EMAIL> and <IP> and <PHONE>"
  }

  test("redactPii leaves clean text and near-misses untouched") {
    redact("no pii here at all") shouldBe "no pii here at all"
    redact("version 1.2.3 is out") shouldBe "version 1.2.3 is out" // 3 octets only
    redact("meet @noon sharp") shouldBe "meet @noon sharp" // no local part/tld
  }

  test("redactPii handles repeated matches and null") {
    redact("a@b.co c@d.io") shouldBe "<EMAIL> <EMAIL>"
    assert(eval1(Seq(Option.empty[String]).toDF("t")
      .select(TextFns.redactPii(col("t")))) == null)
  }

  test("piiCount counts matches") {
    eval1(Seq("a@b.co x c@d.io").toDF("t")
      .select(TextFns.piiCount(col("t"), TextFns.emailRe))) shouldBe 2
  }

  private def stats(s: String): (Int, Int, Int, Int) = {
    val r = Seq(s).toDF("t").select(TextFns.repetitionStats(col("t")).as("r"))
      .select(col("r.n_tokens"), col("r.top_token_count"),
        col("r.n_bigrams"), col("r.n_distinct_bigrams")).collect()(0)
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getInt(3))
  }

  test("repetitionStats counts tokens, top token, bigrams") {
    // "a b a b a": 5 tokens, 'a'×3; bigrams [a b, b a, a b, b a] → 4 total, 2 distinct
    stats("a b a b a") shouldBe ((5, 3, 4, 2))
    stats("x y z") shouldBe ((3, 1, 2, 2))
  }

  test("repetitionStats short-doc fallback mirrors wordShingles") {
    stats("solo") shouldBe ((1, 1, 1, 1)) // bigram fallback = whole text
    stats("") shouldBe ((0, 0, 1, 1))     // empty → one empty-string bigram
  }

  test("repetitionStats null text → null struct") {
    Seq(Option.empty[String]).toDF("t")
      .select(TextFns.repetitionStats(col("t")).as("r"))
      .collect()(0).isNullAt(0) shouldBe true
  }
}
