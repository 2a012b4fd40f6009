package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokens drops empty strings from repeated whitespace") {
    eval1(Seq("  a   b\tc \n d ").toDF("t")
      .select(TextFns.tokens(col("t")))) shouldBe Seq("a", "b", "c", "d")
  }

  test("tokenCount and bpeishTokenCount") {
    eval1(Seq("one two three").toDF("t")
      .select(TextFns.tokenCount(col("t")))) shouldBe 3
    // "don't stop" → don / ' / t / stop
    eval1(Seq("don't stop").toDF("t")
      .select(TextFns.bpeishTokenCount(col("t")))) shouldBe 4
  }

  test("wordShingles n=3 with short-text fallback") {
    eval1(Seq("a b c d").toDF("t").select(TextFns.wordShingles(col("t"), 3)))
      .shouldBe(Seq("a b c", "b c d"))
    eval1(Seq("a b").toDF("t").select(TextFns.wordShingles(col("t"), 3)))
      .shouldBe(Seq("a b"))
  }

  test("charShingles n=2 over normalized text") {
    eval1(Seq("Ab c").toDF("t").select(TextFns.charShingles(col("t"), 2)))
      .shouldBe(Seq("ab", "b ", " c"))
  }

  test("normalize and fingerprint are whitespace/case insensitive") {
    val df = Seq(("A  B\tc", "a b c")).toDF("x", "y")
    eval1(df.select(TextFns.fingerprint(col("x")) === TextFns.fingerprint(col("y")))) shouldBe true
  }

  test("ratios: punct, digit, stopword on known text") {
    val t = "the cat, 2 dogs!"   // 16 chars: 2 punct, 1 digit; 4 tokens, 1 stopword
    eval1(Seq(t).toDF("t").select(TextFns.punctRatio(col("t")))) shouldBe 2.0 / 16
    eval1(Seq(t).toDF("t").select(TextFns.digitRatio(col("t")))) shouldBe 1.0 / 16
    eval1(Seq(t).toDF("t").select(TextFns.stopwordRatio(col("t")))) shouldBe 0.25
    // empty text → 0.0 everywhere, no division blow-up
    eval1(Seq("").toDF("t").select(TextFns.stopwordRatio(col("t")))) shouldBe 0.0
  }

  test("exact ratio variants match float variants to 4 decimals") {
    val docs = graft.Tables.documents(spark, sfDir).limit(50)
    val cmp = docs.select(
      abs(TextFns.meanTokenLenExact(col("text")) - round(TextFns.meanTokenLen(col("text")), 4)).as("d1"),
      abs(TextFns.stopwordRatioExact(col("text")) - round(TextFns.stopwordRatio(col("text")), 4)).as("d2"))
      .agg(max(col("d1")), max(col("d2")))
    val r = rows(cmp).head
    // half-up vs banker's-free float round can differ by exactly 1e-4 at a boundary
    assert(r.getDouble(0) <= 1e-4 + 1e-9)
    assert(r.getDouble(1) <= 1e-4 + 1e-9)
  }

  test("qualityScore bounded in [0,1], empty text scores 0") {
    val b = graft.Tables.documents(spark, sfDir)
      .agg(min(TextFns.qualityScore(col("text"))), max(TextFns.qualityScore(col("text"))))
    val r = rows(b).head
    assert(r.getDouble(0) >= 0.0 && r.getDouble(1) <= 1.0)
    eval1(Seq("").toDF("t").select(TextFns.qualityScore(col("t")))) shouldBe 0.0
    eval1(Seq("   ").toDF("t").select(TextFns.qualityScore(col("t")))) shouldBe 0.0
  }

  test("encoding signals: damage counted and repaired to spaces, \\t\\n kept") {
    val df = Seq("ok\uFFFDtext\u0007with\u001Fjunk\tkeep\nws")
      .toDF("raw")
      .select(
        TextFns.piiCount(col("raw"), TextFns.replacementCharRe).as("n_rep"),
        TextFns.piiCount(col("raw"), TextFns.controlCharRe).as("n_ctl"),
        TextFns.stripEncodingDamage(col("raw")).as("clean"))
    val r = rows(df).head
    r.getAs[Int]("n_rep") shouldBe 1
    r.getAs[Int]("n_ctl") shouldBe 2
    r.getAs[String]("clean") shouldBe "ok text with junk\tkeep\nws"
  }

  test("languageId votes by marker stopwords, und when none") {
    val df = Seq(
      ("the cat is on the mat and it is flat", "en"),
      ("der Hund ist nicht ein Fisch und das ist gut", "de"),
      ("el perro es grande y la casa es azul", "es"),
      ("le chat est sur les toits et la lune est belle", "fr"),
      ("это не на что и в", "ru"),
      ("zzz qqq www", "und")
    ).toDF("text", "expected")
      .select(col("expected"), TextFns.languageId(col("text")).as("got"))
    rows(df).foreach(r => r.getString(1) shouldBe r.getString(0))
  }
}
