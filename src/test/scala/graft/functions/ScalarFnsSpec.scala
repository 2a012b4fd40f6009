package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ScalarFnsSpec extends SparkSpec {
  import spark.implicits._

  test("safeUrlDecode: decodes, swallows malformed to empty, null to null") {
    val df = Seq(
      ("a", "hello%20world"),
      ("b", "bad%zz"),       // malformed escape
      ("c", null)
    ).toDF("id", "url")
      .select(col("id"), ScalarFns.safeUrlDecode(col("url")).as("d"))
      .orderBy("id")
    rows(df).map(r => r.getString(0) -> r.getString(1)) shouldBe Seq(
      "a" -> "hello world", "b" -> "", "c" -> null)
  }

  test("normalizeDomain strips scheme and www, lowercases") {
    val df = Seq("https://WWW.Example.COM/path", "http://site.org", "wwwx.net")
      .toDF("u").select(ScalarFns.normalizeDomain(col("u")).as("d"))
    rows(df).map(_.getString(0)) shouldBe Seq(
      "example.com/path", "site.org", "wwwx.net")
  }

  test("extractDomain pulls hostname") {
    val df = Seq("https://www.example.com:8080/a?b=1", "example.com/x", "http://a.b.c/d")
      .toDF("u").select(ScalarFns.extractDomain(col("u")).as("d"))
    rows(df).map(_.getString(0)) shouldBe Seq("example.com", "example.com", "a.b.c")
  }

  test("epochMillisToTs matches timestamp_millis semantics") {
    val df = Seq(1704067200123L).toDF("ms")
      .select(date_format(ScalarFns.epochMillisToTs(col("ms")),
        "yyyy-MM-dd HH:mm:ss.SSS").as("t"))
    eval1(df) shouldBe "2024-01-01 00:00:00.123"
  }

  test("tsToDateTag formats yyyyMMdd") {
    val df = Seq(1704153600000L).toDF("ms")
      .select(ScalarFns.tsToDateTag(ScalarFns.epochMillisToTs(col("ms"))).as("d"))
    eval1(df) shouldBe "20240102"
  }

  test("roundFrac is exact round-half-up at boundary cases") {
    // 39155/800 = 48.94375 — sits exactly on a 4-decimal half boundary
    val df = Seq((39155L, 8L)).toDF("n", "d")
    eval1(df.select(ScalarFns.roundFrac(col("n"), col("d"), 4))) shouldBe 4894.375
    // 39155/800 = 48.94375 → half-up at 4 decimals = 48.9438, not 48.9437
    eval1(df.select(ScalarFns.roundFrac(col("n"), col("d") * 100L, 4))) shouldBe 48.9438
    // den = 0 → null
    eval1(Seq((1L, 0L)).toDF("n", "d")
      .select(ScalarFns.roundFrac(col("n"), col("d"), 4))).asInstanceOf[AnyRef] shouldBe null
  }

  test("cents converts 2-decimal money exactly") {
    val df = Seq(391.55, 0.01, 12345.67, 0.0).toDF("m")
      .select(ScalarFns.cents(col("m")).as("c"))
    rows(df).map(_.getLong(0)) shouldBe Seq(39155L, 1L, 1234567L, 0L)
  }

  test("countIf / sumIf / safeDiv") {
    val df = Seq(1, 2, 3, 4, 5).toDF("x").agg(
      ScalarFns.countIf(col("x") > 3).as("c"),
      ScalarFns.sumIf(col("x") > 3, col("x")).as("s"))
    rows(df).head.toSeq shouldBe Seq(2L, 9L)
    eval1(Seq((1.0, 0.0)).toDF("n", "d")
      .select(ScalarFns.safeDiv(col("n"), col("d")))).asInstanceOf[AnyRef] shouldBe null
  }

  test("parseHost extracts host via built-in parse_url") {
    eval1(Seq("https://www.example.com/a").toDF("u")
      .select(ScalarFns.parseHost(col("u")))) shouldBe "www.example.com"
  }
}
