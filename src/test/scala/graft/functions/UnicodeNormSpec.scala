package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  // decomposed acute, Hangul jamo, full-width A, ligature fi — all as
  // \u escapes so the source file stays ASCII
  private val eAcuteDec = "e\u0301"
  private val eAcute = "\u00e9"
  private val hangulJamo = "\u1100\u1161"
  private val hangulSyl = "\uac00"
  private val fullA = "\uff21"
  private val ligFi = "\ufb01"

  test("NFC composes canonical sequences; NFKC additionally folds compatibility forms") {
    val df = Seq(
      (s"Caf$eAcuteDec", s"Caf$eAcute"),
      (hangulJamo, hangulSyl),
      ("plain ascii", "plain ascii"),
      ("", "")).toDF("in", "expected_nfc")
    rows(df.select(col("expected_nfc"),
        UnicodeNorm.nfc(col("in")).as("got")))
      .foreach(r => r.getString(1) shouldBe r.getString(0))
    // NFC leaves compatibility forms alone; NFKC folds them to ASCII
    eval1(Seq(fullA).toDF("s")
      .select(UnicodeNorm.nfc(col("s")))) shouldBe fullA
    eval1(Seq(fullA).toDF("s")
      .select(UnicodeNorm.normalize(col("s"), "NFKC"))) shouldBe "A"
    eval1(Seq(ligFi).toDF("s")
      .select(UnicodeNorm.normalize(col("s"), "NFKC"))) shouldBe "fi"
  }

  test("NULL propagates; already-normalized input returns unchanged (fast path)") {
    eval1(Seq(Option.empty[String]).toDF("s")
      .select(UnicodeNorm.nfc(col("s")))) shouldBe null.asInstanceOf[Any]
    // fast path: the interpreted eval must return the SAME UTF8String
    // object for already-NFC input (no copy)
    val u = UTF8String.fromString("already normalized")
    val out = UnicodeNormalize(Literal(u, org.apache.spark.sql.types.StringType),
      "NFC").eval(null)
    assert(out.asInstanceOf[AnyRef] eq u.asInstanceOf[AnyRef])
  }

  test("interpreted eval == codegen path on mixed fixtures") {
    val fixtures = Seq(s"Cafe$eAcuteDec", hangulJamo, fullA, ligFi,
      "ascii only", "", s"mix $eAcuteDec$hangulJamo tail")
    for (form <- Seq("NFC", "NFD", "NFKC", "NFKD")) {
      val viaDf = fixtures.toDF("s")
        .select(UnicodeNorm.normalize(col("s"), form)).as[String].collect()
      val viaEval = fixtures.map { s =>
        UnicodeNormalize(Literal(UTF8String.fromString(s),
          org.apache.spark.sql.types.StringType), form).eval(null).toString
      }
      viaDf.toSeq shouldBe viaEval
      // and both equal the JDK reference
      viaEval shouldBe fixtures.map(s =>
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.valueOf(form)))
    }
  }

  test("invalid form fails at analysis, not per-row") {
    val ex = intercept[Exception] {
      Seq("x").toDF("s")
        .select(UnicodeNorm.normalize(col("s"), "NFX")).collect()
    }
    assert(ex.getMessage.contains("NFX") || ex.getMessage.contains("DATATYPE_MISMATCH"),
      ex.getMessage)
  }

  test("expression stays inside whole-stage codegen") {
    val df = graft.Tables.documents(spark, sfDir)
      .select(UnicodeNorm.nfc(col("text")).as("t"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the projection carrying unicodenormalize must sit under a *(n)
    // WSCG stage, not a standalone (fallback) Project
    val projLine = plan.linesIterator
      .find(_.toLowerCase.contains("unicodenormalize"))
      .orElse(plan.linesIterator.find(_.contains("Project")))
    assert(projLine.exists(_.contains("*(")), plan)
  }
}
