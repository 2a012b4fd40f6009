package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.Bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization for text columns.
  *
  * Dedup and fingerprinting break when byte-different spellings of the
  * SAME text ("é" composed vs "e"+U+0301 decomposed, full-width vs
  * ASCII forms) hash apart: every text operator upstream of a hash
  * (line dedup, shingles, minhash, winnowing) silently treats them as
  * distinct documents. The standard fix is canonical normalization at
  * ingest. Spark has no built-in for it (`lower`/`translate` don't
  * touch combining sequences), so this is a native Catalyst
  * [[UnicodeNormalize]] expression — one `java.text.Normalizer` call
  * inside whole-stage codegen, no UDF serialization boundary.
  *
  * The is-normalized FAST PATH matters at 100 TB: real corpora are
  * overwhelmingly already-NFC ASCII, and `Normalizer.isNormalized` is
  * a cheap scan that skips the allocating `normalize` call for them,
  * returning the input UTF8String untouched.
  */
object UnicodeNorm {

  /** NFC canonical composition (the ingest default; DuckDB's
    * `nfc_normalize` replays it — q121's oracle). */
  def nfc(c: Column): Column = normalize(c, "NFC")

  /** Any of NFC / NFD / NFKC / NFKD. NFKC is the aggressive
    * compatibility fold (full-width → ASCII, ligatures expanded) used
    * before token counting and language ID. */
  def normalize(c: Column, form: String): Column =
    Bridge.column(UnicodeNormalize(Bridge.expression(c), form))
}

/** Native `Normalizer.normalize(child, form)` with an is-normalized
  * fast path. NULL in → NULL out; the form is validated at analysis
  * time (a typo must fail the query, not each row).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"unicode_normalize needs a string input, got ${child.dataType.catalogString}")
    else if (!Set("NFC", "NFD", "NFKC", "NFKD").contains(form))
      TypeCheckResult.TypeCheckFailure(
        s"unknown normalization form '$form' (NFC/NFD/NFKC/NFKD)")
    else TypeCheckResult.TypeCheckSuccess

  // resolved once, not per row; @transient — re-derived from `form`
  // after executor-side deserialization
  @transient private lazy val javaForm: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any = {
    val u = input.asInstanceOf[UTF8String]
    val s = u.toString
    if (java.text.Normalizer.isNormalized(s, javaForm)) u
    else UTF8String.fromString(java.text.Normalizer.normalize(s, javaForm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val s = ctx.freshName("s")
      s"""
         |final String $s = $c.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s,
         |    java.text.Normalizer.Form.$form)
         |  ? $c
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.$form));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
