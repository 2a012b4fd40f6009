package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import java.net.URLDecoder
import scala.util.Try

/** Scalar expression helpers covering the reference's function surface
  * (SURVEY.md §2.4, F1–F20): URL/domain handling, epoch-time conventions,
  * JSON parsing, conditional aggregation idioms.
  *
  * Everything except [[safeUrlDecode]] composes built-in Catalyst
  * expressions, so the whole surface stays inside whole-stage codegen.
  * The decode wrapper is the reference's only true UDF
  * (data_mart/data_mart.scala:94-99): built-in `url_decode` throws on
  * malformed input while the reference swallows errors to "".
  */
object ScalarFns {

  /** Exception-safe percent-decoding (reference: data_mart.scala:94-99).
    * Kept as a Scala UDF deliberately — `try_url_decode` returns NULL on
    * failure, the reference contract is empty string. Null in → null out.
    */
  val safeUrlDecode = udf { url: String =>
    if (url == null) null
    else Try(URLDecoder.decode(url, "UTF-8")).getOrElse("")
  }

  /** Strip scheme and leading www. then lowercase — the reference's
    * domain normalization intent (filter.scala:53-54, features.scala:32).
    * The reference's pattern `www.` has an unescaped dot; we implement the
    * intent (`^www\.`) per SURVEY.md F4.
    */
  def normalizeDomain(url: Column): Column =
    regexp_replace(lower(regexp_replace(url, "^(?i)https?://", "")), "^www\\.", "")

  /** Extract hostname via capture group (reference: data_mart.scala:102-107).
    * Scheme and www are matched case-insensitively like
    * [[normalizeDomain]] — URLs arrive in any case, and a
    * case-sensitive pattern would return the SCHEME string for
    * "HTTP://..." inputs. */
  def extractDomain(url: Column): Column =
    regexp_extract(url, "^(?i)(?:https?://)?(?:www\\.)?([^:/\\n?]+)", 1)

  /** Hostname via the SQL builtin (reference F7 used callUDF("parse_url");
    * Spark 4.x exposes it directly). */
  def parseHost(url: Column): Column = parse_url(url, lit("HOST"))

  /** Epoch-milliseconds → TimestampType, the reference's pervasive
    * convention (agg.scala:58, dashboard.scala:57). */
  def epochMillisToTs(ms: Column): Column =
    (ms.cast("double") / 1000.0).cast("timestamp")

  /** TimestampType → yyyyMMdd string, the reference's partition-date format
    * (filter.scala:53-54). */
  def tsToDateTag(ts: Column): Column = date_format(ts, "yyyyMMdd")

  /** Conditional count — `count(when(cond, true))` idiom
    * (features.scala:73-74). count ignores nulls. */
  def countIf(cond: Column): Column = count(when(cond, lit(true)))

  /** Conditional sum — `sum(when(cond, x).otherwise(0))` idiom
    * (agg.scala:60-62). */
  def sumIf(cond: Column, value: Column): Column =
    sum(when(cond, value).otherwise(lit(0)))

  /** Null-safe ratio: NULL when denominator is 0 (the reference relies on
    * SQL division semantics for AOV, agg.scala:64). */
  def safeDiv(num: Column, den: Column): Column =
    when(den =!= 0, num / den)

  /** Exact integer division (SQL `div`), bypassing double arithmetic. */
  def intDiv(num: Column, den: Column): Column = {
    import org.apache.spark.sql.graftshim.Bridge
    import org.apache.spark.sql.catalyst.expressions.IntegralDivide
    Bridge.column(IntegralDivide(
      Bridge.expression(num), Bridge.expression(den)))
  }

  /** round(num/den, scale) for NON-NEGATIVE integral columns, computed
    * entirely in integer space: floor((2·num·10^s + den) / (2·den)).
    *
    * Why not round(num/den, s): engines summing in different orders land
    * on opposite sides of a decimal boundary (e.g. 391.55/8 = 48.94375 —
    * 2-decimal money over small counts sits EXACTLY on round-half
    * boundaries), so float-then-round is irreproducible by construction.
    * Integer arithmetic is exact in every engine. NULL when den = 0.
    */
  def roundFrac(num: Column, den: Column, scale: Int): Column = {
    val p = math.pow(10, scale).toLong
    when(den =!= 0,
      intDiv(num.cast("long") * lit(2 * p) + den.cast("long"),
        den.cast("long") * lit(2L))
        .cast("double") / lit(p.toDouble))
  }

  /** Money (2-decimal double) → exact integer cents. The per-row value
    * sits within 1e-12 of the cent grid, so the round is unambiguous;
    * downstream sums/ratios then stay exact. */
  def cents(money: Column): Column = round(money * 100, 0).cast("long")
}
