package graft

import graft.functions.{CosineSimilarity, DotProduct, SqDistMicro}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's native
  * expressions as SQL functions, so `spark.sql("SELECT
  * cosine_similarity(a, b) ...")` reaches the fused codegen kernel —
  * the same plumbing a connector/extension jar uses
  * (`spark.sql.extensions=graft.GraftExtensions`).
  *
  * This is the ONLY Catalyst hook the engine needs: per SURVEY.md §4 no
  * custom optimizer Rule or SparkStrategy is required for reference
  * parity — every reference behavior lands on built-in Catalyst paths —
  * so none is installed. The hook exists to surface the custom
  * Expression layer to SQL users.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(GraftExtensions.cosineSimilarity)
    ext.injectFunction(GraftExtensions.dotProduct)
    ext.injectFunction(GraftExtensions.sqDistMicro)
    ext.injectFunction(GraftExtensions.topKPairs)
    ext.injectFunction(GraftExtensions.unicodeNormalize)
    ext.injectFunction(GraftExtensions.boundedCollect)
  }
}

object GraftExtensions {
  val cosineSimilarity: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("cosine_similarity"),
    new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"cosine_similarity takes 2 arguments, got ${children.length}")
      CosineSimilarity(children.head, children(1))
    })

  val dotProduct: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("dot_product"),
    new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"dot_product takes 2 arguments, got ${children.length}")
      DotProduct(children.head, children(1))
    })

  val sqDistMicro: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("sq_dist_micro"),
    new ExpressionInfo(classOf[SqDistMicro].getName, "sq_dist_micro"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"sq_dist_micro takes 2 arguments, got ${children.length}")
      SqDistMicro(children.head, children(1))
    })

  /** `top_k_pairs(score, id, k)` — the native bounded-heap top-k
    * aggregate; k must be a literal int (it sizes the buffer at plan
    * time). Score/id casts mirror the Column builder's coercion. */
  val topKPairs: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("top_k_pairs"),
    new ExpressionInfo(
      classOf[graft.operators.TopKPairs].getName, "top_k_pairs"),
    (children: Seq[Expression]) => {
      require(children.length == 3,
        s"top_k_pairs takes (score, id, k), got ${children.length} args")
      val k = children(2) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"top_k_pairs k must be a literal int, got $other")
      }
      graft.operators.TopKPairs(
        org.apache.spark.sql.catalyst.expressions.Cast(children.head,
          org.apache.spark.sql.types.DoubleType),
        org.apache.spark.sql.catalyst.expressions.Cast(children(1),
          org.apache.spark.sql.types.LongType), k)
    })

  /** `unicode_normalize(text, 'NFC')` — the codegen'd normalization
    * Expression (q121's kernel); form must be a literal string (it
    * resolves the Normalizer.Form at plan time). */
  val unicodeNormalize: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("unicode_normalize"),
    new ExpressionInfo(
      classOf[graft.functions.UnicodeNormalize].getName, "unicode_normalize"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"unicode_normalize takes (text, form), got ${children.length} args")
      val form = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
            if v != null => v.toString
        case other => throw new IllegalArgumentException(
          s"unicode_normalize form must be a literal string, got $other")
      }
      graft.functions.UnicodeNormalize(children.head, form)
    })

  /** `bounded_collect(id, cap)` — the hard-capped collect aggregate
    * (exact count + at most cap members inside the buffer; the LSH
    * degenerate-bucket guard); cap must be a literal int. */
  val boundedCollect: (FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression) = (
    FunctionIdentifier("bounded_collect"),
    new ExpressionInfo(
      classOf[graft.operators.BoundedCollectLong].getName, "bounded_collect"),
    (children: Seq[Expression]) => {
      require(children.length == 2,
        s"bounded_collect takes (id, cap), got ${children.length} args")
      val cap = children(1) match {
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
        case other => throw new IllegalArgumentException(
          s"bounded_collect cap must be a literal int, got $other")
      }
      graft.operators.BoundedCollectLong(
        org.apache.spark.sql.catalyst.expressions.Cast(children.head,
          org.apache.spark.sql.types.LongType), cap)
    })

  /** Register on an already-built session (tests / notebooks that can't
    * set spark.sql.extensions before session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    Seq(cosineSimilarity, dotProduct, sqDistMicro, topKPairs,
      unicodeNormalize, boundedCollect).foreach {
      case (id, info, builder) =>
        spark.sessionState.functionRegistry
          .registerFunction(id, info, builder)
    }
}
