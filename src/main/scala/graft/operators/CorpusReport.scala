package graft.operators

import graft.functions.{ScalarFns, TextFns}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus profiling — the data-card numbers every curation pipeline
  * reports: per-source document counts, token totals, quality and
  * length distributions, with a rollup grand total.
  *
  * Engine-reproducible by construction: the mean quality is computed
  * as an exact rational over the 1e-4-quantized scores (a float AVG
  * would be summation-order-dependent), and the median token count
  * uses the p·(n−1) linear interpolation both Spark's `percentile`
  * and DuckDB's `quantile_cont` implement (the q53 precedent).
  *
  * One aggregation shuffle on the source key; the rollup adds its
  * grand-total pass inside the same hash aggregate. The per-doc
  * feature projection (tokenize + quality) is narrow.
  */
object CorpusReport {

  /** (source, n_docs, n_tokens, mean_quality, median_tokens,
    * max_tokens) per source plus exactly one 'ALL' rollup row
    * (distinguished by `grouping()`, so a NULL source VALUE reports as
    * its own '(none)' group instead of colliding with the total).
    * NULL text counts as a zero-token doc with quality 0 (the score's
    * own convention).
    */
  def bySource(docs: DataFrame, textCol: String,
               sourceCol: String): DataFrame = {
    val perDoc = docs.select(
      col(sourceCol).as("__src"),
      coalesce(TextFns.tokenCount(col(textCol)), lit(0)).cast("long").as("__nt"),
      // quality is k/10000 with k integer by construction — recover k
      // exactly so the mean is integer arithmetic
      coalesce(round(TextFns.qualityScore(col(textCol)) * 10000), lit(0.0))
        .cast("long").as("__q"))
    perDoc
      .rollup(col("__src"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        // mean over the 1e-4-quantized scores, half-up, computed as
        // (2·Σk + n) div (2n) — the ×10⁴-cancelled form of
        // roundFrac(Σk, n·10⁴, 4): Σk ≤ n·10⁴, so the numerator stays
        // < 2^63 out to ~4.6e14 documents where the uncancelled form
        // would overflow (ANSI ArithmeticException) near 5e10 on the
        // grand-total row
        (ScalarFns.intDiv(sum(col("__q")) * 2 + count(lit(1)),
          count(lit(1)) * 2).cast("double") / 10000.0).as("mean_quality"),
        expr("percentile(__nt, 0.5)").as("median_tokens"),
        max(col("__nt")).as("max_tokens"),
        grouping(col("__src")).as("__total"))
      .select(
        when(col("__total") === 1, "ALL")
          .otherwise(coalesce(col("__src"), lit("(none)"))).as("source"),
        col("n_docs"), col("n_tokens"), col("mean_quality"),
        col("median_tokens"), col("max_tokens"))
  }
}
