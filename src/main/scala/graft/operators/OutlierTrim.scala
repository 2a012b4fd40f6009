package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-group statistical outlier trimming — the corpus-curation step
  * that drops length/size outliers (truncated fragments, concatenation
  * blobs) before training, per language or per source.
  *
  * Tukey fences: keep rows whose value lies within
  * [q1 − k·iqr, q3 + k·iqr]. Quartiles (p = 0.25/0.75) are chosen over
  * p05/p95 deliberately: the rank position p·(n−1) is then an exact
  * dyadic double, so the interpolated fence is bit-identical across
  * engines and a row AT a fence can never flip in or out between this
  * implementation and an external verifier (0.05·(n−1) has no exact
  * binary representation; quartiles do).
  *
  * 100 TB design: one exact-percentile aggregate per group produces a
  * GROUP-CARDINALITY-sized fence table (languages, sources — thousands
  * at most), which broadcasts; the trim itself is then a narrow
  * broadcast-hash-join + filter over the corpus scan — no corpus
  * shuffle at any scale. Exact `percentile` builds a value→count map
  * per group, fine for bounded-domain values (lengths, counts); for
  * unbounded continuous domains swap in `percentile_approx`, same
  * plan shape.
  */
object OutlierTrim {

  /** Fences per group: (groupCol, q1, q3, lo, hi). */
  def tukeyFences(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 1.5): DataFrame = {
    val iqr = col("q3") - col("q1")
    df.groupBy(col(groupCol))
      .agg(
        percentile(col(valueCol), lit(0.25)).as("q1"),
        percentile(col(valueCol), lit(0.75)).as("q3"))
      .select(col(groupCol), col("q1"), col("q3"),
        (col("q1") - lit(k) * iqr).as("lo"),
        (col("q3") + lit(k) * iqr).as("hi"))
  }

  /** Keep rows with valueCol inside the group's Tukey fences. Schema is
    * unchanged (fence columns are dropped after the filter).
    * NULL-group rows are DROPPED (the equi-join cannot match them) and
    * NULL values fail both fence comparisons — treat both as "not
    * provably inlying"; pre-bucket NULL groups if they must survive. */
  def tukey(df: DataFrame, groupCol: String, valueCol: String,
            k: Double = 1.5): DataFrame = {
    val fences = tukeyFences(df, groupCol, valueCol, k)
      .select(col(groupCol), col("lo"), col("hi"))
    df.join(broadcast(fences), Seq(groupCol))
      .filter(col(valueCol) >= col("lo") && col(valueCol) <= col("hi"))
      .drop("lo", "hi")
      .select(df.columns.toIndexedSeq.map(col): _*)
  }
}
