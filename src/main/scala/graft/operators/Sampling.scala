package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset sampling and splitting for training pipelines.
  *
  * [[hashSplit]] beats `randomSplit` for corpus work: membership is a
  * pure function of the row's ID, so splits are stable across runs,
  * cluster sizes, and re-partitioning — re-ingesting a grown corpus
  * keeps every old document in its old split (no eval contamination).
  * `randomSplit` re-draws membership whenever partitioning changes.
  *
  * [[stratified]] is `sampleBy`-shaped but hash-deterministic for the
  * same reason. All operators are narrow (no shuffle).
  */
object Sampling {

  /** Assign each row to a named split by hashing its id: buckets are
    * ten-thousandths of the hash space, weights are normalized.
    * Returns the frame with a `split` column. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0))
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .sliding(2).toSeq.zip(splits).map { case (Seq(lo, hi), (name, _)) =>
        (name, (lo * 10000).toLong, (hi * 10000).toLong)
      }
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(10000L))
    val splitCol = bounds.tail.foldLeft(
      when(bucket < bounds.head._3, bounds.head._1)) {
      case (acc, (name, _, hi)) => acc.when(bucket < hi, name)
    }.otherwise(bounds.last._1) // hash == upper edge rounding guard
    df.withColumn("split", splitCol)
  }

  /** Deterministic stratified sample: keeps ~`fraction(stratum)` of the
    * rows in each stratum, membership decided by the id hash. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    // operator-distinct salt: with the SAME hash as hashSplit, composing
    // the two is fully correlated (a 10% tail split then stratified(0.5)
    // keeps zero rows instead of half) — the salt makes them independent
    val bucket = pmod(xxhash64(lit("stratified"), col(idCol), lit(seed)), lit(10000L))
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(stratumCol) === stratum && bucket < (f * 10000).toLong)
    }
    df.filter(keep)
  }
}
