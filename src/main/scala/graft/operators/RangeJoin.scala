package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval (range) join: match fact rows whose scalar falls inside a
  * dim interval [lo, hi) — IP→geo, value→tier, time→session lookups.
  *
  * Spark plans a raw `value >= lo && value < hi` condition as a
  * nested-loop join (O(|fact|·|dim|) probes). [[binned]] rewrites it
  * as an EQUI-join on a bin id: each interval explodes into the fixed
  * `binWidth` bins it covers, each fact row maps to one bin, the join
  * is hash-based, and the residual range predicate filters bin-edge
  * false positives. Work becomes O(|fact| + |dim|·bins-per-interval)
  * — the standard trick that keeps interval lookups linear at 100 TB.
  * Choose binWidth near the median interval width: too small explodes
  * the dim side, too large degrades toward the cross product.
  */
object RangeJoin {

  /** @param fact     rows with a scalar `valueCol`
    * @param dim      rows with [loCol, hiCol) intervals (hi exclusive)
    * @param binWidth bin size in value units */
  def binned(fact: DataFrame, dim: DataFrame, valueCol: String,
             loCol: String, hiCol: String, binWidth: Double): DataFrame = {
    require(binWidth > 0)
    val dimBinned = dim.withColumn("__bin",
      explode(sequence(
        floor(col(loCol) / binWidth).cast("long"),
        // hi is exclusive: an interval ending exactly on a bin edge
        // does not cover that bin
        ceil(col(hiCol) / binWidth).cast("long") - 1)))
    val factBinned = fact.withColumn("__bin",
      floor(col(valueCol) / binWidth).cast("long"))
    factBinned.join(dimBinned, Seq("__bin"))
      .filter(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__bin")
  }
}
