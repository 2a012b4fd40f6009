package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys — the techniques AQE's skew-join
  * splitting can't always apply (e.g. the build side must broadcast
  * per-salt, or the skew is in an aggregation, not a join).
  *
  * Scale notes: a single hot key (null ids, "unknown" domains, bot
  * users) puts its entire payload in ONE task at 100 TB. Salting fans a
  * hot key across `salts` tasks at the cost of replicating the other
  * side `salts`×, so apply it to the skewed subset only when the dim
  * side is large (see [[saltedJoin]]'s replication note).
  */
object SkewOps {

  /** Inner equi-join with a salted key: every fact row gets a
    * content-derived salt in [0, salts); the dim side is replicated once
    * per salt value so each (key, salt) bucket joins locally.
    *
    * The salt is derived by hashing ALL fact columns — deterministic
    * (re-runs give identical plans/results; no RNG state on executors)
    * while still spreading rows of the same hot key. Result equals the
    * plain inner join row-for-row. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0)
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.toIndexedSeq.map(col): _*)), lit(salts)).cast("int"))
    val replicatedDim = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit): _*)))
    saltedFact.join(replicatedDim, Seq(key, "__salt"))
      .drop("__salt")
  }

  /** Two-phase aggregation for skewed COUNT DISTINCT: phase 1 reduces
    * (key, value) pairs — spreading a hot key across tasks by the value
    * hash — phase 2 counts per key. Equal to
    * `groupBy(key).agg(countDistinct(value))` without funneling a hot
    * key's whole value set through one task's hash set. */
  def twoPhaseCountDistinct(df: DataFrame, key: String, value: String): DataFrame =
    df.select(col(key), col(value)).distinct()
      .groupBy(col(key))
      // count(col) skips the (key, NULL) row distinct() may keep, so a
      // NULL value never counts as distinct — exactly countDistinct —
      // while keys whose values are all NULL still appear with 0.
      .agg(count(col(value)).as(s"n_distinct_$value"))

  /** Two-phase sum for a skewed group key: partial sums on
    * (key, salt) — map-side combine already bounds this, so the win is
    * only for NON-algebraic aggregates; kept as the pattern's canonical
    * shape with sum as the demonstrator. */
  def saltedSum(df: DataFrame, key: String, value: String,
                salts: Int): DataFrame =
    df.withColumn("__salt",
        pmod(xxhash64(col(value)), lit(salts)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(value)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$value"))
}
