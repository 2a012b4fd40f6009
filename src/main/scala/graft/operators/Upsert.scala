package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-level incremental maintenance: merge an update batch into a
  * snapshot (the reference's update-mode pattern,
  * users_items.scala:59-89, generalized from its additive matrix merge
  * — PivotMatrix.mergeMatrices — to last-write-wins row semantics).
  *
  * Scale: ONE shuffle on the key for the union, then a per-key
  * row_number pick — no driver state, no per-row lookups. At 100 TB
  * the snapshot side dominates; a production deployment would bucket
  * both sides on the key so the union-shuffle degenerates to a local
  * sort (see BucketedOps), which this composes with unchanged.
  */
object Upsert {

  /** Last-write-wins merge of `updates` into `snapshot`: per key keep
    * the row with the highest version; a version tie is won by the
    * update batch (the row that arrived later). Schemas must match. */
  def lastWriteWins(snapshot: DataFrame, updates: DataFrame,
                    keyCols: Seq[String], versionCol: String): DataFrame = {
    val tagged = snapshot.withColumn("__gen", lit(0))
      .unionByName(updates.withColumn("__gen", lit(1)))
    TopK.perGroup(tagged, keyCols, 1,
        col(versionCol).desc, col("__gen").desc)
      .drop("__gen")
  }
}
