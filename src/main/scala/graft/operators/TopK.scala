package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k operators (SURVEY.md O2 generalized per §2.7).
  *
  * Scale notes:
  *  - [[global]] relies on Catalyst planning `orderBy(...).limit(k)` as
  *    `TakeOrderedAndProject`: per-partition heap of size k + driver
  *    merge of p·k rows — never a global sort. Keep k ≪ 10⁶.
  *  - [[perGroup]] uses row_number over a partitioned window: one
  *    shuffle on the group key; rank-filter is applied before any
  *    downstream join so only k rows per group survive the stage.
  */
object TopK {

  /** Global top-k with caller-supplied total order (include tie-breakers
    * for determinism). Planned as TakeOrderedAndProject. */
  def global(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Top-k rows per group. `order` must be a total order within a group
    * (add a unique id as the last key for determinism). */
  def perGroup(df: DataFrame, partitionCols: Seq[String], k: Int,
               order: Column*): DataFrame = {
    val w = Window.partitionBy(partitionCols.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
