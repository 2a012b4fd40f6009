package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pivot / unpivot matrix builders generalizing the reference's central
  * crosstab pattern (SURVEY.md A3/A4: users_items.scala:59-80,
  * features.scala:50,81-89, data_mart.scala:114,126).
  *
  * Scale notes:
  *  - Pivot values are ALWAYS caller-supplied. The reference's
  *    value-less `pivot(col)` runs a hidden distinct+collect to the
  *    driver — O(distinct) driver memory, a silent job, and a
  *    nondeterministic column order. At 100 TB both are unacceptable;
  *    use [[distinctValues]] once (an explicit, visible job) and reuse
  *    the sorted list across incremental runs.
  *  - A pivot over k values compiles to ONE hash aggregation with k
  *    conditional measures — a single shuffle on the group key, no
  *    per-value scans.
  */
object PivotMatrix {

  /** Explicit, sorted pivot-value discovery — the one driver round-trip,
    * made visible and cached by the caller. */
  def distinctValues(df: DataFrame, col: String): Seq[String] =
    df.select(col).na.drop().distinct()
      .collect().map(_.getString(0)).sorted.toSeq

  /** key × pivotCol count matrix with deterministic (sorted) columns:
    * one column per value, named `{prefix}{value}`, missing → 0.
    * Generalizes users_items.scala:77-80 / data_mart.scala:112-115. */
  def countMatrix(df: DataFrame, key: String, pivotCol: String,
                  values: Seq[String], prefix: String = ""): DataFrame = {
    val sorted = values.sorted
    val pivoted = df
      .groupBy(col(key))
      .pivot(pivotCol, sorted)
      .count()
      // fill ONLY the pivot value columns: a blanket fill would also
      // rewrite a NULL group KEY to 0, conflating e.g. anonymous
      // events with a real key 0
      .na.fill(0L, sorted)
    sorted.foldLeft(pivoted)((d, v) => d.withColumnRenamed(v, s"$prefix$v"))
  }

  /** 0/1 presence matrix (the users×items shape,
    * users_items.scala:77-80). */
  def presenceMatrix(df: DataFrame, key: String, pivotCol: String,
                     values: Seq[String], prefix: String = ""): DataFrame = {
    val counts = countMatrix(df, key, pivotCol, values, prefix)
    values.sorted.foldLeft(counts) { (d, v) =>
      val c = s"$prefix$v"
      d.withColumn(c, when(col(c) > 0, 1).otherwise(0))
    }
  }

  /** Long-form unpivot via native `unpivot` (Spark 3.4+; the reference
    * synthesized a `stack(...)` SQL string from df.columns,
    * users_items.scala:59-73 — same semantics, no string building). */
  def unpivotMatrix(df: DataFrame, idCol: String, valueCols: Seq[String],
                    varName: String = "item", valName: String = "value"): DataFrame =
    df.unpivot(Array(col(idCol)), valueCols.map(col).toArray, varName, valName)

  /** Merge two wide matrices by full outer join on the key, summing
    * overlapping value columns — the users_items "update" mode
    * (users_items.scala:85-101) without the unpivot/union round-trip:
    * a single shuffle on the key instead of unpivot→union→re-pivot. */
  def mergeMatrices(a: DataFrame, b: DataFrame, key: String): DataFrame = {
    val aCols = a.columns.filter(_ != key).toSet
    val bCols = b.columns.filter(_ != key).toSet
    val all = (aCols ++ bCols).toSeq.sorted
    val merged: Seq[Column] = all.map { c =>
      val l = if (aCols(c)) coalesce(a(c), lit(0L)) else lit(0L)
      val r = if (bCols(c)) coalesce(b(c), lit(0L)) else lit(0L)
      (l + r).as(c)
    }
    a.join(b, Seq(key), "outer").select(col(key) +: merged: _*)
  }
}
