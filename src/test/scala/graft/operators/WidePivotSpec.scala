package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Wide-pivot stress: the reference's heaviest shape is a top-1000
  * domain crosstab (features.scala:36,50) — verify the matrix builders
  * and array packing hold at a hundreds-of-columns width, not just the
  * 5-value event-type pivots the oracle queries use.
  */
class WidePivotSpec extends SparkSpec {

  test("200-column count matrix: schema, totals, and array packing") {
    val e = Tables.events(spark, sfDir)
      .withColumn("k", concat(lit("d"),
        lpad(pmod(col("event_id"), lit(200)).cast("string"), 3, "0")))
    val values = (0 until 200).map(i => f"d$i%03d")
    val m = PivotMatrix.countMatrix(e, "user_id", "k", values)
    m.columns.length shouldBe 201
    // total counts preserved across the pivot
    val pivotTotal = m.select(
      values.map(v => sum(col(v))).reduce(_ + _).as("t")).collect()(0).getLong(0)
    pivotTotal shouldBe e.count()
    // pack the 200 counts into one feature vector (features.scala:56-59)
    val packed = m.select(col("user_id"), array(values.map(col): _*).as("vec"))
    val row = packed.orderBy("user_id").limit(1).collect()(0)
    row.getSeq[Long](1).length shouldBe 200
    row.getSeq[Long](1).sum should be > 0L
  }

  test("wide pivot round-trips through unpivot") {
    val e = Tables.events(spark, sfDir)
      .withColumn("k", concat(lit("d"),
        lpad(pmod(col("event_id"), lit(100)).cast("string"), 3, "0")))
    val values = (0 until 100).map(i => f"d$i%03d")
    val wide = PivotMatrix.countMatrix(e, "user_id", "k", values)
    val long = PivotMatrix.unpivotMatrix(wide, "user_id", values, "k", "n")
      .filter(col("n") > 0)
    val expected = e.groupBy("user_id", "k").agg(count(lit(1)).as("n"))
    rows(long.exceptAll(expected)) shouldBe empty
    rows(expected.exceptAll(long)) shouldBe empty
  }
}
