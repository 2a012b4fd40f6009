package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PivotMatrixSpec extends SparkSpec {
  import spark.implicits._

  private lazy val events = Seq(
    (1L, "view"), (1L, "view"), (1L, "buy"),
    (2L, "view"),
    (3L, "buy"), (3L, "click")
  ).toDF("uid", "etype")
  private val values = Seq("buy", "click", "view")

  test("countMatrix: deterministic sorted columns, zeros filled") {
    val m = PivotMatrix.countMatrix(events, "uid", "etype", values).orderBy("uid")
    m.columns.toSeq shouldBe Seq("uid", "buy", "click", "view")
    rows(m).map(_.toSeq) shouldBe Seq(
      Seq(1L, 1L, 0L, 2L), Seq(2L, 0L, 0L, 1L), Seq(3L, 1L, 1L, 0L))
  }

  test("countMatrix with prefix renames value columns") {
    PivotMatrix.countMatrix(events, "uid", "etype", values, "ev_")
      .columns.toSeq shouldBe Seq("uid", "ev_buy", "ev_click", "ev_view")
  }

  test("presenceMatrix is 0/1") {
    val m = PivotMatrix.presenceMatrix(events, "uid", "etype", values).orderBy("uid")
    rows(m).map(_.toSeq) shouldBe Seq(
      Seq(1L, 1, 0, 1), Seq(2L, 0, 0, 1), Seq(3L, 1, 1, 0))
  }

  test("pivot → unpivot round-trips to the grouped long form") {
    val wide = PivotMatrix.countMatrix(events, "uid", "etype", values)
    val long = PivotMatrix.unpivotMatrix(wide, "uid", values, "etype", "n")
      .filter(col("n") > 0)
    val expected = events.groupBy("uid", "etype").agg(count(lit(1)).as("n"))
    rows(long.exceptAll(expected)) shouldBe empty
    rows(expected.exceptAll(long)) shouldBe empty
  }

  test("mergeMatrices sums overlapping columns, keeps all keys (union of schemas)") {
    val a = Seq((1L, 2L, 1L), (2L, 1L, 0L)).toDF("uid", "view", "buy")
    val b = Seq((2L, 3L, 5L), (9L, 1L, 1L)).toDF("uid", "view", "click")
    val m = PivotMatrix.mergeMatrices(a, b, "uid").orderBy("uid")
    m.columns.toSeq shouldBe Seq("uid", "buy", "click", "view")
    rows(m).map(_.toSeq) shouldBe Seq(
      Seq(1L, 1L, 0L, 2L),
      Seq(2L, 0L, 5L, 4L),
      Seq(9L, 0L, 1L, 1L))
  }

  test("distinctValues returns sorted distinct non-null values") {
    val withNull = events.union(Seq((9L, null.asInstanceOf[String])).toDF("uid", "etype"))
    PivotMatrix.distinctValues(withNull, "etype") shouldBe Seq("buy", "click", "view")
  }
}
