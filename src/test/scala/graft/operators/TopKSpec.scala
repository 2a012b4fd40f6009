package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1L, 10.0), ("a", 2L, 30.0), ("a", 3L, 20.0),
    ("b", 4L, 5.0), ("b", 5L, 5.0), ("b", 6L, 1.0)
  ).toDF("grp", "id", "score")

  test("global top-k with tie-breaker") {
    rows(TopK.global(df, 3, col("score").desc, col("id").asc))
      .map(_.getLong(1)) shouldBe Seq(2L, 3L, 1L)
  }

  test("global top-k plans TakeOrderedAndProject, not a global sort") {
    val plan = TopK.global(df, 3, col("score").desc, col("id").asc)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("per-group top-k with deterministic ties") {
    val out = rows(TopK.perGroup(df, Seq("grp"), 2, col("score").desc, col("id").asc)
      .orderBy("grp", "id")).map(r => (r.getString(0), r.getLong(1)))
    out shouldBe Seq(("a", 2L), ("a", 3L), ("b", 4L), ("b", 5L))
  }

  test("per-group drops the helper rank column") {
    TopK.perGroup(df, Seq("grp"), 1, col("id").asc).columns.toSeq shouldBe
      Seq("grp", "id", "score")
  }
}
