package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, Double, Long)], k: Int) =
    rows.toDF("g", "score", "id")
      .groupBy("g")
      .agg(TopKAgg.topK(k)(col("score"), col("id")).as("nn"))
      .select(col("g"), posexplode(col("nn")).as(Seq("pos", "p")))
      .select(col("g"), col("pos"), col("p._1").as("score"), col("p._2").as("id"))
      .orderBy("g", "pos")
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getLong(3))).toSeq

  test("keeps the k best, score desc") {
    val out = run(Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L)), 2)
    out shouldBe Seq(("a", 3.0, 2L), ("a", 2.0, 3L))
  }

  test("ties break by id ascending") {
    val out = run(Seq(("a", 5.0, 9L), ("a", 5.0, 2L), ("a", 5.0, 7L)), 2)
    out shouldBe Seq(("a", 5.0, 2L), ("a", 5.0, 7L))
  }

  test("fewer rows than k returns all, ordered") {
    val out = run(Seq(("a", 1.0, 1L), ("a", 2.0, 2L)), 10)
    out shouldBe Seq(("a", 2.0, 2L), ("a", 1.0, 1L))
  }

  test("partial-merge path agrees with single-partition result") {
    val data = (1 to 5000).map(i => ("g", (i % 97).toDouble, i.toLong))
    val manyParts = data.toDF("g", "score", "id").repartition(32)
      .groupBy("g").agg(TopKAgg.topK(5)(col("score"), col("id")).as("nn"))
      .select(explode(col("nn")).as("p"))
      .select(col("p._1"), col("p._2")).collect().map(_.toSeq).toSeq
    val onePart = data.toDF("g", "score", "id").coalesce(1)
      .groupBy("g").agg(TopKAgg.topK(5)(col("score"), col("id")).as("nn"))
      .select(explode(col("nn")).as("p"))
      .select(col("p._1"), col("p._2")).collect().map(_.toSeq).toSeq
    manyParts shouldBe onePart
    manyParts.head shouldBe Seq(96.0, 96L) // best score, smallest id among ties
  }
}
