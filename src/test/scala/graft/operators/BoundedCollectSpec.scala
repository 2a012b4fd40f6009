package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BoundedCollectSpec extends SparkSpec {
  import spark.implicits._

  private def agg(rows: Seq[(String, Long)], cap: Int, parts: Int = 1) = {
    val base = rows.toDF("g", "id")
    val df = if (parts == 1) base.coalesce(1) else base.repartition(parts)
    df.groupBy("g")
      .agg(BoundedCollectLong.boundedCollect(cap)(col("id")).as("bc"))
      .select(col("g"), col("bc.n"), col("bc.items"))
      .orderBy("g")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getSeq[Long](2).toSeq)).toSeq
  }

  test("small groups: exact count, all items, sorted") {
    agg(Seq(("a", 3L), ("a", 1L), ("a", 2L), ("b", 9L)), cap = 10) shouldBe
      Seq(("a", 3L, Seq(1L, 2L, 3L)), ("b", 1L, Seq(9L)))
  }

  test("oversized group: count stays exact, storage hard-capped") {
    val out = agg((1L to 50L).map(i => ("a", i)), cap = 5)
    out.head._2 shouldBe 50L           // exact count
    out.head._3.length shouldBe 5      // buffer never exceeded cap
    out.head._3 shouldBe out.head._3.sorted
  }

  test("merge across partitions preserves the exact count and the cap") {
    val out = agg((1L to 1000L).map(i => ("a", i)), cap = 8, parts = 32)
    out.head._2 shouldBe 1000L
    out.head._3.length shouldBe 8
    // all partitions agree with the single-partition count
    agg((1L to 1000L).map(i => ("a", i)), cap = 8).head._2 shouldBe 1000L
  }

  test("nulls are skipped") {
    val out = Seq[(String, Option[Long])](("a", Some(1L)), ("a", None))
      .toDF("g", "id")
      .groupBy("g")
      .agg(BoundedCollectLong.boundedCollect(4)(col("id")).as("bc"))
      .select(col("bc.n"), col("bc.items")).collect()(0)
    out.getLong(0) shouldBe 1L
    out.getSeq[Long](1) shouldBe Seq(1L)
  }

  test("int input coerces to long via the Column builder") {
    val out = Seq(("a", 7), ("a", 3)).toDF("g", "id")
      .groupBy("g")
      .agg(BoundedCollectLong.boundedCollect(4)(col("id")).as("bc"))
      .select(col("bc.items")).collect()(0).getSeq[Long](0)
    out shouldBe Seq(3L, 7L)
  }
}
