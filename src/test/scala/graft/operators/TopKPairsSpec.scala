package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge

/** The native TypedImperativeAggregate top-k must agree with the udaf
  * Aggregator form ([[TopKAgg]]) on every input — they are differential
  * twins; Similarity runs the native one. */
class TopKPairsSpec extends SparkSpec {
  import spark.implicits._

  private def runNative(rows: Seq[(String, Double, Long)], k: Int) =
    rows.toDF("g", "score", "id")
      .groupBy("g")
      .agg(TopKPairs.topK(k)(col("score"), col("id")).as("nn"))
      .select(col("g"), posexplode(col("nn")).as(Seq("pos", "p")))
      .select(col("g"), col("pos"), col("p.sim").as("score"), col("p.id").as("id"))
      .orderBy("g", "pos")
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getLong(3))).toSeq

  private def runUdaf(rows: Seq[(String, Double, Long)], k: Int) =
    rows.toDF("g", "score", "id")
      .groupBy("g")
      .agg(TopKAgg.topK(k)(col("score"), col("id")).as("nn"))
      .select(col("g"), posexplode(col("nn")).as(Seq("pos", "p")))
      .select(col("g"), col("pos"), col("p._1").as("score"), col("p._2").as("id"))
      .orderBy("g", "pos")
      .collect().map(r => (r.getString(0), r.getDouble(2), r.getLong(3))).toSeq

  test("keeps the k best, score desc, ties by id asc") {
    runNative(Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("a", 2.0, 3L)), 2) shouldBe
      Seq(("a", 3.0, 2L), ("a", 2.0, 3L))
    runNative(Seq(("a", 5.0, 9L), ("a", 5.0, 2L), ("a", 5.0, 7L)), 2) shouldBe
      Seq(("a", 5.0, 2L), ("a", 5.0, 7L))
  }

  test("fewer rows than k returns all, ordered") {
    runNative(Seq(("a", 1.0, 1L), ("a", 2.0, 2L)), 10) shouldBe
      Seq(("a", 2.0, 2L), ("a", 1.0, 1L))
  }

  test("null scores and ids are skipped, not ranked") {
    val df = Seq[(String, Option[Double], Option[Long])](
      ("a", Some(3.0), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(9.0), None), ("a", Some(1.0), Some(4L)))
      .toDF("g", "score", "id")
    val out = df.groupBy("g")
      .agg(TopKPairs.topK(2)(col("score"), col("id")).as("nn"))
      .select(explode(col("nn")).as("p"))
      .select(col("p.sim"), col("p.id"))
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSeq
    out shouldBe Seq((3.0, 1L), (1.0, 4L))
  }

  test("merge path (32 partitions) agrees with single partition") {
    val data = (1 to 5000).map(i => ("g", (i % 97).toDouble, i.toLong))
    def run(parts: Int) = {
      val base = data.toDF("g", "score", "id")
      val df = if (parts == 1) base.coalesce(1) else base.repartition(parts)
      df.groupBy("g").agg(TopKPairs.topK(5)(col("score"), col("id")).as("nn"))
        .select(explode(col("nn")).as("p"))
        .select(col("p.sim"), col("p.id")).collect().map(_.toSeq).toSeq
    }
    run(32) shouldBe run(1)
    run(32).head shouldBe Seq(96.0, 96L)
  }

  test("differential: native ≡ udaf on seeded random inputs (NaN rows planted)") {
    val rnd = new scala.util.Random(7)
    (1 to 10).foreach { _ =>
      val n = 1 + rnd.nextInt(60)
      val rows = Seq.fill(n)((
        Seq("a", "b", "c")(rnd.nextInt(3)),
        // coarse grid forces score ties so the tie-break path is hit;
        // ~1-in-10 NaN exercises the skip path in BOTH aggregates (a NaN
        // admitted to the last slot would poison the whole group's top-k)
        if (rnd.nextInt(10) == 0) Double.NaN else (rnd.nextInt(9) - 4).toDouble,
        rnd.nextInt(50).toLong))
      val k = 1 + rnd.nextInt(6)
      runNative(rows, k) shouldBe runUdaf(rows, k)
    }
  }

  test("NaN scores are skipped and cannot block later genuine scores") {
    // k=1: the NaN arrives first — if admitted it would reject 3.0 forever
    runNative(Seq(("a", Double.NaN, 1L), ("a", 3.0, 2L), ("a", 1.0, 3L)), 1) shouldBe
      Seq(("a", 3.0, 2L))
    runUdaf(Seq(("a", Double.NaN, 1L), ("a", 3.0, 2L), ("a", 1.0, 3L)), 1) shouldBe
      Seq(("a", 3.0, 2L))
    // all-NaN group -> empty result, not a NaN row
    runNative(Seq(("a", Double.NaN, 1L), ("a", Double.NaN, 2L)), 2) shouldBe empty
  }

  test("serialize/deserialize round-trips the buffer") {
    val agg = TopKPairs(Bridge.expression(lit(0.0)), Bridge.expression(lit(0L)), 3)
    val buf = new TopKPairsBuffer(3)
    buf.insert(1.5, 10L); buf.insert(2.5, 20L); buf.insert(0.5, 30L)
    buf.insert(3.5, 40L) // evicts 0.5
    val rt = agg.deserialize(agg.serialize(buf))
    rt.n shouldBe 3
    rt.scores.take(3).toSeq shouldBe Seq(3.5, 2.5, 1.5)
    rt.ids.take(3).toSeq shouldBe Seq(40L, 20L, 10L)
  }
}
