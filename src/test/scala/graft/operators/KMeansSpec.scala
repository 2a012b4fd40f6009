package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the integer-exact Lloyd k-means: seed
  * draw at iters=0, one-round centroid means, the empty-cluster carry
  * rule, assignment tie-breaks, and partitioning independence. q107
  * carries the full two-round DuckDB oracle check.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  private val A = Seq(0.0f, 0.0f)
  private val B = Seq(1.0f, 1.0f)

  test("fit(iters=0) returns the portable seed draw, cids 1..k in rank order") {
    val df = Seq((1L, A), (2L, B), (3L, Seq(2.0f, 2.0f)))
      .toDF("id", "vec")
    val m = KMeans.fit(df, "id", "vec", k = 2, iters = 0)
    m.map(_._1) shouldBe Seq(1, 2)
    // the seeds are actual corpus vectors in micro space
    val micro = Set(Seq(0L, 0L), Seq(1000000L, 1000000L), Seq(2000000L, 2000000L))
    m.foreach(c => micro should contain(c._2))
  }

  test("one Lloyd round: centroid moves to the exact truncating integer mean") {
    // force the partition: k=1 — every point joins the single cluster,
    // centroid = (Σv div n) per element: mean of (0,0),(1,1),(2,2) ->
    // (1e6, 1e6); with (0,0),(1,1) -> (500000, 500000)
    val df = Seq((1L, A), (2L, B)).toDF("id", "vec")
    val m = KMeans.fit(df, "id", "vec", k = 1, iters = 1)
    m shouldBe Seq((1, Seq(500000L, 500000L)))
  }

  test("empty-cluster carry: a centroid that loses all members keeps its value") {
    // k = n with a duplicate pair: both copies tie to the smaller cid,
    // leaving one seed memberless — it must survive the round unchanged
    val df = Seq((1L, Seq(2.0f, 2.0f)), (2L, Seq(2.0f, 2.0f)),
      (3L, Seq(10.0f, 10.0f))).toDF("id", "vec")
    val m = KMeans.fit(df, "id", "vec", k = 3, iters = 1)
    m.map(_._1) shouldBe Seq(1, 2, 3)
    m.map(_._2).sortBy(_.head) shouldBe Seq(
      Seq(2000000L, 2000000L), Seq(2000000L, 2000000L),
      Seq(10000000L, 10000000L))
    // and one of the duplicate-pair centroids is memberless
    val sizes = KMeans.assign(df, "id", "vec", m)
      .groupBy("cluster").count().as[(Int, Long)].collect().toMap
    sizes.values.sum shouldBe 3L
    sizes.keySet.size shouldBe 2 // one empty cluster attracts nobody
  }

  test("assign: exact integer distances, ties to the smallest cid") {
    val model: KMeans.Model =
      Seq((1, Seq(0L, 0L)), (2, Seq(2000000L, 0L)), (3, Seq(0L, 0L)))
    val df = Seq((7L, Seq(0.0f, 0.0f)), (8L, Seq(1.0f, 0.0f)))
      .toDF("id", "vec")
    val out = KMeans.assign(df, "id", "vec", model)
      .orderBy("id").as[(Long, Int, Long)].collect()
    // id 7 sits ON centroids 1 and 3 — smallest cid wins
    out(0) shouldBe ((7L, 1, 0L))
    // id 8 is equidistant (1e6²) from centroids 1, 2, and 3
    out(1) shouldBe ((8L, 1, 1000000L * 1000000L))
  }

  test("assign excludes NULL and NULL-element vectors (ANN contract)") {
    val df = Seq((1L, Seq(0.0f, 0.0f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("id", "vec")
      .union(Seq((3L, Seq(Some(1.0f), None))).toDF("id", "vec")
        .select(col("id"), col("vec").cast("array<float>")))
    val out = KMeans.assign(df, "id", "vec", Seq((1, Seq(0L, 0L))))
    out.select("id").as[Long].collect().toSet shouldBe Set(1L)
  }

  test("Lloyd rounds tighten cells: trained centroids beat the raw seed draw") {
    // the reason the IVF family wants fit at all: total within-cell
    // spread after 2 rounds must undercut the corpus-point draw
    val emb = graft.Tables.embeddings(spark, sfDir)
    def cost(iters: Int): Long = {
      val m = KMeans.fit(emb, "vec_id", "embedding", k = 8, iters = iters)
      KMeans.assign(emb, "vec_id", "embedding", m)
        .agg(sum(col("dist_sq_micro"))).collect()(0).getLong(0)
    }
    assert(cost(2) < cost(0))
  }

  test("trained IVF beats the hashed draw: higher recall@3 at equal nCells/nProbe") {
    // the r6 verdict's remaining ANN nuance, now measured in-tree:
    // data-dependent centroids follow the density, so at identical
    // cell/probe budgets the trained quantizer must recall strictly
    // more of the brute-force truth. Both paths are deterministic
    // (portable ranks, integer kmeans), so these are fixed numbers,
    // not flaky statistics: hashed ≈ 0.433, trained ≈ 0.541 at
    // nProbe=2 on this corpus.
    val e = graft.Tables.embeddings(spark, sfDir)
    val exact = graft.operators.Similarity
      .bruteForceTopK(e, e, "vec_id", "embedding", 3)
      .select(col("q_id"), col("c_id")).persist()
    val denom = exact.count().toDouble
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      exact.join(ann.select(col("q_id"), col("c_id")),
        Seq("q_id", "c_id"), "left_semi").count() / denom
    val hashed = recall(graft.operators.Similarity
      .ivfTopK(e, "vec_id", "embedding", 3, nCells = 22, nProbe = 2))
    val trained = recall(graft.operators.Similarity
      .ivfTopKTrained(e, "vec_id", "embedding", 3, nCells = 22,
        nProbe = 2, iters = 4))
    assert(trained > hashed,
      s"trained recall $trained must beat hashed $hashed")
    trained should be >= 0.5
    exact.unpersist()
  }

  test("two-level quantizer: beats the hashed draw at equal cells; invariants hold") {
    // the scale path past the literal-centroid cap: supers literal,
    // subs a relation. Deterministic, so these are pinned numbers:
    // two-level ≈ 0.495 vs hashed ≈ 0.433 at ~equal cell count
    // (flat-trained 0.541 remains the small-K winner — the two-level
    // trade buys the n·√K assignment shape, not extra recall)
    val e = graft.Tables.embeddings(spark, sfDir)
    val exact = graft.operators.Similarity
      .bruteForceTopK(e, e, "vec_id", "embedding", 3)
      .select(col("q_id"), col("c_id")).persist()
    val denom = exact.count().toDouble
    def recall(ann: org.apache.spark.sql.DataFrame): Double =
      exact.join(ann.select(col("q_id"), col("c_id")),
        Seq("q_id", "c_id"), "left_semi").count() / denom
    val hashed = recall(graft.operators.Similarity
      .ivfTopK(e, "vec_id", "embedding", 3, nCells = 22, nProbe = 2))
    val two = recall(graft.operators.Similarity
      .ivfTopKTwoLevel(e, "vec_id", "embedding", 3, nCells = 22,
        nProbe = 2, superProbe = 2, iters = 2))
    assert(two > hashed, s"two-level recall $two must beat hashed $hashed")
    exact.unpersist()

    val cells = graft.operators.Similarity
      .ivfCellsTwoLevel(e, "vec_id", "embedding", nCells = 22, nProbe = 2)
    // exactly nProbe cells per vector, ids inside 1..nSuper·nSub (5·5)
    val perId = cells.groupBy("id").count()
      .agg(min("count"), max("count")).collect()(0)
    perId.getLong(0) shouldBe 2L
    perId.getLong(1) shouldBe 2L
    val range = cells.agg(min("cell"), max("cell")).collect()(0)
    assert(range.getInt(0) >= 1 && range.getInt(1) <= 25)
    // deterministic across input partitioning
    val again = graft.operators.Similarity
      .ivfCellsTwoLevel(e.repartition(13), "vec_id", "embedding",
        nCells = 22, nProbe = 2)
    rows(cells.exceptAll(again)) shouldBe empty
    rows(again.exceptAll(cells)) shouldBe empty
  }

  test("two-level degenerates: nCells=1, nProbe past the cell count, all-NULL corpus fails loudly") {
    import graft.operators.Similarity
    val df = (0L until 40L)
      .map(i => (i, Array.tabulate(4)(j => ((i + j) % 5).toFloat)))
      .toDF("id", "vec")
    // one super, one sub: every vector lands in cell 1
    val one = Similarity.ivfCellsTwoLevel(df, "id", "vec", nCells = 1,
      nProbe = 1, superProbe = 1, iters = 1)
    one.select(countDistinct(col("cell"))).collect()(0).getLong(0) shouldBe 1L
    one.count() shouldBe 40L
    // nProbe beyond the total cell count clamps instead of erroring
    val clamped = Similarity.ivfCellsTwoLevel(df, "id", "vec", nCells = 4,
      nProbe = 99, superProbe = 99, iters = 1)
    clamped.groupBy("id").count()
      .agg(max("count")).collect()(0).getLong(0) should be <= 4L
    // a corpus with no valid vectors must fail loudly, not emit cells
    val allNull = Seq((1L, null.asInstanceOf[Array[Float]]))
      .toDF("id", "vec")
    val ex = intercept[Exception] {
      Similarity.ivfCellsTwoLevel(allNull, "id", "vec", nCells = 2,
        nProbe = 1, iters = 0).collect()
    }
    ex.getMessage.toLowerCase should include("empty")
  }

  test("fit is independent of input partitioning") {
    val df = (0L until 40L).map(i => (i, Seq((i % 7).toFloat, (i % 3).toFloat)))
      .toDF("id", "vec")
    val a = KMeans.fit(df, "id", "vec", k = 4, iters = 2)
    val b = KMeans.fit(df.repartition(13), "id", "vec", k = 4, iters = 2)
    a shouldBe b
  }
}
