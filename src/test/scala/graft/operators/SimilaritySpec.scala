package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("bruteForceTopK on hand-built vectors") {
    val vecs = Seq(
      (1L, Array(1f, 0f)),
      (2L, Array(0.9f, 0.1f)),   // closest to 1
      (3L, Array(0f, 1f))
    ).toDF("vec_id", "embedding")
    val out = rows(Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 1)
      .orderBy("q_id")).map(r => (r.getLong(0), r.getLong(1)))
    out shouldBe Seq((1L, 2L), (2L, 1L), (3L, 2L))
  }

  test("bruteForceTopK excludes self and returns exactly k ranks") {
    val e = Tables.embeddings(spark, sfDir).limit(30)
    val out = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
    rows(out.filter(col("q_id") === col("c_id"))) shouldBe empty
    val perQuery = rows(out.groupBy("q_id").agg(count(lit(1)).as("n"),
      max("rank").as("mr")))
    perQuery.foreach { r => r.getLong(1) shouldBe 3L; r.getInt(2) shouldBe 3 }
  }

  test("srpBuckets deterministic across invocations") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val b1 = rows(Similarity.srpBuckets(e, "vec_id", "embedding", 4, 8).orderBy("id", "table"))
    val b2 = rows(Similarity.srpBuckets(e, "vec_id", "embedding", 4, 8).orderBy("id", "table"))
    b1 shouldBe b2
  }

  test("srpBuckets UDF form ≡ HOF expression form, both hash families") {
    val e = Tables.embeddings(spark, sfDir).limit(50)
    val udfB = rows(Similarity.srpBuckets(e, "vec_id", "embedding", 4, 8)
      .orderBy("id", "table"))
    val hofB = rows(Similarity.srpBucketsHof(e, "vec_id", "embedding", 4, 8)
      .orderBy("id", "table"))
    udfB shouldBe hofB
    val udfP = rows(Similarity.srpBuckets(e, "vec_id", "embedding", 2, 4,
      Similarity.portablePlaneComponent).orderBy("id", "table"))
    val hofP = rows(Similarity.srpBucketsHof(e, "vec_id", "embedding", 2, 4,
      Similarity.portablePlaneComponent).orderBy("id", "table"))
    udfP shouldBe hofP
  }

  test("LSH top-k recall vs brute force on unclustered embeddings (few planes)") {
    // The testdata embeddings are unclustered random vectors: top-3
    // neighbors sit near cos≈0.3, so per-plane collision p≈0.6 —
    // planes must stay low for recall. p^4=0.13, 1-(1-p^4)^16 ≈ 0.9.
    val e = Tables.embeddings(spark, sfDir).limit(200)
    val exact = rows(Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
      .select("q_id", "c_id")).map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = rows(Similarity.lshTopK(e, "vec_id", "embedding", 3, tables = 16, planes = 4)
      .select("q_id", "c_id")).map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall too low")
  }

  test("LSH finds genuine near-duplicates with near-certain recall") {
    // Near-dup vectors (cos≈0.99): per-plane p≈0.97, recall ≈ 1 even
    // with 12 planes — the regime LSH dedup actually targets.
    val base = (0 until 16).map(i => math.sin(i * 1.7).toFloat).toArray
    val perturbed = base.zipWithIndex.map { case (v, i) => v + 0.02f * math.cos(i).toFloat }
    val noise = (1 to 60).map { s =>
      (100L + s, (0 until 16).map(i => math.sin(s * 31.7 + i * 2.3).toFloat).toArray)
    }
    val df = (Seq((1L, base), (2L, perturbed)) ++ noise).toDF("vec_id", "embedding")
    val out = rows(Similarity.lshTopK(df, "vec_id", "embedding", 1, tables = 8, planes = 12)
      .filter(col("q_id") === 1L).select("c_id"))
    out.map(_.getLong(0)) shouldBe Seq(2L)
  }

  test("IVF top-k recall vs brute force (unclustered data, generous probes)") {
    // Unclustered random vectors are IVF's worst case (cells are
    // arbitrary Voronoi regions, neighbors scatter across them) —
    // recall here is a floor, not the operator's typical regime.
    val e = Tables.embeddings(spark, sfDir).limit(200)
    val exact = rows(Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
      .select("q_id", "c_id")).map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = rows(Similarity.ivfTopK(e, "vec_id", "embedding", 3, nCells = 8, nProbe = 4)
      .select("q_id", "c_id")).map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.4, s"IVF recall $recall too low")
  }

  test("auto-sizing: suggestCells/suggestPlanes implement the SCALE.md rules") {
    // nCells = √n (assignment n·c vs within-cell n²/c balance point)
    Similarity.suggestCells(0L) shouldBe 1
    Similarity.suggestCells(100L) shouldBe 10
    Similarity.suggestCells(1000000L) shouldBe 1000
    // planes = log2(n/64) clamped to [6, 24] — the floor clears the
    // measured planes=4 coarse-bucket cliff (SCALE.md, 35.8s)
    Similarity.suggestPlanes(0L) shouldBe 6
    Similarity.suggestPlanes(8000L) shouldBe 7
    Similarity.suggestPlanes(1000000L) shouldBe 14
    (Similarity.suggestPlanes(Long.MaxValue) <= 24) shouldBe true
  }

  test("auto-sizing: nCells=0 / planes=0 reproduce the explicit-arg results") {
    val e = Tables.embeddings(spark, sfDir).limit(100)
    // 100 vectors → suggestCells = 10: the sentinel path must be
    // byte-identical to the caller writing 10 explicitly
    val auto = rows(Similarity.ivfTopK(e, "vec_id", "embedding", 2,
        nCells = 0, nProbe = 2,
        centroidRank = Similarity.portableCentroidRank)
      .orderBy("q_id", "rank"))
    val explicit = rows(Similarity.ivfTopK(e, "vec_id", "embedding", 2,
        nCells = 10, nProbe = 2,
        centroidRank = Similarity.portableCentroidRank)
      .orderBy("q_id", "rank"))
    auto shouldBe explicit
    // 100 vectors → suggestPlanes = 6
    val autoB = rows(Similarity.srpBuckets(e, "vec_id", "embedding",
        tables = 2, planes = 0).orderBy("id", "table"))
    val explicitB = rows(Similarity.srpBuckets(e, "vec_id", "embedding",
        tables = 2, planes = 6).orderBy("id", "table"))
    autoB shouldBe explicitB
  }

  test("IVF top-k returns ranked neighbors with sane similarity ordering") {
    val e = Tables.embeddings(spark, sfDir).limit(100)
    val out = rows(Similarity.ivfTopK(e, "vec_id", "embedding", 2, nCells = 8, nProbe = 2)
      .orderBy("q_id", "rank"))
    assert(out.nonEmpty)
    out.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      val sims = rs.sortBy(_.getInt(rs.head.fieldIndex("rank"))).map(_.getDouble(rs.head.fieldIndex("sim")))
      sims shouldBe sims.sorted.reverse
    }
  }

  test("semanticDedupeTrained: planted duplicate dropped greedy-by-id; survivors preserved") {
    val base = Tables.embeddings(spark, sfDir).limit(100)
    // vec 9001 = exact copy of vec 1's embedding: identical micro
    // vectors share a cluster by construction, so the pair is always
    // in one cell and the larger id must drop
    val dup = base.filter(col("vec_id") === 1)
      .select(lit(9001L).as("vec_id"), col("embedding"), col("label"))
    val kept = Similarity.semanticDedupeTrained(base.union(dup),
      "vec_id", "embedding", nCells = 4, iters = 2, threshold = 0.9999)
    val ids = kept.select("id").as[Long].collect().toSet
    ids should contain(1L)
    ids should not contain 9001L
    ids.size should be >= 99
    // every survivor is an input id with a valid trained cluster
    kept.select("cell").as[Int].collect().toSet.subsetOf((1 to 4).toSet) shouldBe true
  }

  test("hardNegatives: ceiling excises near-dup false negatives; cross-label only") {
    val base = Tables.embeddings(spark, sfDir).limit(60)
    // vec 9001 = exact copy of vec 1's embedding under a DIFFERENT
    // label — the classic false negative: cosine 1.0, cross-label
    val dup = base.filter(col("vec_id") === 1)
      .select(lit(9001L).as("vec_id"), col("embedding"), lit(999).as("label"))
    // vec 9002 = copy of vec 2 with a NULL label: unknown class, must
    // appear neither as anchor nor candidate
    val nullLbl = base.filter(col("vec_id") === 2)
      .select(lit(9002L).as("vec_id"), col("embedding"),
        lit(null).cast("int").as("label"))
    val df = base.union(dup).union(nullLbl)
    // nProbe = nCells: every vector probes every cell, so the planted
    // pairs are guaranteed candidates and the assertions are exact
    // ceiling off (1.1): the identical cross-label copy is rank-1
    val loose = Similarity.hardNegatives(df, "vec_id", "embedding", "label",
      k = 3, nCells = 4, nProbe = 4, ceiling = 1.1)
    val anchor1 = rows(loose.filter(col("q_id") === 1L).orderBy("rank"))
    anchor1.head.getLong(anchor1.head.fieldIndex("c_id")) shouldBe 9001L
    anchor1.head.getDouble(anchor1.head.fieldIndex("sim")) shouldBe 1.0 +- 1e-9
    // production default (0.95): the same pair is excised, anchor 1
    // still mines k negatives from the rest of the corpus
    val capped = Similarity.hardNegatives(df, "vec_id", "embedding", "label",
      k = 3, nCells = 4, nProbe = 4)
    rows(capped.filter(col("q_id") === 1L && col("c_id") === 9001L)) shouldBe empty
    rows(capped.filter(col("q_id") === 1L)).size shouldBe 3
    // cross-label invariant and NULL-label exclusion over the output
    val lbl = df.select(col("vec_id"), col("label"))
    val joined = capped
      .join(lbl.select(col("vec_id").as("q_id"), col("label").as("ql")), "q_id")
      .join(lbl.select(col("vec_id").as("c_id"), col("label").as("cl")), "c_id")
    rows(joined.filter(col("ql") === col("cl")
      || col("ql").isNull || col("cl").isNull)) shouldBe empty
    rows(capped.filter(col("q_id") === 9002L || col("c_id") === 9002L)) shouldBe empty
  }

  test("contrastiveTriplets: singleton-class NULL positive, negatives ≡ hardNegatives, NULL labels absent") {
    val base = Tables.embeddings(spark, sfDir).limit(60)
    val dup = base.filter(col("vec_id") === 1)
      .select(lit(9001L).as("vec_id"), col("embedding"), lit(999).as("label"))
    val nullLbl = base.filter(col("vec_id") === 2)
      .select(lit(9002L).as("vec_id"), col("embedding"),
        lit(null).cast("int").as("label"))
    val df = base.union(dup).union(nullLbl)
    val t = rows(Similarity.contrastiveTriplets(df, "vec_id", "embedding",
      "label", kNeg = 3, nCells = 4, nProbe = 4))
    val byId = t.map(r => r.getLong(0) -> r).toMap
    // 9001 is the only label-999 vector: no positive exists, but its
    // hard negatives do (vec 1 itself sits at cosine 1.0 ≥ ceiling)
    byId(9001L).isNullAt(1) shouldBe true
    byId(9001L).getSeq[Long](3) should not be empty
    byId(9001L).getSeq[Long](3) should not contain 1L
    // NULL-label vector: neither an anchor nor inside any negative set
    byId.contains(9002L) shouldBe false
    t.flatMap(_.getSeq[Long](3)) should not contain 9002L
    // the negative branch IS hardNegatives: same ids, same order
    val hn = rows(Similarity.hardNegatives(df, "vec_id", "embedding",
        "label", k = 3, nCells = 4, nProbe = 4)
      .filter(col("q_id") === 1L).orderBy("rank")).map(_.getLong(1))
    byId(1L).getSeq[Long](3) shouldBe hn
    // every positive carries the anchor's own label
    val lbl = rows(df.select("vec_id", "label")).filter(!_.isNullAt(1))
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    t.filter(!_.isNullAt(1)).foreach { r =>
      lbl(r.getLong(1)) shouldBe lbl(r.getLong(0))
    }
  }

  test("contrastiveTriplets: one-class corpus yields positives with empty negative arrays") {
    val one = (1 to 6).map { i =>
      (i.toLong, (0 until 8).map(j => math.sin(i * 1.3 + j).toFloat).toArray, 7)
    }.toDF("vec_id", "embedding", "label")
    val t = rows(Similarity.contrastiveTriplets(one, "vec_id", "embedding",
      "label", kNeg = 2, nCells = 2, nProbe = 2))
    t should not be empty
    t.foreach { r =>
      r.isNullAt(1) shouldBe false
      r.getSeq[Long](3) shouldBe empty
    }
  }

  test("marginRescore: integer margins match an independent reference on the same kNN") {
    val e = Tables.embeddings(spark, sfDir).limit(40)
    val knn = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
    // reference computed driver-side with BigInt arithmetic from the
    // SAME knn relation — pins the rescoring transform (quantization,
    // exact sums, truncating div), independent of the Spark plan
    val knnRows = rows(knn.select("q_id", "c_id", "sim"))
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val simU = knnRows.map { case (q, c, s) =>
      (q, c) -> BigInt(math.round(s * 1e6))
    }.toMap
    val nbsum = knnRows.groupBy(_._1).map { case (q, rs) =>
      q -> rs.map(r => simU((r._1, r._2))).sum
    }
    val expected = knnRows.map { case (q, c, _) =>
      val den = nbsum(q) + nbsum(c)
      (q, c) -> (BigInt(2) * 3 * simU((q, c)) * 10000 / den).toLong
    }.toMap
    val got = rows(Similarity.marginRescore(knn, 3)
      .select("q_id", "c_id", "margin_u"))
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    got shouldBe expected
  }

  test("marginRescore: all-orthogonal corpus yields NULL margins, not a division error") {
    val ortho = (0 until 4).map { i =>
      (i.toLong, Array.tabulate(4)(j => if (j == i) 1f else 0f))
    }.toDF("vec_id", "embedding")
    val knn = Similarity.bruteForceTopK(ortho, ortho, "vec_id", "embedding", 2)
    val out = rows(Similarity.marginRescore(knn, 2).select("margin_u"))
    out should not be empty
    out.foreach(r => assert(r.isNullAt(0), "expected NULL margin on zero neighborhoods"))
  }
}
