package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[FeatureHash]] — signed feature hashing. q162 proves engine
  * parity; this spec pins the algebra (signed counts, cancellation,
  * dense assembly) and the whole point: the trainless bridge into the
  * ANN operators. */
class FeatureHashSpec extends SparkSpec {
  import spark.implicits._

  test("hashedTf: weights are signed token counts; repeated tokens accumulate") {
    val docs = Seq((1L, "x x x y")).toDF("doc_id", "text")
    val rowsOut = FeatureHash.hashedTf(docs, "doc_id", "text", dim = 64)
      .collect().map(r => (r.getInt(1), r.getLong(2)))
    // x contributes 3·ξ(x) to its bucket, y 1·ξ(y) (buckets may
    // coincide; magnitudes prove accumulation either way)
    rowsOut.map(t => math.abs(t._2)).sum should (be (4L) or be (2L))
    rowsOut.foreach(t => assert(t._1 >= 0 && t._1 < 64))
  }

  test("dense vectors: identical texts embed identically; token-less docs are zero") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "totally different words here"), (4L, ""))
      .toDF("doc_id", "text")
    val v = FeatureHash.hashedTfVectors(docs, "doc_id", "text", dim = 32)
      .collect().map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    v(1L) shouldBe v(2L)
    v(1L) should not be v(3L)
    v(4L).forall(_ == 0f) shouldBe true
    v.values.foreach(_.length shouldBe 32)
  }

  test("hashedTfIdf: rarer buckets weigh more; w_idf is the exact product") {
    // 'common' in all 4 docs, 'rare' in one → df 4 vs 1 (no collision
    // at dim 1024 for two tokens, checked below)
    val docs = Seq((1L, "common rare"), (2L, "common"), (3L, "common"),
      (4L, "common")).toDF("doc_id", "text")
    val out = FeatureHash.hashedTfIdf(docs, "doc_id", "text", dim = 1024)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val buckets = out.map(_._2).distinct
    buckets.length shouldBe 2 // no collision in this fixture
    val byBucket = out.groupBy(_._2)
    val (rareB, commonB) = {
      val sorted = byBucket.toSeq.sortBy(_._2.length)
      (sorted.head._1, sorted.last._1)
    }
    // idf_micro: rare df=1 → ln(5/2)·1e6 = 916291; common df=4 → ln(1)=0
    byBucket(rareB).head._4 shouldBe 916291L
    byBucket(commonB).head._4 shouldBe 0L
    out.foreach { case (_, _, w, idf, widf) => widf shouldBe w * idf }
  }

  test("hashedTfIdf: NULL ids are excluded from N (count-DISTINCT semantics)") {
    // 2 real docs + 1 NULL-id doc → N = 2, not 3; 'common' is in both
    // real docs AND the null doc, so its df = 3 and idf would go
    // negative if N counted the NULL id as a third distinct value
    val docs = Seq((java.lang.Long.valueOf(1L), "common rare"),
      (java.lang.Long.valueOf(2L), "common"),
      (null.asInstanceOf[java.lang.Long], "common"))
      .toDF("doc_id", "text")
    val out = FeatureHash.hashedTfIdf(docs, "doc_id", "text", dim = 1024)
      .filter(col("doc_id").isNotNull)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(3)))
    // rare: df=1 → ln((2+1)/(1+1))·1e6 = 405465; common: df=3 →
    // ln(3/4)·1e6 = −287682 (oracle's count(DISTINCT id) N, exactly)
    out.map(_._3).toSet shouldBe Set(405465L, -287682L)
  }

  test("the bridge works: hashed vectors drive brute-force ANN to the lexical twin") {
    val docs = graft.Tables.documents(spark, sfDir).limit(60)
      .select("doc_id", "text")
      .union(Seq(
        (990001L, "spark window merge sort batch stream value key"),
        (990002L, "spark window merge sort batch stream value key"))
        .toDF("doc_id", "text"))
    val vecs = FeatureHash.hashedTfVectors(docs, "doc_id", "text", dim = 64)
      .withColumnRenamed("vector", "embedding")
      .withColumnRenamed("doc_id", "vec_id")
    val nn = Similarity.bruteForceTopK(vecs,
        vecs.filter(col("vec_id") === 990001L), "vec_id", "embedding", k = 1)
      .collect()
    nn.length shouldBe 1
    nn.head.getAs[Long]("c_id") shouldBe 990002L // the exact copy wins
  }
}
