package graft.operators

import graft.SparkSpec
import graft.Tables
import org.apache.spark.sql.functions._

class QuantizedTopKSpec extends SparkSpec {
  import spark.implicits._

  private def quant(v: Seq[Float]): Seq[Double] =
    eval1(Seq(Tuple1(v)).toDF("v").select(Similarity.quantize(col("v"))))
      .asInstanceOf[scala.collection.Seq[Double]].toSeq

  test("quantize scales to ±127 with floor(x·s + 0.5)") {
    // max|x| = 4 → scale 31.75: [1,2,4] → [floor(32.25), floor(64.0), 127]
    quant(Seq(1f, 2f, 4f)) shouldBe Seq(32.0, 64.0, 127.0)
    // negatives: floor(-31.75 + 0.5) = floor(-31.25) = -32
    quant(Seq(-1f, 4f)) shouldBe Seq(-32.0, 127.0)
  }

  test("quantize maps the all-zero vector to zeros") {
    quant(Seq(0f, 0f, 0f)) shouldBe Seq(0.0, 0.0, 0.0)
  }

  test("quantizedTopK ranks by exact integer dot, ties by id") {
    // unit-ish vectors where quantized dots are hand-computable:
    // all quantize to ±127 multiples along axes
    val vecs = Seq(
      (1L, Seq(1f, 0f)),   // q=[127,0]
      (2L, Seq(1f, 0f)),   // q=[127,0]
      (3L, Seq(0f, 1f)),   // q=[0,127]
      (4L, Seq(-1f, 0f)))  // q=[-127,0]
    val df = vecs.toDF("vec_id", "embedding")
    val out = Similarity.quantizedTopK(df, "vec_id", "embedding", 2)
      .orderBy(col("q_id"), col("rank"))
      .select(col("q_id"), col("rank"), col("c_id"), col("qdot"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    // for q=1: best is 2 (dot 16129), then 3 (dot 0); 4 is last (-16129)
    out.take(2) shouldBe Seq((1L, 1, 2L, 16129L), (1L, 2, 3L, 0L))
    // for q=3 (orthogonal to all): dot 0 with 1,2,4 → ties by id asc
    out.filter(_._1 == 3L) shouldBe Seq((3L, 1, 1L, 0L), (3L, 2, 2L, 0L))
  }

  test("quantized top-1 recalls the exact top-1 on testdata embeddings") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 1)
      .select(col("q_id"), col("c_id").as("exact_c"))
    val quantized = Similarity.quantizedTopK(e, "vec_id", "embedding", 1)
      .select(col("q_id"), col("c_id").as("quant_c"))
    val n = exact.count()
    val hits = exact.join(quantized, "q_id")
      .filter(col("exact_c") === col("quant_c")).count()
    // int8 quantization of 64-dim unclustered vectors keeps most exact
    // winners; anything below ~half would mean the quantizer is broken
    hits.toDouble / n should be >= 0.5
  }

  test("quantizedRerank beats raw quantized ranking and orders candidates by exact cosine") {
    val e = Tables.embeddings(spark, sfDir)
    val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 1)
      .select(col("q_id"), col("c_id").as("exact_c"))
    val n = exact.count()
    def top1Hits(df: org.apache.spark.sql.DataFrame): Long =
      exact.join(df.filter(col("rank") === 1)
        .select(col("q_id"), col("c_id").as("got_c")), "q_id")
        .filter(col("exact_c") === col("got_c")).count()
    val rawHits = top1Hits(Similarity.quantizedTopK(e, "vec_id", "embedding", 1))
    val rerank = Similarity.quantizedRerank(e, "vec_id", "embedding",
      k = 1, overfetch = 8)
    val rerankHits = top1Hits(rerank)
    // re-ranking the overfetched candidate list with exact cosine can
    // only fix stage-1 inversions, never introduce new ones
    rerankHits should be >= rawHits
    rerankHits.toDouble / n should be >= 0.8
    // and the emitted sim IS the exact cosine (spot the whole frame)
    val vecs = e.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val vecsC = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
    val bad = rerank.join(vecs, "q_id").join(vecsC, "c_id")
      .withColumn("want", graft.functions.VectorFns.cosine(col("qv"), col("cv")))
      .filter(col("sim") =!= col("want"))
    bad.count() shouldBe 0L
  }
}
