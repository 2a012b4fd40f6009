package graft.tools

import org.apache.spark.sql.functions._

/** Throwaway r17 probe: decompose q177's wall time (train vs encode vs
  * search). Not part of the library surface; deleted after use. */
object ProbeQ177 {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("local[32]", 32, "probe-q177")
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t[A](name: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    (1 to 3).foreach { round =>
      println(s"[probe] ---- round $round ----")
      val emb = graft.Tables.embeddings(spark, dir)
      // trainResidual decomposition (mirrors its body with public APIs)
      val clean = emb.filter(col("embedding").isNotNull
        && !exists(col("embedding"), x => x.isNull)
        && size(col("embedding")) === 64)
      val sample = t("  sample draw+cache") {
        val s0 = clean
          .withColumn("__r", graft.operators.Similarity
            .portableCentroidRank(col("vec_id")))
          .orderBy(col("__r"), col("vec_id")).limit(4096)
          .select(col("vec_id"), col("embedding"), col("__r"))
          .cache()
        s0.count(); s0
      }
      val cells = t("  cells KMeans.fit") {
        graft.operators.KMeans.fit(
          sample.orderBy(col("__r"), col("vec_id")).limit(4096)
            .select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", 8, 2)
      }
      t("  (cells assign 1 pass)") {
        graft.operators.KMeans.assign(
          sample.select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", cells).count()
      }
      sample.unpersist()
      val model = t("trainResidual (full)") {
        graft.operators.ProductQuant.trainResidual(emb, "vec_id",
          "embedding", dim = 64, m = 2, k = 4, iters = 2, nCells = 8,
          cellIters = 2)
      }
      val out = t("search (encode+adc+rank)") {
        val df = graft.operators.ProductQuant.ivfAdcResidualTopK(emb,
          emb.filter(col("vec_id") <= 20), "vec_id", "embedding",
          dim = 64, model, k = 3, nProbe = 2)
          .orderBy(col("q_id"), col("rank"))
        df.count()
      }
      println(s"[probe] rows=$out")
      spark.catalog.clearCache()
      System.gc()
    }
    spark.stop()
  }
}
