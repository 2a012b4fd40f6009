package graft.streaming

import graft.SparkSpec
import graft.ml.QualityFilter
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming model-based quality gate (StreamOps.qualityGateEachBatch):
  * a FROZEN offline-trained classifier filters a document stream per
  * micro-batch, row-identical to a backfill filter with the same
  * model — the live form of TrainingCorpusPipeline stage 2e. */
class QualityGateStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-micro-batch quality gate ≡ backfill filter; junk drops mid-stream") {
    implicit val ctx = spark.sqlContext
    // model trained offline on a labeled seed (the QualityFilterSpec fixture)
    val seed = ((1L to 20L).map(i =>
        (i, s"the committee published its annual report on policy $i outcomes", 1)) ++
      (21L to 40L).map(i =>
        (i, s"zzz qqq $i xx kk zz qq xk zx kq free free free click click", 0)))
      .toDF("doc_id", "text", "label")
    val model = QualityFilter.train(seed, "doc_id", "text", "label",
      dim = 256, maxIter = 20)

    val docs = Seq(
      (101L, "the committee published a thorough report on local policy outcomes"),
      (102L, "zz qq xx kk free free click click zq xk"),
      (103L, "the annual report methods were published for the committee"),
      (104L, "kk zz qq free click free click xx"))
    val in = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = StreamOps.qualityGateEachBatch(
        in.toDF().toDF("doc_id", "text"), model, minP = 0.5) {
        (kept: DataFrame, _: Long) =>
          collected.synchronized {
            collected ++= kept.select("doc_id").as[Long].collect()
          }
      }
      .start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      in.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val backfill = QualityFilter.filter(model, docs.toDF("doc_id", "text"),
        "doc_id", "text", minP = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    collected.sorted.toSeq shouldBe backfill
    backfill shouldBe Seq(101L, 103L) // the junk rows dropped in-stream
  }
}
