package graft.streaming

import graft.SparkSpec
import graft.operators.UnigramLm
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming unigram-LM scoring (StreamOps.lmScoreEachBatch): an
  * offline-built LM scores a document stream per micro-batch, and the
  * result is row-identical to scoring the same docs in one batch run —
  * the backfill-equals-live invariant the operator promises. Stateless
  * by construction: no watermark, no state store.
  */
class LmScoreStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-micro-batch LM scores ≡ batch scores, incl. OOV penalty") {
    implicit val ctx = spark.sqlContext
    // LM built offline over a reference corpus ("a" frequent, "b" rare)
    val reference = Seq((10L, "a a a b"), (11L, "a b a a")).toDF("doc_id", "text")
    val lm = UnigramLm.build(reference, "text")

    // stream docs: in-vocab, mixed, fully-OOV
    val docs = Seq((1L, "a b a"), (2L, "a zzz"), (3L, "zzz qqq"))
    val in = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = StreamOps.lmScoreEachBatch(
        in.toDF().toDF("doc_id", "text"), lm) { (scored: DataFrame, _: Long) =>
        collected.synchronized { collected ++= scored.collect() }
      }
      .start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      in.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = collected.map(r => (r.getLong(0), r.getInt(1),
      r.getLong(2), r.getDouble(3))).sortBy(_._1)
    val batch = UnigramLm.scoreWithOov(docs.toDF("doc_id", "text"),
        "doc_id", "text", lm)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    streamed.toSeq shouldBe batch.toSeq

    // fully-OOV doc takes exactly the penalty: 2 tokens · −2e7 micro
    val oov = streamed.find(_._1 == 3L).get
    oov._3 shouldBe -40000000L
    oov._4 shouldBe -20.0
  }
}
