package graft.streaming

import graft.SparkSpec
import graft.operators.LangId
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming language ID (StreamOps.langIdEachBatch): the profile
  * scorer runs per micro-batch and the result is row-identical to
  * scoring the same docs in one batch run — the backfill-equals-live
  * invariant. Stateless: the per-doc aggs are batch-local and the
  * profile is a constant broadcast. */
class LangIdStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-micro-batch language predictions ≡ batch predictions") {
    implicit val ctx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumped over the lazy dog and all of the others"),
      (2L, "der schnelle braune fuchs sprang über den faulen hund und lief weg"),
      (3L, ""), // und in both paths
      (4L, "быстрая коричневая лиса перепрыгнула через ленивую собаку"))
    val in = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = StreamOps.langIdEachBatch(
        in.toDF().toDF("doc_id", "text")) { (scored: DataFrame, _: Long) =>
        collected.synchronized {
          collected ++= scored.select("doc_id", "lang_pred", "score", "margin").collect()
        }
      }
      .start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      in.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = collected
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    val batch = LangId.predict(docs.toDF("doc_id", "text"), "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    streamed.toSeq shouldBe batch.toSeq
    streamed.map(t => t._1 -> t._2).toMap shouldBe
      Map(1L -> "en", 2L -> "de", 3L -> "und", 4L -> "ru")
  }
}
