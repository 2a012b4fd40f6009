package graft.streaming

import graft.SparkSpec
import graft.operators.UnigramTokenizer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming frozen-tokenizer encoding (StreamOps.tokenizeEachBatch):
  * an offline-learned vocabulary encodes a document stream per
  * micro-batch, row-identical to a backfill encode with the same
  * artifact — including the NULL-id `<unk>` rows for words the frozen
  * alphabet cannot spell. Stateless: no watermark, no state store, no
  * relearning (arrival order must not change the tokenization).
  */
class TokenizeStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-micro-batch frozen encode ≡ batch encode, incl. unk rows") {
    implicit val ctx = spark.sqlContext
    // vocabulary learned offline on a reference corpus
    val reference = Seq((10L, "abab ab ba")).toDF("doc_id", "text")
    val vocab = UnigramTokenizer.seedVocab(reference, "text",
      vocabSize = 5, maxPieceLen = 2)

    // stream docs across two batches; 'zq' is unspellable
    val docs = Seq((1L, "ab ab"), (2L, "abab zq"), (3L, "ba"))
    val in = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = StreamOps.tokenizeEachBatch(
        in.toDF().toDF("doc_id", "text"), vocab, maxPieceLen = 2) {
        (enc: DataFrame, _: Long) =>
          collected.synchronized { collected ++= enc.collect() }
      }
      .start()
    try {
      in.addData(docs.take(2): _*)
      q.processAllAvailable()
      in.addData(docs.drop(2): _*)
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))
    val streamed = collected.map(key).sortBy(t => (t._1, t._2, t._3))
    val batch = UnigramTokenizer.encodeWith(docs.toDF("doc_id", "text"),
        "doc_id", "text", vocab, maxPieceLen = 2)
      .collect().map(key).sortBy(t => (t._1, t._2, t._3))
    streamed.toSeq shouldBe batch.toSeq

    // the unspellable word surfaced as one NULL-id row
    streamed.filter(t => t._1 == 2L && t._2 == 1) shouldBe
      Seq((2L, 1, 0, "zq", -1))
  }

  test("frozen-BPE per-batch encode ≡ batch encode, incl. NULL-id unknown symbols") {
    implicit val ctx = spark.sqlContext
    import graft.operators.Vocabulary
    val reference = Seq((10L, "low low low lower lower")).toDF("doc_id", "text")
    val merges = Vocabulary.bpeMerges(reference, "text", 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = Vocabulary.bpeVocab(reference, "text", 3)

    val docs = Seq((1L, "slow low"), (2L, "zz lower"))
    val in = MemoryStream[(Long, String)]
    val collected = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = StreamOps.bpeTokenizeEachBatch(
        in.toDF().toDF("doc_id", "text"), merges, vocab) {
        (enc: DataFrame, _: Long) =>
          collected.synchronized { collected ++= enc.collect() }
      }
      .start()
    try {
      in.addData(docs: _*)
      q.processAllAvailable()
    } finally q.stop()

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))
    val streamed = collected.map(key).sortBy(t => (t._1, t._2, t._3))
    val batch = Vocabulary.bpeEncodeWith(docs.toDF("doc_id", "text"),
        "doc_id", "text", merges, vocab)
      .collect().map(key).sortBy(t => (t._1, t._2, t._3))
    streamed.toSeq shouldBe batch.toSeq
    // merges fired inside the unseen word; 'z' is an unknown symbol
    streamed.filter(_._1 == 1L).map(t => (t._4, t._5 >= 0)).toSeq shouldBe
      Seq(("s", false), ("low", true), ("low", true))
    streamed.filter(t => t._1 == 2L && t._2 == 0).map(_._4).toSeq shouldBe
      Seq("z", "z")
  }
}
