package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming distribution-drift monitoring
  * (StreamOps.driftMonitorEachBatch): each micro-batch is compared to
  * an offline reference histogram, per-batch — a matching-shape batch
  * reads TVD 0, a shifted batch reads the exact drift the batch
  * operator computes for the same rows (live ≡ backfill). Stateless:
  * no watermark, no state store.
  */
class DriftMonitorStreamSpec extends SparkSpec {
  import spark.implicits._

  test("per-micro-batch drift: stable batch 0, shifted batch matches the batch operator") {
    implicit val ctx = spark.sqlContext
    // reference: source g, lengths all in bucket 0 (width 10)
    val reference = Seq(("g", 3L), ("g", 5L), ("g", 7L), ("g", 9L))
      .toDF("source", "len")
      .persist()
    val in = MemoryStream[(String, Long)]
    val perBatch = scala.collection.mutable.Map.empty[Long, Seq[(String, Option[Long])]]
    val q = StreamOps.driftMonitorEachBatch(
        in.toDF().toDF("source", "len"), reference,
        "source", "len", bucketWidth = 10L) { (drift: DataFrame, id: Long) =>
        val rs = drift.collect().toSeq.map(r => (r.getString(0),
          if (r.isNullAt(3)) None else Some(r.getLong(3))))
        perBatch.synchronized { perBatch(id) = rs }
      }
      .start()
    try {
      // batch 0: same shape as the reference → zero drift
      in.addData(("g", 2L), ("g", 8L))
      q.processAllAvailable()
      // batch 1: half the rows moved one bucket up, plus a group the
      // reference has never seen
      in.addData(("g", 4L), ("g", 14L), ("new_src", 5L))
      q.processAllAvailable()
    } finally q.stop()

    perBatch(0L) shouldBe Seq(("g", Some(0L)))
    // live ≡ backfill: batch 1 through the BATCH operator, same rows
    val batchTwin = graft.operators.CorpusStats.distributionDrift(
        reference, Seq(("g", 4L), ("g", 14L), ("new_src", 5L))
          .toDF("source", "len"),
        "source", "len", bucketWidth = 10L)
      .collect().toSeq.map(r => (r.getString(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    perBatch(1L).toSet shouldBe batchTwin.toSet
    // and the hand value: reference all in bucket 0, batch half moved
    // → TVD ½ = 5000; the unseen group has no reference side → NULL
    perBatch(1L).toMap.apply("g") shouldBe Some(5000L)
    perBatch(1L).toMap.apply("new_src") shouldBe None
  }
}
