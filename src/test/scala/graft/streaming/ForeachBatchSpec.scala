package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** foreachBatch — the escape hatch for sinks without a native streaming
  * writer (JDBC upserts, multi-table fanout): each micro-batch arrives
  * as a BATCH DataFrame with a monotonically increasing batch id, and
  * batch-only operations (overwrite-per-partition, jdbc) apply.
  */
class ForeachBatchSpec extends SparkSpec {
  import spark.implicits._

  test("streaming agg lands in parquet via foreachBatch with batch ids") {
    implicit val ctx = spark.sqlContext
    val root = Files.createTempDirectory("graft_feb")
    val out = s"$root/out"
    val in = MemoryStream[(Timestamp, Long, String, Double)]
    val agg = StreamOps.tumblingCommerceAggUnbounded(
      in.toDF().toDF("ts", "user_id", "event_type", "value"))
    val seenBatches = scala.collection.mutable.ArrayBuffer.empty[Long]
    val q = agg.writeStream
      .outputMode("update")
      .option("checkpointLocation", s"$root/ckpt")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        seenBatches.synchronized { seenBatches += id }
        batch.withColumn("batch_id", lit(id))
          .write.mode("append").parquet(out)
      }
      .start()
    try {
      in.addData((Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "purchase", 100.0))
      q.processAllAvailable()
      in.addData((Timestamp.valueOf("2024-01-01 10:40:00"), 2L, "purchase", 50.0))
      q.processAllAvailable()
      seenBatches.distinct.size should be >= 2
      val result = spark.read.parquet(out)
      // update mode re-emits the 10:00 window; the LAST batch has both
      val last = result.orderBy(col("batch_id").desc).limit(1).collect()(0)
      last.getAs[Double]("revenue") shouldBe 150.0
    } finally q.stop()
  }
}
