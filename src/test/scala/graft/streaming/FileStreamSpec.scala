package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import java.nio.file.Files
import java.sql.Timestamp

/** File-source streaming integration: the broker-less S2/K5 path —
  * readStream over a directory, watermarked tumbling aggregate,
  * parquet sink, Trigger.AvailableNow (the replay/batch-catchup
  * trigger). Proves the stream operators run against a real
  * file-backed source end-to-end, not just MemoryStream.
  */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("file stream → tumbling agg → parquet sink with AvailableNow") {
    val root = Files.createTempDirectory("graft_fs")
    val in = s"$root/in"; val out = s"$root/out"; val ckpt = s"$root/ckpt"
    new java.io.File(in).mkdirs()

    Seq(
      (Timestamp.valueOf("2024-01-01 10:05:00"), 1L, "purchase", 100.0),
      (Timestamp.valueOf("2024-01-01 10:40:00"), 2L, "purchase", 50.0),
      (Timestamp.valueOf("2024-01-01 12:00:00"), 3L, "view", 0.0)
    ).toDF("ts", "user_id", "event_type", "value")
      .coalesce(1).write.parquet(s"$in/batch1")

    val stream = spark.readStream
      .schema("ts timestamp, user_id long, event_type string, value double")
      .parquet(s"$in/*")
    val agg = StreamOps.tumblingCommerceAgg(stream, lateness = "10 minutes")
    val q = agg.writeStream
      .format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    // append mode: with all input consumed, the watermark (12:00 − 10m)
    // has passed the 10:00 window's end → it is finalized and written.
    val result = spark.read.parquet(out)
      .filter(col("window_start") === Timestamp.valueOf("2024-01-01 10:00:00"))
      .collect()
    result.length shouldBe 1
    result.head.getAs[Double]("revenue") shouldBe 150.0
    result.head.getAs[Long]("purchases") shouldBe 2L
  }
}
