package graft.pipelines

import java.nio.file.Files
import java.sql.Timestamp

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingIngestPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")

  test("streaming ingest: gate, in-stream content dedup, and index dedup compose") {
    implicit val ctx = spark.sqlContext
    val decent = "the quick brown fox jumps over the lazy dog and keeps " +
      "running through the quiet forest toward the distant river bank"
    // historical index holds one known doc's fingerprint
    val indexDir = Files.createTempDirectory("ingest_index").toString
    Seq(s"$decent already ingested")
      .toDF("text")
      .select(graft.functions.TextFns.fingerprint(col("text")).as("fp"))
      .write.mode("overwrite").parquet(indexDir)
    val corpusIndex = spark.read.parquet(indexDir)

    val in = MemoryStream[(Timestamp, Long, String)]
    val docs = in.toDF().toDF("ts", "doc_id", "text")
    val q = StreamingIngestPipeline
      .run(docs, corpusIndex, "ts", "text", minQuality = 0.3)
      .writeStream.format("memory").queryName("stream_ingest")
      .outputMode("append").start()
    try {
      in.addData(
        (ts(0), 1L, s"$decent fresh content"),         // survives
        (ts(1), 2L, s"$decent  FRESH   content"),      // in-stream dup of 1 (normalized)
        (ts(2), 3L, s"$decent already ingested"),      // in the index → dropped
        (ts(3), 4L, "a" * 30 + " " + "b" * 30),        // below quality floor
        (ts(4), 5L, s"$decent genuinely new text"))    // survives
      q.processAllAvailable()
      val out = spark.table("stream_ingest")
      out.select("doc_id").as[Long].collect().sorted shouldBe Array(1L, 5L)
      // audit columns from the gate are present on the sink rows
      out.columns should contain allOf ("quality", "n_pii")
    } finally q.stop()
  }
}
