package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files
import java.sql.Timestamp

/** Stream joins — beyond the reference's surface (SURVEY §2.9 notes it
  * has none), but core Structured Streaming capability:
  *  - stream-static: enrichment against a dimension table (no state).
  *  - stream-stream inner join with watermarks + time-range condition:
  *    both sides buffered in state, bounded by the watermark.
  */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("stream-static join enriches events against a dimension") {
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val dim = Seq((1L, "gold"), (2L, "bronze")).toDF("user_id", "tier")
    val joined = in.toDF().toDF("user_id", "value").join(dim, "user_id")
    val q = joined.writeStream.format("memory").queryName("ss_static")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck_ss").toString)
      .start()
    try {
      in.addData((1L, 10.0), (2L, 5.0), (3L, 1.0)) // 3 has no dim row
      q.processAllAvailable()
      val out = spark.table("ss_static").orderBy("user_id").collect()
        .map(r => (r.getLong(0), r.getString(2)))
      out shouldBe Array((1L, "gold"), (2L, "bronze"))
    } finally q.stop()
  }

  test("stream-stream join: views matched to purchases within 30 minutes") {
    implicit val ctx = spark.sqlContext
    val views = MemoryStream[(Timestamp, Long, Long)]
    val buys = MemoryStream[(Timestamp, Long, Long)]
    val v = views.toDF().toDF("v_ts", "user_id", "view_id")
      .withWatermark("v_ts", "10 minutes")
    val b = buys.toDF().toDF("b_ts", "user_id", "buy_id")
      .withWatermark("b_ts", "10 minutes")
    val joined = v.join(b,
      v("user_id") === b("user_id") &&
        b("b_ts") >= v("v_ts") && b("b_ts") <= v("v_ts") + expr("interval 30 minutes"))
      .select(v("user_id"), col("view_id"), col("buy_id"))
    val q = joined.writeStream.format("memory").queryName("ss_stream")
      .outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ck_sj").toString)
      .start()
    try {
      views.addData(
        (ts("2024-01-01 10:00:00"), 1L, 100L),
        (ts("2024-01-01 10:00:00"), 2L, 200L))
      buys.addData(
        (ts("2024-01-01 10:20:00"), 1L, 900L),  // within 30m of view 100
        (ts("2024-01-01 11:30:00"), 2L, 901L))  // 90m later — outside window
      q.processAllAvailable()
      val out = spark.table("ss_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      out shouldBe Array((1L, 100L, 900L))
    } finally q.stop()
  }
}
