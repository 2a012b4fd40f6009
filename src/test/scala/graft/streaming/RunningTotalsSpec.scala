package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.nio.file.Files

class RunningTotalsSpec extends SparkSpec {
  import spark.implicits._

  test("transformWithState accumulates per-key totals across micro-batches") {
    // transformWithState requires the RocksDB provider; scope it to
    // this query (the shared session's other streams use the default).
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val ctx = spark.sqlContext
      val in = MemoryStream[RunningTotals.In]
      val q = RunningTotals.runningTotals(in.toDS())
        .writeStream.format("memory").queryName("running_totals")
        .outputMode("update")
        .option("checkpointLocation",
          Files.createTempDirectory("ckpt_tws").toString)
        .start()
      try {
        in.addData(RunningTotals.In(1L, 10.0), RunningTotals.In(1L, 2.5),
          RunningTotals.In(2L, 7.0))
        q.processAllAvailable()
        in.addData(RunningTotals.In(1L, 0.5), RunningTotals.In(3L, 1.0))
        q.processAllAvailable()

        // last emission per key reflects ALL batches: state survived
        val out = spark.table("running_totals")
          .groupBy("user_id").agg(
            org.apache.spark.sql.functions.max_by(
              org.apache.spark.sql.functions.struct($"n", $"total"), $"n").as("last"))
          .select($"user_id", $"last.n", $"last.total")
          .orderBy("user_id")
        rows(out).map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) shouldBe Seq(
          (1L, 3L, 13.0), (2L, 1L, 7.0), (3L, 1L, 1.0))
      } finally q.stop()
    } finally {
      prior match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
