package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-key running totals via `transformWithState` — Spark 4's
  * successor to the (flat)MapGroupsWithState API (typed state handles,
  * per-state TTL, timers decoupled from output mode). The graft engine
  * keeps BOTH: Sessionize demonstrates the classic API, this the
  * modern one.
  *
  * Each micro-batch re-emits the updated (count, total) for every key
  * that received input — the streaming twin of an incrementally
  * maintained aggregate table. State is one small tuple per key;
  * production deployments bound it with a TTL on inactivity
  * (TTLConfig) instead of growing forever like the reference's
  * unwatermarked aggs (SURVEY ST2).
  *
  * Requires the RocksDB state store provider (the HDFS-backed default
  * does not implement the transformWithState operator's column
  * families).
  */
object RunningTotals {

  case class In(user_id: Long, value: Double)
  case class Out(user_id: Long, n: Long, total: Double)

  class Processor extends StatefulProcessor[Long, In, Out] {
    @transient private var totals:
      org.apache.spark.sql.streaming.ValueState[(Long, Double)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getValueState[(Long, Double)]("totals",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble),
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[In],
                                 timers: TimerValues): Iterator[Out] = {
      var (n, v) = if (totals.exists()) totals.get() else (0L, 0.0)
      rows.foreach { e => n += 1; v += e.value }
      totals.update((n, v))
      Iterator.single(Out(key, n, math.round(v * 100.0) / 100.0))
    }
  }

  def runningTotals(events: Dataset[In]): Dataset[Out] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new Processor,
        TimeMode.None(), OutputMode.Update())
  }
}
