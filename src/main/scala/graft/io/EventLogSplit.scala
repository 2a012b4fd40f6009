package graft.io

import graft.Tables
import graft.streaming.StreamOps
import org.apache.spark.sql.SparkSession

/** The filter module's job end-to-end (filter/filter.scala): read the
  * event log, fork per event type, tag with the partition date, write
  * each branch date-partitioned.
  *
  * Differences from the reference, by design:
  *  - no global `orderBy("date")` before the write (filter.scala:58,63)
  *    — a total sort of the full log is a pointless range-shuffle when
    *  the output is partitioned by that same date; partition dirs give
  *    the grouping, order within a partition is meaningless in JSON.
  *  - source/sink are injected values, not hard-wired Kafka/HDFS paths.
  */
object EventLogSplit {

  /** Batch form over the testdata events table. Returns the per-type
    * output paths.
    *
    * The source is persisted across the fan-out: each branch write is
    * its own action, so without the persist every entry in `types`
    * re-scans the full log from source — N types, N full passes (at
    * 100 TB, N passes over the lake). Released once all branches have
    * committed. */
  def run(spark: SparkSession, sfDir: String, outDir: String,
          types: Seq[String] = Seq("view", "purchase")): Map[String, String] = {
    val events = Tables.events(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try
      StreamOps.splitByValue(events, "event_type", "ts", types).map {
        case (t, branch) =>
          val path = s"$outDir/$t"
          PartitionedJsonSink(path, Seq("p_date")).write(branch)
          t -> path
      }
    finally events.unpersist()
  }
}
