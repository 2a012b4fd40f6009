package graft.io

import graft.{GraftConf, Tables}
import graft.operators.PivotMatrix
import graft.queries.MatrixPipelines
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The users_items module end-to-end (users_items.scala): build a
  * user × event-type count matrix snapshot, or — in update mode —
  * merge the previous snapshot with the new log slice and write the
  * result back.
  *
  * The reference's update path unpivots the old snapshot with a
  * synthesized `stack(...)` string, unions with the new long-form log
  * and re-pivots (users_items.scala:59-89). Here the merge is a single
  * outer join summing per-key columns ([[PivotMatrix.mergeMatrices]]):
  * one shuffle on the user key instead of unpivot→union→re-pivot
  * (three). Update mode comes from typed config (SURVEY C4,
  * `spark.graft.users_items.update_mode`).
  */
object UsersItemsPipeline {

  val Prefix = "spark.graft.users_items"

  /** Build the matrix for a log slice. */
  def buildMatrix(events: DataFrame): DataFrame =
    PivotMatrix.countMatrix(events, "user_id", "event_type",
      MatrixPipelines.EventTypes)

  /** Run one increment: read events from `sfDir` (optionally filtered
    * by the caller), merge with the existing snapshot when update mode
    * is on AND a snapshot exists, write the snapshot, return it. */
  def run(spark: SparkSession, sfDir: String, snapshotDir: String,
          slice: DataFrame => DataFrame = identity): DataFrame = {
    val conf = GraftConf(spark, Prefix)
    val fresh = buildMatrix(slice(Tables.events(spark, sfDir)))
    // Hadoop FileSystem, not java.io.File: the snapshot may live on
    // HDFS/S3, where a local-FS existence probe always says "missing"
    // and update mode would silently rebuild from scratch.
    val snapPath = new org.apache.hadoop.fs.Path(snapshotDir)
    val fs = snapPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val snapshotExists = fs.exists(snapPath)
    val result =
      if (conf.updateMode && snapshotExists)
        PivotMatrix.mergeMatrices(
          spark.read.parquet(snapshotDir), fresh, "user_id")
      else fresh
    // write via a temp dir: the overwrite target may be this job's
    // input. Swap by FILESYSTEM RENAME, not a second Spark write — the
    // rename is a metadata op (crash window shrinks from a full job to
    // one FS call) and the matrix isn't written+read twice.
    val tmp = snapshotDir + "_tmp"
    ParquetSink(tmp, SaveMode.Overwrite, coalesceTo = Some(1)).write(result)
    fs.delete(snapPath, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), snapPath)
    spark.read.parquet(snapshotDir)
  }
}
