package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Sink abstraction covering the reference's write surface (SURVEY.md
  * §2.2 K1–K5).
  *
  * Scale notes:
  *  - [[PartitionedJsonSink]] keeps the reference's Hive-style
  *    date-partition layout (filter.scala:59,64) — the layout downstream
  *    partition pruning depends on.
  *  - [[ParquetSink]]'s `coalesceTo` reproduces the reference's
  *    small-output compaction (coalesce(1..5)); leave it None for big
  *    outputs — a forced coalesce(1) single-threads the final stage.
  *  - [[KafkaStreamSink]] serializes rows as `to_json(struct(*))`
  *    (agg.scala:70) and applies checkpoint + trigger + output mode
  *    (agg.scala:71-79).
  */
sealed trait Sink {
  def write(df: DataFrame): Unit
}

/** K1: date-partitioned JSON (filter.scala:59,64). */
final case class PartitionedJsonSink(path: String, partitionCols: Seq[String],
                                     mode: SaveMode = SaveMode.Overwrite)
    extends Sink {
  def write(df: DataFrame): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).json(path)
}

/** K2: parquet snapshot, optional compaction. */
final case class ParquetSink(path: String, mode: SaveMode = SaveMode.Overwrite,
                             coalesceTo: Option[Int] = None,
                             partitionCols: Seq[String] = Nil) extends Sink {
  def write(df: DataFrame): Unit = {
    val d = coalesceTo.fold(df)(df.coalesce)
    val w = d.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .parquet(path)
  }
}

/** [[ParquetSink]]'s ORC twin — same coalesce/partition controls, so
  * a pipeline retargets between the two columnar formats by swapping
  * the sink value only. */
final case class OrcSink(path: String, mode: SaveMode = SaveMode.Overwrite,
                         coalesceTo: Option[Int] = None,
                         partitionCols: Seq[String] = Nil) extends Sink {
  def write(df: DataFrame): Unit = {
    val d = coalesceTo.fold(df)(df.coalesce)
    val w = d.write.mode(mode)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(path)
  }
}

/** K3: JDBC table overwrite (data_mart.scala:138-146). */
final case class JdbcSink(url: String, table: String, user: String,
                          password: String, driver: String,
                          mode: SaveMode = SaveMode.Overwrite) extends Sink {
  def options: Map[String, String] =
    Map("url" -> url, "dbtable" -> table, "user" -> user,
      "password" -> password, "driver" -> driver)

  def write(df: DataFrame): Unit =
    df.write.format("jdbc").options(options).mode(mode).save()
}

/** K6: out-of-band JDBC DDL (data_mart.scala:149-151) — after writing
  * the mart table the reference opens a raw JDBC connection and runs a
  * `GRANT SELECT` so the checker account can read it. This is not a
  * Spark operator (no DataFrame flows through it): it is a driver-side
  * single-statement session executed AFTER the Spark write completes.
  * Kept beside [[JdbcSink]] because real deployments pair the two —
  * write, then grant.
  */
object JdbcDdl {
  /** Execute one DDL/DCL statement (GRANT, CREATE, DROP …) and close
    * the connection. Returns false when the statement produced no
    * result set (the normal DDL case, mirroring `Statement.execute`).
    */
  def execute(url: String, user: String, password: String, driver: String,
              ddl: String): Boolean = {
    Class.forName(driver)
    val props = new java.util.Properties()
    if (user.nonEmpty) props.setProperty("user", user)
    if (password.nonEmpty) props.setProperty("password", password)
    val conn = java.sql.DriverManager.getConnection(url, props)
    try {
      val st = conn.createStatement()
      try st.execute(ddl) finally st.close()
    } finally conn.close()
  }

  /** The reference's statement shape (data_mart.scala:150): read grant
    * on a freshly-written table to a named account. */
  def grantSelect(table: String, to: String): String =
    s"GRANT SELECT ON $table TO $to"
}

/** K4: generic connector append (Elasticsearch `es` etc.,
  * dashboard.scala:56-60). */
final case class FormatSink(format: String,
                            options: Map[String, String] = Map.empty,
                            mode: SaveMode = SaveMode.Append) extends Sink {
  def write(df: DataFrame): Unit =
    df.write.format(format).options(options).mode(mode).save()
}

/** K5: Kafka streaming sink — rows serialized as JSON `value`. Call
  * [[start]] on a streaming frame (write() is unsupported: streaming
  * sinks don't terminate). */
final case class KafkaStreamSink(bootstrapServers: String, topic: String,
                                 checkpointLocation: String,
                                 trigger: Trigger = Trigger.ProcessingTime("10 seconds"),
                                 outputMode: String = "update") extends Sink {
  // failOnDataLoss deliberately absent: it is a Kafka SOURCE option
  // (KafkaSource carries it). The reference passed it on its
  // writeStream chain (agg.scala:78) where the kafka writer silently
  // ignores it — a dead knob this API does not reproduce.
  def options: Map[String, String] =
    Map("kafka.bootstrap.servers" -> bootstrapServers, "topic" -> topic,
      "checkpointLocation" -> checkpointLocation)

  /** The value-serialization projection, exposed for testing: the whole
    * row as a JSON string (agg.scala:70). */
  def serialize(df: DataFrame): DataFrame =
    df.select(to_json(struct(df.columns.toIndexedSeq.map(col): _*)).as("value"))

  def start(df: DataFrame): StreamingQuery =
    serialize(df).writeStream.format("kafka").options(options)
      .trigger(trigger).outputMode(outputMode).start()

  def write(df: DataFrame): Unit =
    throw new UnsupportedOperationException("streaming sink: use start()")
}
