package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source abstraction covering the reference's scan surface (SURVEY.md
  * §2.1 S1–S7) without hard-wiring hosts the way the reference does
  * (e.g. data_mart.scala:15): every source is a value object, and
  * connector-backed sources (Kafka/JDBC/Cassandra/ES shapes) can be
  * substituted by a file-backed stand-in via [[Source.substituted]] —
  * the mechanism that lets the same pipeline run in a broker-less
  * environment or a test (SURVEY §7 "hard parts"/streaming).
  *
  * Option-map assembly is pure and public so specs can assert the exact
  * connector configuration without a live endpoint.
  */
sealed trait Source {
  def read(spark: SparkSession): DataFrame
}

/** S7: parquet scan — pushdown/pruning-friendly (PushedFilters +
  * ReadSchema reach the scan). */
final case class ParquetSource(path: String) extends Source {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** S6: line-delimited JSON, schema inferred when none given (the
  * reference's spark.read.json; explicit schema avoids the inference
  * scan — always pass one at scale). */
final case class JsonSource(path: String, schema: Option[StructType] = None)
    extends Source {
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read
    schema.fold(r)(s => r.schema(s)).json(path)
  }
}

final case class CsvSource(path: String, header: Boolean = true,
                           schema: Option[StructType] = None) extends Source {
  def read(spark: SparkSession): DataFrame = {
    val r = spark.read.option("header", header.toString)
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s)).csv(path)
  }
}

/** ORC scan — the other columnar format warehouses standardize on;
  * same pushdown/pruning behavior as parquet (PushedFilters +
  * ReadSchema reach the scan, spec-asserted), so pipelines are
  * format-portable between the two without plan changes. */
final case class OrcSource(path: String) extends Source {
  def read(spark: SparkSession): DataFrame = spark.read.orc(path)
}

/** Raw-file scan for multimodal ingestion: each matching file becomes
  * one row (path, modificationTime, length, content: binary) — the
  * entry point that feeds payload bytes to `graft.multimodal`
  * (exact payload dedup → stub decode → features). `pathGlobFilter`
  * narrows by extension ("*.jpg"); `maxBytes` guards the executor
  * against a stray multi-GB object (files LARGER are dropped by the
  * built-in filter, not truncated — a clipped payload would
  * fingerprint as a distinct object and poison dedup). */
final case class BinaryFileSource(path: String,
                                  pathGlobFilter: Option[String] = None,
                                  maxBytes: Option[Long] = None)
    extends Source {
  def options: Map[String, String] =
    pathGlobFilter.map("pathGlobFilter" -> _).toMap
  def read(spark: SparkSession): DataFrame = {
    val df = options.foldLeft(spark.read.format("binaryFile")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(path)
    // the size guard is a pushable filter on the file-status `length`
    // column (evaluated before content IO for skipped files), NOT the
    // binaryFile maxLength session conf — that conf FAILS the whole
    // scan on the first oversized file, where ingestion wants the bad
    // object dropped and the crawl continued
    maxBytes.fold(df)(m =>
      df.filter(org.apache.spark.sql.functions.col("length") <= m))
  }
}

/** S5: JDBC scan (data_mart.scala:78-85). `partitionColumn`/bounds turn
  * the single-connection read into numPartitions parallel range scans —
  * mandatory at scale; the reference read unpartitioned. */
final case class JdbcSource(url: String, table: String, user: String,
                            password: String, driver: String,
                            partitionColumn: Option[String] = None,
                            lowerBound: Option[Long] = None,
                            upperBound: Option[Long] = None,
                            numPartitions: Option[Int] = None) extends Source {
  def options: Map[String, String] =
    Map("url" -> url, "dbtable" -> table, "user" -> user,
      "password" -> password, "driver" -> driver) ++
      partitionColumn.map("partitionColumn" -> _) ++
      lowerBound.map(v => "lowerBound" -> v.toString) ++
      upperBound.map(v => "upperBound" -> v.toString) ++
      numPartitions.map(v => "numPartitions" -> v.toString)

  def read(spark: SparkSession): DataFrame =
    spark.read.format("jdbc").options(options).load()
}

/** S1/S2: Kafka batch or streaming scan (filter.scala:28-36,
  * agg.scala:31-38). `perPartitionOffsets` reproduces the reference's
  * hand-built `{"topic":{"0":N}}` startingOffsets JSON
  * (filter.scala:32-35). */
final case class KafkaSource(bootstrapServers: String, topic: String,
                             streaming: Boolean,
                             startingOffsets: String = "earliest",
                             perPartitionOffsets: Map[Int, Long] = Map.empty,
                             maxOffsetsPerTrigger: Option[Long] = None,
                             failOnDataLoss: Boolean = true)
    extends Source {
  def options: Map[String, String] = {
    val so =
      if (perPartitionOffsets.nonEmpty)
        s"""{"$topic":{${perPartitionOffsets.toSeq.sorted
          .map { case (p, o) => s""""$p":$o""" }.mkString(",")}}}"""
      else startingOffsets
    Map("kafka.bootstrap.servers" -> bootstrapServers,
      "subscribe" -> topic, "startingOffsets" -> so,
      // SOURCE option (tolerate broker truncation, agg.scala:78 — the
      // reference misplaced it on its writeStream chain, where Kafka
      // ignores it; it belongs here on the read side)
      "failOnDataLoss" -> failOnDataLoss.toString) ++
      maxOffsetsPerTrigger.map(v => "maxOffsetsPerTrigger" -> v.toString)
  }

  def read(spark: SparkSession): DataFrame =
    if (streaming) spark.readStream.format("kafka").options(options).load()
    else spark.read.format("kafka").options(options).load()
}

/** S3/S4: generic connector scan (Cassandra `org.apache.spark.sql
  * .cassandra`, Elasticsearch `org.elasticsearch.spark.sql`, …) —
  * format + options, schemas connector-supplied. */
final case class FormatSource(format: String,
                              options: Map[String, String] = Map.empty)
    extends Source {
  def read(spark: SparkSession): DataFrame =
    spark.read.format(format).options(options).load()
}

object Source {
  /** Environment substitution: when `spark.graft.io.substitute.<name>`
    * is set, read that parquet path instead of the connector — the
    * config-driven stand-in for broker-less environments (the reference
    * instead hard-wires hosts, SURVEY C1/C3). */
  def substituted(spark: SparkSession, name: String, real: Source): DataFrame =
    spark.conf.getOption(s"spark.graft.io.substitute.$name") match {
      case Some(path) => ParquetSource(path).read(spark)
      case None       => real.read(spark)
    }
}
