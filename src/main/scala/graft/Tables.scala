package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed access to the driver-generated testdata tables
  * (/root/testdata/sf*, schemas in FIXTURES.md §B).
  *
  * Every loader is a plain parquet scan so Catalyst retains full
  * pushdown/pruning freedom — filters and projections applied by callers
  * reach the scan (`PushedFilters`/`ReadSchema` in explain). At 100 TB the
  * same loaders work unchanged against a partitioned table root; nothing
  * here assumes single-file inputs.
  */
object Tables {
  private def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = read(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = read(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = read(spark, dir, "lineitem")

  /** events.ts is TIMESTAMP(NANOS) parquet, which Spark's TimestampType
    * (microseconds) cannot represent — the vectorized reader rejects the
    * file outright. Read nanos as Long (legacy conf, set session-level so
    * any caller-provided session works) and floor-divide to microseconds,
    * matching DuckDB's NS→US truncation. Integer `div`, not `/`: ns since
    * epoch ≈ 1.7e18 exceeds double's 53-bit mantissa. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(spark, dir, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** Name-dispatched loader — the single source of per-table read
    * handling (events' ns→µs conversion included), so SQL-facing code
    * never re-implements path conventions. */
  def byName(spark: SparkSession, dir: String, name: String): DataFrame = name match {
    case "region"     => region(spark, dir)
    case "nation"     => nation(spark, dir)
    case "customer"   => customer(spark, dir)
    case "supplier"   => supplier(spark, dir)
    case "part"       => part(spark, dir)
    case "orders"     => orders(spark, dir)
    case "lineitem"   => lineitem(spark, dir)
    case "events"     => events(spark, dir)
    case "documents"  => documents(spark, dir)
    case "embeddings" => embeddings(spark, dir)
    case other => throw new IllegalArgumentException(s"unknown table '$other'")
  }
}
