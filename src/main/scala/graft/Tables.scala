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

  /** events.ts normalizes to session-zoned TimestampType regardless of
    * how the driver generated the file — the generator's physical type
    * has changed across rounds, and every downstream query assumes one
    * logical type:
    *  - TIMESTAMP(NANOS): Spark's TimestampType (µs) can't represent it
    *    and the vectorized reader rejects the file. Read nanos as Long
    *    (legacy conf, set session-level so any caller-provided session
    *    works) and floor-divide to µs, matching DuckDB's NS→US
    *    truncation. Integer `div`, not `/`: ns since epoch ≈ 1.7e18
    *    exceeds double's 53-bit mantissa.
    *  - timestamp[us] without timezone (TIMESTAMP_NTZ): cast to
    *    TimestampType — a pure relabel under the session's fixed UTC
    *    timezone (GraftSession), no instant shift.
    *  - already TimestampType: pass through. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType}
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // The NTZ→TimestampType cast below is instant-preserving only under
    // UTC. GraftSession pins it, but this accepts any caller session —
    // pin it for the cast, then RESTORE the caller's zone: Dataset
    // analysis is eager and ResolveTimeZone bakes the session zone into
    // the Cast at that point, so the restore cannot shift this read,
    // and a non-UTC caller's later timestamp work stays in their zone.
    // (nanosAsLong deliberately stays set: the parquet reader consults
    // it per file at EXECUTION, so restoring it would break the scan.)
    val prevTz = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      val raw = read(spark, dir, "events")
      raw.schema("ts").dataType match {
        case LongType => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prevTz)
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
