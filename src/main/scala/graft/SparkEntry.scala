package graft

import graft.queries.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog itself lives in graft.queries (one QuerySpec per
  * operator from SURVEY.md §2, Spark code and DuckDB oracle side by
  * side); this object just adapts it to the driver's shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks
    * rows>0. The data-mart pipeline: dimension joins + CASE bucketing +
    * pivoted per-user activity (the reference's centerpiece shape,
    * data_mart.scala:111-135). */
  def entry(spark: SparkSession): DataFrame =
    queries("q25_datamart")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. (lazy vals:
    * Bench/Verify index these in per-query loops — the catalog maps
    * are built once, not once per lookup.) */
  lazy val queries: Map[String, (SparkSession, String) => DataFrame] =
    Catalog.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashing DuckDB can't
    * reproduce (xxhash64 sketches) → driver records rows-only checks. */
  lazy val oracleSql: Map[String, String] =
    Catalog.all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap

  /** Headline subset timed by graft.Bench. */
  lazy val benchQueries: Seq[String] = Catalog.all.filter(_.bench).map(_.name)
}
