package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL entry path: register the testdata tables as temp views (+ the
  * graft SQL functions) so the whole engine is drivable from
  * `spark.sql(...)` as well as the DataFrame API — both front ends
  * build the same Catalyst plans, so every optimization in SCALE.md
  * applies identically.
  */
object SqlFacade {

  val TableNames: Seq[String] = Seq("region", "nation", "customer",
    "supplier", "part", "orders", "lineitem", "events", "documents",
    "embeddings")

  /** Create one temp view per testdata table and register graft's SQL
    * functions on the session. */
  def register(spark: SparkSession, sfDir: String): Unit = {
    // dispatch through the typed loaders so per-table read handling
    // (events' ns→µs conversion, any future case) can't diverge
    // between the SQL views and the DataFrame API
    TableNames.foreach(t =>
      Tables.byName(spark, sfDir, t).createOrReplaceTempView(t))
    GraftExtensions.register(spark)
  }

  def sql(spark: SparkSession, query: String): DataFrame = spark.sql(query)
}
