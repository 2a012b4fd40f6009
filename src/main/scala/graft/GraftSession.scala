package graft

import org.apache.spark.sql.SparkSession

/** One place for session tuning so Verify / Bench / tests run the same
  * engine configuration (SURVEY.md §2.12).
  *
  * Knobs and why (sized for local[32]; the same settings scale to a real
  * cluster where shuffle.partitions tracks total cores):
  *  - AQE on: runtime coalescing of shuffle partitions + skew-join
  *    splitting replaces the reference's hand-tuned repartition(2/5)
  *    (SURVEY §4).
  *  - shuffle.partitions = cores, not 200: at local scale 200 partitions
  *    means 200 tiny tasks per exchange — pure scheduler overhead.
  *  - UTC timezone: oracle comparability (build.sbt sets it too; set
  *    here as well so tests launched any other way agree).
  */
object GraftSession {
  def build(master: String, shufflePartitions: Int,
            appName: String = "graft"): SparkSession =
    SparkSession.builder()
      .master(master)
      .appName(appName)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // plan RENDERING must never threaten the driver heap: deeply
      // composed pipelines (multi-detector decontamination etc.) reach
      // plan strings of hundreds of MB at the default ~2GB cap, built
      // eagerly by AQE's explain updates. 8 MB keeps every diagnostic
      // readable while bounding the allocation.
      .config("spark.sql.maxPlanStringLength", (8 * 1024 * 1024).toString)
      // static conf, default 100 compiled classes: a multi-query
      // session (Bench's 15 queries x several codegen fragments each,
      // Verify's 90+) evicts LRU entries mid-run and silently re-pays
      // seconds of janino per evicted shape — measured as a ~0.5s
      // in-suite penalty on q27 vs the same query isolated. 1000
      // entries holds every shape this library generates; memory cost
      // is tens of MB of classes on a 100+ GB driver.
      .config("spark.sql.codegen.cache.maxEntries", "1000")
      .getOrCreate()
}
