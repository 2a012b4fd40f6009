package graft.tools

import org.apache.spark.sql.execution.ExplainMode

/** Dumps `.explain("formatted")` output (post-execution, so AQE's
  * FINAL plan is shown) for bench queries into a directory — the
  * round-17 optimization evidence files (`plans/r17/<q>_<tag>.txt`).
  *
  * Usage: runMain graft.tools.ExplainDump <outDir> <tag> [sfDir] [q...]
  * Each query is materialized through the noop sink first (guide §1.4:
  * every column of every row computes, nothing is written), then the
  * formatted plan of that same execution is written.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val sfDir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val only = args.drop(3).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.GraftSession.build(s"local[$cpus]", cpus.toInt,
      "graft-explaindump")
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    val names = graft.SparkEntry.benchQueries
      .filter(n => only.isEmpty || only.exists(n.startsWith))
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"explaindump: $name")
      val df = graft.SparkEntry.queries(name)(spark, sfDir)
      df.write.format("noop").mode("overwrite").save()
      val txt = df.queryExecution.explainString(
        ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(outDir, s"${name}_$tag.txt"), txt)
      println(s"[explaindump] $name -> $outDir/${name}_$tag.txt " +
        s"(${txt.length} chars)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
