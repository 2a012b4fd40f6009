package graft

import org.apache.spark.sql.SparkSession

/** Driver-smoke stand-in: builds a VANILLA session (no graft configs —
  * exactly what the external driver does) and checks entry() returns
  * rows on sf0.001. Guards against anything in the library that quietly
  * depends on GraftSession-only settings. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-smoke")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.entry(spark).count()
    println(s"SMOKE entry rows=$n ${if (n > 0) "OK" else "EMPTY"}")
    spark.stop()
    if (n <= 0) sys.exit(1)
  }
}
