package graft

import org.apache.spark.sql.SparkSession

/** Typed job configuration over `spark.conf` — the reference
  * parameterizes every module through ad-hoc string reads under
  * app-specific prefixes (SURVEY.md C3: `spark.filter.*`,
  * `spark.users_items.*`, `spark.mlproject.*`) and branches driver
  * logic on raw strings (C4: `updateMode == "1"`). This wraps the same
  * mechanism in typed, defaulted, validated accessors under one prefix.
  *
  * Usage: `val conf = GraftConf(spark); if (conf.updateMode) ...` —
  * set externally via `--conf spark.graft.update_mode=true`.
  */
final case class GraftConf(spark: SparkSession, prefix: String = "spark.graft") {

  private def get(key: String): Option[String] =
    spark.conf.getOption(s"$prefix.$key").map(_.trim).filter(_.nonEmpty)

  def string(key: String, default: String): String = get(key).getOrElse(default)

  def int(key: String, default: Int): Int =
    get(key).map { v =>
      v.toIntOption.getOrElse(
        throw new IllegalArgumentException(s"$prefix.$key must be an int, got '$v'"))
    }.getOrElse(default)

  def bool(key: String, default: Boolean): Boolean =
    get(key).map { raw =>
      // case-insensitive like Spark's own conf parsing: a Python-side
      // driver writes str(True) == "True"
      raw.toLowerCase match {
        case "true" | "1"  => true
        case "false" | "0" => false
        case _ => throw new IllegalArgumentException(
          s"$prefix.$key must be a boolean, got '$raw'")
      }
    }.getOrElse(default)

  // ---- the reference's parameter surface, typed --------------------------

  /** users_items update mode (C4): merge with the previous snapshot. */
  def updateMode: Boolean = bool("update_mode", default = false)

  /** Input/output roots (filter.scala:23-25 shape). */
  def inputDir: String = string("input_dir", "/root/testdata/sf0.001")
  def outputDir: String = string("output_dir", "/tmp/graft_out")

  /** Streaming knobs (agg.scala:21,73). */
  def triggerSeconds: Int = int("trigger_seconds", 10)
  def windowMinutes: Int = int("window_minutes", 60)
  def watermark: String = string("watermark", "1 hour")

  /** Feature-space cap (features.scala:36). */
  def topDomains: Int = int("top_domains", 1000)
}
