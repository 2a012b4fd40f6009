package graft.io

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

class UsersItemsPipelineSpec extends SparkSpec {

  test("two incremental runs in update mode equal one whole-log run") {
    val snap = Files.createTempDirectory("graft_ui").toString + "/snapshot"
    spark.conf.set(s"${UsersItemsPipeline.Prefix}.update_mode", "true")
    try {
      // day 1..15 slice, then the rest — mirrors a daily batch cadence
      UsersItemsPipeline.run(spark, sfDir, snap,
        _.filter(dayofmonth(col("ts")) <= 15))
      val updated = UsersItemsPipeline.run(spark, sfDir, snap,
        _.filter(dayofmonth(col("ts")) > 15))
      val whole = UsersItemsPipeline.run(spark, sfDir,
        Files.createTempDirectory("graft_ui2").toString + "/s")
      rows(updated.exceptAll(whole)) shouldBe empty
      rows(whole.exceptAll(updated)) shouldBe empty
    } finally spark.conf.unset(s"${UsersItemsPipeline.Prefix}.update_mode")
  }

  test("without update mode a rerun replaces the snapshot instead of merging") {
    val snap = Files.createTempDirectory("graft_ui3").toString + "/snapshot"
    // materialize before the second run overwrites the snapshot files
    val first = rows(UsersItemsPipeline.run(spark, sfDir, snap)
      .orderBy("user_id")).map(_.toSeq)
    val second = rows(UsersItemsPipeline.run(spark, sfDir, snap)
      .orderBy("user_id")).map(_.toSeq)
    second shouldBe first // identical, not doubled
  }
}
