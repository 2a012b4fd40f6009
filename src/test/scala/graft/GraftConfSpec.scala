package graft

class GraftConfSpec extends SparkSpec {

  test("defaults apply when keys are unset") {
    val c = GraftConf(spark, "spark.graft.test0")
    c.updateMode shouldBe false
    c.triggerSeconds shouldBe 10
    c.watermark shouldBe "1 hour"
  }

  test("typed reads parse and validate") {
    val p = "spark.graft.test1"
    spark.conf.set(s"$p.update_mode", "1")
    spark.conf.set(s"$p.trigger_seconds", "5")
    spark.conf.set(s"$p.watermark", "30 minutes")
    try {
      val c = GraftConf(spark, p)
      c.updateMode shouldBe true
      c.triggerSeconds shouldBe 5
      c.watermark shouldBe "30 minutes"
    } finally Seq("update_mode", "trigger_seconds", "watermark")
      .foreach(k => spark.conf.unset(s"$p.$k"))
  }

  test("booleans parse case-insensitively (a Python driver writes str(True))") {
    val p = "spark.graft.test3"
    spark.conf.set(s"$p.update_mode", "True")
    try GraftConf(spark, p).updateMode shouldBe true
    finally spark.conf.unset(s"$p.update_mode")
    spark.conf.set(s"$p.update_mode", "FALSE")
    try GraftConf(spark, p).updateMode shouldBe false
    finally spark.conf.unset(s"$p.update_mode")
  }

  test("Tables.byName rejects unknown names instead of guessing a path") {
    intercept[IllegalArgumentException](
      Tables.byName(spark, "/tmp", "no_such_table"))
  }

  test("malformed values throw with the offending key in the message") {
    val p = "spark.graft.test2"
    spark.conf.set(s"$p.trigger_seconds", "soon")
    try {
      val e = intercept[IllegalArgumentException](
        GraftConf(spark, p).triggerSeconds)
      e.getMessage should include(s"$p.trigger_seconds")
    } finally spark.conf.unset(s"$p.trigger_seconds")
  }
}
