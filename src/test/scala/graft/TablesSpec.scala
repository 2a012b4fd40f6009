package graft

import org.apache.spark.sql.functions._

/** [[Tables]] read-path contracts that go beyond "the oracle queries
  * pass": the events() timezone handling must not leak session-level
  * side effects into caller sessions. */
class TablesSpec extends SparkSpec {

  test("events() restores the caller's session timezone and still reads UTC-pinned instants") {
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      // baseline instants under the normal UTC session
      spark.conf.set("spark.sql.session.timeZone", "UTC")
      val utcMin = eval1(Tables.events(spark, sfDir)
        .agg(min(unix_micros(col("ts")))))
      // a non-UTC caller: the NTZ→timestamp cast must still resolve
      // under the UTC pin (instant parity with the UTC read), and the
      // caller's zone must survive the call — the round-6 version
      // left the session permanently switched to UTC
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val e = Tables.events(spark, sfDir)
      spark.conf.get("spark.sql.session.timeZone") shouldBe "America/New_York"
      // execution happens AFTER the restore; the analysis-time pin
      // must have baked UTC into the cast
      eval1(e.agg(min(unix_micros(col("ts"))))) shouldBe utcMin
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }
}
