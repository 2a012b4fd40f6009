package graft

import org.apache.spark.sql.SparkSession

class GraftExtensionsSpec extends SparkSpec {

  test("cosine_similarity callable from SQL after registration") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT cosine_similarity(array(1.0F, 0.0F), array(1.0F, 0.0F)) AS s," +
        " cosine_similarity(array(1.0F, 0.0F), array(0.0F, 1.0F)) AS o")
      .collect()(0)
    r.getDouble(0) shouldBe 1.0 +- 1e-12
    r.getDouble(1) shouldBe 0.0 +- 1e-12
  }

  test("extension class injects without error (config wiring is creation-time only)") {
    // Config-based wiring (spark.sql.extensions=graft.GraftExtensions)
    // only runs at SparkSession CREATION, which a shared-JVM suite can't
    // exercise end-to-end; the SQL test above drives the same builder
    // through the live registry. Here: the injection call itself.
    noException should be thrownBy
      new GraftExtensions().apply(new org.apache.spark.sql.SparkSessionExtensions)
  }
}
