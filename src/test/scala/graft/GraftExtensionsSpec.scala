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

  test("top_k_pairs callable from SQL as an aggregate, coercing int inputs") {
    GraftExtensions.register(spark)
    val rows = spark.sql(
      "SELECT g, top_k_pairs(s, id, 2) AS nn FROM VALUES" +
        " ('a', 1, 10), ('a', 3, 20), ('a', 2, 30), ('a', 3, 5)" +
        " AS t(g, s, id) GROUP BY g")
      .selectExpr("g", "inline(nn)")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    rows shouldBe Seq(("a", 3.0, 5L), ("a", 3.0, 20L))
  }

  test("top_k_pairs rejects a non-literal k") {
    GraftExtensions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT top_k_pairs(s, id, id) FROM VALUES (1.0, 10L) AS t(s, id)")
        .collect()
    }
    ex.getMessage should include("literal int")
  }

  test("unicode_normalize callable from SQL; form must be a literal") {
    GraftExtensions.register(spark)
    // decomposed e + combining acute → composed é under NFC
    val r = spark.sql(
      "SELECT unicode_normalize('é', 'NFC') AS n").collect()(0)
    r.getString(0) shouldBe "é"
    val ex = intercept[Exception] {
      spark.sql("SELECT unicode_normalize(t, t) FROM VALUES ('x') AS v(t)")
        .collect()
    }
    ex.getMessage should include("literal")
  }

  test("bounded_collect callable from SQL: exact count, capped members") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      "SELECT g, bounded_collect(id, 2) AS bc FROM VALUES" +
        " ('a', 3), ('a', 1), ('a', 2), ('b', 9)" +
        " AS t(g, id) GROUP BY g ORDER BY g")
      .selectExpr("g", "bc.n", "size(bc.items)")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSeq
    // group a: exact count 3, members hard-capped at 2
    r shouldBe Seq(("a", 3L, 2), ("b", 1L, 1))
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
