package graft

import org.apache.spark.sql.functions._

class SqlFacadeSpec extends SparkSpec {

  test("SQL front end produces the same result as the DataFrame catalog query") {
    SqlFacade.register(spark, sfDir)
    val viaSql = spark.sql("""
      SELECT r_name, n_name,
             round(sum(o_totalprice), 2) AS revenue,
             count(*) AS n_orders
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name""")
    val viaDf = SparkEntry.queries("q04_join_inner_revenue")(spark, sfDir)
    rows(viaSql) shouldBe rows(viaDf)
  }

  test("graft SQL functions and views compose: cosine similarity over embeddings in pure SQL") {
    SqlFacade.register(spark, sfDir)
    val top = spark.sql("""
      SELECT a.vec_id AS qa, b.vec_id AS qb,
             round(cosine_similarity(a.embedding, b.embedding), 4) AS sim
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      ORDER BY sim DESC, qa, qb
      LIMIT 5""").collect()
    top.length shouldBe 5
    // agrees with the native column API on the same pair
    val (qa, qb, sim) = (top.head.getLong(0), top.head.getLong(1), top.head.getDouble(2))
    val direct = Tables.embeddings(spark, sfDir)
    val a = direct.filter(col("vec_id") === qa).select(col("embedding").as("va"))
    val b = direct.filter(col("vec_id") === qb).select(col("embedding").as("vb"))
    val check = a.crossJoin(b)
      .select(round(graft.functions.VectorFns.cosine(col("va"), col("vb")), 4))
      .collect()(0).getDouble(0)
    check shouldBe sim
  }

  test("events view carries the ns→µs timestamp handling") {
    SqlFacade.register(spark, sfDir)
    val n = spark.sql(
      "SELECT count(*) FROM events WHERE ts >= timestamp'2020-01-01 00:00:00'")
      .collect()(0).getLong(0)
    n should be > 0L
  }
}
