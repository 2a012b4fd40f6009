package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSpec extends SparkSpec {
  import spark.implicits._

  test("connectedComponents labels chains, triangles, and isolates correctly") {
    // components: {1,2,3,4} (chain), {10,11,12} (triangle), {20,21}
    val pairs = Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (20L, 21L)
    ).toDF("id_a", "id_b")
    val out = rows(Dedup.connectedComponents(pairs).orderBy("doc"))
      .map(r => (r.getLong(0), r.getLong(1)))
    out shouldBe Seq(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L,
      20L -> 20L, 21L -> 20L)
  }

  test("connectedComponents converges on a long chain (diameter > 2)") {
    val chain = (1L until 30L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = Dedup.connectedComponents(chain, maxIters = 50)
    rows(out.select("cluster").distinct()).map(_.getLong(0)) shouldBe Seq(1L)
  }

  test("nearDupGroups: every doc in exactly one group, sizes sum to corpus") {
    val docs = graft.Tables.documents(spark, sfDir)
    val groups = Dedup.nearDupGroups(docs, "doc_id", "text")
    val total = rows(groups.agg(sum(col("group_size")))).head.getLong(0)
    total shouldBe docs.count()
    // keep ids are distinct docs
    groups.select("keep_id").distinct().count() shouldBe groups.count()
  }
}
