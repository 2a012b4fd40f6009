package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed PageRank fixtures: the cycle fixed point, star
  * accumulation, teleport floor, dangling absorption, duplicate-edge
  * collapse, and partitioning independence. q109 carries the full
  * two-round DuckDB oracle on the purchase graph.
  */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  test("2-cycle is the fixed point: ranks stay at r0 every round") {
    // a→b, b→a, outdeg 1 each: 150000 + (8500·10⁶) div 10⁴ = 10⁶
    val edges = Seq(("a", "b"), ("b", "a")).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .orderBy("node").as[(String, Long)].collect()
    r shouldBe Array(("a", 1000000L), ("b", 1000000L))
  }

  test("star: the hub accumulates, leaves settle at the teleport floor") {
    // a→b, c→b after 1 round: b = 150000 + (8500·(10⁶+10⁶)) div 10⁴
    //                            = 1850000; a, c = 150000 (no in-edges)
    val edges = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iters = 1)
      .orderBy("node").as[(String, Long)].collect()
    r shouldBe Array(("a", 150000L), ("b", 1850000L), ("c", 150000L))
  }

  test("second round: drained leaves shrink the hub (exact integers)") {
    // round 2: b = 150000 + (8500·(150000+150000)) div 10⁴ = 405000
    val edges = Seq(("a", "b"), ("c", "b")).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iters = 2)
      .filter(col("node") === "b").as[(String, Long)].collect()
    r shouldBe Array(("b", 405000L))
  }

  test("duplicate edges collapse; dangling node absorbs without redistributing") {
    // a→b twice = once; b dangles (keeps rank, contributes nothing)
    val edges = Seq(("a", "b"), ("a", "b")).toDF("src", "dst")
    val r = GraphOps.pageRank(edges, "src", "dst", iters = 1)
      .orderBy("node").as[(String, Long)].collect()
    r shouldBe Array(("a", 150000L), ("b", 1000000L))
  }

  test("iters = 0 returns the uniform init; empty edges yield no nodes") {
    val edges = Seq(("a", "b")).toDF("src", "dst")
    GraphOps.pageRank(edges, "src", "dst", iters = 0)
      .select("rank_micro").as[Long].collect().toSet shouldBe Set(1000000L)
    val none = Seq.empty[(String, String)].toDF("src", "dst")
    GraphOps.pageRank(none, "src", "dst", iters = 2).count() shouldBe 0L
  }

  test("ranks independent of input partitioning") {
    val edges = (1 to 60).map(i => (s"n${i % 12}", s"n${(i * 7) % 12}"))
      .toDF("src", "dst")
    val a = GraphOps.pageRank(edges, "src", "dst", iters = 3)
      .orderBy("node").collect()
    val b = GraphOps.pageRank(edges.repartition(9), "src", "dst", iters = 3)
      .orderBy("node").collect()
    a shouldBe b
  }
}
