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

  // ---------------------------------------------------- label propagation

  test("labelProp: barbell hand values — left clique converges, bridge pulls") {
    // cliques {1,2,3} and {4,5,6}, bridge 3–4; two synchronous rounds
    // hand-unrolled: L1 = {1→2, 2→1, 3→1, 4→3, 5→4, 6→4} (min label on
    // all-tie neighborhoods), L2 = {1→1, 2→1, 3→1, 4→4, 5→3, 6→3}
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("src", "dst")
    val r = GraphOps.labelPropagation(edges, "src", "dst", iters = 2)
      .orderBy("node").as[(Long, Long)].collect()
    r shouldBe Array((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 3L),
      (6L, 3L))
  }

  test("labelProp: iters = 0 returns identity labels") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r = GraphOps.labelPropagation(edges, "src", "dst", iters = 0)
      .orderBy("node").as[(Long, Long)].collect()
    r shouldBe Array((1L, 1L), (2L, 2L), (3L, 3L))
  }

  test("labelProp: majority beats smaller label; ties take smallest") {
    // hub 9 with neighbors 5, 6, 7 relabeled by round 1; round 1 from
    // identity: hub sees {5,6,7} all count 1 → tie → 5
    val edges = Seq((9L, 5L), (9L, 6L), (9L, 7L)).toDF("src", "dst")
    val r1 = GraphOps.labelPropagation(edges, "src", "dst", iters = 1)
      .orderBy("node").as[(Long, Long)].collect()
    // leaves see only the hub (label 9); hub ties → min = 5
    r1 shouldBe Array((5L, 9L), (6L, 9L), (7L, 9L), (9L, 5L))
  }

  test("labelProp: duplicate and reverse edges collapse (no double votes)") {
    val clean = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val noisy = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    val a = GraphOps.labelPropagation(clean, "src", "dst", iters = 2)
      .orderBy("node").collect()
    val b = GraphOps.labelPropagation(noisy, "src", "dst", iters = 2)
      .orderBy("node").collect()
    a shouldBe b
  }

  test("labelProp: result independent of input partitioning") {
    val edges = (1 to 80).map(i => ((i % 20).toLong, ((i * 13 + 3) % 20).toLong))
      .toDF("src", "dst")
    val a = GraphOps.labelPropagation(edges, "src", "dst", iters = 3)
      .orderBy("node").collect()
    val b = GraphOps.labelPropagation(edges.repartition(7), "src", "dst", iters = 3)
      .orderBy("node").collect()
    a shouldBe b
  }

  test("empty edge relation: all three graph ops return empty, not error") {
    val empty = Seq.empty[(Long, Long)].toDF("src", "dst")
    GraphOps.triangleCounts(empty, "src", "dst").count() shouldBe 0L
    GraphOps.labelPropagation(empty, "src", "dst", iters = 2)
      .count() shouldBe 0L
    GraphOps.kCore(empty, "src", "dst", k = 2, rounds = 2)
      .count() shouldBe 0L
  }

  test("all-self-loop input collapses to empty for the undirected ops") {
    val loops = Seq((1L, 1L), (2L, 2L)).toDF("src", "dst")
    GraphOps.triangleCounts(loops, "src", "dst").count() shouldBe 0L
    GraphOps.kCore(loops, "src", "dst", k = 1, rounds = 1)
      .count() shouldBe 0L
  }

  // --------------------------------------------------------------- k-core

  test("kCore: triangle survives k=2 peeling, tail node drops") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val r = GraphOps.kCore(edges, "src", "dst", k = 2, rounds = 2)
      .orderBy("node").as[(Long, Long)].collect()
    r shouldBe Array((1L, 2L), (2L, 2L), (3L, 2L))
  }

  test("kCore: a path fully dissolves under k=2 (cascading peel)") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    GraphOps.kCore(edges, "src", "dst", k = 2, rounds = 2)
      .count() shouldBe 0L
  }

  test("kCore: one round leaves deg<k rows — the documented next-drop set") {
    // path 1–2–3–4–5, k=2: round 1 drops the endpoints; survivors
    // 2–3–4 now have degrees 1, 2, 1 — the <k rows a second round
    // would peel
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val r1 = GraphOps.kCore(edges, "src", "dst", k = 2, rounds = 1)
      .orderBy("node").as[(Long, Long)].collect()
    r1 shouldBe Array((2L, 1L), (3L, 2L), (4L, 1L))
    GraphOps.kCore(edges, "src", "dst", k = 2, rounds = 3)
      .count() shouldBe 0L
  }

  test("kCore: result independent of input partitioning") {
    val edges = (1 to 100).map(i => ((i % 25).toLong, ((i * 7 + 2) % 25).toLong))
      .toDF("src", "dst")
    val a = GraphOps.kCore(edges, "src", "dst", k = 3, rounds = 2)
      .orderBy("node").collect()
    val b = GraphOps.kCore(edges.repartition(9), "src", "dst", k = 3, rounds = 2)
      .orderBy("node").collect()
    a shouldBe b
  }

  // ------------------------------------------------------------ triangles

  test("triangles: K4 has 4, every node in 3; C4 (no chord) has none") {
    val k4 = Seq(("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"),
      ("c", "d")).toDF("src", "dst")
    val r = GraphOps.triangleCounts(k4, "src", "dst")
      .orderBy("node").as[(String, Long)].collect()
    r shouldBe Array(("a", 3L), ("b", 3L), ("c", 3L), ("d", 3L))

    val c4 = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"))
      .toDF("src", "dst")
    GraphOps.triangleCounts(c4, "src", "dst").count() shouldBe 0L
  }

  test("triangles: self-loops, duplicates, and reverse edges collapse") {
    // one real triangle, noised with every degenerate edge form
    val edges = Seq(("x", "x"), ("x", "y"), ("y", "x"), ("x", "y"),
      ("y", "z"), ("z", "x")).toDF("src", "dst")
    val r = GraphOps.triangleCounts(edges, "src", "dst")
      .orderBy("node").as[(String, Long)].collect()
    r shouldBe Array(("x", 1L), ("y", 1L), ("z", 1L))
  }

  test("triangles: star hub is triangle-free; hub wedges stay bounded") {
    // a 50-leaf star: the naive neighbor join would expand 50·49/2
    // wedges at the hub; degree orientation points every edge INTO the
    // hub (leaves have lower (deg, id)), so the hub has out-degree 0
    // and contributes no wedges at all
    val star = (1 to 50).map(i => (f"leaf$i%02d", "hub")).toDF("src", "dst")
    GraphOps.triangleCounts(star, "src", "dst").count() shouldBe 0L
  }

  test("triangles: differential vs naive triple join on a seeded graph") {
    // 200 pseudo-random edges over 40 nodes (hash-derived, seeded) —
    // pins the orientation algebra against the obviously-correct
    // a<b<c enumeration on a graph with mixed degrees
    val edges = (1 to 200)
      .map { i =>
        val a = math.abs((i * 2654435761L) % 40)
        val b = math.abs((i * 40503L + 7) % 40)
        (f"n$a%02d", f"n$b%02d")
      }
      .toDF("src", "dst")
    val fast = GraphOps.triangleCounts(edges, "src", "dst")
      .orderBy("node").as[(String, Long)].collect()

    val und = edges.selectExpr("least(src, dst) AS u", "greatest(src, dst) AS v")
      .filter(col("u") =!= col("v")).distinct()
    val e1 = und.select(col("u").as("a"), col("v").as("b"))
    val e2 = und.select(col("u").as("b"), col("v").as("c"))
    val e3 = und.select(col("u").as("a"), col("v").as("c"))
    val tri = e1.join(e2, "b").join(e3, Seq("a", "c"))
    val naive = tri.selectExpr("explode(array(a, b, c)) AS node")
      .groupBy("node").agg(count(lit(1)).as("n_tri"))
      .orderBy("node").as[(String, Long)].collect()
    fast shouldBe naive
  }

  test("triangles: result independent of input partitioning") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("c", "d"),
      ("d", "a")).toDF("src", "dst")
    val a = GraphOps.triangleCounts(edges, "src", "dst")
      .orderBy("node").collect()
    val b = GraphOps.triangleCounts(edges.repartition(5), "src", "dst")
      .orderBy("node").collect()
    a shouldBe b
  }
}
