package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the retrieval + corpus-surgery family:
  * LineDedup (first-occurrence winners, rebuild order, empty-doc rows),
  * Retrieval.bm25TopK (length normalization, idf ordering, integer
  * scores), Retrieval.rrfFuse (exact integer fusion terms), and
  * Sampling.epochReplicate (replication counts, drop-at-zero, position
  * permutation, partitioning independence). The q103–q106 catalog
  * entries carry the full DuckDB oracle checks; these pin the edge
  * cases the sf corpus doesn't exercise.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  // ---------------------------------------------------------------- LineDedup

  test("LineDedup: first (id, pos) occurrence wins; later copies drop") {
    val docs = Seq(
      (1L, "alpha\nshared line\nbeta"),
      (2L, "shared line\ngamma"),
      (3L, "shared line"))
      .toDF("doc_id", "text")
    val out = LineDedup.firstOccurrence(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    out shouldBe Array(
      (1L, 3, 3, "alpha\nshared line\nbeta"),
      (2L, 2, 1, "gamma"),
      (3L, 1, 0, ""))
  }

  test("LineDedup: rebuild preserves original line order, not sort order") {
    val docs = Seq((1L, "zebra\napple\nmango")).toDF("doc_id", "text")
    val out = LineDedup.firstOccurrence(docs, "doc_id", "text").collect()(0)
    out.getAs[String]("clean") shouldBe "zebra\napple\nmango"
  }

  test("LineDedup: empty/NULL text keeps a row with zero lines") {
    val docs = Seq((1L, "a"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = LineDedup.firstOccurrence(docs, "doc_id", "text")
      .orderBy("doc_id")
      .as[(Long, Int, Int, String)].collect()
    out shouldBe Array((1L, 1, 1, "a"), (2L, 0, 0, ""), (3L, 0, 0, ""))
  }

  test("LineDedup: duplicate line WITHIN one doc keeps only the first") {
    val docs = Seq((1L, "x\ny\nx")).toDF("doc_id", "text")
    val out = LineDedup.firstOccurrence(docs, "doc_id", "text").collect()(0)
    out.getAs[Int]("n_lines") shouldBe 3
    out.getAs[Int]("n_kept") shouldBe 2
    out.getAs[String]("clean") shouldBe "x\ny"
  }

  test("LineDedup: result independent of input partitioning") {
    val docs = Seq((1L, "p\nq"), (2L, "q\nr"), (3L, "r\np"))
      .toDF("doc_id", "text")
    val a = LineDedup.firstOccurrence(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    val b = LineDedup.firstOccurrence(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id").collect()
    a shouldBe b
  }

  test("intraDoc: repeats within a doc drop, order preserved") {
    val docs = Seq((1L, "nav\nalpha\nnav\nbeta\nalpha\nnav"))
      .toDF("doc_id", "text")
    val out = LineDedup.intraDoc(docs, "doc_id", "text")
      .as[(Long, Int, Int, String)].collect()
    out shouldBe Array((1L, 6, 3, "nav\nalpha\nbeta"))
  }

  test("intraDoc: does NOT dedupe across documents (scope is the doc)") {
    // the same shared line survives in BOTH docs — the exact point
    // where intraDoc and firstOccurrence diverge
    val docs = Seq((1L, "shared\na"), (2L, "shared\nb")).toDF("doc_id", "text")
    val out = LineDedup.intraDoc(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect()
    out shouldBe Array((1L, 2, 2, "shared\na"), (2L, 2, 2, "shared\nb"))
  }

  test("intraDoc: empty lines dropped; empty/NULL text yields (0, 0, '')") {
    val docs = Seq((1L, "a\n\n\na"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = LineDedup.intraDoc(docs, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Int, Int, String)].collect()
    out shouldBe Array((1L, 2, 1, "a"), (2L, 0, 0, ""), (3L, 0, 0, ""))
  }

  test("intraDoc agrees with firstOccurrence on a one-document corpus") {
    // with a single doc the corpus-level and intra-doc rules coincide
    val docs = Seq((7L, "x\ny\nx\nz\ny")).toDF("doc_id", "text")
    val a = LineDedup.intraDoc(docs, "doc_id", "text").collect()
    val b = LineDedup.firstOccurrence(docs, "doc_id", "text").collect()
    a shouldBe b
  }

  test("intraDoc plan is shuffle-free (narrow, scan-local)") {
    val docs = Seq((1L, "a\nb\na")).toDF("doc_id", "text")
    val plan = LineDedup.intraDoc(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    plan should not include "Exchange"
  }

  // ------------------------------------------------------------------- BM25

  test("bm25TopK: shorter doc outranks longer at equal tf (length norm)") {
    val docs = Seq(
      (1L, "hit pad pad pad pad pad pad pad pad pad pad pad pad pad pad"),
      (2L, "hit pad"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("hit"), k = 10)
      .orderBy("rank").as[(Int, Long, Int, Long, Double)].collect()
    out.map(_._2) shouldBe Array(2L, 1L) // short doc first
    out.foreach(_._3 shouldBe 1)         // one query term hit each
  }

  test("bm25TopK: rarer term contributes more than a common one (idf)") {
    // 'rare' appears in 1 of 4 docs, 'common' in all 4; docs 1 and 2
    // have identical length so only idf separates them
    val docs = Seq(
      (1L, "rare pad"), (2L, "common pad"),
      (3L, "common stuffing"), (4L, "common filler"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
        Seq("rare", "common"), k = 10)
      .orderBy("rank").as[(Int, Long, Int, Long, Double)].collect()
    out.head._2 shouldBe 1L
    // docs with no query term are absent
    out.map(_._2).toSet should not contain 5L
    out.length shouldBe 4
  }

  test("bm25TopK: integer micro-scores, ties broken by id") {
    // identical docs → identical score_micro; rank order = id order
    val docs = Seq((3L, "hit pad"), (1L, "hit pad"), (2L, "hit pad"))
      .toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text", Seq("hit"), k = 10)
      .orderBy("rank").as[(Int, Long, Int, Long, Double)].collect()
    out.map(_._2) shouldBe Array(1L, 2L, 3L)
    out.map(_._4).distinct.length shouldBe 1
  }

  // -------------------------------------------------------------------- RRF

  test("rrfFuse: exact integer fusion of two lists") {
    // c=60: rank 1 → 1000000 div 61 = 16393, rank 2 → 1000000 div 62 = 16129
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, b), "id", k = 10)
      .orderBy("rank").as[(Int, Long, Int, Long, Double)].collect()
    out shouldBe Array(
      (1, 2L, 2, 32522L, 0.032522), // both lists: 16129 + 16393
      (2, 1L, 1, 16393L, 0.016393),
      (3, 3L, 1, 16129L, 0.016129))
  }

  test("rrfFuseWeighted: weights as data flip the fused winner; exact integers") {
    // two rankers in perfect disagreement: equal weights tie on
    // rrf_micro (id breaks it); up-weighting ranker B must crown ITS
    // favorite — the user tunes the mix, the operator doesn't change
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank") // A prefers doc 1
    val b = Seq((2L, 1), (1L, 2)).toDF("id", "rank") // B prefers doc 2
    val equal = Retrieval.rrfFuseWeighted(Seq((a, 10000L), (b, 10000L)),
        "id", k = 10)
      .orderBy("rank").as[(Int, Long, Int, Long, Double)].collect()
    equal.map(_._2) shouldBe Array(1L, 2L)        // tie → id asc
    equal.map(_._4).distinct shouldBe Array(32522L) // 16393 + 16129 both
    val bHeavy = Retrieval.rrfFuseWeighted(Seq((a, 10000L), (b, 20000L)),
        "id", k = 10)
      .orderBy("rank").as[(Int, Long, Int, Long, Double)].collect()
    bHeavy.map(_._2) shouldBe Array(2L, 1L)
    // doc 2: A rank2 16129 + 2×(B rank1 16393) = 48915, exact
    bHeavy.head._4 shouldBe 16129L + 2 * 16393L
  }

  test("rrfFuse ≡ rrfFuseWeighted at weight 1.0 (the q105/q165 paths are untouched)") {
    val a = Seq((1L, 1), (2L, 2)).toDF("id", "rank")
    val b = Seq((2L, 1), (3L, 2)).toDF("id", "rank")
    val plain = Retrieval.rrfFuse(Seq(a, b), "id", k = 10)
      .collect().map(_.toSeq)
    val weighted = Retrieval.rrfFuseWeighted(Seq((a, 10000L), (b, 10000L)),
      "id", k = 10).collect().map(_.toSeq)
    weighted shouldBe plain
  }

  test("rrfFuse: k truncates after fusion, ties break by id") {
    val a = Seq((5L, 1), (4L, 2), (3L, 3)).toDF("id", "rank")
    val out = Retrieval.rrfFuse(Seq(a, a), "id", k = 2)
      .orderBy("rank").as[(Int, Long, Int, Long, Double)].collect()
    out.map(_._2) shouldBe Array(5L, 4L)
    out.foreach(_._3 shouldBe 2)
  }

  // --------------------------------------------------------- epochReplicate

  test("epochReplicate: per-group copy counts; zero-epoch group dropped") {
    val docs = Seq((1L, "up3"), (2L, "up3"), (3L, "up2"), (4L, "drop"),
      (5L, "other")).toDF("doc_id", "source")
    val out = Sampling.epochReplicate(docs, "doc_id", "source",
      Map("up3" -> 3, "up2" -> 2, "drop" -> 0))
    val counts = out.groupBy("source").count().as[(String, Long)]
      .collect().toMap
    counts shouldBe Map("up3" -> 6L, "up2" -> 2L, "other" -> 1L)
    // epoch numbering is 1-based per copy
    out.filter(col("doc_id") === 1L).select("epoch").as[Int]
      .collect().sorted shouldBe Array(1, 2, 3)
  }

  test("epochReplicate: pos is a permutation of 1..n over the replicated stream") {
    val docs = Seq((1L, "a"), (2L, "a"), (3L, "b")).toDF("doc_id", "source")
    val out = Sampling.epochReplicate(docs, "doc_id", "source", Map("a" -> 2))
    val pos = out.select("pos").as[Long].collect().sorted
    pos shouldBe (1L to 5L).toArray
  }

  test("epochReplicate: NULL group takes defaultEpochs; determinism across partitioning") {
    val docs = Seq((1L, null.asInstanceOf[String]), (2L, "g"))
      .toDF("doc_id", "source")
    val out = Sampling.epochReplicate(docs, "doc_id", "source",
      Map("g" -> 2), defaultEpochs = 2)
    out.count() shouldBe 4L
    val a = Sampling.epochReplicate(docs, "doc_id", "source", Map("g" -> 2),
      defaultEpochs = 2).orderBy("pos").collect()
    val b = Sampling.epochReplicate(docs.repartition(5), "doc_id", "source",
      Map("g" -> 2), defaultEpochs = 2).orderBy("pos").collect()
    a shouldBe b
  }

  test("phraseSearch: overlaps, repeated words, and degenerate inputs") {
    import spark.implicits._
    def search(docs: Seq[(Long, String)], phrase: Seq[String]) =
      rows(Retrieval.phraseSearch(
          docs.toDF("doc_id", "text"), "doc_id", "text", phrase)
        .orderBy("doc_id"))
        .map(r => r.getLong(0) -> r.getLong(1))
    // overlapping runs of a repeated-word phrase count separately
    search(Seq((1L, "x x x"), (2L, "x x"), (3L, "x y x")),
      Seq("x", "x")) shouldBe Seq(1L -> 2L, 2L -> 1L)
    // multi-token phrase with interleaved overlap: "a b a b a" holds
    // "a b a" at anchors 0 and 2
    search(Seq((1L, "a b a b a"), (2L, "a b b a")),
      Seq("a", "b", "a")) shouldBe Seq(1L -> 2L)
    // single-token phrase degrades to occurrence counting
    search(Seq((1L, "t q t t"), (2L, "q q")), Seq("t")) shouldBe
      Seq(1L -> 3L)
    // absent phrase and NULL text produce no rows at all
    search(Seq((1L, "a b c")), Seq("z", "z")) shouldBe empty
    rows(Retrieval.phraseSearch(
      Seq((1L, null: String)).toDF("doc_id", "text"),
      "doc_id", "text", Seq("a"))) shouldBe empty
  }

  test("queryLikelihood: tf orders hits; zero-hit docs still rank via the prior") {
    val docs = Seq(
      (1L, "spark spark other"),
      (2L, "spark other other"),
      (3L, "other other other")).toDF("doc_id", "text")
    val out = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
        Seq("spark"), k = 10)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getInt(2)))
    // unlike BM25 (hits only), EVERY doc scores — absence costs
    // through the collection prior, so d3 ranks last, not missing
    out.map(_._2).toSeq shouldBe Seq(1L, 2L, 3L)
    out.map(_._3).toSeq shouldBe Seq(1, 1, 0)
    // a corpus-absent query term is dropped, not a crash or a -inf
    val withOov = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
        Seq("spark", "zzznope"), k = 10)
      .collect().map(_.getLong(1)).toSeq
    withOov shouldBe Seq(1L, 2L, 3L)
  }

  test("queryLikelihood and BM25 agree on the head for a distinctive term") {
    val docs = graft.Tables.documents(spark, sfDir)
    val ql = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("spark"), k = 5).collect().map(_.getLong(1)).toSet
    val bm = Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("spark"), k = 5).collect().map(_.getLong(1)).toSet
    // same single-term signal → heavy overlap (identical tf ordering
    // modulo each model's length normalization)
    (ql intersect bm).size should be >= 3
  }
}
