package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[BigramLm]] — conditional-probability quality scoring. The q134
  * oracle proves engine parity; this spec pins the math on hand
  * fixtures and the DISCRIMINATION the operator exists for: scrambled
  * text scores below natural word order even when unigram frequencies
  * are identical (exactly what [[UnigramLm]] cannot see). */
class BigramLmSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed conditional log-probs on a two-doc corpus") {
    // corpus pairs: (a,b)×2, (b,a)×1, (b,c)×1 → c(a·)=2, c(b·)=2
    val docs = Seq((1L, "a b a"), (2L, "a b c")).toDF("doc_id", "text")
    val lm = BigramLm.build(docs, "text").collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    lm(("a", "b")) shouldBe ((2L, 0L)) // p(b|a) = 2/2 → ln 1 = 0
    lm(("b", "a")) shouldBe ((1L, math.round(math.log(0.5) * 1e6)))
    lm(("b", "c")) shouldBe ((1L, math.round(math.log(0.5) * 1e6)))
    // doc 1 = pairs (a,b),(b,a): sum = 0 + ln(.5)µ
    val sc = BigramLm.selfScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2))).toMap
    sc(1L) shouldBe ((2, math.round(math.log(0.5) * 1e6)))
    sc(2L) shouldBe ((2, math.round(math.log(0.5) * 1e6)))
  }

  test("scrambled text scores below natural order at identical unigram frequencies") {
    // 8 natural-order docs establish the bigram structure; the 9th has
    // the same tokens (same unigram profile) in an order whose bigrams
    // never occur elsewhere
    val natural = (1L to 8L).map(i => (i, "the cat sat on the mat"))
    val scrambled = Seq((9L, "mat the on sat cat the"))
    val docs = (natural ++ scrambled).toDF("doc_id", "text")
    val scores = BigramLm.selfScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val naturalAvg = scores(1L)
    assert(scores(9L) < naturalAvg,
      s"scrambled ${scores(9L)} should score below natural $naturalAvg")
    // ...and the unigram LM cannot separate them (same token multiset)
    val uni = UnigramLm.selfScore(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getDouble(r.fieldIndex("avg_logprob"))).toMap
    uni(9L) shouldBe uni(1L)
  }

  test("unseen bigram backs off to continuation unigram + penalty; short docs keep NULL rows") {
    val corpus = Seq((1L, "x y x y x y"), (2L, "y x"), (3L, "solo"), (4L, ""))
      .toDF("doc_id", "text")
    val out = BigramLm.selfScore(corpus, "doc_id", "text")
    val rows = out.collect().map(r =>
      r.getLong(0) -> (r.getInt(1), if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    rows(3L) shouldBe ((0, None))
    rows(4L) shouldBe ((0, None))
    rows(1L)._1 shouldBe 5
    // scoring a NEW doc whose bigrams are unseen: every position takes
    // uni(w2) + backoff; with w2 = corpus-OOV it takes the OOV floor
    val lm = BigramLm.build(corpus, "text")
    val uni = UnigramLm.build(corpus, "text")
    val novel = Seq((10L, "x zzz")).toDF("doc_id", "text")
    val sc = BigramLm.score(novel, "doc_id", "text", lm, uni).collect()(0)
    sc.getInt(1) shouldBe 1
    sc.getLong(2) shouldBe (BigramLm.OovMicro + BigramLm.BackoffMicro)
  }

  // ---- perplexityBuckets (q150 carries the full oracle) --------------

  test("perplexityBuckets: two-phase banded rank ≡ a plain ntile window (differential)") {
    // the real testdata corpus: multiple sources, realistic score
    // spread — the banded-rank + ANSI-NTILE arithmetic must equal
    // ntile().over(partitionBy(source)) row for row
    val docs = graft.Tables.documents(spark, sfDir)
    val got = BigramLm.perplexityBuckets(docs, "doc_id", "text", "source")
      .filter(col("bucket").isNotNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("cost_milli"), col("doc_id"))
    val expected = got.select(col("doc_id"), col("source"), col("cost_milli"))
      .withColumn("exp_bucket", ntile(3).over(w))
    val joined = got.join(expected, Seq("doc_id", "source", "cost_milli"))
    joined.filter(col("bucket") =!= col("exp_bucket")).count() shouldBe 0L
    joined.count() should be > 100L
  }

  test("perplexityBuckets: head holds the fluent docs, groups cut independently") {
    // source A: 5 natural docs + 2 scrambled; source B: 3 docs of its
    // own dialect — B's docs must fill B's buckets 1..3 regardless of
    // how their absolute scores compare to A's
    val a = (1L to 5L).map(i => (i, "the cat sat on the mat", "A")) ++
      Seq((6L, "mat on the sat the cat", "A"), (7L, "cat mat sat the on the", "A"))
    val b = Seq((8L, "alpha beta gamma", "B"), (9L, "alpha beta gamma", "B"),
      (10L, "gamma beta alpha", "B"))
    val docs = (a ++ b).toDF("doc_id", "text", "source")
    val out = BigramLm.perplexityBuckets(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getInt(4))).toMap
    // A: 7 docs → buckets of 3,2,2 by ascending cost; the five
    // identical natural docs are the cheapest and fill bucket 1 (+2)
    (1L to 3L).foreach(i => out(i)._2 shouldBe 1)
    (4L to 5L).foreach(i => out(i)._2 shouldBe 2)
    // the scrambled pair lands in the tail
    out(6L)._2 should be >= 2
    out(7L)._2 shouldBe 3
    // B: 3 docs → one per bucket, the scrambled one last
    Seq(8L, 9L, 10L).map(i => out(i)._2).sorted shouldBe Seq(1, 2, 3)
    out(10L)._2 shouldBe 3
  }

  test("perplexityBuckets: docs with fewer than two tokens keep a NULL-bucket row") {
    val docs = Seq((1L, "a b a b", "S"), (2L, "solo", "S"), (3L, "", "S"))
      .toDF("doc_id", "text", "source")
    val rows = BigramLm.perplexityBuckets(docs, "doc_id", "text", "source")
      .collect().map(r => r.getLong(0) -> r).toMap
    rows.keySet shouldBe Set(1L, 2L, 3L)
    rows(2L).isNullAt(3) shouldBe true
    rows(2L).isNullAt(4) shouldBe true
    rows(3L).isNullAt(4) shouldBe true
    rows(1L).getInt(4) shouldBe 1
  }
}
