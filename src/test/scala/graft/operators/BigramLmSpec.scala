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
}
