package graft.operators

import graft.SparkSpec

/** [[UnigramTokenizer]] — SentencePiece-style unigram-LM seed
  * vocabulary + Viterbi segmentation. The q146/q147 oracles prove
  * engine parity on the corpus; this spec pins the ALGORITHM on
  * hand-computed fixtures: exact weights and micro-quantized
  * log-probs, the minimum-cost path, the longer-piece tie rule, and
  * the single-char coverage guarantee.
  */
class UnigramTokenizerSpec extends SparkSpec {
  import spark.implicits._

  private def docs(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  private def vocabOf(df: org.apache.spark.sql.DataFrame, size: Int,
                      maxLen: Int = 2): Map[String, (Long, Long)] =
    UnigramTokenizer.seedVocab(df, "text", size, maxLen)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  private def segOf(df: org.apache.spark.sql.DataFrame, size: Int,
                    maxLen: Int = 2): Map[String, (String, Int, Long)] =
    UnigramTokenizer.segmentWords(df, "text", size, maxLen)
      .collect().map(r => r.getString(0) ->
        (r.getString(2), r.getInt(3), r.getLong(4))).toMap

  test("seedVocab: hand-computed weights and micro log-probs on 'abab ab'") {
    // candidates of abab: a,ab,b,ba,a,ab,b ; of ab: a,ab,b
    // → weights a=3 b=3 ab=3 ba=1, W=10
    val v = vocabOf(docs("abab ab"), size = 4)
    v.keySet shouldBe Set("a", "b", "ab", "ba")
    v("a")._1 shouldBe 3L
    v("b")._1 shouldBe 3L
    v("ab")._1 shouldBe 3L
    v("ba")._1 shouldBe 1L
    // round(ln(3/10)·1e6) = −1203973 ; round(ln(1/10)·1e6) = −2302585
    v("a")._2 shouldBe -1203973L
    v("ab")._2 shouldBe -1203973L
    v("ba")._2 shouldBe -2302585L
  }

  test("seedVocab: multi-char slots filled by (weight desc, piece asc)") {
    // corpus 'xy xz': chars x=2 y=1 z=1; multi xy=1 xz=1 — one slot
    // left at size 4, weight tie broken by piece asc → xy kept
    val v = vocabOf(docs("xy xz"), size = 4)
    v.keySet shouldBe Set("x", "y", "z", "xy")
  }

  test("seedVocab: vocabSize must exceed the corpus alphabet") {
    val e = intercept[IllegalArgumentException] {
      vocabOf(docs("abc"), size = 3)
    }
    e.getMessage should include("alphabet")
    intercept[IllegalArgumentException] {
      UnigramTokenizer.seedVocab(docs("a"), "text", 5, maxPieceLen = 17)
    }
  }

  test("segmentWords: Viterbi picks the minimum-cost path") {
    // vocab from 'abab ab' (above): cost(a)=cost(b)=cost(ab)=1203973,
    // cost(ba)=2302585 → 'abab' best = ab|ab (2407946), beating
    // a|b|a|b (4815892) and a|ba|b (4711431)
    val s = segOf(docs("abab ab"), size = 4)
    s("abab") shouldBe (("ab ab", 2, 2407946L))
    s("ab") shouldBe (("ab", 1, 1203973L))
  }

  test("segmentWords: equal-cost paths break toward the longer final piece") {
    // corpus 'aaa': w(a)=3 w(aa)=2 W=5 → cost(a)=510826 cost(aa)=916291
    // best[3] via a|aa = via aa|a = 1427117 — packed key must pick the
    // len-2 piece at the END, i.e. 'a aa', not 'aa a'
    val s = segOf(docs("aaa"), size = 2)
    s("aaa") shouldBe (("a aa", 2, 1427117L))
  }

  test("segmentWords: single-char coverage segments words with no multi piece") {
    // size 4 on 'xy xz' keeps only multi piece 'xy' → 'xz' must fall
    // back to its characters and still segment
    val s = segOf(docs("xy xz"), size = 4)
    s("xy")._1 shouldBe "xy"
    s("xz")._1 shouldBe "x z"
    s("xz")._2 shouldBe 2
  }

  test("emReweight: best-path recount, char floor, and unused-piece prune") {
    // corpus 'abab ab', vocab {a,b,ab,ba}: Viterbi uses only 'ab'
    // (abab → ab|ab, ab → ab) ⇒ vcounts ab=3, everything else 0.
    // Refined: chars a,b floored at 1; ba PRUNED; W' = 1+1+3 = 5
    val v = UnigramTokenizer.emReweight(docs("abab ab"), "text",
        vocabSize = 4, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    v.keySet shouldBe Set("a", "b", "ab")
    v("a") shouldBe ((1L, -1609438L))  // round(ln(1/5)·1e6)
    v("b") shouldBe ((1L, -1609438L))
    v("ab") shouldBe ((3L, -510826L))  // round(ln(3/5)·1e6)
  }

  test("emReweight: weights come from path occurrences times word count") {
    // 'aaa' ×2 in the corpus: best path a|aa (tie rule) per occurrence
    // ⇒ a and aa each get weight 2, W' = 4
    val v = UnigramTokenizer.emReweight(docs("aaa aaa"), "text",
        vocabSize = 2, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    v("a") shouldBe ((2L, -693147L))   // round(ln(2/4)·1e6)
    v("aa") shouldBe ((2L, -693147L))
  }

  test("encode: positions and seed-vocab piece ids reconstruct the text") {
    // vocab of 'abab ab' = {a, b, ab, ba}; ids by piece asc:
    // a=1, ab=2, b=3, ba=4. abab → ab|ab, ab → ab
    val rows = UnigramTokenizer.encode(docs("abab ab"), "doc_id", "text",
        vocabSize = 4, maxPieceLen = 2)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        r.getString(3), r.getInt(4))).toSet
    rows shouldBe Set(
      (0L, 0, 0, "ab", 2), (0L, 0, 1, "ab", 2),
      (0L, 1, 0, "ab", 2))
    // ids cover the FULL seed (ba gets id 4 even though never used)
    val v2 = UnigramTokenizer.encode(docs("abab ab", "ba ba"), "doc_id",
        "text", vocabSize = 5, maxPieceLen = 2)
      .collect().map(r => r.getString(3) -> r.getInt(4)).toMap
    v2.values.toSeq.distinct.sorted shouldBe v2.values.toSeq.distinct.sorted
    v2.keySet should contain("ba")
  }

  test("encodeWith: frozen vocab ≡ self-learned encode; unspellable words get NULL-id rows") {
    val train = docs("abab ab")
    val vocab = UnigramTokenizer.seedVocab(train, "text", vocabSize = 4,
      maxPieceLen = 2)
    // identity: applying the corpus's own seed reproduces encode
    val self = UnigramTokenizer.encode(train, "doc_id", "text",
      vocabSize = 4, maxPieceLen = 2).collect().map(_.toSeq).toSet
    val frozen = UnigramTokenizer.encodeWith(train, "doc_id", "text",
      vocab, maxPieceLen = 2).collect().map(_.toSeq).toSet
    frozen shouldBe self
    // a later crawl with characters the vocab never saw: 'zq' cannot
    // be spelled → one <unk> row (piece = word, NULL id); in-alphabet
    // words encode normally
    val crawl = docs("ab zq abab")
    val rows = UnigramTokenizer.encodeWith(crawl, "doc_id", "text",
        vocab, maxPieceLen = 2)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toSet
    rows shouldBe Set(
      (0, 0, "ab", 2),
      (1, 0, "zq", -1),
      (2, 0, "ab", 2), (2, 1, "ab", 2))
  }

  test("fertility: hand-computed pieces-per-word rates per group") {
    // vocab of the union corpus (size 4, maxLen 2) = {a, b, ab, ba}:
    // abab → ab|ab (2), ab → ab (1), ba → ba (1), b → b (1)
    val docs = Seq((1L, "abab ab", "X"), (2L, "ba b", "Y"))
      .toDF("doc_id", "text", "source")
    val f = UnigramTokenizer.fertility(docs, "text", "source",
        vocabSize = 4, maxPieceLen = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    f("X") shouldBe ((2L, 3L, 15000L))
    f("Y") shouldBe ((2L, 2L, 10000L))
  }

  test("coverage: unspellable share per group under a frozen vocabulary") {
    val vocab = UnigramTokenizer.seedVocab(docs("abab ab"), "text",
      vocabSize = 4, maxPieceLen = 2)
    val crawl = Seq(("S", "ab zq ba"), ("T", "aa bb"))
      .toDF("source", "text")
    val out = UnigramTokenizer.coverage(crawl, "text", "source", vocab,
        maxPieceLen = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    out("S") shouldBe ((3L, 1L, 3333L)) // zq unspellable; ab, ba spell
    out("T") shouldBe ((2L, 0L, 0L))    // chars a,b cover everything
  }

  test("segmentWords: path cost equals the sum of piece costs") {
    val v = vocabOf(docs("abab ab ba"), size = 5)
    val s = segOf(docs("abab ab ba"), size = 5)
    s.foreach { case (_, (enc, n, cost)) =>
      val pieces = enc.split(" ")
      pieces.length shouldBe n
      cost shouldBe pieces.map(p => -v(p)._2).sum
    }
  }

  test("emTrain: shrink schedule cuts multi pieces geometrically, floors at target, keeps every char") {
    val corpus = docs(Seq.fill(6)("abab abc bca cab abcd dcba").mkString(" "))
    val sizes = (1 to 3).map { r =>
      val v = UnigramTokenizer.emTrain(corpus, "text", seedSize = 20,
        targetSize = 5, rounds = r, shrinkBp = 5000, maxPieceLen = 4)
      val rows = v.collect()
      // every alphabet char survives every round (coverage guarantee)
      rows.map(_.getString(0)).filter(_.length == 1).toSet shouldBe
        Set("a", "b", "c", "d")
      rows.length
    }
    // strictly shrinking until the floor; never below alphabet+1
    sizes.sliding(2).foreach { case Seq(a, b) => b should be <= a; case _ => }
    sizes.last should be >= 5
  }

  test("emTrain: one round at shrink 1.0 is exactly emReweight") {
    val corpus = docs("abab ab ba abc")
    val a = UnigramTokenizer.emTrain(corpus, "text", seedSize = 8,
        targetSize = 1, rounds = 1, shrinkBp = 10000, maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    val b = UnigramTokenizer.emReweight(corpus, "text", vocabSize = 8,
        maxPieceLen = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted
    a shouldBe b.toSeq
  }

  test("Viterbi key unpack is exact past the 2^53 double ceiling") {
    // the packed key is (cumulative_cost)·32 + (32 − piece_len); the
    // unpack must recover cumulative_cost by EXACT integer floor-div
    // (shiftright by 5), matching the oracle's `// 32`. A double
    // division loses the low bit once cost·32 > 2^53: cost = 2^53+1
    // packs to a key whose double image divides back to 2^53.
    import org.apache.spark.sql.functions._
    val cost = (1L << 53) + 1L
    val key = cost * 32L + 7L
    val row = Seq(key).toDF("mk")
      .select(shiftright(col("mk").cast("long"), 5).as("cost_exact"),
        ((col("mk") - pmod(col("mk"), lit(32L))) / 32).cast("long")
          .as("cost_double"))
      .head()
    row.getLong(0) shouldBe cost             // the shipped unpack: exact
    assert(row.getLong(1) != cost)           // the rejected double path drops the low bit
  }
}
