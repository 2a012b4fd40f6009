package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** [[Vocabulary.bpeMerges]]/[[Vocabulary.bpeSegments]] — distributed
  * BPE merge learning. The q131/q132 oracles prove 10-round engine
  * parity on the corpus; this spec pins the ALGORITHM on hand-computed
  * fixtures (the classic Sennrich walk-through shape, greedy-overlap
  * edge, early stop). */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def mergesOf(text: String, n: Int): Seq[(Int, String, String, Long)] =
    Vocabulary.bpeMerges(Seq((1L, text)).toDF("doc_id", "text"), "text", n)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq

  private def segmentsOf(text: String, n: Int): Map[String, (Long, String)] =
    Vocabulary.bpeSegments(Seq((1L, text)).toDF("doc_id", "text"), "text", n)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getString(2))).toMap

  test("hand-computed merge trajectory on the classic low/lower/lowest corpus") {
    // word counts: low×3, lower×2, lowest×1 → all six words start l-o-w
    val text = "low low low lower lower lowest"
    val m = mergesOf(text, 3)
    // round 1: (l,o) and (o,w) both occur 6 times — tie broken (l,o) < (o,w)
    m(0) shouldBe ((1, "l", "o", 6L))
    // round 2: (lo,w) now 6, everything else ≤ 3
    m(1) shouldBe ((2, "lo", "w", 6L))
    // round 3: (low,e) in lower+lowest = 3 beats (e,r)=2, (e,s)=1
    m(2) shouldBe ((3, "low", "e", 3L))
    val seg = segmentsOf(text, 3)
    seg("low") shouldBe ((3L, "low"))
    seg("lower") shouldBe ((2L, "lowe r"))
    seg("lowest") shouldBe ((1L, "lowe s t"))
  }

  test("greedy left-to-right on self-pairs: aaaa merges to aa aa, aaa to aa a") {
    val m = mergesOf("aaaa aaa", 1)
    m(0) shouldBe ((1, "a", "a", 5L)) // 3 adjacent pairs in aaaa + 2 in aaa
    val seg = segmentsOf("aaaa aaa", 1)
    seg("aaaa")._2 shouldBe "aa aa"
    seg("aaa")._2 shouldBe "aa a"
  }

  test("stops early when no adjacent pair remains") {
    // single-char words only: zero pairs from the start
    mergesOf("a b c a", 5) shouldBe Seq.empty
    // 'ab' exhausts after one merge
    val m = mergesOf("ab ab", 5)
    m.map(t => (t._1, t._2, t._3)) shouldBe Seq((1, "a", "b"))
    segmentsOf("ab ab", 5)("ab")._2 shouldBe "ab"
  }

  test("bpeEncode: positions, subwords, and alphabet ids reconstruct the text") {
    val df = Vocabulary.bpeEncode(
      Seq((1L, "low lower"), (2L, "lowest low")).toDF("doc_id", "text"),
      "doc_id", "text", 2) // merges: (l,o) then (lo,w) → every word starts "low"
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3), r.getInt(4)))
    // doc 1 word 0 = "low" → single subword "low"
    rows.filter(t => t._1 == 1L && t._2 == 0).map(_._4).toSeq shouldBe Seq("low")
    // doc 1 word 1 = "lower" → low e r in order
    rows.filter(t => t._1 == 1L && t._2 == 1).sortBy(_._3).map(_._4).toSeq shouldBe
      Seq("low", "e", "r")
    // doc 2 word 0 = "lowest" → low e s t
    rows.filter(t => t._1 == 2L && t._2 == 0).sortBy(_._3).map(_._4).toSeq shouldBe
      Seq("low", "e", "s", "t")
    // alphabet ids: 1-based, ordered by subword asc, consistent everywhere
    val alphabet = rows.map(t => (t._4, t._5)).distinct.sortBy(_._2)
    alphabet.map(_._1) shouldBe alphabet.map(_._1).sorted
    alphabet.map(_._2) shouldBe (1 to alphabet.size)
    rows.groupBy(_._4).values.foreach(g => g.map(_._5).distinct.size shouldBe 1)
  }

  test("bpeFertility: hand-computed subword-per-word rates per group") {
    // after 2 merges on this corpus ((l,o) then (lo,w)): "low" → 1
    // subword, "lower" → 3 ("low e r"), "held" → 4 chars (no merge hits)
    val docs = Seq(
      (1L, "low low lower", "a"),
      (2L, "held low", "b")).toDF("doc_id", "text", "source")
    val out = Vocabulary.bpeFertility(docs, "text", "source", 2)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    // group a: 3 words → 1+1+3 = 5 subwords → 16666 bp
    out("a") shouldBe ((3L, 5L, 16666L))
    // group b: 2 words → 4+1 = 5 subwords → 25000 bp
    out("b") shouldBe ((2L, 5L, 25000L))
  }

  test("checkpoint cadence: 40 merges cross two lineage truncations and match a driver replay") {
    // three 20-symbol words sustain ~57 merges, so numMerges = 40 runs
    // past the 16-round localCheckpoint cadence twice — this is the
    // regression net for the bounded-lineage learner: the segmentation
    // must be IDENTICAL to greedily replaying the returned merge table
    // driver-side from character symbols
    def replay(word: String, merges: Seq[(String, String)]): Seq[String] =
      merges.foldLeft(word.map(_.toString).toVector) { case (syms, (a, b)) =>
        syms.foldLeft(Vector.empty[String]) { (acc, x) =>
          if (acc.nonEmpty && acc.last == a && x == b) acc.init :+ (a + b)
          else acc :+ x
        }
      }
    val w1 = ('a' to 't').mkString
    val w2 = ('A' to 'T').mkString
    val w3 = ('g' to 'z').mkString
    val text = (Seq.fill(3)(w1) ++ Seq.fill(2)(w2) ++ Seq(w3)).mkString(" ")
    val df = Seq((1L, text)).toDF("doc_id", "text")
    val merges = Vocabulary.bpeMerges(df, "text", 40).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    merges.size shouldBe 40
    val segs = Vocabulary.bpeSegments(df, "text", 40).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    segs.keySet shouldBe Set(w1, w2, w3)
    Seq(w1, w2, w3).foreach { w =>
      segs(w) shouldBe replay(w, merges).mkString(" ")
    }
  }

  test("frozen apply ≡ self-learned on the training corpus (segments and encode)") {
    val docs = Seq((1L, "low low lower"), (2L, "lowest low")).toDF("doc_id", "text")
    val merges = Vocabulary.bpeMerges(docs, "text", 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val selfSegs = Vocabulary.bpeSegments(docs, "text", 3)
      .collect().map(_.toSeq).toSet
    Vocabulary.bpeSegmentsWith(docs, "text", merges)
      .collect().map(_.toSeq).toSet shouldBe selfSegs
    val vocab = Vocabulary.bpeVocab(docs, "text", 3)
    val selfEnc = Vocabulary.bpeEncode(docs, "doc_id", "text", 3)
      .collect().map(_.toSeq).toSet
    Vocabulary.bpeEncodeWith(docs, "doc_id", "text", merges, vocab)
      .collect().map(_.toSeq).toSet shouldBe selfEnc
  }

  test("frozen apply on a LATER crawl: merges fire on new words; unknown symbols get NULL ids") {
    // learned on low×3 lower×2: merges (l,o), (lo,w), then the round-3
    // tie (low,e)=2 vs (e,r)=2 breaks lhs-asc to (e,r) — final
    // segmentation low=[low], lower=[low, er], alphabet {low, er}
    val train = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val merges = Vocabulary.bpeMerges(train, "text", 3).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val vocab = Vocabulary.bpeVocab(train, "text", 3)
    vocab.collect().map(_.getString(0)).toSet shouldBe Set("low", "er")
    // "slow": s-l-o-w → s-lo-w → s-low: the merges apply inside an
    // UNSEEN word; "zz" stays char-split (open vocabulary)
    val crawl = Seq((9L, "slow zz")).toDF("doc_id", "text")
    val rows = Vocabulary.bpeEncodeWith(crawl, "doc_id", "text", merges, vocab)
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getString(3),
        if (r.isNullAt(4)) -1 else r.getInt(4))).toSet
    val lowId = vocab.collect().find(_.getString(0) == "low").get.getInt(1)
    rows shouldBe Set(
      (0, 0, "s", -1), (0, 1, "low", lowId),
      (1, 0, "z", -1), (1, 1, "z", -1))
  }

  test("bpeLearnAll: one learn returns the same merges, vocab, and segments as the three separate calls") {
    val docs = Seq((1L, "low low low lower lower lowest"),
      (2L, "lowest low")).toDF("doc_id", "text")
    val model = Vocabulary.bpeLearnAll(docs, "text", 3)
    model.merges shouldBe Vocabulary.bpeMerges(docs, "text", 3).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    model.vocab.collect().map(_.toSeq).toSet shouldBe
      Vocabulary.bpeVocab(docs, "text", 3).collect().map(_.toSeq).toSet
    model.segments.collect().map(_.toSeq).toSet shouldBe
      Vocabulary.bpeSegments(docs, "text", 3)
        .select(col("word"),
          org.apache.spark.sql.functions.split(col("encoding"), " ")
            .as("syms"))
        .collect().map(_.toSeq).toSet
  }

  test("bpeEncodeWithModel ≡ bpeEncodeWith on a later crawl: cached segments reused, novel words folded") {
    val train = Seq((1L, "low low low lower lower")).toDF("doc_id", "text")
    val model = Vocabulary.bpeLearnAll(train, "text", 3)
    // crawl mixes SEEN words (from the cached segmentation table),
    // novel words the merges still fire on (slow), and out-of-alphabet
    // text (zz) — the frozen contract end to end
    val crawl = Seq((9L, "slow zz lower"), (10L, "low slows"))
      .toDF("doc_id", "text")
    val viaModel = Vocabulary.bpeEncodeWithModel(crawl, "doc_id", "text",
      model).collect().map(_.toSeq).toSet
    val viaFold = Vocabulary.bpeEncodeWith(crawl, "doc_id", "text",
      model.mergePairs, model.vocab).collect().map(_.toSeq).toSet
    viaModel shouldBe viaFold
  }

  test("merge table rank/count types and ordering are stable") {
    val df = Vocabulary.bpeMerges(
      Seq((1L, "abc abc abd")).toDF("doc_id", "text"), "text", 4)
    df.schema("rank").dataType shouldBe org.apache.spark.sql.types.IntegerType
    df.schema("pair_count").dataType shouldBe org.apache.spark.sql.types.LongType
    val ranks = df.collect().map(_.getInt(0)).toSeq
    ranks shouldBe ranks.sorted
  }

  private def mergesOf(df: org.apache.spark.sql.DataFrame, n: Int, batch: Int) =
    Vocabulary.bpeMerges(df, "text", n, batch)
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("batched merges ≡ sequential on a conflict-free corpus (and batching actually fires)") {
    // three symbol-disjoint pair families at strictly separated counts:
    // the acceptance rules admit all of them in ONE census job
    val df = Seq.fill(5)("ab ab ab ab cd cd cd ef ef").map(t => Tuple1(t))
      .toDF("text")
    val seq1 = mergesOf(df, 3, batch = 1)
    val seq4 = mergesOf(df, 3, batch = 4)
    seq4 shouldBe seq1
    seq1.map(m => (m._2, m._3)) shouldBe
      Seq(("a", "b"), ("c", "d"), ("e", "f"))
  }

  test("batched merges ≡ sequential on an adversarial overlapping corpus (fallback path)") {
    // every top pair shares symbols with the next (aa/ab chains) — the
    // batch must degrade to sequential behavior, not diverge
    val df = Seq.fill(4)("aaaa aab abb bba ab ba").map(t => Tuple1(t))
      .toDF("text")
    mergesOf(df, 5, batch = 4) shouldBe mergesOf(df, 5, batch = 1)
  }

  test("batched merges ≡ sequential on the natural corpus across the checkpoint cadence") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).limit(80)
    mergesOf(docs, 24, batch = 8) shouldBe mergesOf(docs, 24, batch = 1)
  }

  test("interaction-exact rule batches lhs-sharing pairs the coarse rule could not") {
    // four pairs all sharing the LHS symbol 't' at strictly separated
    // counts: merging (t,a) cannot touch (t,b)'s census — destruction
    // needs rhs==t or lhs==(a concat) — so the refined rule accepts
    // all four in ONE census job, where the round-8 symbol-disjoint
    // rule stopped at the first shared letter (4 jobs). The words are
    // 2-char, so nothing chains.
    val df = (Seq.fill(9)("ta") ++ Seq.fill(7)("tb") ++ Seq.fill(5)("tc")
      ++ Seq.fill(3)("td")).map(t => Tuple1(t)).toDF("text")
    val seq1 = mergesOf(df, 4, batch = 1)
    Vocabulary.learnCensusJobs shouldBe 4 // sequential: one job per merge
    val seq4 = mergesOf(df, 4, batch = 4)
    seq4 shouldBe seq1
    Vocabulary.learnCensusJobs shouldBe 1 // refined rule: one job total
    seq1.map(m => (m._2, m._3)) shouldBe
      Seq(("t", "a"), ("t", "b"), ("t", "c"), ("t", "d"))
  }

  test("batch boundaries: self-pairs and rhs->lhs interaction still end the batch") {
    // (o,w) merges first; the runner-up (l,o)'s rhs is the accepted
    // LHS — pattern "l o w" destroys (l,o) occurrences when "o w"
    // merges, so the batch MUST stop and re-census; equivalence with
    // sequential is the proof
    val df = (Seq.fill(9)("low") ++ Seq.fill(5)("ow")).map(t => Tuple1(t))
      .toDF("text")
    val seq1 = mergesOf(df, 2, batch = 1)
    val seq4 = mergesOf(df, 2, batch = 4)
    seq4 shouldBe seq1
    Vocabulary.learnCensusJobs shouldBe 2 // interaction forces two jobs
    // self-pair: (a,a) chains under greedy apply — accepted, then the
    // batch closes (created (aa,aa) is bounded by (a,a)'s OWN count)
    val dfa = (Seq.fill(9)("aaaa") ++ Seq.fill(3)("bc")).map(t => Tuple1(t))
      .toDF("text")
    val a4 = mergesOf(dfa, 2, batch = 4)
    val jobs4 = Vocabulary.learnCensusJobs
    a4 shouldBe mergesOf(dfa, 2, batch = 1)
    jobs4 shouldBe 2
  }
}
