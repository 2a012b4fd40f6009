package graft.operators

import graft.SparkSpec

class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val train = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "completely unrelated training material about spark"),
    (3L, "  The   QUICK brown fox jumps over the lazy dog  ") // = doc 1 normalized
  ).toDF("doc_id", "text")

  private val eval = Seq(
    (101L, "the quick brown fox jumps over the lazy dog"),   // exact leak (vs 1 and 3)
    (102L, "the quick brown fox jumps over the lazy cat"),   // near-dup leak
    (103L, "entirely novel evaluation content nothing shared")
  ).toDF("doc_id", "text")

  test("exactLeaks flags verbatim (normalized) duplicates with min train evidence") {
    val out = rows(Decontaminate.exactLeaks(train, eval, "doc_id", "text")
      .orderBy("eval_id"))
    out.map(r => (r.getLong(0), r.getLong(1))) shouldBe Seq((101L, 1L))
  }

  test("contaminationFraction: exact per-train-doc distinct-gram shares") {
    // n=3 grams. train 1: 7 distinct trigrams, all present in eval 101
    // (identical text) -> 10000 bp. train 2: 0 shared -> 0 bp.
    // train 3 normalizes differently at the TOKEN level (The/QUICK
    // casing) so only the grams matching doc 1's casing differ — count
    // it by hand: its tokens are "The QUICK brown fox jumps over the
    // lazy dog" -> 7 trigrams, of which those not touching The/QUICK
    // ("brown fox jumps", "fox jumps over", "jumps over the",
    // "over the lazy", "the lazy dog") = 5 appear in eval 101.
    val out = Decontaminate.contaminationFraction(train, eval,
        "doc_id", "text", n = 3)
      .orderBy("train_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    out shouldBe Seq(
      (1L, 7L, 7L, Some(10000L)),
      (2L, 4L, 0L, Some(0L)),
      (3L, 7L, 5L, Some(7142L)))
  }

  test("contaminationFraction: NULL text yields a row with NULL frac") {
    val t = Seq((1L, "a b c d"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val e = Seq((9L, "a b c d")).toDF("doc_id", "text")
    val out = Decontaminate.contaminationFraction(t, e, "doc_id", "text", n = 3)
      .orderBy("train_id")
      .as[(Long, Long, Long, Option[Long])].collect().toSeq
    out.head shouldBe (1L, 2L, 2L, Some(10000L))
    out(1)._1 shouldBe 2L
    out(1)._4 shouldBe None
  }

  test("nearDupLeaks finds cross-corpus near-duplicates only") {
    val out = rows(Decontaminate.nearDupLeaks(train, eval, "doc_id", "text",
        n = 3, threshold = 0.5)
      .orderBy("eval_id", "train_id"))
    // 101 matches train 1 exactly (jaccard 1.0) and train 3 on the
    // 5 of 9 union shingles unaffected by its case changes (0.556 —
    // near-dup shingling is RAW text by design; exactLeaks normalizes);
    // 102 overlaps train 1 on 6 of 8 (0.75); 103 matches nothing.
    out.map(r => (r.getLong(0), r.getLong(1))) shouldBe Seq(
      (101L, 1L), (101L, 3L), (102L, 1L))
    val j = out.map(r => r.getDouble(2))
    j.head shouldBe 1.0
    j(1) shouldBe 0.555556 +- 1e-6
    j(2) shouldBe 0.75 +- 1e-6
  }

  test("nearDupLeaks never reports within-corpus pairs") {
    // train 1 and train 3 are near-identical; eval 101/102 are similar
    // to each other too — none of those pairs may appear.
    val out = rows(Decontaminate.nearDupLeaks(train, eval, "doc_id", "text", 3, 0.1))
    out.foreach { r =>
      assert(r.getLong(0) >= 100L, s"eval_id column holds a train doc: $r")
      assert(r.getLong(1) < 100L, s"train_id column holds an eval doc: $r")
    }
  }

  test("nearDupLeaksLsh ≡ exact nearDupLeaks at high threshold (planted + testdata)") {
    // planted corpus: thresholds where band recall ≈ 1
    val exactP = rows(Decontaminate.nearDupLeaks(train, eval, "doc_id", "text",
        3, 0.75).orderBy("eval_id", "train_id")).map(_.toSeq)
    val lshP = rows(Decontaminate.nearDupLeaksLsh(train, eval, "doc_id", "text",
        3, 128, 32, 0.75).orderBy("eval_id", "train_id")).map(_.toSeq)
    lshP shouldBe exactP
    lshP should not be empty
    // the sf0.001 corpus with the q72/q82 md5 split
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) < "2"
    val exactT = rows(Decontaminate.nearDupLeaks(docs.filter(!isEval),
        docs.filter(isEval), "doc_id", "text", 3, 0.8)
      .orderBy("eval_id", "train_id")).map(_.toSeq)
    val lshT = rows(Decontaminate.nearDupLeaksLsh(docs.filter(!isEval),
        docs.filter(isEval), "doc_id", "text", 3, 128, 32, 0.8)
      .orderBy("eval_id", "train_id")).map(_.toSeq)
    lshT shouldBe exactT
  }

  test("semanticLeaks: a planted paraphrase (same embedding, new words) is caught; boundary and NULL invariants hold") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // base: near-orthogonal one-hot-ish vectors; eval doc 100 is a
    // PARAPHRASE of train doc 1 — identical embedding, so no lexical
    // detector could relate them — plus an unrelated eval doc and a
    // corrupt train row that must be excluded, not crash the kernel
    def v(i: Int): Array[Float] = Array.tabulate(8)(j => if (j == i % 8) 1f else 0f)
    val train = (Seq((1L, v(0)), (2L, v(1)), (3L, v(2)), (4L, v(3))) :+
      ((5L, null.asInstanceOf[Array[Float]])))
      .toDF("vec_id", "embedding")
    val eval = Seq((100L, v(0)), (101L, v(5))).toDF("vec_id", "embedding")
    val out = Decontaminate.semanticLeaks(train, eval, "vec_id", "embedding",
        threshold = 0.9, nCells = 4, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    out.map(t => (t._1, t._2)).toSeq shouldBe Seq((100L, 1L))
    out.head._3 shouldBe 1.0 +- 1e-9
    // every reported pair crosses the boundary by construction: eval
    // ids come only from the eval side (101 absent = no false leak)
    out.map(_._1).toSet shouldBe Set(100L)
  }

  test("semanticLeaks: an id outside 62 bits fails loudly instead of overflowing the uid packing") {
    import spark.implicits._
    def v(i: Int): Array[Float] = Array.tabulate(8)(j => if (j == i % 8) 1f else 0f)
    val big = (1L << 62) // 2·id+tag would overflow Long from here up
    val train = Seq((1L, v(0)), (big, v(1))).toDF("vec_id", "embedding")
    val eval = Seq((100L, v(0))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Decontaminate.semanticLeaks(train, eval, "vec_id", "embedding",
        threshold = 0.9, nCells = 2, nProbe = 2).collect()
    }
    ex.getMessage should include("62 bits")
    // in-range ids (including negative ones) still work
    val ok = Seq((-5L, v(0))).toDF("vec_id", "embedding")
    Decontaminate.semanticLeaks(ok, eval, "vec_id", "embedding",
      threshold = 0.9, nCells = 2, nProbe = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq shouldBe
      Seq((100L, -5L))
  }
}
