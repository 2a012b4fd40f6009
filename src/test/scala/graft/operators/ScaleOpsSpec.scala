package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

/** Round-3 scale-path operators: Bloom dedup, deterministic shuffle,
  * exact n-gram decontamination, semantic dedup. Mostly differential —
  * each operator has a brute-force definition it must equal exactly.
  */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sfDir)

  // ---------- bloomDedupe ----------

  test("bloomDedupe equals the plain anti join on fingerprint") {
    val split = substring(md5(col("doc_id").cast("string")), 1, 1) < "4"
    val index = docs.filter(split)
    val batch = docs.filter(!split)
    val got = Dedup.bloomDedupe(batch, index, "doc_id", "text", 10000L)
      .select(col("doc_id"))
    val want = batch
      .withColumn("__fp", TextFns.fingerprint(col("text")))
      .join(index.select(TextFns.fingerprint(col("text")).as("__fp"))
        .filter(col("__fp").isNotNull).distinct(),
        Seq("__fp"), "left_anti")
      .select(col("doc_id"))
    rows(got.exceptAll(want)) shouldBe empty
    rows(want.exceptAll(got)) shouldBe empty
  }

  test("bloomDedupe stays exact when the filter is saturated with false positives") {
    // expectedItems=1 at fpp 0.5 → nearly everything tests positive;
    // the verify join must still produce the exact anti-join answer
    val index = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("id", "text")
    val batch = Seq((10L, "alpha beta"), (11L, "fresh content"),
      (12L, "gamma  delta"), (13L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Dedup.bloomDedupe(batch, index, "id", "text", 1L, fpp = 0.5)
      .select("id").as[Long].collect().sorted
    // 10 dup, 12 dup after whitespace normalization, 11 new, 13 NULL passes
    out shouldBe Array(11L, 13L)
  }

  test("bloomDedupe does not collapse within-batch duplicates") {
    val index = Seq((1L, "seen")).toDF("id", "text")
    val batch = Seq((2L, "twice"), (3L, "twice")).toDF("id", "text")
    Dedup.bloomDedupe(batch, index, "id", "text", 100L)
      .count() shouldBe 2L
  }

  // ---------- deterministicShuffle ----------

  test("deterministicShuffle equals the global-window rank") {
    val df = docs.select(col("doc_id"))
    val got = Sampling.deterministicShuffle(df, "doc_id", seed = 42L)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(md5(concat_ws("_", lit("42"), col("doc_id").cast("string"))),
        col("doc_id"))
    val want = df.withColumn("pos", row_number().over(w).cast("long"))
    rows(got.select("doc_id", "pos").exceptAll(want.select("doc_id", "pos"))) shouldBe empty
    rows(want.select("doc_id", "pos").exceptAll(got.select("doc_id", "pos"))) shouldBe empty
  }

  test("deterministicShuffle: positions are an exact 1..n permutation, stable under repartition") {
    val df = spark.range(0, 2000).toDF("id")
    val a = Sampling.deterministicShuffle(df, "id")
    val ps = a.select("pos").as[Long].collect().sorted
    ps shouldBe (1L to 2000L).toArray
    val b = Sampling.deterministicShuffle(df.repartition(17), "id")
    rows(a.exceptAll(b)) shouldBe empty
    rows(b.exceptAll(a)) shouldBe empty
  }

  test("deterministicShuffle: different seeds give different orders") {
    val df = spark.range(0, 500).toDF("id")
    val a = Sampling.deterministicShuffle(df, "id", seed = 1L)
    val b = Sampling.deterministicShuffle(df, "id", seed = 2L)
    a.join(b, Seq("id"))
      .filter(a("pos") === b("pos")).count() should be < 50L
  }

  // ---------- ngramLeaks ----------

  test("ngramLeaks flags a planted verbatim 13-token span and nothing else") {
    val span = (1 to 13).map(i => s"tok$i").mkString(" ")
    val train = Seq(
      (1L, s"preamble words here $span trailing content words"),
      (2L, "completely unrelated training document with many distinct words")
    ).toDF("id", "text")
    val eval = Seq(
      (100L, s"benchmark question quoting $span verbatim in context"),
      (101L, "clean eval document sharing nothing with training data at all")
    ).toDF("id", "text")
    val out = Decontaminate.ngramLeaks(train, eval, "id", "text", n = 13)
      .collect()
    out.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((100L, 1L))
  }

  test("ngramLeaks counts DISTINCT shared grams") {
    // 15 shared tokens in a row → three 13-grams shared (positions 1..3)
    val shared = (1 to 15).map(i => s"w$i").mkString(" ")
    val train = Seq((1L, s"$shared tail1 tail2")).toDF("id", "text")
    val eval = Seq((2L, s"head1 head2 $shared")).toDF("id", "text")
    val out = Decontaminate.ngramLeaks(train, eval, "id", "text", n = 13)
      .collect()
    out.length shouldBe 1
    out(0).getInt(2) shouldBe 3
  }

  test("ngramLeaks: short docs fall back to whole-text matching; NULL text never flagged") {
    val train = Seq((1L, "short doc"), (2L, "other short")).toDF("id", "text")
    val eval = Seq((10L, "short doc"), (11L, "short doc extra"),
      (12L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Decontaminate.ngramLeaks(train, eval, "id", "text", n = 13)
      .collect()
    out.map(r => (r.getLong(0), r.getLong(1))).toSet shouldBe Set((10L, 1L))
  }

  // ---------- boilerplateFraction ----------

  test("boilerplateFraction: planted boilerplate phrase scores high; unique docs score zero") {
    val boiler = "all rights reserved contact us terms of service"
    val docs = (1L to 6L).map(i => (i, s"unique$i words here $boiler"))
      .toDF("id", "text")
      .union(Seq((7L, "entirely fresh content with no repeats anywhere at all"))
        .toDF("id", "text"))
    val out = Dedup.boilerplateFraction(docs, "id", "text", n = 3, minDocs = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // the 6 boiler docs share the 6 shingles inside the boiler span;
    // their leading "uniqueN words here" shingles are theirs alone
    (1L to 6L).foreach { i => out(i) should be > 0.4 }
    out(7L) shouldBe 0.0
  }

  test("boilerplateFraction: frac is n_common/n_shingles half-up at 4 digits; NULL text excluded") {
    val docs = Seq((1L, "a b c a b c"), (2L, "a b c x y z"),
      (3L, null.asInstanceOf[String])).toDF("id", "text")
    val out = Dedup.boilerplateFraction(docs, "id", "text", n = 3, minDocs = 2)
      .collect()
    out.map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
    val byId = out.map(r => r.getLong(0) ->
      (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    // doc1 shingles: {abc, bca, cab, abc(dup)} -> distinct {a b c, b c a, c a b};
    // only "a b c" also occurs in doc2 -> 1/3
    byId(1L) shouldBe ((3, 1, 0.3333))
    // doc2: {a b c, b c x, c x y, x y z} -> 1/4
    byId(2L) shouldBe ((4, 1, 0.25))
  }

  // ---------- temperatureMixture ----------

  test("temperatureMixture: sqrt damping boosts small groups, caps at 10000, hits the budget") {
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("g", when(col("id") < 9000, "big").otherwise("small"))
    val out = Sampling.temperatureMixture(df, "id", "g", budget = 1000L)
    val rates = out.select("g", "rate_bp").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // w_big=94, w_small=31, tot=125: rate_big = 1000*94*10000/(125*9000)=835
    // rate_small = 1000*31*10000/(125*1000) = 2480
    rates("big") shouldBe 835L
    rates("small") shouldBe 2480L
    // small's PER-ROW keep rate ~3x big's: the flattening worked
    val kept = out.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    kept("small").toDouble / 1000 should be > (kept("big").toDouble / 9000) * 2
    // expected total = 9000*835/10000 + 1000*2480/10000 = 999.5
    (kept("big") + kept("small")).toDouble shouldBe 1000.0 +- 100.0
  }

  test("temperatureMixture: membership is a pure function of the id (repartition-stable)") {
    val df = spark.range(0, 3000).toDF("id")
      .withColumn("g", pmod(col("id"), lit(3)).cast("string"))
    val a = Sampling.temperatureMixture(df, "id", "g", budget = 300L)
    val b = Sampling.temperatureMixture(df.repartition(11), "id", "g", budget = 300L)
    rows(a.exceptAll(b)) shouldBe empty
    rows(b.exceptAll(a)) shouldBe empty
  }

  test("temperatureMixture: NULL group is damped like any other, not dropped") {
    // 9000 'big' + 1000 NULL-keyed rows: the NULL group must get its own
    // rate (null-safe join) and the named group's rate must match the
    // two-group math — a dropped-but-counted NULL group would skew it
    val df = spark.range(0, 10000).toDF("id")
      .withColumn("g", when(col("id") < 9000, "big").otherwise(lit(null: String)))
    val out = Sampling.temperatureMixture(df, "id", "g", budget = 1000L)
    val rates = out.select("g", "rate_bp").distinct().collect()
      .map(r => (if (r.isNullAt(0)) null else r.getString(0)) -> r.getLong(1)).toMap
    // identical counts to the big/small test -> identical rates
    rates("big") shouldBe 835L
    rates(null) shouldBe 2480L
    out.filter(col("g").isNull).count() should be > 0L
  }

  test("temperatureMixture: high-cardinality group key stays in-plan (1e5 groups)") {
    // one row per group: w=1 for all, tw=1e5, ideal rate = budget*10000/1e5
    // = 5000 bp for budget 50000 -> every group damped to ~coin-flip.
    // The point is the operator completes with NO driver-side rate table.
    val n = 100000L
    val df = spark.range(0, n).toDF("id")
      .withColumn("g", concat(lit("d"), col("id")))
    val out = Sampling.temperatureMixture(df, "id", "g", budget = 50000L)
    out.select("rate_bp").distinct().collect().map(_.getLong(0)).toSeq shouldBe Seq(5000L)
    val kept = out.count()
    kept.toDouble shouldBe 50000.0 +- 2000.0
  }

  // ---------- semanticDedupe ----------

  test("semanticDedupe equals the brute-force greedy-by-id rule") {
    val emb = Tables.embeddings(spark, sfDir)
    val kept = Similarity.semanticDedupe(emb, "vec_id", "embedding",
        nCells = 4, threshold = 0.35,
        centroidRank = Similarity.portableCentroidRank)
      .select(col("id"), col("cell"))
    // brute force over the same cell assignment
    val cells = Similarity.ivfCells(emb, "vec_id", "embedding", 4, 1,
        Similarity.portableCentroidRank)
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val av = cells.join(vecs, "id")
    val droppedWant = av.as("a").join(av.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .filter(graft.functions.VectorFns.cosine(col("a.vec"), col("b.vec")) >= 0.35)
      .select(col("b.id").as("id")).distinct()
    val want = av.join(droppedWant, Seq("id"), "left_anti").select("id", "cell")
    rows(kept.exceptAll(want)) shouldBe empty
    rows(want.exceptAll(kept)) shouldBe empty
    // and it actually dropped something on this corpus
    kept.count() should be < emb.count()
  }

  test("semanticDedupe: kept set has no same-cell pair above threshold with ordered ids where the smaller survived") {
    val emb = Tables.embeddings(spark, sfDir)
    val kept = Similarity.semanticDedupe(emb, "vec_id", "embedding",
      nCells = 4, threshold = 0.35,
      centroidRank = Similarity.portableCentroidRank)
    val vecs = emb.select(col("vec_id").as("id"), col("embedding").as("vec"))
    val kv = kept.join(vecs, "id")
    // a kept v with a kept smaller-id near-dup in the same cell would
    // violate the drop rule (v should have been dropped)
    kv.as("a").join(kv.as("b"),
        col("a.cell") === col("b.cell") && col("a.id") < col("b.id"))
      .filter(graft.functions.VectorFns.cosine(col("a.vec"), col("b.vec")) >= 0.35)
      .count() shouldBe 0L
  }

  // ---------- CorpusReport ----------

  test("CorpusReport: ALL row equals the recombined per-source stats; NULL text is a zero-token doc") {
    val d = Seq(
      ("s1", "the quick fox"), ("s1", "a b"),
      ("s2", null.asInstanceOf[String])).toDF("source", "text")
    val rep = CorpusReport.bySource(d, "text", "source")
      .orderBy("source").collect()
    rep.map(_.getString(0)) shouldBe Array("ALL", "s1", "s2")
    val all = rep(0); val s1 = rep(1); val s2 = rep(2)
    all.getLong(1) shouldBe 3L                      // n_docs
    all.getLong(2) shouldBe (s1.getLong(2) + s2.getLong(2)) // token sum
    s2.getLong(2) shouldBe 0L                       // NULL text → 0 tokens
    s2.getDouble(3) shouldBe 0.0                    // quality 0
    s1.getDouble(4) shouldBe 2.5                    // median of {3,2}
  }

  test("CorpusReport: a NULL source VALUE gets its own '(none)' row, never a second 'ALL'") {
    val d = Seq(
      (null.asInstanceOf[String], "some words here"),
      ("s1", "other words there")).toDF("source", "text")
    val rep = CorpusReport.bySource(d, "text", "source")
      .orderBy("source").collect()
    rep.map(_.getString(0)) shouldBe Array("(none)", "ALL", "s1")
    rep.count(_.getString(0) == "ALL") shouldBe 1
    rep.find(_.getString(0) == "ALL").get.getLong(1) shouldBe 2L
  }

  // ---------- Vocabulary ----------

  test("Vocabulary: ids rank by (count desc, token asc); OOV encodes to 0; order preserved") {
    val docs = Seq(
      (1L, "b a a c b a"),   // a×3 b×2 c×1
      (2L, "a b zz")).toDF("id", "text")
    val vocab = Vocabulary.build(docs, "text", 3)
    vocab.orderBy("tok_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2))) shouldBe
      Seq(("a", 4L, 1), ("b", 3L, 2), ("c", 1L, 3))
    // size cap: "zz" (count 1, after "c" alphabetically) fell off
    val enc = Vocabulary.encode(docs, vocab, "id", "text")
      .filter(col("id") === 2L).orderBy("pos").collect()
      .map(r => (r.getInt(1), r.getString(2), r.getInt(3)))
    enc shouldBe Seq((0, "a", 1), (1, "b", 2), (2, "zz", 0))
  }

  test("Vocabulary: build is deterministic under repartition; NULL text encodes to no rows") {
    val docs = Tables.documents(spark, sfDir)
    val a = Vocabulary.build(docs, "text", 20)
    val b = Vocabulary.build(docs.repartition(7), "text", 20)
    rows(a.exceptAll(b)) shouldBe empty
    rows(b.exceptAll(a)) shouldBe empty
    val nullDoc = Seq((9L, null.asInstanceOf[String])).toDF("id", "text")
    Vocabulary.encode(nullDoc, a, "id", "text").count() shouldBe 0L
  }

  test("all six operators are total on empty inputs") {
    val noDocs = Seq.empty[(Long, String)].toDF("id", "text")
    val someDocs = Seq((1L, "some content here")).toDF("id", "text")
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("id", "vec")
    Dedup.bloomDedupe(noDocs, someDocs, "id", "text", 10L).count() shouldBe 0L
    // empty INDEX: bloom rejects nothing is wrong — it must PASS everything
    Dedup.bloomDedupe(someDocs, noDocs, "id", "text", 10L).count() shouldBe 1L
    Sampling.deterministicShuffle(noDocs, "id").count() shouldBe 0L
    Sampling.temperatureMixture(noDocs, "id", "text", 10L).count() shouldBe 0L
    Decontaminate.ngramLeaks(noDocs, someDocs, "id", "text").count() shouldBe 0L
    Decontaminate.ngramLeaks(someDocs, noDocs, "id", "text").count() shouldBe 0L
    Dedup.boilerplateFraction(noDocs, "id", "text").count() shouldBe 0L
    Similarity.semanticDedupe(noVecs, "id", "vec", 4, 0.9).count() shouldBe 0L
  }

  test("semanticDedupe: corrupt (null-element) vectors are excluded from the output") {
    val good = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.99f, 0.14f)), (3L, Array(0.0f, 1.0f)))
    val df = good.toDF("id", "vec")
      .union(Seq((4L, null.asInstanceOf[Array[Float]])).toDF("id", "vec"))
    val kept = Similarity.semanticDedupe(df, "id", "vec", nCells = 2,
      threshold = 0.95)
    kept.select("id").as[Long].collect() should not contain 4L
  }
}
