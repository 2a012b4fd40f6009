package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Hand-computed fixtures for the round-5 curation operators:
  * UnigramLm (integer-quantized log-prob scoring), OutlierTrim (Tukey
  * fences), CorpusStats (source overlap + Zipf head mass). The q93–q96
  * catalog entries get full DuckDB oracle checks; these specs pin the
  * arithmetic on fixtures small enough to verify by hand, including the
  * cases the sf corpus doesn't exercise (planted outliers, empty text).
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("UnigramLm.selfScore: hand-computed micro-quantized log-probs") {
    // corpus: a:2 b:2 c:1, N=5
    // lp_micro(a) = lp_micro(b) = round(ln(0.4)·1e6) = -916291
    // lp_micro(c) = round(ln(0.2)·1e6) = -1609438
    val docs = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val out = UnigramLm.selfScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    out.length shouldBe 2
    // doc 1: 3 tokens, lp_sum = 3·(-916291) = -2748873
    out(0).getAs[Int]("n_tokens") shouldBe 3
    out(0).getAs[Long]("lp_sum_micro") shouldBe -2748873L
    out(0).getAs[Double]("avg_logprob") shouldBe -0.9163
    // doc 2: 2 tokens, lp_sum = -916291 - 1609438 = -2525729
    out(1).getAs[Long]("lp_sum_micro") shouldBe -2525729L
    out(1).getAs[Double]("avg_logprob") shouldBe -1.2629
  }

  test("UnigramLm.klDrift: hand-computed contributions, OOV floor, corpus total") {
    // P: a×2 b×1 (N=3) → lp_p(a)=−405465, lp_p(b)=−1098612
    // Q: a×1 b×3 (N=4) → lp_q(a)=−1386294, lp_q(b)=−287682
    // contrib(a)=2·980829=1961658 ; contrib(b)=1·(−810930)
    // kl = (1961658−810930)/3/1e6 = 0.383576
    val p = Seq((1L, "a a b")).toDF("doc_id", "text")
    val q = Seq((2L, "a b b b")).toDF("doc_id", "text")
    val out = UnigramLm.klDrift(p, q, "text", k = 10).orderBy("rank").collect()
    out.map(_.getString(1)).toSeq shouldBe Seq("a", "b")
    out(0).getAs[Long]("contrib_micro") shouldBe 1961658L
    out(1).getAs[Long]("contrib_micro") shouldBe -810930L
    out.foreach(_.getAs[Double]("kl_nats") shouldBe 0.383576)
    // a P-only token takes the OOV floor and carries a NULL lp_q
    val out2 = UnigramLm.klDrift(
      Seq((1L, "z a")).toDF("doc_id", "text"),
      Seq((2L, "a")).toDF("doc_id", "text"), "text", k = 10)
      .orderBy("rank").collect()
    out2(0).getString(1) shouldBe "z"
    out2(0).isNullAt(4) shouldBe true
    out2(0).getAs[Long]("contrib_micro") shouldBe 19306853L
    out2(1).getAs[Long]("contrib_micro") shouldBe -693147L
    out2.foreach(_.getAs[Double]("kl_nats") shouldBe 9.306853)
  }

  test("UnigramLm.score drops token-less docs; caller left-joins them back") {
    val docs = Seq((1L, "a b"), (2L, ""), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val lm = UnigramLm.build(docs, "text")
    val scored = UnigramLm.score(docs, "doc_id", "text", lm)
    scored.select("doc_id").as[Long].collect().toSet shouldBe Set(1L)
    val kept = docs.select("doc_id")
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tokens"), lit(0)).as("n_tokens"))
      .orderBy("doc_id").as[(Long, Int)].collect()
    kept shouldBe Array((1L, 2), (2L, 0), (3L, 0))
  }

  test("OutlierTrim.tukey: dyadic fences drop the planted outlier only") {
    // values 1..5 + 100: q1 = 2.25, q3 = 4.75, iqr = 2.5,
    // fences [-1.5, 8.5] → keeps 1..5, drops 100
    val df = Seq(("g", 1L), ("g", 2L), ("g", 3L), ("g", 4L), ("g", 5L),
      ("g", 100L)).toDF("grp", "v")
    val fences = OutlierTrim.tukeyFences(df, "grp", "v").collect()(0)
    fences.getAs[Double]("q1") shouldBe 2.25
    fences.getAs[Double]("q3") shouldBe 4.75
    fences.getAs[Double]("lo") shouldBe -1.5
    fences.getAs[Double]("hi") shouldBe 8.5
    OutlierTrim.tukey(df, "grp", "v")
      .select("v").as[Long].collect().sorted shouldBe Array(1L, 2L, 3L, 4L, 5L)
  }

  test("OutlierTrim.tukey trims per group independently, schema unchanged") {
    val df = Seq(("a", 10L), ("a", 11L), ("a", 12L), ("a", 13L), ("a", 1000L),
      ("b", 1000L), ("b", 1001L), ("b", 1002L), ("b", 1003L))
      .toDF("grp", "v")
    val out = OutlierTrim.tukey(df, "grp", "v")
    out.columns.toSeq shouldBe Seq("grp", "v")
    // a's 1000 is an outlier within a; b's 1000s are normal within b
    out.filter($"grp" === "a").select("v").as[Long].collect().max should be < 1000L
    out.filter($"grp" === "b").count() shouldBe 4
  }

  test("CorpusStats.sourceNgramOverlap: only sharing pairs, exact jaccard") {
    // A: {"a b c","b c d"}  B: {"a b c"}  C: {"x y z"}
    // (A,B): common 1 → jaccard 1/(2+1-1) = 0.5; no other pair shares
    val docs = Seq(("A", "a b c d"), ("B", "a b c"), ("C", "x y z"))
      .toDF("source", "text")
    val out = CorpusStats.sourceNgramOverlap(docs, "source", "text", n = 3)
      .collect()
    out.length shouldBe 1
    out(0).getAs[String]("src_a") shouldBe "A"
    out(0).getAs[String]("src_b") shouldBe "B"
    out(0).getAs[Long]("n_common") shouldBe 1L
    out(0).getAs[Double]("jaccard") shouldBe 0.5
  }

  test("CorpusStats.topTokenCoverage: head mass with alphabetical ties") {
    // tokens: a×3, b×2, c×1 → top2 covers 5/6 = 0.8333
    val docs = Seq((1L, "a a a b"), (2L, "b c")).toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
    val out = CorpusStats.topTokenCoverage(docs, "lang", "text", k = 2)
      .collect()(0)
    out.getAs[Long]("n_tokens") shouldBe 6L
    out.getAs[String]("top_token") shouldBe "a"
    out.getAs[Double]("topk_frac") shouldBe 0.8333
  }

  test("UnigramLm.selfScore ≡ build + score (differential, sf0.001)") {
    val docs = graft.Tables.documents(spark, sfDir)
    val fused = UnigramLm.selfScore(docs, "doc_id", "text")
    val composed = UnigramLm.score(docs, "doc_id", "text",
      UnigramLm.build(docs, "text"))
    fused.exceptAll(composed).count() shouldBe 0L
    composed.exceptAll(fused).count() shouldBe 0L
  }

  test("UnigramLm.dsirTopK prefers target-like docs; OOV cancels in the ratio") {
    // target LM: only token "t"; source LM: only token "s"
    val target = Seq((1L, "t t")).toDF("doc_id", "text")
    val source = Seq((2L, "s s")).toDF("doc_id", "text")
    val tLm = UnigramLm.build(target, "text")
    val sLm = UnigramLm.build(source, "text")
    // candidates: pure-target, pure-source, OOV-for-both
    val docs = Seq((10L, "t t t"), (11L, "s s"), (12L, "x y"))
      .toDF("doc_id", "text")
    val ranked = UnigramLm.dsirTopK(docs, "doc_id", "text", tLm, sLm, k = 3)
      .collect()
    ranked.map(_.getLong(0)).toSeq shouldBe Seq(10L, 12L, 11L)
    // "t": lp_t = ln(1)·1e6 = 0, lp_s = OOV −2e7 → +2e7 per token
    ranked(0).getAs[Long]("llr_sum_micro") shouldBe 60000000L
    ranked(0).getAs[Double]("llr_per_token") shouldBe 20.0
    // OOV-for-both: penalties cancel exactly → 0
    ranked(1).getAs[Long]("llr_sum_micro") shouldBe 0L
    // pure-source mirrors pure-target: −2e7 per token
    ranked(2).getAs[Double]("llr_per_token") shouldBe -20.0
  }

  test("Dedup.keepBestInClusters keeps the highest score, min-id on ties") {
    // docs 1,2 near-dups (8 of 9 shingles shared → jaccard 0.89): the
    // LONGER doc 2 must survive; 3 is a singleton; 4,5 identical text
    // and score → min id 4 survives
    val base = "a b c d e f g h i j"
    val docs = Seq(
      (1L, base, 10L), (2L, base + " k", 11L),
      (3L, "x y z w v u t s r q", 10L),
      (4L, "p o n m l k j i h g", 10L), (5L, "p o n m l k j i h g", 10L))
      .toDF("doc_id", "text", "len")
    val out = Dedup.keepBestInClusters(docs, "doc_id", "text", "len")
      .orderBy("keep_id").collect()
    out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq shouldBe
      Seq((2L, 2L, 11L), (3L, 1L, 10L), (4L, 2L, 10L))
  }

  test("Sampling.tokenBudgetSelect is a budget-true prefix of the md5 order") {
    val docs = (1L to 50L).map(i => (i, 10L + i % 7)).toDF("doc_id", "n_tok")
    val budget = 300L
    val picked = Sampling.tokenBudgetSelect(docs, "doc_id", "n_tok", budget)
      .collect()
    // every running total within budget, and the selection is exactly
    // the maximal prefix of the deterministic md5 order
    picked.map(_.getAs[Long]("cum_tokens")).max should be <= budget
    val order = docs
      .withColumn("ord", md5(concat_ws("_", lit("42"), col("doc_id"))))
      .orderBy("ord", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val expected = order.scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) =>
      (id, n, cum + n)
    }.drop(1).takeWhile(_._3 <= budget).map(_._1).toSet
    picked.map(_.getLong(0)).toSet shouldBe expected
    expected.size should be < 50 // the budget actually cuts
    // full-budget run selects everything
    Sampling.tokenBudgetSelect(docs, "doc_id", "n_tok", 100000L)
      .count() shouldBe 50L
    // repartition-stable determinism
    val again = Sampling.tokenBudgetSelect(
      docs.repartition(7), "doc_id", "n_tok", budget)
    again.collect().map(_.getLong(0)).toSet shouldBe expected
  }

  test("Sampling.curriculumOrder: bin-major, shuffled within, NULL bin first") {
    val df = (1L to 40L).map(i => (i, if (i <= 5) None else Some((i % 3).toInt)))
      .toDF("doc_id", "bin")
    val out = Sampling.curriculumOrder(df, "doc_id", "bin").collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getLong(2)))
    out.length shouldBe 40
    // positions are a permutation of 1..40
    out.map(_._3).sorted shouldBe (1L to 40L).toArray
    // bin-major: every NULL-bin position < every bin-0 position < bin-1 …
    val byBin = out.groupBy(_._2).map { case (b, rs) =>
      b -> (rs.map(_._3).min, rs.map(_._3).max) }
    val order = Seq(None, Some(0), Some(1), Some(2))
    order.sliding(2).foreach { case Seq(lo, hi) =>
      byBin(lo)._2 should be < byBin(hi)._1
    }
    // within a bin the order is the deterministic md5 shuffle: relative
    // order of any bin's members matches deterministicShuffle positions
    val shuffled = Sampling.deterministicShuffle(df, "doc_id").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    out.groupBy(_._2).values.foreach { rs =>
      rs.sortBy(_._3).map(_._1).toSeq shouldBe
        rs.sortBy(r => shuffled(r._1)).map(_._1).toSeq
    }
  }

  test("q94 on sf0.001 equals a manually-computed fence filter") {
    val docs = graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val trimmed = OutlierTrim.tukey(docs, "lang", "n_chars")
    // recompute fences independently with Spark SQL percentile and
    // verify row-set equality (differential, not just row count)
    val fences = docs.groupBy("lang").agg(
      percentile(col("n_chars"), lit(0.25)).as("q1"),
      percentile(col("n_chars"), lit(0.75)).as("q3"))
    val expected = docs.join(fences, "lang")
      .filter(col("n_chars") >= col("q1") - lit(1.5) * (col("q3") - col("q1")) &&
        col("n_chars") <= col("q3") + lit(1.5) * (col("q3") - col("q1")))
    trimmed.count() shouldBe expected.count()
    trimmed.select("doc_id").exceptAll(expected.select("doc_id")).count() shouldBe 0L
  }

  test("CorpusStats.collocations: hand lifts; HOF pair generation ≡ relational self-join") {
    // "a b a" window 1: two (a,b) pairs; p(ab)=1, p(a)=p(b)=1/2 → lift 4
    val ab = rows(CorpusStats.collocations(
      Seq((1L, "a b a")).toDF("doc_id", "text"), "text",
      window = 1, minCount = 1L, topN = 10))
    ab.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))) shouldBe
      Seq(("a", "b", 2L, 4000000L))
    // "x x x" window 2: three self-pairs, single-token corpus → lift
    // exactly at independence (1e6); self-pair counts its marginal twice
    val xx = rows(CorpusStats.collocations(
      Seq((1L, "x x x"), (2L, null: String)).toDF("doc_id", "text"), "text",
      window = 2, minCount = 1L, topN = 10))
    xx.map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))) shouldBe
      Seq(("x", "x", 3L, 1000000L))
    // the scan-local HOF pair generation equals the relational
    // self-join (b.pos ∈ (a.pos, a.pos+w]) the oracle uses
    val docs = graft.Tables.documents(spark, sfDir).limit(50)
    val got = CorpusStats.collocations(docs, "text",
        window = 3, minCount = 1L, topN = 1000000)
      .select("w1", "w2", "n_pairs")
    val toks = docs.select(col("doc_id"),
      posexplode(graft.functions.TextFns.tokens(col("text")))
        .as(Seq("pos", "tok")))
    val ref = toks.as("a").join(toks.as("b"),
        col("a.doc_id") === col("b.doc_id")
          && col("b.pos") > col("a.pos")
          && col("b.pos") <= col("a.pos") + 3)
      .select(least(col("a.tok"), col("b.tok")).as("w1"),
        greatest(col("a.tok"), col("b.tok")).as("w2"))
      .groupBy("w1", "w2").agg(count(lit(1)).as("n_pairs"))
    rows(got.exceptAll(ref)) shouldBe empty
    rows(ref.exceptAll(got)) shouldBe empty
  }

  test("CorpusStats.distributionDrift: hand values — identical 0, half-moved 5000, disjoint 10000") {
    // g0: identical shape; g1: 2 of 4 docs move one bucket → TVD ½;
    // g2: every doc moves → TVD 1; widths of 10
    def snap(rows: Seq[(String, Long)]) =
      rows.toDF("source", "len").withColumn("doc_id", lit(0L))
    val prev = snap(Seq(("g0", 5L), ("g0", 15L),
      ("g1", 5L), ("g1", 5L), ("g1", 5L), ("g1", 5L),
      ("g2", 5L), ("g2", 5L)))
    val cur = snap(Seq(("g0", 7L), ("g0", 12L),
      ("g1", 5L), ("g1", 5L), ("g1", 15L), ("g1", 15L),
      ("g2", 25L), ("g2", 25L)))
    val out = rows(CorpusStats.distributionDrift(prev, cur, "source", "len",
        bucketWidth = 10L).orderBy("grp"))
      .map(r => (r.getString(0), r.getLong(3))).toMap
    out shouldBe Map("g0" -> 0L, "g1" -> 5000L, "g2" -> 10000L)
  }

  test("CorpusStats.distributionDrift: one-sided groups NULL; scale-free normalization; NULL keys/values") {
    def L(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    val prev = Seq[(String, java.lang.Long)](("only_prev", L(5)),
      ("stable", L(5)), ("stable", L(5)), (null, L(5)))
      .toDF("source", "len")
    // stable has 3× the docs in cur, same single-bucket shape → 0 drift
    val cur = Seq[(String, java.lang.Long)](("only_cur", L(5)),
      ("stable", L(5)), ("stable", L(5)), ("stable", L(5)),
      ("stable", L(5)), ("stable", L(5)), ("stable", L(5)),
      (null, L(5)), (null, null))
      .toDF("source", "len")
    val out = rows(CorpusStats.distributionDrift(prev, cur, "source", "len",
      bucketWidth = 10L).orderBy("grp"))
    val byGrp = out.map(r => r.getString(0) ->
      (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    byGrp("only_prev") shouldBe None
    byGrp("only_cur") shouldBe None
    byGrp("stable") shouldBe Some(0L)
    // NULL keys compare under "(none)"; the NULL value row is excluded
    byGrp("(none)") shouldBe Some(0L)
    out.find(_.getString(0) == "(none)").get.getLong(2) shouldBe 1L
  }
}
