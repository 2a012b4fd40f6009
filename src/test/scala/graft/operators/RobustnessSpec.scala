package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Degenerate-input behavior: null/empty/whitespace documents, empty
  * frames — the inputs a 100 TB crawl corpus is guaranteed to contain.
  * A throw in any of these poisons a full-scan job (SURVEY §5 edge
  * cases).
  */
class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dirty = Seq(
    (1L, "normal document text here"),
    (2L, ""),
    (3L, "   \t  "),
    (4L, null.asInstanceOf[String]),
    (5L, "normal document text here")
  ).toDF("doc_id", "text")

  test("exact dedup: empty and whitespace texts group together; null text survives") {
    val out = Dedup.exact(dirty, "doc_id", "text")
    // docs 2,3 normalize to "" (one group); 1,5 duplicate; 4 null is its own group
    val groups = rows(out.orderBy("keep_id")).map(r => (r.getLong(0), r.getLong(1)))
    groups should contain((1L, 2L)) // 1+5
    groups should contain((2L, 2L)) // 2+3
    out.count() shouldBe 3
  }

  test("ngramJaccardPairs: degenerate docs pair only among themselves, no throw") {
    val pairs = rows(Dedup.ngramJaccardPairs(dirty, "doc_id", "text", 3, 0.5))
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 5L))
    // empty/whitespace docs share the "" shingle → legitimately pair
    pairs should contain((2L, 3L))
    pairs should have size 2
  }

  test("minhash pipeline survives null/empty docs end-to-end") {
    val pairs = rows(Dedup.minhashPairs(dirty, "doc_id", "text",
      shingleN = 3, numHashes = 32, bands = 8, threshold = 0.5))
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 5L))
  }

  test("simhash pipeline survives null/empty docs") {
    noException should be thrownBy
      Dedup.simhashPairs(dirty, "doc_id", "text", radius = 3).collect()
  }

  test("text functions return defaults, not nulls/throws, on degenerate text") {
    import graft.functions.TextFns
    val out = dirty.select(
      col("doc_id"),
      TextFns.qualityScore(col("text")).as("q"),
      TextFns.languageId(col("text")).as("lang"),
      TextFns.tokenCount(col("text")).as("n")).orderBy("doc_id").collect()
    out(1).getDouble(1) shouldBe 0.0 // empty
    out(2).getDouble(1) shouldBe 0.0 // whitespace
    out(1).getString(2) shouldBe "und"
    out(1).getInt(3) shouldBe 0
  }

  test("operators accept empty input frames") {
    val empty = dirty.filter(col("doc_id") < 0)
    Dedup.exact(empty, "doc_id", "text").count() shouldBe 0
    Dedup.ngramJaccardPairs(empty, "doc_id", "text", 3, 0.5).count() shouldBe 0
    Dedup.minhashPairs(empty, "doc_id", "text").count() shouldBe 0
    TopK.global(empty, 5, col("doc_id").asc).count() shouldBe 0
    PivotMatrix.countMatrix(empty, "doc_id", "text", Seq("a", "b")).count() shouldBe 0
  }

  test("as-of joins: empty right side yields all-NULL payloads, both forms") {
    val left = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00"), "x"))
      .toDF("key", "ts", "tag")
    val right = Seq.empty[(Long, java.sql.Timestamp, Double)]
      .toDF("key", "ts", "price")
    for (out <- Seq(
        AsOfJoin.asof(left, right, Seq("key"), "ts", Seq("price")),
        AsOfJoin.asofBroadcast(left, right, Seq("key"), "ts", Seq("price")))) {
      val r = rows(out)
      r should have size 1
      assert(r.head.isNullAt(r.head.fieldIndex("price")))
    }
  }

  test("upsert with an empty update batch returns the snapshot unchanged") {
    val snapshot = Seq(("a", 1L, "v")).toDF("key", "version", "payload")
    val updates = Seq.empty[(String, Long, String)].toDF("key", "version", "payload")
    rows(Upsert.lastWriteWins(snapshot, updates, Seq("key"), "version")) shouldBe
      rows(snapshot)
  }

  test("similarity handles empty and mismatched-dim vectors without throwing") {
    val vecs = Seq(
      (1L, Array(1f, 2f, 3f)),
      (2L, Array[Float]()),
      (3L, Array(1f, 2f))
    ).toDF("vec_id", "embedding")
    noException should be thrownBy
      Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 2).collect()
  }

  test("similarity survives NULL embeddings: pair dropped, never an encoder crash") {
    val vecs = Seq(
      (1L, Option(Array(1f, 2f))),
      (2L, Option(Array(2f, 4f))),
      (3L, Option.empty[Array[Float]])
    ).toDF("vec_id", "embedding")
    val out = rows(Similarity.bruteForceTopK(vecs, vecs, "vec_id", "embedding", 2))
    // NULL-embedding rows produce NULL sims on every pair touching them
    // — filtered before the non-nullable heap aggregate, so vec 3
    // appears neither as query nor as candidate
    out.foreach { r =>
      r.getLong(0) should not be 3L
      r.getLong(1) should not be 3L
    }
    out.map(_.getLong(0)).toSet shouldBe Set(1L, 2L)
  }

  test("LSH bucketing excludes NULL vectors and NULL-element vectors, no crash") {
    val vecs = Seq(
      (1L, Option(Seq[Option[Float]](Some(1f), Some(2f)))),
      (2L, Option(Seq[Option[Float]](Some(2f), None))), // corrupt element
      (3L, Option.empty[Seq[Option[Float]]])            // null vector
    ).toDF("vec_id", "embedding")
    val buckets = rows(Similarity.srpBuckets(vecs, "vec_id", "embedding", 2, 2))
    // only the intact vector is indexed; corrupt rows get no buckets
    // (their every cosine would be NULL downstream anyway)
    buckets.map(_.getLong(0)).toSet shouldBe Set(1L)
  }

  test("curation ops survive null/empty/whitespace docs, no throw") {
    val tagged = dirty.withColumn("grp", lit("g"))
      .withColumn("n", expr("length(coalesce(text, ''))").cast("long"))
    // LM scoring: token-less docs (2,3,4) legitimately absent
    UnigramLm.selfScore(dirty, "doc_id", "text").count() shouldBe 2L
    // trim: every row keeps or drops, never throws; null-safe filter
    OutlierTrim.tukey(tagged, "grp", "n").count() should be <= 5L
    // overlap/coverage over a single group: no pairs, one coverage row
    CorpusStats.sourceNgramOverlap(tagged, "grp", "text").count() shouldBe 0L
    CorpusStats.topTokenCoverage(tagged, "grp", "text", 5).count() shouldBe 1L
    // budget cut with zero budget selects nothing; full budget all rows
    Sampling.tokenBudgetSelect(tagged, "doc_id", "n", 0L).count() shouldBe 0L
    Sampling.tokenBudgetSelect(tagged, "doc_id", "n", 1000L).count() shouldBe 5L
    // keep-best: null text forms its own singleton, dup texts merge
    Dedup.keepBestInClusters(dirty, "doc_id", "text", "doc_id")
      .count() should be >= 3L
  }

  test("empty-corpus curation: every operator returns an empty frame") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
      .withColumn("grp", lit("g"))
    UnigramLm.selfScore(empty, "doc_id", "text").count() shouldBe 0L
    OutlierTrim.tukey(empty.withColumn("n", lit(1L)), "grp", "n")
      .count() shouldBe 0L
    CorpusStats.sourceNgramOverlap(empty, "grp", "text").count() shouldBe 0L
    CorpusStats.topTokenCoverage(empty, "grp", "text", 5).count() shouldBe 0L
    Sampling.tokenBudgetSelect(empty.withColumn("n", lit(1L)),
      "doc_id", "n", 10L).count() shouldBe 0L
  }

  test("retrieval family survives empty/degenerate corpora") {
    val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
    LineDedup.firstOccurrence(noDocs, "doc_id", "text").count() shouldBe 0L
    Retrieval.bm25TopK(noDocs, "doc_id", "text", Seq("x"), 5).count() shouldBe 0L
    // NULL-text docs never reach the BM25 ranking (no tokens, no hits)
    val withNull = Seq((1L, "hit pad"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    Retrieval.bm25TopK(withNull, "doc_id", "text", Seq("hit"), 5)
      .select("doc_id").as[Long].collect() shouldBe Array(1L)
    val emptyRank = Seq.empty[(Long, Int)].toDF("doc_id", "rank")
    Retrieval.rrfFuse(Seq(emptyRank, emptyRank), "doc_id", 5).count() shouldBe 0L
    Sampling.epochReplicate(noDocs.withColumn("src", lit("a")),
      "doc_id", "src", Map.empty).count() shouldBe 0L
    // k-means: fit on an empty corpus yields an empty model; assigning
    // against one fails loudly instead of emitting NULL clusters
    val noVecs = Seq.empty[(Long, Seq[Float])].toDF("vec_id", "embedding")
    val m = KMeans.fit(noVecs, "vec_id", "embedding", k = 3, iters = 2)
    m.isEmpty shouldBe true
    an[IllegalArgumentException] should be thrownBy
      KMeans.assign(noVecs, "vec_id", "embedding", m)
    // k > n: the model degrades to one centroid per point
    val two = Seq((1L, Seq(0.0f)), (2L, Seq(1.0f))).toDF("vec_id", "embedding")
    KMeans.fit(two, "vec_id", "embedding", k = 5, iters = 1).size shouldBe 2
  }

  test("exact dedup: multiple null-text docs stay SEPARATE singleton groups") {
    val docs = Seq(
      (1L, Option("same text")), (2L, Option("same text")),
      (10L, Option.empty[String]), (11L, Option.empty[String])
    ).toDF("doc_id", "text")
    val out = rows(Dedup.exact(docs, "doc_id", "text").orderBy("keep_id"))
    out.map(r => (r.getLong(0), r.getLong(1))) shouldBe Seq(
      (1L, 2L), (10L, 1L), (11L, 1L))
  }

  // ---- round-7 operators over the dirty corpus -----------------------

  test("c4Clean is idempotent: cleaning the clean text keeps every line") {
    val multi = dirty.union(Seq(
      (6L, "a fine sentence here.\nno punct line\nuses javascript daily.")
    ).toDF("doc_id", "text"))
    val once = QualityRules.c4Clean(multi, "doc_id", "text")
      .select(col("doc_id"), col("clean_text"))
    val twice = QualityRules.c4Clean(once, "doc_id", "clean_text")
    // every kept line survives a second pass untouched
    twice.filter((col("n_kept") =!= col("n_lines"))
        && (col("n_lines") > lit(0))
        && (org.apache.spark.sql.functions.length(col("clean_text")) > lit(0)))
      .count() shouldBe 0L
    val r6 = twice.filter(col("doc_id") === 6L).collect().head
    r6.getAs[String]("clean_text") shouldBe "a fine sentence here."
  }

  test("perplexityBuckets: a corpus with no bigrams anywhere yields all-NULL buckets") {
    val solo = Seq(("1", 1L, "one"), ("1", 2L, ""), ("1", 3L, null.asInstanceOf[String]))
      .toDF("source", "doc_id", "text")
    val out = rows(BigramLm.perplexityBuckets(solo, "doc_id", "text", "source"))
    out should have size 3
    out.foreach(_.isNullAt(4) shouldBe true)
  }

  test("unigram tokenizer survives the dirty corpus end-to-end") {
    val v = UnigramTokenizer.seedVocab(dirty, "text", vocabSize = 40,
      maxPieceLen = 4)
    v.count() should be > 0L
    val seg = UnigramTokenizer.segmentWords(dirty, "text", 40, 4)
    // null/empty/whitespace docs contribute no words; real words segment
    seg.filter(col("encoding").isNull).count() shouldBe 0L
    UnigramTokenizer.encodeWith(dirty, "doc_id", "text", v, 4)
      .filter(col("piece_id").isNull).count() shouldBe 0L
  }

  test("objective prep on degenerate docs: no throw, empty-safe outputs") {
    val sc = rows(Denoise.spanCorrupt(dirty, "doc_id", "text"))
    sc should have size 5
    sc.filter(r => Seq(2L, 3L, 4L).contains(r.getLong(0)))
      .foreach { r =>
        r.getString(4) shouldBe ""
        r.getString(5) shouldBe "<extra_id_0>"
      }
    // prefix split drops everything without 2+ tokens
    Denoise.prefixSplit(dirty, "doc_id", "text").collect()
      .map(_.getLong(0)).toSet shouldBe Set(1L, 5L)
    // preference pairs: a pool of null scores vanishes, no throw
    Dialogue.preferencePairs(
      dirty.select(lit(1L).as("p"), col("doc_id"),
        lit(null).cast("long").as("s")), "p", "doc_id", "s")
      .count() shouldBe 0L
  }
}
