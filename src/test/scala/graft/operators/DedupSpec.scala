package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sfDir)

  test("exact dedup groups whitespace/case variants, keeps min id") {
    val df = Seq(
      (1L, "Hello  World"),
      (2L, "hello world"),
      (3L, "different text"),
      (4L, "HELLO\tWORLD ")
    ).toDF("doc_id", "text")
    val out = rows(Dedup.exact(df, "doc_id", "text").orderBy("keep_id"))
      .map(r => (r.getLong(0), r.getLong(1)))
    out shouldBe Seq((1L, 3L), (3L, 1L))
  }

  test("exactKeepSmallest keeps the min-id ROW per precomputed fingerprint; NULL fingerprints are singletons, never dropped") {
    val df = Seq(
      (5L, "fpA", "row5"), (2L, "fpA", "row2"), (9L, "fpB", "row9"),
      (7L, null.asInstanceOf[String], "row7"),
      (8L, null.asInstanceOf[String], "row8"))
      .toDF("doc_id", "fp", "payload")
    val out = Dedup.exactKeepSmallest(df, "doc_id", "fp")
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(2)))
    // fpA keeps 2 (min), fpB keeps 9; both NULL-fp rows survive as
    // their own singletons (the exact() unknown-content rule — a
    // plain semi join would silently drop them)
    out.toSeq shouldBe Seq((2L, "row2"), (7L, "row7"), (8L, "row8"),
      (9L, "row9"))
  }

  test("ngramJaccardPairs finds known near-dup, exact jaccard value") {
    // doc1/doc2: shingle sets {a b c, b c d, c d e} vs {a b c, b c d, c d X}
    // intersection 2, union 4 → jaccard 0.5
    val df = Seq(
      (1L, "a b c d e"),
      (2L, "a b c d X"),
      (3L, "totally unrelated words here")
    ).toDF("doc_id", "text")
    val out = rows(Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.4))
    out.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) shouldBe Seq((1L, 2L, 0.5))
  }

  test("ngramJaccardPairs differential: maxDf cap is a no-op on a low-df corpus") {
    // sf0.001 max shingle df is far below the default cap: the guarded
    // operator must be bit-identical to the uncapped one
    val capped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6)
    val uncapped = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.6,
      maxDf = Int.MaxValue)
    rows(capped.exceptAll(uncapped)) shouldBe empty
    rows(uncapped.exceptAll(capped)) shouldBe empty
  }

  test("ngramJaccardPairs: maxDf excises a planted hot shingle from the similarity space") {
    // every doc carries the boilerplate footer shingle "x y z"; docs 1/2
    // additionally share real content. With the footer's df (7) over the
    // cap, it must count toward NEITHER intersections NOR set sizes.
    val df = (Seq(
      (1L, "a b c d e x y z"),
      (2L, "a b c d X x y z")
    ) ++ (3L to 7L).map(i => (i, s"u$i v$i w$i x y z"))).toDF("doc_id", "text")
    // uncapped: footer pairs ALL 21 doc pairs; doc1/doc2 jaccard 3/9
    val un = rows(Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.01,
      maxDf = Int.MaxValue))
    un.size shouldBe 21
    // capped: only the real near-dup survives, at the FILTERED-set
    // jaccard — sets {abc,bcd,cde,dex,exy} vs {abc,bcd,cdX,dXx,Xxy},
    // inter 2, union 8
    val capped = rows(Dedup.ngramJaccardPairs(df, "doc_id", "text", 3, 0.01,
      maxDf = 6))
    capped.map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))) shouldBe
      Seq((1L, 2L, 0.25))
  }

  test("differential: minhashPairs == exact jaccard pairs at threshold 0.8 on sf0.001") {
    val exact = Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("id_a", "id_b")
    val mh = Dedup.minhashPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 128, bands = 32, threshold = 0.8)
      .select("id_a", "id_b")
    rows(mh.exceptAll(exact)) shouldBe empty      // precision 1.0 by construction
    rows(exact.exceptAll(mh)) shouldBe empty      // recall: band-curve miss ~5e-8
  }

  test("simhash is deterministic and identical for identical normalized text") {
    val df = Seq((1L, "Quick  Brown fox"), (2L, "quick brown FOX")).toDF("doc_id", "text")
    val hs = rows(Dedup.simhash(df, "doc_id", "text")).map(_.getLong(1)).distinct
    hs.size shouldBe 1
  }

  test("simhashPairs: near-identical docs within radius, unrelated docs not paired") {
    val base = "the quick brown fox jumps over the lazy dog again and again today"
    val df = Seq(
      (1L, base),
      (2L, base + " extra"),                     // tiny perturbation
      (3L, "completely unrelated numeric table of contents zone")
    ).toDF("doc_id", "text")
    val pairs = rows(Dedup.simhashPairs(df, "doc_id", "text", radius = 16))
      .map(r => (r.getLong(0), r.getLong(1)))
    pairs should contain((1L, 2L))
    pairs should not contain ((1L, 3L))
    pairs should not contain ((2L, 3L))
  }

  test("simhash pairs are unigram near-dups on sf0.001 (differential sanity)") {
    // SimHash votes over TOKEN frequencies — it approximates bag-of-words
    // similarity, not shingle-sequence similarity. The right differential
    // oracle is unigram token-SET jaccard: every hamming<=3 pair must be
    // a strong bag-of-words near-dup.
    val uni = docs.select(col("doc_id").as("doc"),
      explode(array_distinct(graft.functions.TextFns.tokens(
        lower(col("text"))))).as("tok"))
    val sizes = uni.groupBy("doc").agg(count(lit(1)).as("sz"))
    val inter = uni.as("a")
      .join(uni.as("b"), col("a.tok") === col("b.tok") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("i"))
    val uniJac = inter
      .join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("sz", "sa"), "id_a")
      .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("sz", "sb"), "id_b")
      .filter(col("i").cast("double") / (col("sa") + col("sb") - col("i")) >= 0.7)
    val strong = rows(uniJac.select("id_a", "id_b"))
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = rows(Dedup.simhashPairs(docs, "doc_id", "text", radius = 3)
      .select("id_a", "id_b")).map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sh.nonEmpty)
    assert((sh -- strong).isEmpty,
      s"simhash produced ${(sh -- strong).size}/${sh.size} pairs below unigram jaccard 0.7")
  }

  test("simhashPairs differential: maxBucket cap is a no-op on sf0.001") {
    // sf0.001's chunk blocks are far below the default cap: the guarded
    // operator must be bit-identical to an effectively-unguarded run
    val capped = Dedup.simhashPairs(docs, "doc_id", "text", radius = 3)
    val unguarded = Dedup.simhashPairs(docs, "doc_id", "text", radius = 3,
      maxBucket = Int.MaxValue / 2)
    rows(capped.exceptAll(unguarded)) shouldBe empty
    rows(unguarded.exceptAll(capped)) shouldBe empty
  }

  test("simhashPairs caps degenerate chunk blocks (bounded fan-out)") {
    // 60 identical docs → identical simhash → every chunk block has all
    // 60 docs. maxBucket=10 must drop every block (no pair ever
    // materialized); maxBucket=100 pairs all of them.
    val many = (1L to 60L).map(i => (i, "same text for every doc")).toDF("doc_id", "text")
    rows(Dedup.simhashPairs(many, "doc_id", "text", radius = 3,
      maxBucket = 10)) shouldBe empty
    val all = rows(Dedup.simhashPairs(many, "doc_id", "text", radius = 3,
      maxBucket = 100))
    all.size shouldBe 60 * 59 / 2
    all.map(_.getInt(2)).distinct shouldBe Seq(0) // hamming 0 for identical text
  }

  test("minhashCandidates caps degenerate buckets") {
    // 60 identical docs → one LSH bucket of 60; maxBucket=10 must drop it
    val many = (1L to 60L).map(i => (i, "same text for every doc")).toDF("doc_id", "text")
    val sigs = Dedup.minhashSignatures(many, "doc_id", "text", 3, 16)
    rows(Dedup.minhashCandidates(sigs, bands = 4, maxBucket = 10)) shouldBe empty
    rows(Dedup.minhashCandidates(sigs, bands = 4, maxBucket = 100)) should not be empty
  }

  test("shingle kernel's incremental hash equals fnv1a over the joined shingle strings") {
    // the kernel streams FNV-1a over (token, ' ') sequences without
    // materializing the shingle; this pins it to the reference form,
    // including multi-space runs, leading/trailing ws, tabs/newlines,
    // short-doc fallback, and the empty-text fallback hash
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "  leading  and   multi\t space\nnewline "),
      (3L, "short doc"),
      (4L, ""),
      (5L, "   ")).toDF("id", "text")
    val got = Dedup.shingleSets(docs, "id", "text", 3, "id", cache = false)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    def want(text: String): Set[Long] = {
      val toks = text.split("\\s+").filter(_.nonEmpty).toSeq
      val shingles =
        if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSeq
        else Seq(toks.mkString(" "))
      shingles.map(Dedup.fnv1a).toSet
    }
    got(1L) shouldBe want("alpha beta gamma delta epsilon")
    got(2L) shouldBe want("  leading  and   multi\t space\nnewline ")
    got(3L) shouldBe want("short doc")
    got(4L) shouldBe want("")
    got(5L) shouldBe want("   ")
  }

  test("simhashPairs preserves an IntegerType id through the long buffer") {
    val df = Seq((1, "a b c d e f g h"), (2, "a b c d e f g h"), (3, "z y x"))
      .toDF("doc_id", "text")
    val out = Dedup.simhashPairs(df, "doc_id", "text", radius = 3)
    out.schema("id_a").dataType shouldBe org.apache.spark.sql.types.IntegerType
    out.schema("id_b").dataType shouldBe org.apache.spark.sql.types.IntegerType
    rows(out).map(r => (r.getInt(0), r.getInt(1))) should contain((1, 2))
  }

  private def excised(docs: Seq[(Long, String)], n: Int): Map[Long, (Long, Long, String)] = {
    import spark.implicits._
    Dedup.exciseRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", n)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
  }

  test("exciseRepeatedSpans: planted cross-doc span kept in first doc, cut from the second") {
    val span = "alpha bravo charlie delta echo" // exactly n=5 tokens
    val out = excised(Seq(
      1L -> s"intro words here $span closing words",
      2L -> s"different opening $span and a tail",
      3L -> "wholly unrelated text with no repeats at all"), n = 5)
    out(1L) shouldBe ((10L, 0L, s"intro words here $span closing words"))
    out(2L) shouldBe ((10L, 5L, "different opening and a tail"))
    out(3L)._2 shouldBe 0L
  }

  test("exciseRepeatedSpans: overlapping repeats merge into one maximal cut") {
    // 6-token repeat = two overlapping 5-gram occurrences in doc 2;
    // their cut windows [p,p+4] and [p+1,p+5] union to the full span
    val span = "one two three four five six"
    val out = excised(Seq(
      1L -> s"$span left anchor",
      2L -> s"right anchor $span"), n = 5)
    out(1L)._2 shouldBe 0L
    out(2L) shouldBe ((8L, 6L, "right anchor"))
  }

  test("exciseRepeatedSpans: intra-doc repetition keeps the first occurrence") {
    val out = excised(Seq(
      1L -> "a b c d e filler filler2 filler3 a b c d e"), n = 5)
    out(1L)._2 shouldBe 5L
    out(1L)._3 shouldBe "a b c d e filler filler2 filler3"
  }

  test("exciseRepeatedSpans: short, empty, and null docs pass through whole") {
    import spark.implicits._
    val df = Seq((1L, Option("only four tokens here")), (2L, Option("")),
      (3L, Option.empty[String]))
      .toDF("doc_id", "text")
    val out = Dedup.exciseRepeatedSpans(df, "doc_id", "text", n = 5)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    out(1L) shouldBe ((4L, 0L, "only four tokens here"))
    out(2L) shouldBe ((0L, 0L, ""))
    out(3L) shouldBe ((0L, 0L, ""))
  }

  test("surrogate ids: deterministic hash minting, the collision-free variant, and the integral-id contract satisfied end to end on a URL-keyed corpus") {
    import spark.implicits._
    val urls = Seq(
      ("https://a.example/reports/1", "annual harbor dredging report"),
      ("https://b.example/weather/2", "mountain weather station logs"),
      ("https://c.example/news/3", "regional water quality findings"))
      .toDF("url", "text")
    // hash form: deterministic across invocations, distinct, narrow
    def mint() = Dedup.withSurrogateId(urls, "url")
      .select("url", "doc_id").as[(String, Long)].collect().toMap
    val ids = mint()
    mint() shouldBe ids
    ids.values.toSeq.distinct should have size 3
    // the id is the KEY's identity: a re-crawl row of the same URL
    // mints the same id
    Dedup.withSurrogateId(urls.limit(1), "url")
      .select("doc_id").as[Long].head() shouldBe
      ids("https://a.example/reports/1")
    // unique variant: ids are exactly 0..n−1, ordered by key
    val uniq = Dedup.withUniqueSurrogateId(urls, "url")
      .select("url", "doc_id").as[(String, Long)].collect().sortBy(_._2)
    uniq.map(_._2) shouldBe Array(0L, 1L, 2L)
    uniq.map(_._1) shouldBe ids.keySet.toArray.sorted
    // and the minted frame satisfies the family's integral-id
    // fail-fasts (the error message's own advice, proven)
    val minted = Dedup.withSurrogateId(urls, "url")
    val (hb, hs) = TextIndex.buildIndex(minted, "doc_id", "text")
    hs.count() shouldBe 3L
    TextIndex.incrementalTextDups(minted, "doc_id", "text", hb, hs)
      .count() shouldBe 3L // every doc re-crawls itself at Jaccard 1.0
    spark.catalog.clearCache()
  }
}
