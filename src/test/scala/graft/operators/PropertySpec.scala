package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5 test strategy #3): pivot ∘
  * unpivot round-trips, union count preservation, split
  * complementarity — over ScalaCheck-generated event logs.
  *
  * Sampling is manual (Gen.apply with fixed seeds) because only raw
  * scalacheck is on the test classpath; seeds are fixed so failures
  * reproduce.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val eventTypes = Seq("buy", "click", "view")

  private val eventsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(60, for {
      uid <- Gen.choose(1L, 8L)
      t <- Gen.oneOf(eventTypes)
    } yield (uid, t))

  private def samples(n: Int): Seq[List[(Long, String)]] =
    (1 to n).flatMap(i => eventsGen(Gen.Parameters.default, Seed(i.toLong)))

  test("pivot ∘ unpivot round-trips to grouped counts for arbitrary logs") {
    samples(5).foreach { events =>
      val df = events.toDF("uid", "etype")
      val wide = PivotMatrix.countMatrix(df, "uid", "etype", eventTypes)
      val back = PivotMatrix.unpivotMatrix(wide, "uid", eventTypes, "etype", "n")
        .filter(col("n") > 0)
      val expected = df.groupBy("uid", "etype").agg(count(lit(1)).as("n"))
      rows(back.exceptAll(expected)) shouldBe empty
      rows(expected.exceptAll(back)) shouldBe empty
    }
  }

  test("split by type is complementary: branch counts sum to filtered total") {
    samples(5).foreach { events =>
      val df = events.toDF("uid", "etype")
      val total = df.filter(col("etype").isin(eventTypes: _*)).count()
      eventTypes.map(t => df.filter(col("etype") === t).count()).sum shouldBe total
    }
  }

  private val wordPool = Seq("alpha", "beta", "gamma", "delta", "eps",
    "zeta", "eta", "theta")

  private val docsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(30, Gen.choose(2, 12).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf(wordPool)).map(_.mkString(" "))))
      .map(_.zipWithIndex.map { case (t, i) => (i.toLong, t) })

  private def docSamples(n: Int): Seq[List[(Long, String)]] =
    (1 to n).flatMap(i => docsGen(Gen.Parameters.default, Seed(100L + i)))

  test("curation invariants hold over arbitrary corpora") {
    docSamples(4).foreach { docsList =>
      val docs = docsList.toDF("doc_id", "text")
        .withColumn("grp", (col("doc_id") % 3).cast("string"))

      // selfScore: one row per non-empty doc, scores repartition-stable
      val s1 = UnigramLm.selfScore(docs, "doc_id", "text")
      s1.count() shouldBe docs.count()
      val s2 = UnigramLm.selfScore(docs.repartition(7), "doc_id", "text")
      rows(s1.exceptAll(s2)) shouldBe empty

      // trim: output ⊆ input, and a constant-value group is untouched
      val lens = docs.withColumn("len", expr("length(text)"))
      val trimmed = OutlierTrim.tukey(lens, "grp", "len")
      trimmed.count() should be <= lens.count()
      rows(trimmed.exceptAll(lens)) shouldBe empty

      // Zipf coverage: frac ∈ (0,1]; k ≥ vocabulary ⟹ frac = 1.0
      val cov = CorpusStats.topTokenCoverage(docs, "grp", "text", k = 3)
      cov.collect().foreach { r =>
        val f = r.getAs[Double]("topk_frac")
        f should be > 0.0
        f should be <= 1.0
      }
      CorpusStats.topTokenCoverage(docs, "grp", "text", k = wordPool.size)
        .collect().foreach(_.getAs[Double]("topk_frac") shouldBe 1.0)

      // overlap: jaccard ∈ (0,1], pairs ordered, at most C(3,2) rows
      val ov = CorpusStats.sourceNgramOverlap(docs, "grp", "text", n = 2)
      ov.count() should be <= 3L
      ov.collect().foreach { r =>
        r.getAs[String]("src_a") should be < r.getAs[String]("src_b")
        val j = r.getAs[Double]("jaccard")
        j should be > 0.0
        j should be <= 1.0
      }
    }
  }

  test("round-6 operator invariants hold over arbitrary corpora") {
    docSamples(3).foreach { docsList =>
      val docs = docsList.toDF("doc_id", "text")

      // LangId: one row per doc; score ≥ margin ≥ 0; und ⟺ score 0;
      // predictions repartition-stable
      val p1 = LangId.predict(docs, "doc_id", "text")
      p1.count() shouldBe docs.count()
      p1.collect().foreach { r =>
        val (lang, score, margin) = (r.getString(1), r.getLong(2), r.getLong(3))
        assert(score >= margin && margin >= 0L)
        assert((lang == "und") == (score == 0L), s"$lang score=$score")
      }
      val p2 = LangId.predict(docs.repartition(7), "doc_id", "text")
      rows(p1.exceptAll(p2)) shouldBe empty

      // exciseRepeatedSpans: one row per doc; token conservation —
      // clean's token count = n_tokens − n_removed; n_removed bounded;
      // output repartition-stable
      val e1 = Dedup.exciseRepeatedSpans(docs, "doc_id", "text", n = 3)
      e1.count() shouldBe docs.count()
      e1.collect().foreach { r =>
        val (nTok, nRem, clean) = (r.getLong(1), r.getLong(2), r.getString(3))
        assert(nRem >= 0L && nRem <= nTok)
        val cleanToks = clean.split("\\s+").count(_.nonEmpty).toLong
        cleanToks shouldBe (nTok - nRem)
      }
      val e2 = Dedup.exciseRepeatedSpans(docs.repartition(5), "doc_id", "text", n = 3)
      rows(e1.exceptAll(e2)) shouldBe empty

      // BPE: merge ranks are 1..N without gaps; pair counts
      // non-increasing is NOT an invariant (later merges can create
      // more frequent pairs) — but every count is ≥ 1 and the
      // segmentation re-joins to the original word
      val m = Vocabulary.bpeMerges(docs, "text", 4).collect()
      m.map(_.getInt(0)).toSeq shouldBe (1 to m.length)
      m.foreach(_.getLong(3) should be >= 1L)
      Vocabulary.bpeSegments(docs, "text", 4).collect().foreach { r =>
        r.getString(2).replace(" ", "") shouldBe r.getString(0)
      }
    }
  }

  test("constant-value groups survive Tukey trim whole") {
    val df = (1L to 40L).map(i => ("g", 7L)).toDF("grp", "v")
    OutlierTrim.tukey(df, "grp", "v").count() shouldBe 40L
  }

  test("snapshot family invariants: statuses partition ids; drift symmetric, zero on identity") {
    docSamples(3).foreach { docsList =>
      val docs = docsList.toDF("doc_id", "text")
        .withColumn("grp", (col("doc_id") % 3).cast("string"))
      val prev = docs.filter(col("doc_id") % 5 =!= 0)
      val cur = docs.filter(col("doc_id") % 4 =!= 3)
        .withColumn("text", when(col("doc_id") % 4 === 1,
          concat(col("text"), lit(" mut"))).otherwise(col("text")))

      // statuses partition the id universe, and agree with the full
      // membership + content reference recomputed driver-side
      val d = rows(SnapshotDiff.diff(prev, cur, "doc_id", "text"))
        .map(r => r.getLong(0) -> r.getString(1))
      d.map(_._1).distinct.size shouldBe d.size
      val pTxt = rows(prev.select("doc_id", "text"))
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      val cTxt = rows(cur.select("doc_id", "text"))
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      d.map(_._1).toSet shouldBe (pTxt.keySet ++ cTxt.keySet)
      d.foreach { case (id, st) =>
        val expected =
          if (!pTxt.contains(id)) "added"
          else if (!cTxt.contains(id)) "removed"
          else if (pTxt(id) == cTxt(id)) "unchanged"
          else "changed"
        st shouldBe expected
      }
      // identity diff: every status unchanged; identity drift: all 0
      rows(SnapshotDiff.diff(docs, docs, "doc_id", "text"))
        .map(_.getString(1)).toSet shouldBe Set("unchanged")
      // scalatest's `length` matcher shadows functions.length here
      val lens = (df: org.apache.spark.sql.DataFrame) =>
        df.withColumn("len", expr("CAST(length(text) AS BIGINT)"))
      rows(CorpusStats.distributionDrift(lens(docs), lens(docs),
        "grp", "len", 5L)).foreach(_.getLong(3) shouldBe 0L)
      // drift is symmetric in its sides (tvd only; counts swap)
      val ab = rows(CorpusStats.distributionDrift(lens(prev), lens(cur),
          "grp", "len", 5L))
        .map(r => r.getString(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      val ba = rows(CorpusStats.distributionDrift(lens(cur), lens(prev),
          "grp", "len", 5L))
        .map(r => r.getString(0) -> (if (r.isNullAt(3)) -1L else r.getLong(3))).toMap
      ab shouldBe ba
    }
  }

  test("matrix merge of any disjoint split equals the whole-log matrix") {
    samples(3).zipWithIndex.foreach { case (events, i) =>
      val pivotUid = (i % 8) + 1L
      val df = events.toDF("uid", "etype")
      val a = PivotMatrix.countMatrix(
        df.filter(col("uid") <= pivotUid), "uid", "etype", eventTypes)
      val b = PivotMatrix.countMatrix(
        df.filter(col("uid") > pivotUid), "uid", "etype", eventTypes)
      val merged = PivotMatrix.mergeMatrices(a, b, "uid")
      val whole = PivotMatrix.countMatrix(df, "uid", "etype", eventTypes)
      rows(merged.exceptAll(whole)) shouldBe empty
      rows(whole.exceptAll(merged)) shouldBe empty
    }
  }

  private val wordGen: Gen[List[String]] =
    Gen.listOfN(30, for {
      len <- Gen.choose(1, 7)
      cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)

  test("Viterbi optimality: every word's path cost ≤ its all-characters path cost") {
    // the DP must never do worse than the trivial char-by-char
    // segmentation available to it by the coverage guarantee
    (1 to 3).foreach { i =>
      val words = wordGen(Gen.Parameters.default, Seed(100L + i)).get
      val docs = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val vocab = UnigramTokenizer.seedVocab(docs, "text", vocabSize = 12,
        maxPieceLen = 3)
      val charCost = vocab
        .filter(org.apache.spark.sql.functions.length(col("piece")) === 1)
        .collect().map(r => r.getString(0)(0) -> -r.getLong(2)).toMap
      UnigramTokenizer.segmentWords(docs, "text", 12, 3).collect()
        .foreach { r =>
          val word = r.getString(0)
          val cost = r.getLong(4)
          val allChars = word.map(charCost).sum
          assert(cost <= allChars,
            s"'$word': Viterbi $cost beats chars $allChars the wrong way")
        }
    }
  }

  test("perplexityBuckets: equal-frequency — per-group bucket sizes differ by ≤ 1") {
    val docs = graft.Tables.documents(spark, sfDir)
    val sizes = BigramLm.perplexityBuckets(docs, "doc_id", "text", "source")
      .filter(col("bucket").isNotNull)
      .groupBy("source", "bucket").count()
      .groupBy("source")
      .agg((max("count") - min("count")).as("spread"),
        countDistinct("bucket").as("nb"))
      .collect()
    sizes.length should be > 5
    sizes.foreach { r =>
      assert(r.getLong(1) <= 1, s"bucket spread ${r.getLong(1)} in ${r.get(0)}")
      r.getLong(2) shouldBe 3L
    }
  }

  test("batched BPE ≡ sequential over arbitrary tiny-alphabet corpora (tie torture)") {
    // a 3-letter alphabet forces shared symbols and count ties
    // everywhere — exactly the regime where an unsound acceptance rule
    // in bpeLearn(batch) would diverge from the sequential argmax.
    // 12 random corpora × 3 batch sizes, all must match batch=1.
    val wordGen: Gen[List[String]] =
      Gen.listOfN(24, for {
        len <- Gen.choose(1, 6)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
    (1 to 12).foreach { i =>
      val words = wordGen(Gen.Parameters.default, Seed(1000L + i)).get
      val df = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
      val seqMerges = Vocabulary.bpeMerges(df, "text", 8).collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      Seq(2, 4, 8).foreach { b =>
        val batched = Vocabulary.bpeMerges(df, "text", 8, batch = b)
          .collect()
          .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
          .toSeq
        assert(batched == seqMerges,
          s"seed ${1000 + i} batch $b diverged:\n  seq: $seqMerges\n  bat: $batched\n  corpus: ${words.mkString(" ")}")
      }
    }
  }

  /** Driver-side reference of [[UrlCuration.canonicalUrl]]'s rules —
    * the independent implementation the property test compares the
    * Spark expression against. ASCII inputs only: Scala's String sort
    * is UTF-16 order and Spark's is UTF-8 byte order, identical on
    * ASCII (the generator stays ASCII; the operator doc notes binary
    * ordering). */
  private def refCanonicalUrl(url: String): String = {
    if (url == null) return null
    val base = url.split("#", -1)(0)
    val p = base.indexOf("://")
    if (p < 0) return url
    val scheme = base.substring(0, p).toLowerCase
    val rest = base.substring(p + 3)
    // authority ends at the EARLIEST of '/' and '?' (the r11 ADVICE
    // fix: a query with no path must not fold into the host)
    val cutCands = Seq(rest.indexOf('/'), rest.indexOf('?')).filter(_ >= 0)
    val cut = if (cutCands.isEmpty) -1 else cutCands.min
    val hostport =
      (if (cut >= 0) rest.substring(0, cut) else rest).toLowerCase
    val tail = if (cut >= 0) rest.substring(cut) else ""
    val pathq = if (tail.startsWith("/")) tail else "/" + tail
    val q = pathq.indexOf('?')
    val path = if (q >= 0) pathq.substring(0, q) else pathq
    val query = if (q >= 0) pathq.substring(q + 1) else ""
    val host =
      if (scheme == "http" && hostport.endsWith(":80")) hostport.dropRight(3)
      else if (scheme == "https" && hostport.endsWith(":443"))
        hostport.dropRight(4)
      else hostport
    val kept = query.split("&", -1).filter(x => x.nonEmpty &&
      !x.startsWith("utm_") &&
      !UrlCuration.DefaultTrackingParams.contains(x.split("=", -1)(0)))
      .sorted
    scheme + "://" + host + path +
      (if (kept.nonEmpty) "?" + kept.mkString("&") else "")
  }

  test("canonicalUrl ≡ driver reference over arbitrary component-assembled URLs") {
    // components drawn to collide with every rule: mixed-case schemes
    // and hosts, default and non-default ports, tracker and real
    // params in shuffled orders, duplicate names, fragments, empty
    // params, bare hosts — 200 URLs across 4 seeds
    val urlGen: Gen[String] = for {
      scheme <- Gen.oneOf("http", "HTTP", "https", "HTTPS", "ftp")
      labels <- Gen.listOfN(2, Gen.oneOf("Ex", "site", "A1", "b-2", "WWW"))
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      segs <- Gen.choose(0, 2).flatMap(n =>
        Gen.listOfN(n, Gen.oneOf("Path", "p", "x9")))
      params <- Gen.choose(0, 5).flatMap(n => Gen.listOfN(n,
        Gen.oneOf("utm_source=x", "utm_b=2", "gclid=9", "fbclid=",
          "id=7", "a=1", "b=2", "z=A", "z=B", "", "flag")))
      frag <- Gen.oneOf("", "#top", "#sec-2")
    } yield scheme + "://" + labels.mkString(".") + ".com" + port +
      segs.map("/" + _).mkString +
      (if (params.nonEmpty) "?" + params.mkString("&") else "") + frag
    val urls = (1 to 4).flatMap(i =>
      Gen.listOfN(50, urlGen)(Gen.Parameters.default, Seed(7000L + i)).get)
    val got = urls.toDF("url")
      .select(UrlCuration.canonicalUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    got.zip(urls.map(refCanonicalUrl)).zipWithIndex.foreach {
      case ((g, r), i) =>
        assert(g == r, s"url ${urls(i)} canonicalized to $g, reference $r")
    }
  }
}
