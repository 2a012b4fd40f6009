package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.TextFns
import org.apache.spark.sql.functions._

class SamplingPackingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: weights respected within tolerance, exactly reproducible") {
    val df = spark.range(0, 10000).toDF("id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.hashSplit(df, "id", splits)
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    counts("train").toDouble / 10000 shouldBe 0.8 +- 0.02
    counts("val").toDouble / 10000 shouldBe 0.1 +- 0.02
    counts("test").toDouble / 10000 shouldBe 0.1 +- 0.02
    // stability: repartitioned input gives IDENTICAL membership
    val b = Sampling.hashSplit(df.repartition(13), "id", splits)
    rows(a.exceptAll(b)) shouldBe empty
    rows(b.exceptAll(a)) shouldBe empty
  }

  test("hashSplit: growing the corpus never moves an old row's split") {
    val small = spark.range(0, 1000).toDF("id")
    val grown = spark.range(0, 5000).toDF("id")
    val splits = Seq("train" -> 0.9, "eval" -> 0.1)
    val before = Sampling.hashSplit(small, "id", splits)
    val after = Sampling.hashSplit(grown, "id", splits).filter(col("id") < 1000)
    rows(before.exceptAll(after)) shouldBe empty
  }

  test("clusterSafeSplit: no near-dup pair ever straddles two splits") {
    val docs = Tables.documents(spark, sfDir)
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text",
      shingleN = 3, numHashes = 128, bands = 32, threshold = 0.8,
      maxBucket = Int.MaxValue)
    val split = Sampling.clusterSafeSplit(docs, "doc_id", pairs,
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    // every doc present exactly once
    split.count() shouldBe docs.count()
    // the invariant hashSplit can't give: join each pair's two sides
    // to their splits — zero pairs may disagree
    val sa = split.select(col("doc_id").as("id_a"), col("split").as("sp_a"))
    val sb = split.select(col("doc_id").as("id_b"), col("split").as("sp_b"))
    val crossers = pairs.join(sa, "id_a").join(sb, "id_b")
      .filter(col("sp_a") =!= col("sp_b"))
    crossers.count() shouldBe 0L
    // and the same-cluster⇒same-split form of it
    split.groupBy("cluster")
      .agg(countDistinct(col("split")).as("k"))
      .filter(col("k") > 1).count() shouldBe 0L
  }

  test("clusterSafeSplit: singletons get their own cluster; membership repartition-stable") {
    val docs = Tables.documents(spark, sfDir)
    val noPairs = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val s1 = Sampling.clusterSafeSplit(docs, "doc_id", noPairs,
      Seq("train" -> 0.9, "eval" -> 0.1))
    // no pairs → cluster == own id everywhere
    s1.filter(col("cluster") =!= col("doc_id")).count() shouldBe 0L
    val s2 = Sampling.clusterSafeSplit(docs.repartition(11), "doc_id",
      noPairs, Seq("train" -> 0.9, "eval" -> 0.1))
    rows(s1.select("doc_id", "cluster", "split")
      .exceptAll(s2.select("doc_id", "cluster", "split"))) shouldBe empty
  }

  test("stratified: per-stratum fractions honored, deterministic") {
    val docs = Tables.documents(spark, sfDir)
    val fracs = Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.0)
    val out = Sampling.stratified(docs, "doc_id", "lang", fracs)
    val by = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    by.keySet should not contain "fr"
    by("de") shouldBe total("de")
    by("en").toDouble / total("en") shouldBe 0.5 +- 0.15
    // strata not in the map are dropped entirely
    by.keySet.subsetOf(Set("en", "de")) shouldBe true
  }

  test("greedyPack: no bin exceeds the budget except single oversized docs") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFns.tokenCount(col("text")).as("n_tokens"))
    val budget = 120L
    val packed = Packing.greedyPack(docs, "doc_id", "n_tokens", budget, groups = 8)
    packed.count() shouldBe docs.count() // every doc assigned once
    val binTotals = packed.filter(!col("truncated"))
      .groupBy("pack_group", "bin")
      .agg(sum(col("n_tokens")).as("t"), count(lit(1)).as("n"))
    rows(binTotals.filter(col("t") > budget)) shouldBe empty
    // packing actually packs: average bin holds more than one doc
    val avgDocs = binTotals.agg(avg(col("n"))).collect()(0).getDouble(0)
    assert(avgDocs > 1.5, s"avg docs per bin $avgDocs — not packing")
    // oversized docs sit alone in their bin, flagged
    val oversized = packed.filter(col("truncated"))
    val oversizedBins = oversized.join(binTotals,
      Seq("pack_group", "bin"), "left_semi")
    rows(oversizedBins) shouldBe empty
  }

  test("packLayout: contiguous non-overlapping spans, bin totals within budget") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFns.tokenCount(col("text")).as("n_tokens"))
    val budget = 120L
    val layout = Packing.packLayout(
      Packing.greedyPack(docs, "doc_id", "n_tokens", budget, groups = 8), budget)
    layout.count() shouldBe docs.count()
    // every bin: seq_idx is 0..n-1, spans chain exactly (tok_start of
    // seq k = tok_end of seq k-1, first starts at 0), and the final
    // tok_end never exceeds the budget — EVEN for oversized single-doc
    // bins (budget-clamped effective lengths)
    layout.collect()
      .groupBy(r => (r.getAs[Long]("pack_group"), r.getAs[Long]("bin")))
      .foreach { case (_, rs) =>
        val bySeq = rs.sortBy(_.getAs[Int]("seq_idx"))
        bySeq.map(_.getAs[Int]("seq_idx")).toSeq shouldBe bySeq.indices
        bySeq.head.getAs[Long]("tok_start") shouldBe 0L
        bySeq.sliding(2).filter(_.length == 2).foreach { pair =>
          pair(1).getAs[Long]("tok_start") shouldBe pair(0).getAs[Long]("tok_end")
        }
        assert(bySeq.last.getAs[Long]("tok_end") <= budget)
      }
  }

  test("greedyPack deterministic across runs and partitionings") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFns.tokenCount(col("text")).as("n_tokens"))
    val a = Packing.greedyPack(docs, "doc_id", "n_tokens", 200, 4)
    val b = Packing.greedyPack(docs.repartition(17), "doc_id", "n_tokens", 200, 4)
    rows(a.exceptAll(b)) shouldBe empty
    rows(b.exceptAll(a)) shouldBe empty
  }

  test("greedyPack: groups=0 auto-sizes; one huge group streams without materializing") {
    // sentinel path: group ids land inside the suggestGroups(n) range
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFns.tokenCount(col("text")).as("n_tokens"))
    val n = docs.count()
    val auto = Packing.greedyPack(docs, "doc_id", "n_tokens", budget = 120L)
    auto.count() shouldBe n
    val maxG = auto.agg(max(col("pack_group"))).collect()(0).getLong(0)
    assert(maxG < Packing.suggestGroups(n),
      s"group id $maxG outside the ${Packing.suggestGroups(n)}-group rule")
    // the sizing rule itself
    Packing.suggestGroups(0L) shouldBe 64
    Packing.suggestGroups(8192L * 100) shouldBe 100
    Packing.suggestGroups(Long.MaxValue) shouldBe (1 << 20)
    // ONE deliberately huge group (200k docs via groupExpr): the walk
    // is a streamed sorted iterator with two Longs of state, so this
    // must complete comfortably on a 4-thread test session — under the
    // r6 it.toSeq.sortBy shape this was the whole group in one task's
    // heap — and still honor the budget and bin order exactly
    val big = spark.range(200000).select(
      col("id").as("doc_id"), (pmod(col("id"), lit(37L)) + 1L).as("n_tokens"))
    val one = Packing.greedyPack(big, "doc_id", "n_tokens", budget = 100L,
      groupExpr = Some(lit(0L)))
    one.select(countDistinct(col("pack_group"))).collect()(0).getLong(0) shouldBe 1L
    val totals = one.groupBy("bin").agg(sum(col("n_tokens")).as("t"))
    rows(totals.filter(col("t") > 100L)) shouldBe empty
    one.count() shouldBe 200000L
  }

  test("greedyPackSplit: oversized docs split into budget-sized pieces; NO bin over budget, ever") {
    import spark.implicits._
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFns.tokenCount(col("text")).as("n_tokens"))
      .union(Seq((900001L, 1000L), (900002L, 0L)).toDF("doc_id", "n_tokens"))
    val budget = 48L
    val out = Packing.greedyPackSplit(docs, "doc_id", "n_tokens", budget,
      groups = 8).persist()
    // pieces reassemble: per-doc piece sum = doc tokens, pieces are
    // 0..k-1, every piece ≤ budget (so truncation cannot exist)
    val perDoc = out.groupBy("doc_id").agg(
      sum(col("n_tokens")).as("t"), count(lit(1)).as("k"),
      min(col("piece")).as("p0"), max(col("piece")).as("p1"))
    val joined = perDoc.join(docs.withColumnRenamed("n_tokens", "orig"), "doc_id")
    rows(joined.filter(col("t") =!= col("orig"))) shouldBe empty
    rows(joined.filter(col("p0") =!= 0 || col("p1") =!= col("k") - 1)) shouldBe empty
    rows(out.filter(col("n_tokens") > budget)) shouldBe empty
    // the 1000-token doc split into ceil(1000/48)=21 pieces; the
    // empty doc kept its single zero piece
    out.filter(col("doc_id") === 900001L).count() shouldBe 21L
    out.filter(col("doc_id") === 900002L).count() shouldBe 1L
    // bins NEVER exceed the budget — no truncated escape hatch
    rows(out.groupBy("pack_group", "bin")
      .agg(sum(greatest(col("n_tokens"), lit(0L))).as("t"))
      .filter(col("t") > budget)) shouldBe empty
    // layout composes: piece-aware ordering, spans chain, ends ≤ budget
    val layout = Packing.packLayout(out, budget)
    layout.collect()
      .groupBy(r => (r.getAs[Long]("pack_group"), r.getAs[Long]("bin")))
      .foreach { case (_, rs) =>
        val bySeq = rs.sortBy(_.getAs[Int]("seq_idx"))
        bySeq.map(_.getAs[Int]("seq_idx")).toSeq shouldBe bySeq.indices
        bySeq.head.getAs[Long]("tok_start") shouldBe 0L
        bySeq.sliding(2).filter(_.length == 2).foreach { pair =>
          pair(1).getAs[Long]("tok_start") shouldBe pair(0).getAs[Long]("tok_end")
        }
        assert(bySeq.last.getAs[Long]("tok_end") <= budget)
      }
    out.unpersist()
  }

  test("greedyPackSplit: NULL and non-positive counts yield one zero-ish piece, never a phantom budget piece") {
    import spark.implicits._
    // least/greatest skip NULLs, so an uncoalesced NULL count would
    // surface as one piece of n_tokens = budget — the exact bug class
    // this fixture pins
    val docs = Seq(
      (1L, Some(100L)), (2L, None), (3L, Some(0L)), (4L, Some(-7L)))
      .toDF("doc_id", "n_tokens")
    val out = Packing.greedyPackSplit(docs, "doc_id", "n_tokens",
        budget = 48L, groups = 2)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sortBy(_._1)).toMap
    out(1L).map(_._2) shouldBe Seq(48L, 48L, 4L)
    out(2L) shouldBe Seq((0, 0L))
    out(3L) shouldBe Seq((0, 0L))
    out(4L) shouldBe Seq((0, -7L))
  }

  test("packEfficiency: fill caps at 10000 bp on split packs; used ≡ the layout's last tok_end") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), TextFns.tokenCount(col("text")).as("n_tokens"))
    val budget = 48L
    val packed = Packing.greedyPackSplit(docs, "doc_id", "n_tokens", budget,
      groups = 8).persist()
    val eff = Packing.packEfficiency(packed, budget)
    // split packs clamp every piece, so fill can never exceed 100%
    rows(eff.filter(col("fill_bp") > 10000L)) shouldBe empty
    rows(eff.filter(col("used") > budget)) shouldBe empty
    // cross-check against the layout: a bin's used tokens IS where its
    // concatenated span ends
    val layoutEnd = Packing.packLayout(packed, budget)
      .groupBy("pack_group", "bin").agg(max(col("tok_end")).as("end"))
    rows(eff.join(layoutEnd, Seq("pack_group", "bin"))
      .filter(col("used") =!= col("end"))) shouldBe empty
    packed.unpersist()
  }

  test("weightedSample: md5 path equals the exact local A-ES reference") {
    val df = spark.range(0, 500).toDF("id")
      .withColumn("w", (col("id") % 7 + 1).cast("double"))
    val got = Sampling.weightedSample(df, "id", "w", k = 40, seed = 7L,
        uniform = Sampling.md5Uniform)
      .select(col("id"), col("es_key")).as[(Long, Long)].collect().toSeq
    // identical formula, computed locally
    def key(id: Long, w: Double): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$id:7".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 12)
      val u = (java.lang.Long.parseLong(hex, 16) + 0.5) / 281474976710656.0
      math.floor(math.log(u) / w * 1e9).toLong
    }
    val expected = (0L until 500L)
      .map(i => (i, key(i, (i % 7 + 1).toDouble)))
      .sortBy { case (i, k) => (-k, i) }.take(40)
    got.sortBy { case (i, k) => (-k, i) } shouldBe expected
  }

  test("weightedSample: repartition-stable and weight-biased") {
    val df = spark.range(0, 2000).toDF("id")
      .withColumn("w", when(col("id") < 1000, 1.0).otherwise(100.0))
    val a = Sampling.weightedSample(df, "id", "w", 200)
    val b = Sampling.weightedSample(df.repartition(17), "id", "w", 200)
    rows(a.exceptAll(b)) shouldBe empty
    rows(b.exceptAll(a)) shouldBe empty
    // 100× weight must dominate the sample (A-ES: P(light beats heavy)
    // needs u_light > u_heavy^(1/100) ≈ 1)
    a.filter(col("id") >= 1000).count().toDouble should be > 180.0
  }

  test("weightedSample: NULL and non-positive weights are dropped") {
    val bad = Seq(
      (1L, java.lang.Double.valueOf(0.0)),
      (2L, java.lang.Double.valueOf(-1.0)),
      (3L, null.asInstanceOf[java.lang.Double]),
      (4L, java.lang.Double.valueOf(2.0))).toDF("id", "w")
    Sampling.weightedSample(bad, "id", "w", 10)
      .select(col("id")).as[Long].collect() shouldBe Array(4L)
  }

  test("weightedSamplePerGroup: exactly min(k, |group|) per group; within-group order = global keys") {
    val df = spark.range(0, 300).toDF("id")
      .withColumn("g", (col("id") % 3).cast("string"))
      .withColumn("w", (col("id") % 5 + 1).cast("double"))
      // group "2" made tiny: only ids 2 and 5 keep positive weight
      .withColumn("w", when(col("g") === "2" && col("id") > 5, -1.0)
        .otherwise(col("w")))
    val got = Sampling.weightedSamplePerGroup(df, "id", "w", "g", 10)
    got.groupBy("g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap shouldBe
      Map("0" -> 10L, "1" -> 10L, "2" -> 2L)
    // the grouped sample of g is EXACTLY the global sampler run on g's
    // rows alone (same keys, same order) — per-group restriction of A-ES
    val onlyG0 = df.filter(col("g") === "0")
    val viaGlobal = Sampling.weightedSample(onlyG0, "id", "w", 10)
      .select("id", "es_key")
    val viaGroup = got.filter(col("g") === "0").select("id", "es_key")
    rows(viaGlobal.exceptAll(viaGroup)) shouldBe empty
    rows(viaGroup.exceptAll(viaGlobal)) shouldBe empty
  }
}
