package graft.operators

import graft.SparkSpec

/** [[Denoise.spanCorrupt]] — T5 span corruption. q157 proves engine
  * parity; this spec pins the invariants that make the pairs
  * trainable: sentinel-splice round-trip back to the original text,
  * the corruption rate, short-doc/NULL behavior, and seed
  * determinism. */
class DenoiseSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir)
  private lazy val out =
    Denoise.spanCorrupt(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2), r.getLong(3),
        r.getString(4), r.getString(5))).toMap

  test("sentinel splice reconstructs every original document exactly") {
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val sentinel = "<extra_id_([0-9]+)>".r
    out.foreach { case (id, (_, nSpans, _, input, target)) =>
      // target = <e_0> span0 <e_1> span1 ... <e_n>: split into spans
      val spans = sentinel.split(target).map(_.trim).filter(_.nonEmpty)
      spans.length shouldBe nSpans
      var rebuilt = input
      spans.zipWithIndex.foreach { case (sp, k) =>
        rebuilt = rebuilt.replace(s"<extra_id_$k>", sp)
      }
      rebuilt.split("\\s+").filter(_.nonEmpty).mkString(" ") shouldBe
        texts(id).split("\\s+").filter(_.nonEmpty).mkString(" ")
    }
  }

  test("corpus corruption rate lands near the published 15%") {
    val dropped = out.values.map(_._3).sum.toDouble
    val total = out.values.map(_._1).sum.toDouble
    val rate = dropped / total
    assert(rate > 0.10 && rate < 0.20, s"rate $rate outside [0.10, 0.20]")
    out.values.exists(_._2 > 0) shouldBe true
  }

  test("short and NULL docs pass through uncorrupted") {
    val tiny = Seq((1L, "just four little words"),
      (2L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val rows = Denoise.spanCorrupt(tiny, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2),
        r.getString(4), r.getString(5))).toMap
    rows(1L) shouldBe ((4L, 0, "just four little words", "<extra_id_0>"))
    rows(2L) shouldBe ((0L, 0, "", "<extra_id_0>"))
  }

  test("prefixSplit: halves rejoin to the original; split stays in the band; shorts drop") {
    val rows = Denoise.prefixSplit(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getString(4)))
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    rows.foreach { case (id, n, s, in, tgt) =>
      assert(s >= 1 && s < n, s"split $s outside [1, ${n - 1}] for doc $id")
      // the band check (n·0.25 ≤ s ≤ n·0.75, up to the ±1 clamp)
      assert(s >= n / 4 - 1 && s <= n * 3 / 4 + 1, s"split $s off-band for n=$n")
      (in + " " + tgt).split("\\s+").filter(_.nonEmpty).mkString(" ") shouldBe
        texts(id).split("\\s+").filter(_.nonEmpty).mkString(" ")
      in.split("\\s+").count(_.nonEmpty) shouldBe s
    }
    rows.length shouldBe texts.size // every corpus doc splits (all ≥ 2 tokens)
    // sub-2-token docs drop
    val tiny = Seq((1L, "solo"), (2L, ""), (3L, "a b")).toDF("doc_id", "text")
    Denoise.prefixSplit(tiny, "doc_id", "text").collect()
      .map(_.getLong(0)).toSet shouldBe Set(3L)
  }

  test("corruption is a pure function of (id, seed): stable per seed, varies across seeds") {
    val a = Denoise.spanCorrupt(docs, "doc_id", "text", seed = 0L)
      .collect().map(_.toSeq).toSet
    val b = Denoise.spanCorrupt(docs, "doc_id", "text", seed = 0L)
      .collect().map(_.toSeq).toSet
    a shouldBe b
    val c = Denoise.spanCorrupt(docs, "doc_id", "text", seed = 1L)
      .collect().map(_.toSeq).toSet
    assert(a != c, "seed must re-roll the corruption")
  }
}
