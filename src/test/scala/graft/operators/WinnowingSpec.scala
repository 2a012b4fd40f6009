package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The winnowing guarantees from Schleimer et al. 2003, pinned on hand
  * fixtures: the detection guarantee (a shared w+k−1-token run always
  * leaves a shared fingerprint), the rightmost-min tie-break, the
  * short-document degenerate case, the hot-fingerprint guard, and
  * partitioning independence. q108 carries the full DuckDB oracle.
  */
class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  test("detection guarantee: a shared (w+k-1)-token run yields a shared fingerprint") {
    // k=4, w=4: any shared 7-token run must match. The shared run is
    // planted mid-document inside otherwise-disjoint text.
    val docs = Seq(
      (1L, "aa bb cc shared1 shared2 shared3 shared4 shared5 shared6 shared7 dd ee"),
      (2L, "xx yy shared1 shared2 shared3 shared4 shared5 shared6 shared7 zz ww qq"))
      .toDF("doc_id", "text")
    val pairs = Winnowing.matchPairs(docs, "doc_id", "text",
      maxDf = Int.MaxValue).collect()
    pairs.length shouldBe 1
    pairs(0).getAs[Long]("n_shared") should be >= 1L
  }

  test("rightmost-min tie-break: identical grams select the window's last position") {
    // 8 x "a": 5 identical grams; windows [1..4] and [2..5] both pick
    // their RIGHTMOST position under the packed-key min
    val docs = Seq((1L, "a a a a a a a a")).toDF("doc_id", "text")
    val fp = Winnowing.fingerprints(docs, "doc_id", "text")
      .select("fp_pos").as[Int].collect().sorted
    fp shouldBe Array(4, 5)
  }

  test("short documents degrade to the single global-min fingerprint") {
    // 5 tokens -> 2 grams < w: exactly one window at p=1
    val docs = Seq((1L, "v w x y z")).toDF("doc_id", "text")
    Winnowing.fingerprints(docs, "doc_id", "text").count() shouldBe 1L
    // fewer than k tokens: no grams, no fingerprints
    val tiny = Seq((1L, "v w x")).toDF("doc_id", "text")
    Winnowing.fingerprints(tiny, "doc_id", "text").count() shouldBe 0L
  }

  test("fingerprint density: ~2/(w+1) of grams, never more than gram count") {
    val docs = graft.Tables.documents(spark, sfDir).limit(50)
    val fp = Winnowing.fingerprints(docs, "doc_id", "text")
      .groupBy("doc_id").count()
    val grams = docs
      .select(col("doc_id"),
        (graft.functions.TextFns.tokenCount(col("text")) - 3).as("ng"))
      .filter(col("ng") >= 1)
    val joined = fp.join(grams, "doc_id")
      .select((col("count") <= col("ng")).as("ok"))
      .as[Boolean].collect()
    joined.forall(identity) shouldBe true
  }

  test("maxDf guard excises a corpus-common fingerprint before the pair join") {
    // the same 7-token banner in EVERY doc -> its fingerprints have
    // df = n; with maxDf = 2 those hashes are excised and disjoint
    // bodies share nothing
    val banner = "b1 b2 b3 b4 b5 b6 b7"
    val docs = (1L to 5L).map(i =>
        (i, s"$banner u${i}a u${i}b u${i}c u${i}d u${i}e u${i}f u${i}g"))
      .toDF("doc_id", "text")
    val unguarded = Winnowing.matchPairs(docs, "doc_id", "text",
      maxDf = Int.MaxValue).count()
    val guarded = Winnowing.matchPairs(docs, "doc_id", "text",
      maxDf = 2).count()
    unguarded should be >= 10L // all C(5,2) pairs share the banner
    guarded shouldBe 0L
  }

  test("fingerprints independent of input partitioning") {
    val docs = graft.Tables.documents(spark, sfDir).limit(30)
    val a = Winnowing.fingerprints(docs, "doc_id", "text")
      .orderBy("doc_id", "fp_hash", "fp_pos").collect()
    val b = Winnowing.fingerprints(docs.repartition(7), "doc_id", "text")
      .orderBy("doc_id", "fp_hash", "fp_pos").collect()
    a shouldBe b
  }
}
