package graft.ml

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[QualityFilter]] — the DCLM/FineWeb-Edu model-based quality
  * stage. q166 proves the fixed-weights scoring path against the
  * oracle and q167 the training determinism; this spec pins the
  * LEARNING behavior (a separable quality signal is actually learned
  * and generalizes to unseen docs), the filter contract, and the
  * save/load lifecycle. */
class QualityFilterSpec extends SparkSpec {
  import spark.implicits._

  // A separable fixture: "quality" docs share an edited-prose token
  // distribution, "junk" docs a keyboard-mash one. 20 of each to
  // train, 4 held out to prove generalization.
  private def doc(i: Long, good: Boolean): (Long, String, Int) = {
    val text =
      if (good) s"the committee published its annual report on policy ${i} outcomes and methods"
      else s"zzz qqq ${i} xx kk zz qq xk zx kq free free free click click"
    (i, text, if (good) 1 else 0)
  }
  private lazy val train = ((1L to 20L).map(doc(_, good = true)) ++
    (21L to 40L).map(doc(_, good = false)))
    .toDF("doc_id", "text", "label")
  private lazy val unseen = Seq(doc(101L, good = true),
    doc(102L, good = true), doc(103L, good = false), doc(104L, good = false))
    .toDF("doc_id", "text", "label")

  private lazy val model = QualityFilter.train(train, "doc_id", "text",
    "label", dim = 256, maxIter = 20)

  test("train learns the seed: held-out quality docs outscore held-out junk") {
    val p = QualityFilter.score(model, unseen, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    p(101L) should be > 0.5
    p(102L) should be > 0.5
    p(103L) should be < 0.5
    p(104L) should be < 0.5
  }

  test("filter keeps exactly the P >= minP docs, all input columns intact") {
    val kept = QualityFilter.filter(model, unseen, "doc_id", "text", minP = 0.5)
    kept.columns shouldBe unseen.columns
    kept.select("doc_id").as[Long].collect().sorted shouldBe Array(101L, 102L)
  }

  test("save/load round-trip scores identically") {
    val dir = java.nio.file.Files.createTempDirectory("qf").toString + "/m"
    QualityFilter.save(model, dir)
    val loaded = QualityFilter.load(dir)
    val a = QualityFilter.score(model, unseen, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    val b = QualityFilter.score(loaded, unseen, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).sortBy(_._1)
    b shouldBe a
  }

  test("scoreWithMicro: token-less docs score the bias; pred thresholds on margin sign") {
    val docs = Seq((1L, ""), (2L, "zq")).toDF("doc_id", "text")
    // weight every bucket -1 micro so 'zq' lands somewhere negative
    val out = QualityFilter.scoreWithMicro(docs, "doc_id", "text",
        Seq.fill(16)(-500000L), biasMicro = 250000L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getLong(3))).toMap
    out(1L)._1 shouldBe 250000L                 // bias only
    out(1L)._2 shouldBe 0.5622 +- 0.0001        // sigmoid(0.25)
    out(1L)._3 shouldBe 1L
    // one token with sign ±1 → margin = 250000 ∓ 500000
    Set(-250000L, 750000L) should contain (out(2L)._1)
  }

  test("training is layout-independent: fits over different partitionings are bit-identical") {
    // the conditioning contract: repartition(id) + sortWithinPartitions
    // means the INCOMING layout cannot matter — the q92/q167
    // determinism claim, here proven against adversarial layouts
    val m13 = QualityFilter.train(train.repartition(13), "doc_id", "text",
      "label", dim = 256, maxIter = 10)
    val m3 = QualityFilter.train(
      train.repartition(3, col("label")).sortWithinPartitions(col("text")),
      "doc_id", "text", "label", dim = 256, maxIter = 10)
    m13.coefficients shouldBe m3.coefficients
    m13.intercept shouldBe m3.intercept
  }

  test("score dimension follows the model: no hash-space drift between fit and serve") {
    // a model trained at dim 256 must hash serving docs into 256
    // buckets even when the caller would have used another dim — the
    // dim is read off the model, not passed again
    model.numFeatures shouldBe 256
    val p = QualityFilter.score(model, unseen.limit(1), "doc_id", "text")
    p.columns shouldBe Array("doc_id", "p_quality")
  }
}
