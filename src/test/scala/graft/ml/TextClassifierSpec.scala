package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import java.nio.file.Files

class TextClassifierSpec extends SparkSpec {
  import spark.implicits._

  /** Corpus with genuine signal: each class draws from its own marker
    * vocabulary plus shared noise words. (The testdata documents' `lang`
    * label is NOT learnable — text there is identical random tech vocab
    * for every label — so learnability is asserted here and pipeline
    * mechanics on the real testdata below.) */
  private lazy val corpus = {
    val markers = Map(
      "en" -> Seq("the", "and", "is", "of"),
      "de" -> Seq("der", "und", "ist", "nicht"),
      "fr" -> Seq("le", "et", "est", "que"))
    val noise = Seq("data", "table", "row", "scan")
    val rows = for {
      (lang, ws) <- markers.toSeq
      i <- 0 until 40
    } yield {
      val toks = (0 until 12).map(j =>
        if (j % 2 == 0) ws((i + j) % ws.size) else noise((i * 3 + j) % noise.size))
      (s"$lang-$i", toks.mkString(" "), lang)
    }
    rows.toDF("doc_id", "text", "lang")
  }

  test("pipeline learns a separable text classification task") {
    val assembled = TextClassifier.assemble(corpus)
    val Array(train, test) = assembled.randomSplit(Array(0.75, 0.25), seed = 42)
    val model = TextClassifier.train(train)
    val scored = TextClassifier.score(model, test)
    val acc = scored.agg(
      avg(when(col("predicted_label") === col("label_str"), 1.0).otherwise(0.0)))
      .collect()(0).getDouble(0)
    assert(acc >= 0.95, s"accuracy $acc on a trivially separable task")
  }

  test("save/load round-trip scores identically (M5/M6)") {
    val assembled = TextClassifier.assemble(corpus)
    val model = TextClassifier.train(assembled)
    val dir = Files.createTempDirectory("graft_model").toString
    TextClassifier.save(model, dir)
    val loaded = TextClassifier.load(dir)
    val a = TextClassifier.score(model, assembled)
      .select("doc_id", "predicted_label").orderBy("doc_id").collect().toSeq
    val b = TextClassifier.score(loaded, assembled)
      .select("doc_id", "predicted_label").orderBy("doc_id").collect().toSeq
    a shouldBe b
  }

  test("two independent trains produce bit-identical models (q45/q92 determinism)") {
    // train() conditions the layout (hash-repartition on doc_id + sort
    // within partitions), so the vocabulary draw and every L-BFGS
    // treeAggregate see identical data order: coefficients — not just
    // argmax predictions — must match exactly.
    val assembled = TextClassifier.assemble(corpus)
    val m1 = TextClassifier.train(assembled, vocabSize = 50, maxIter = 5)
    val m2 = TextClassifier.train(assembled, vocabSize = 50, maxIter = 5)
    def coefs(m: org.apache.spark.ml.PipelineModel): Seq[Double] =
      m.stages(2).asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
        .coefficientMatrix.toArray.toSeq
    def vocab(m: org.apache.spark.ml.PipelineModel): Seq[String] =
      m.stages(0).asInstanceOf[org.apache.spark.ml.feature.CountVectorizerModel]
        .vocabulary.toSeq
    vocab(m1) shouldBe vocab(m2)
    coefs(m1) shouldBe coefs(m2)
    val a = TextClassifier.score(m1, assembled)
      .select("doc_id", "predicted_label").orderBy("doc_id").collect().toSeq
    val b = TextClassifier.score(m2, assembled)
      .select("doc_id", "predicted_label").orderBy("doc_id").collect().toSeq
    a shouldBe b
  }

  test("fitted model transforms a STREAMING frame (ST7: stream-side inference)") {
    val model = TextClassifier.train(TextClassifier.assemble(corpus))
    implicit val ctx = spark.sqlContext
    val in = MemoryStream[(String, String)]
    val streamTokens = in.toDF().toDF("doc_id", "text")
      .select(col("doc_id"),
        graft.functions.TextFns.tokens(lower(col("text"))).as("tokens"))
    val q = TextClassifier.score(model, streamTokens)
      .select("doc_id", "predicted_label")
      .writeStream.format("memory").queryName("ml_stream").outputMode("append")
      .option("checkpointLocation", Files.createTempDirectory("ckpt_ml").toString)
      .start()
    try {
      in.addData(("d1", "der und ist nicht der und"), ("d2", "the and is of the and"))
      q.processAllAvailable()
      val out = spark.table("ml_stream").orderBy("doc_id").collect()
        .map(r => (r.getString(0), r.getString(1)))
      out shouldBe Array(("d1", "de"), ("d2", "en"))
    } finally q.stop()
  }

  test("pipeline mechanics run end-to-end on real testdata documents") {
    val docs = Tables.documents(spark, sfDir)
    val assembled = TextClassifier.assemble(docs)
    val model = TextClassifier.train(assembled, vocabSize = 1000, maxIter = 5)
    val scored = TextClassifier.score(model, assembled)
    scored.columns should contain allOf ("features", "prediction", "predicted_label")
    // predictions come from the label domain
    val preds = scored.select("predicted_label").distinct()
      .collect().map(_.getString(0)).toSet
    val labels = docs.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(preds.subsetOf(labels))
  }
}
