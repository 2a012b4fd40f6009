package graft.ml

import graft.functions.TextFns
import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.{CountVectorizer, IndexToString, StringIndexer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ML train/serve capability (SURVEY.md §2.11 M1–M6)
  * re-expressed as a reusable text classifier:
  * tokens → CountVectorizer → StringIndexer → LogisticRegression →
  * IndexToString (mlproject/train.scala:38-67, test.scala:46-71,
  * dashboard/dashboard.scala:34-44).
  *
  * The fitted [[PipelineModel]] is a pure column transformer, so
  * `model.transform` composes into BOTH batch and streaming plans —
  * exactly how the reference serves the same model on a Kafka stream
  * (test.scala:71) and an HDFS batch (dashboard.scala:34-44).
  *
  * Scale notes: `fit` runs one vocabulary job (CountVectorizer: a
  * distributed word count + driver top-`vocabSize`), one distinct job
  * (StringIndexer), then maxIter L-BFGS iterations each a treeAggregate
  * over the training set — the driver holds only the (vocabSize ×
  * classes) coefficient matrix. Scoring is embarrassingly parallel.
  */
object TextClassifier {

  /** documents-shaped input → (id, tokens, label) training frame. */
  def assemble(docs: DataFrame, idCol: String = "doc_id",
               textCol: String = "text", labelCol: String = "lang"): DataFrame =
    docs.select(col(idCol), TextFns.tokens(lower(col(textCol))).as("tokens"),
      col(labelCol).as("label_str"))

  /** M1–M5: build + fit the pipeline. Hyperparameters mirror the
    * reference (maxIter=10, regParam=0.001, mlproject/train.scala:49-51).
    *
    * Training is DETERMINISTIC within a session: the input is
    * hash-repartitioned on `idCol` and sorted within partitions, so
    * every pass over the data (CountVectorizer's word count + top-N
    * vocabulary draw, L-BFGS treeAggregate gradients) sees an identical
    * layout — two fits on the same frame produce bit-identical models.
    * Without this, vocabulary count ties and float summation order
    * float with the incoming partitioning and repeated trains can
    * disagree on argmax-marginal docs. One extra shuffle, amortized
    * over maxIter full passes.
    *
    * The guarantee is CONDITIONAL on `idCol` being present: a frame
    * without it trains on whatever layout arrives (a loud stderr
    * warning flags it) — pass the id column through, or rename via
    * `idCol`, to get reproducible fits.
    */
  def train(training: DataFrame, vocabSize: Int = 10000,
            maxIter: Int = 10, regParam: Double = 0.001,
            idCol: String = "doc_id"): PipelineModel = {
    val conditioned =
      if (training.columns.contains(idCol))
        training.repartition(col(idCol)).sortWithinPartitions(idCol)
      else {
        System.err.println(
          s"[graft.TextClassifier] WARNING: no '$idCol' column — input " +
            "layout is not conditioned and repeated fits may differ; " +
            "include the id column for bit-identical training")
        training
      }
    val vectorizer = new CountVectorizer()
      .setInputCol("tokens").setOutputCol("features").setVocabSize(vocabSize)
    // Eager indexer fit so IndexToString gets the label inventory — the
    // reference's exact pattern (mlproject/train.scala:46,57); LR's
    // prediction column carries no string metadata of its own.
    val indexerModel = new StringIndexer()
      .setInputCol("label_str").setOutputCol("label")
      .setStringOrderType("alphabetAsc") // deterministic class indices
      .fit(conditioned)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
    val relabel = new IndexToString()
      .setInputCol("prediction").setOutputCol("predicted_label")
      .setLabels(indexerModel.labelsArray(0))
    new Pipeline()
      .setStages(Array(vectorizer, indexerModel, lr, relabel))
      .fit(conditioned)
  }

  /** M6: score a (possibly streaming) tokens frame. */
  def score(model: PipelineModel, df: DataFrame): DataFrame =
    model.transform(df)

  def save(model: PipelineModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): PipelineModel = PipelineModel.load(path)
}
