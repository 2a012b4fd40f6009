package graft.ml

import graft.operators.FeatureHash
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-based document-quality filtering — the DCLM / FineWeb-Edu
  * stage (Li et al. 2024 "DataComp-LM" §4.4; Penedo et al. 2024
  * "FineWeb-Edu"): train a small linear classifier to distinguish a
  * curated high-quality seed from ordinary crawl, score every
  * document, and keep the ones the model judges quality. This is the
  * composition of two already-verified halves:
  *
  *  - [[graft.operators.FeatureHash.hashedTfVectors]] (q162) — the
  *    TRAINLESS text→`array<float>` bridge: no vocabulary job, no
  *    fitted vectorizer, one narrow explode + map-side-combine groupBy
  *    per corpus pass (exactly HashingTF, as DCLM's fastText-style
  *    filters use hashed bag-of-words features);
  *  - binary [[LogisticRegression]] over those vectors — the driver
  *    holds only a `dim`-sized coefficient vector, scoring is
  *    embarrassingly parallel, and the model composes into batch and
  *    streaming plans alike.
  *
  * Training is DETERMINISTIC within a session under the same
  * conditioning contract as [[TextClassifier.train]]: the input is
  * hash-repartitioned on the id and sorted within partitions so every
  * L-BFGS pass sees an identical layout — two fits on the same frame
  * produce bit-identical models (q167 makes the driver witness that).
  *
  * The ORACLE path ([[scoreWithMicro]]) scores with FIXED integer
  * micro-weights instead of a trained model — q68's fixed-weights
  * precedent: the hashed term frequencies are exact integers under the
  * portable md5 bucket/sign draws, the margin is an exact integer dot
  * product, and only the final sigmoid touches doubles — so DuckDB
  * replays the whole scoring pipeline bit-for-bit (q166).
  *
  * Scale: one corpus pass for features (≤ dim rows per doc), the
  * weight relation is dim-sized and BROADCAST (never a dim-sized
  * literal in the plan — the same no-K-literal rule as the IVF
  * family), no driver collect anywhere.
  */
object QualityFilter {

  /** Fit a binary quality classifier on a labeled seed.
    *
    * `labeled`: (idCol, textCol, labelCol) with labelCol ∈ {0, 1} —
    * 1 = quality (the curated/positive seed), 0 = ordinary crawl.
    * DCLM shape: positives are a reference corpus (instruction data,
    * curated wiki), negatives a uniform crawl sample. */
  def train(labeled: DataFrame, idCol: String, textCol: String,
            labelCol: String, dim: Int = 1024, maxIter: Int = 10,
            regParam: Double = 0.001): LogisticRegressionModel = {
    val input = FeatureHash.hashedTfVectors(labeled, idCol, textCol, dim)
      .join(labeled.select(col(idCol),
        col(labelCol).cast("double").as("label")), Seq(idCol))
      // deterministic conditioning (the TextClassifier.train contract):
      // identical layout per pass → bit-identical repeated fits
      .repartition(col(idCol)).sortWithinPartitions(idCol)
      .select(col(idCol), array_to_vector(col("vector")).as("features"),
        col("label"))
    new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
      .fit(input)
  }

  /** Score a corpus under a trained model → (idCol, p_quality).
    * Feature dim comes from the model, so score sites can't drift from
    * the training-time hash space. */
  def score(model: LogisticRegressionModel, docs: DataFrame,
            idCol: String, textCol: String): DataFrame = {
    val vecs = FeatureHash.hashedTfVectors(docs, idCol, textCol,
      model.numFeatures)
    model.transform(
        vecs.select(col(idCol), array_to_vector(col("vector")).as("features")))
      .select(col(idCol),
        element_at(vector_to_array(col("probability")), 2).as("p_quality"))
  }

  /** The filter: keep docs with P(quality) ≥ minP. Survivors are
    * semi-joined back so every input column flows through untouched. */
  def filter(model: LogisticRegressionModel, docs: DataFrame,
             idCol: String, textCol: String, minP: Double): DataFrame =
    docs.join(
      score(model, docs, idCol, textCol)
        .filter(col("p_quality") >= minP).select(col(idCol)),
      Seq(idCol), "left_semi")

  /** Exact-integer scoring with FIXED micro-weights (the q68
    * precedent, fully oracle-checkable): margin_micro = bias_micro +
    * Σ_b tf_b · wMicro(b) over the sparse hashed-TF rows — every term
    * an exact long — then score = σ(margin_micro/10⁶) rounded to 4.
    * Docs with no tokens keep their row and score the bias alone.
    * Output: (idCol, margin_micro, score, pred_keep).
    *
    * The weight table is broadcast-joined, not a plan literal: dim can
    * be 2²⁰ without a megabyte-sized expression tree. */
  def scoreWithMicro(docs: DataFrame, idCol: String, textCol: String,
                     wMicro: Seq[Long], biasMicro: Long): DataFrame = {
    val dim = wMicro.length
    val spark = docs.sparkSession
    import spark.implicits._
    val w = wMicro.zipWithIndex.map { case (m, b) => (b, m) }
      .toDF("bucket", "w_micro")
    val contrib = FeatureHash.hashedTf(docs, idCol, textCol, dim)
      .join(broadcast(w), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(sum(col("weight") * col("w_micro")).as("__m"))
    docs.select(col(idCol))
      .join(contrib, Seq(idCol), "left")
      .select(col(idCol),
        (coalesce(col("__m"), lit(0L)) + lit(biasMicro)).as("margin_micro"))
      .withColumn("score", round(lit(1.0) /
        (lit(1.0) + exp(-col("margin_micro").cast("double") / lit(1e6))), 4))
      .withColumn("pred_keep",
        when(col("margin_micro") > 0, 1L).otherwise(0L))
  }

  /** DuckDB replay of [[scoreWithMicro]]. */
  def scoreMicroOracle(table: String, idCol: String, textCol: String,
                       wMicro: Seq[Long], biasMicro: Long): String = {
    val dim = wMicro.length
    val values = wMicro.zipWithIndex
      .map { case (m, b) => s"($b, ${m}::BIGINT)" }.mkString(", ")
    s"""
      WITH toks AS (
        SELECT $idCol, unnest(list_filter(
          string_split_regex(coalesce($textCol, ''), '\\s+'),
          x -> x <> '')) AS tok
        FROM $table),
      hashed AS (
        SELECT $idCol,
               CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT)
                 % $dim AS bucket,
               CASE WHEN CAST(('0x' || substring(md5('sgn#' || tok), 1, 15))
                 AS BIGINT) % 2 = 0 THEN 1 ELSE -1 END AS s
        FROM toks),
      tf AS (
        SELECT $idCol, bucket, CAST(sum(s) AS BIGINT) AS weight
        FROM hashed GROUP BY $idCol, bucket HAVING sum(s) <> 0),
      w(bucket, w_micro) AS (VALUES $values),
      m AS (
        SELECT tf.$idCol, sum(tf.weight * w.w_micro) AS mm
        FROM tf JOIN w USING (bucket) GROUP BY tf.$idCol)
      SELECT d.$idCol,
             CAST(coalesce(m.mm, 0) + $biasMicro AS BIGINT) AS margin_micro,
             round(1.0 / (1.0 + exp(-CAST(coalesce(m.mm, 0) + $biasMicro
               AS DOUBLE) / 1000000.0)), 4) AS score,
             CASE WHEN coalesce(m.mm, 0) + $biasMicro > 0
               THEN 1 ELSE 0 END::BIGINT AS pred_keep
      FROM $table d LEFT JOIN m USING ($idCol)
      ORDER BY d.$idCol"""
  }

  def save(model: LogisticRegressionModel, path: String): Unit =
    model.write.overwrite().save(path)

  def load(path: String): LogisticRegressionModel =
    LogisticRegressionModel.load(path)
}
