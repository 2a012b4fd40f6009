package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed Lloyd k-means over an embedding column — the centroid
  * TRAINING step the coarse-quantization family ([[Similarity.ivfCells]],
  * [[Similarity.semanticDedupe]]) otherwise skips by drawing corpus
  * points: a few Lloyd rounds tighten cells substantially, which
  * directly shrinks the within-cell pair scans those operators are
  * priced by.
  *
  * Engine-exact by construction (the [[UnigramLm]] playbook applied to
  * geometry): vectors are quantized ONCE to integer micro-space
  * (`round(x·10⁶)` per element — deterministic in any IEEE engine),
  * after which EVERYTHING is integer arithmetic — squared L2 distances
  * are exact integer sums (bounded: |x|≤10³ ⇒ element term ≤ 4·10¹⁸/dim
  * for any realistic dim; at embedding norms ~1 the sums sit near
  * 10¹²), argmin ties break on centroid id, and the centroid update is
  * the truncating integer mean `Σv div n` (Spark `div` and DuckDB `//`
  * both truncate toward zero). Two engines running this recipe agree
  * bit for bit — which is what makes a trained-clustering oracle
  * (q107) possible at all.
  *
  * 100 TB design: per iteration, ONE narrow pass over the corpus
  * computes every vector's nearest centroid against a LITERAL centroid
  * array (k·dim longs — broadcast-in-plan, no join, no shuffle), and
  * ONE (cid, dim-index) aggregation with map-side partial sums carries
  * k·dim rows to the driver — the same bounded round-trip class as
  * [[Similarity.lshTopK]]'s hyperplane matrix, documented and visible.
  * The corpus is never shuffled; cost is iters × (scan + k·dim·n
  * multiply-adds). The interpreted HOF distance kernel prices fit for
  * OFFLINE runs (k ≤ a few hundred); IVF-style sub-quadratic
  * assignment is the route past that, as documented on
  * [[Similarity.semanticDedupe]].
  */
object KMeans {

  /** Integer micro-space quantization of a float vector — exact in any
    * engine (see class doc). */
  def microVec(vec: Column): Column =
    transform(vec, x => round(x.cast("double") * lit(1e6), 0).cast("long"))

  /** Exact integer squared L2 distance between two micro vectors —
    * the NATIVE fused expression ([[graft.functions.SqDistMicro]]):
    * this kernel sits under every centroid assignment (fit rounds,
    * IVF cells, residual derivation), often join-shaped at
    * (row × candidate) grain, where the old HOF composition paid
    * interpreted CodegenFallback eval per pair (the same class of
    * cost the r11 ladder caught in the PQ encode at k=256).
    * Bitwise-identical results: integer arithmetic, no summation
    * order to disagree over (VectorFnsSpec differential). */
  def sqDistMicro(a: Column, b: Column): Column =
    graft.functions.VectorFns.sqDistMicro(a, b)

  /** A fitted model: (cid 1..k, centroid in micro space). */
  type Model = Seq[(Int, Seq[Long])]

  /** Add `cluster` + `dist_sq_micro` to a frame carrying `__v`: the
    * per-centroid distances land in ONE literal-indexed array (cid
    * order), `array_min` picks the best and `array_position`'s
    * first-match rule IS the smallest-cid tie-break. (Struct-based
    * argmin would be the obvious alternative, but field aliases don't
    * survive inside HOF lambdas — positional arrays do.) */
  private def withAssignment(df: DataFrame, centroids: Model): DataFrame = {
    val ordered = centroids.sortBy(_._1)
    df
      .withColumn("__d",
        transform(typedlit(ordered.map(_._2)), c => sqDistMicro(col("__v"), c)))
      .withColumn("dist_sq_micro", array_min(col("__d")))
      .withColumn("cluster",
        element_at(typedlit(ordered.map(_._1)),
          array_position(col("__d"), col("dist_sq_micro")).cast("int")))
  }

  /** Fit k centroids with `iters` Lloyd rounds. Init draws the k
    * corpus vectors with the smallest portable md5 rank
    * ([[Similarity.portableCentroidRank]] — the q73 convention), ties
    * by id; cid is the 1-based draw order. Clusters that lose all
    * members keep their previous centroid (the deterministic
    * carry rule an external engine can mirror). Vectors with NULL
    * elements are excluded, matching the ANN operators' contract. */
  def fit(df: DataFrame, idCol: String, vecCol: String, k: Int,
          iters: Int): Model = {
    require(k > 0 && iters >= 0, "k must be positive, iters non-negative")
    val vecs = df
      .filter(col(vecCol).isNotNull && !exists(col(vecCol), x => x.isNull))
      .select(col(idCol).as("__id"), microVec(col(vecCol)).as("__v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      var centroids: Model = vecs
        .withColumn("__r", Similarity.portableCentroidRank(col("__id")))
        .orderBy(col("__r"), col("__id")).limit(k)
        .select(col("__v")).collect()
        .zipWithIndex
        .map { case (row, i) => (i + 1, row.getSeq[Long](0)) }
        .toSeq
      (1 to iters).foreach { _ =>
        // one narrow assignment pass + one k·dim-row aggregate; the
        // collect is the documented bounded model round-trip
        val sums = withAssignment(vecs, centroids)
          .select(col("cluster").as("__cid"),
            posexplode(col("__v")).as(Seq("__i", "__x")))
          .groupBy(col("__cid"), col("__i"))
          .agg(sum(col("__x")).as("__s"), count(lit(1)).as("__n"))
          .select(col("__cid"), col("__i"), expr("__s div __n").as("__c"))
          .collect()
        val updated = sums.groupBy(_.getAs[Int]("__cid")).map {
          case (cid, rows) =>
            cid -> rows.sortBy(_.getAs[Int]("__i")).map(_.getAs[Long]("__c")).toSeq
        }
        centroids = centroids.map { case (cid, v) =>
          (cid, updated.getOrElse(cid, v)) // empty-cluster carry
        }
      }
      centroids
    } finally vecs.unpersist()
  }

  /** Assign every vector to its nearest model centroid — a pure map
    * (literal centroids, no join, no shuffle).
    * Output: (idCol, cluster: int, dist_sq_micro: long). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
             centroids: Model): DataFrame = {
    // an empty model would silently assign NULL clusters to every row
    // (array_min over an empty literal) — fail loudly instead; fit on
    // an empty corpus is the only way to produce one
    require(centroids.nonEmpty, "cannot assign against an empty model")
    withAssignment(
        df.filter(col(vecCol).isNotNull && !exists(col(vecCol), x => x.isNull))
          .withColumn("__v", microVec(col(vecCol))),
        centroids)
      .select(col(idCol), col("cluster"), col("dist_sq_micro"))
  }

  /** Fit then assign — the one-call clustering most callers want. */
  def fitAssign(df: DataFrame, idCol: String, vecCol: String, k: Int,
                iters: Int): DataFrame =
    assign(df, idCol, vecCol, fit(df, idCol, vecCol, k, iters))
}
