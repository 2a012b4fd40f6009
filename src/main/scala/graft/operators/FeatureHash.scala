package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Feature hashing (Weinberger et al., "Feature Hashing for Large
  * Scale Multitask Learning", 2009 — the HashingTF shape with the
  * signed trick): project token counts into a fixed `dim`-bucket
  * vector with `v[h(t) mod dim] += ξ(t)`, ξ(t) ∈ {−1, +1} from an
  * independent hash bit. The sign makes collision noise zero-mean, so
  * hashed inner products are unbiased estimates of the true
  * count-vector products — which is what lets the TEXT side of the
  * corpus ride the ENTIRE ANN family (brute force, LSH, IVF, PQ,
  * semantic dedup) without training a vectorizer or fixing a
  * vocabulary: the bridge from tokens to `array<float>` is one
  * stateless narrow pass.
  *
  * Engine-portable: both hashes are the md5 low-60-bit rule
  * ([[Dedup.portableTokenHash]], sign from a salted second draw), all
  * weights exact integers — the q162 oracle replays buckets, signs,
  * and sums. Scale: explode + one (id, bucket) groupBy with map-side
  * combine; output ≤ dim rows per doc regardless of document length.
  */
object FeatureHash {

  private def bucketOf(tok: org.apache.spark.sql.Column, dim: Int) =
    pmod(Dedup.portableTokenHash(tok), lit(dim.toLong)).cast("int")

  private def signOf(tok: org.apache.spark.sql.Column) =
    when(pmod(Dedup.portableTokenHash(concat(lit("sgn#"), tok)),
      lit(2L)) === 0, 1L).otherwise(-1L)

  /** Sparse hashed term vector: one row per NON-ZERO bucket —
    * (idCol, bucket ∈ [0, dim), weight: long = Σ signs). Buckets whose
    * signed contributions cancel to zero are dropped (canonical sparse
    * form; the dense assembly treats them as 0 either way). */
  def hashedTf(docs: DataFrame, idCol: String, textCol: String,
               dim: Int): DataFrame = {
    require(dim >= 2, s"dim must be >= 2, got $dim")
    docs
      .select(col(idCol), explode(TextFns.tokens(col(textCol))).as("tok"))
      .select(col(idCol), bucketOf(col("tok"), dim).as("bucket"),
        signOf(col("tok")).as("s"))
      .groupBy(col(idCol), col("bucket"))
      .agg(sum(col("s")).as("weight"))
      .filter(col("weight") =!= 0)
  }

  /** Dense `array<float>` form of [[hashedTf]] — the drop-in input for
    * the ANN operators (`Similarity.*`, `ProductQuant`,
    * `semanticDedupe`): (idCol, vector array<float> of length dim).
    * Docs with no tokens yield the zero vector (they embed nowhere,
    * but keep their row — the caller decides). Assembly is a per-doc
    * bounded collect (≤ dim entries) + one indexed transform. */
  def hashedTfVectors(docs: DataFrame, idCol: String, textCol: String,
                      dim: Int): DataFrame = {
    val sparse = hashedTf(docs, idCol, textCol, dim)
      .groupBy(col(idCol))
      .agg(map_from_entries(collect_list(struct(col("bucket"), col("weight"))))
        .as("__m"))
    docs.select(col(idCol))
      .join(sparse, Seq(idCol), "left")
      .select(col(idCol),
        transform(sequence(lit(0), lit(dim - 1)), i =>
          coalesce(element_at(col("__m"), i.cast("int")), lit(0L))
            .cast("float")).as("vector"))
  }

  /** [[hashedTf]] with inverse-document-frequency weighting — the
    * HashingTF→IDF pair Spark ML ships, in the engine-portable form:
    * idf(b) = round(ln((N+1)/(df_b+1))·10⁶) per BUCKET (bucket-level
    * df is the hashed-space analog of term df; collisions shade idf
    * toward the commoner colliding term — the standard hashing trade),
    * weighted = weight · idf_micro, exact integers end to end. The
    * df/N relations are bucket-sized and broadcast; the corpus pays
    * the same single explode as [[hashedTf]].
    * Output: (idCol, bucket, weight, idf_micro, w_idf). */
  def hashedTfIdf(docs: DataFrame, idCol: String, textCol: String,
                  dim: Int): DataFrame = {
    val tf = hashedTf(docs, idCol, textCol, dim)
      // feeds the df aggregation AND the weighting join of the
      // returned lazy plan (the round-7 multi-consumer rule); the
      // checkpoint is ≤ docs·dim rows of three integers
      .localCheckpoint()
    // NULL ids excluded: count(DISTINCT id) semantics, so N agrees
    // with the DuckDB oracle on corpora with NULL ids
    val n = docs.select(col(idCol)).filter(col(idCol).isNotNull)
      .distinct().count()
    val idf = tf.groupBy(col("bucket"))
      .agg(count(lit(1)).as("__df"))
      .select(col("bucket"),
        round(log((lit(n.toDouble) + 1.0) / (col("__df") + lit(1.0)))
          * lit(1e6), 0).cast("long").as("idf_micro"))
    tf.join(broadcast(idf), "bucket")
      .select(col(idCol), col("bucket"), col("weight"), col("idf_micro"),
        (col("weight") * col("idf_micro")).as("w_idf"))
  }

  /** DuckDB replay of [[hashedTfIdf]]. */
  def hashedTfIdfOracle(table: String, idCol: String, textCol: String,
                        dim: Int): String =
    hashedTfOracle(table, idCol, textCol, dim).replace(
      s"""      SELECT $idCol, CAST(bucket AS INTEGER) AS bucket,
             CAST(sum(s) AS BIGINT) AS weight
      FROM hashed
      GROUP BY $idCol, bucket
      HAVING sum(s) <> 0
      ORDER BY $idCol, bucket""",
      s"""      , tf AS (
        SELECT $idCol, CAST(bucket AS INTEGER) AS bucket,
               CAST(sum(s) AS BIGINT) AS weight
        FROM hashed
        GROUP BY $idCol, bucket
        HAVING sum(s) <> 0),
      idf AS (
        SELECT bucket,
               CAST(round(ln((CAST((SELECT count(DISTINCT $idCol)
                   FROM $table) AS DOUBLE) + 1.0)
                 / (count(*) + 1.0)) * 1000000, 0) AS BIGINT) AS idf_micro
        FROM tf GROUP BY bucket)
      SELECT t.$idCol, t.bucket, t.weight, i.idf_micro,
             CAST(t.weight * i.idf_micro AS BIGINT) AS w_idf
      FROM tf t JOIN idf i USING (bucket)
      ORDER BY t.$idCol, t.bucket""")

  /** DuckDB replay of [[hashedTf]]. */
  def hashedTfOracle(table: String, idCol: String, textCol: String,
                     dim: Int): String = s"""
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
        FROM toks)
      SELECT $idCol, CAST(bucket AS INTEGER) AS bucket,
             CAST(sum(s) AS BIGINT) AS weight
      FROM hashed
      GROUP BY $idCol, bucket
      HAVING sum(s) <> 0
      ORDER BY $idCol, bucket"""
}
