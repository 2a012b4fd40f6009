package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
  * — the MOSS algorithm): hash every token k-gram, slide a w-window
  * over the hash sequence, and keep each window's minimum (rightmost
  * minimum on ties). Guarantees: any shared run of w+k−1 tokens leaves
  * at least one shared fingerprint (detection), and the selected set
  * is a ~2/(w+1) fraction of the grams (compression) — the
  * plagiarism / near-verbatim-reuse detector between [[Dedup]]'s
  * whole-document sketches and [[Decontaminate]]'s exact n-gram scan.
  *
  * Engine-exact: gram hashes are the portable md5
  * ([[Dedup.portableTokenHash]]) reduced to 2³⁸, and each (hash, pos)
  * candidate is packed into ONE integer key — `h·2²⁵ + (2²⁴ − pos)` —
  * so a plain windowed `min` implements "min hash, rightmost on ties"
  * with no struct comparisons or stateful tie logic; any SQL engine
  * reproduces the fingerprint set bit for bit. The pos field bounds
  * documents at 2²⁴ ≈ 16.7M grams (a guard drops longer docs loudly
  * rather than corrupting keys).
  *
  * 100 TB design: fingerprint selection is per-document windows —
  * PARTITION BY doc, embarrassingly parallel, no cross-doc shuffle;
  * the output is ~2/(w+1) of the gram stream. [[matchPairs]] joins
  * fingerprint sets on the 8-byte hash with the family's standard
  * hot-key guard ([[Dedup.ngramJaccardPairs]]'s `maxDf` shape):
  * corpus-common fingerprints (boilerplate k-grams that survive
  * selection everywhere) are excised by a df census before the
  * pair join can fan out quadratically.
  *
  * Cache lifecycle (the [[Decontaminate]]/[[Dedup]] contract):
  * [[matchPairs]] persists the fingerprint relation MEMORY_AND_DISK
  * inside the returned lazy plan (df census + both join sides read
  * it); blocks release via `spark.catalog.clearCache()` or the
  * ContextCleaner once the plan is unreferenced.
  */
object Winnowing {

  private val PosField = 1L << 24
  private val KeyShift = 1L << 25
  private val HashSpace = 1L << 38

  /** The winnowed fingerprint set of every document.
    * Output: (idCol, fp_hash: long — 38-bit, fp_pos: int — 1-based
    * gram position). Documents with fewer than k tokens have no grams
    * and produce no rows. */
  def fingerprints(df: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4): DataFrame = {
    require(k >= 1 && w >= 1, "k and w must be positive")
    val grams = df
      .select(col(idCol), TextFns.tokens(col(textCol)).as("__toks"))
      .filter(size(col("__toks")) >= k)
      .withColumn("__ng", size(col("__toks")) - (k - 1))
      // the pos field is 24 bits; docs beyond it would alias — refuse
      .withColumn("__ng", when(col("__ng") < PosField, col("__ng"))
        .otherwise(raise_error(lit(s"winnowing: document exceeds $PosField grams"))))
      .select(col(idCol), col("__ng"),
        posexplode(transform(sequence(lit(1), col("__ng")),
          i => array_join(slice(col("__toks"), i, lit(k)), " ")))
          .as(Seq("__p0", "__gram")))
      .withColumn("pos", (col("__p0") + 1).cast("int"))
      .withColumn("__key",
        pmod(Dedup.portableTokenHash(col("__gram")), lit(HashSpace))
          * lit(KeyShift) + (lit(PosField) - col("pos")))
    val win = Window.partitionBy(col(idCol)).orderBy(col("pos"))
      .rowsBetween(0, w - 1)
    grams
      .withColumn("__wkey", min(col("__key")).over(win))
      // window starts run 1..max(ng−w+1, 1): short docs (< w grams)
      // degenerate to the single global-min fingerprint
      .filter(col("pos") <= greatest(col("__ng") - (w - 1), lit(1)))
      .select(col(idCol),
        expr(s"__wkey div ${KeyShift}L").as("fp_hash"),
        (lit(PosField) - pmod(col("__wkey"), lit(KeyShift))).cast("int")
          .as("fp_pos"))
      .distinct()
  }

  /** Cross-document fingerprint match counts — the MOSS similarity
    * report: for every doc pair sharing fingerprints, how many
    * DISTINCT fingerprint hashes they share, strongest `topN` pairs
    * first (ties by ids). `maxDf` excises corpus-common fingerprints
    * before the pair join (hot-key guard; pass `Int.MaxValue` to
    * disable, e.g. under an exact external oracle). */
  def matchPairs(df: DataFrame, idCol: String, textCol: String,
                 k: Int = 4, w: Int = 4, maxDf: Int = 1000,
                 topN: Int = 100): DataFrame = {
    val fp = fingerprints(df, idCol, textCol, k, w)
      .select(col(idCol).as("__id"), col("fp_hash"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val rare = if (maxDf == Int.MaxValue) fp
      else fp.join(
        fp.groupBy(col("fp_hash")).agg(count(lit(1)).as("__df"))
          .filter(col("__df") <= maxDf)
          .select(col("fp_hash")),
        Seq("fp_hash"), "left_semi")
    rare.as("a")
      .join(rare.as("b"),
        col("a.fp_hash") === col("b.fp_hash") && col("a.__id") < col("b.__id"))
      .groupBy(col("a.__id").as("doc_a"), col("b.__id").as("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .orderBy(col("n_shared").desc, col("doc_a"), col("doc_b"))
      .limit(topN)
  }
}
