package graft.queries

import graft.Tables
import graft.functions.TextFns
import graft.operators.{GraphOps, LineDedup, Similarity}
import org.apache.spark.sql.functions._

/** Corpus-structure family: graph transitivity over the embedding
  * similarity graph (q110) and within-document line dedup (q111) —
  * structure signals AT two scopes the earlier families don't cover:
  * the corpus-level neighbor graph's clustering shape, and the single
  * document's internal repetition, with a zero-shuffle operator for
  * the latter.
  */
object StructureOps {

  /** q110: per-node triangle counts over the exact top-3 cosine
    * neighbor graph (GraphOps.triangleCounts) — the transitivity /
    * clustering-coefficient signal of the corpus: triangle-dense nodes
    * sit in semantic clumps (near-dup families, templated content),
    * triangle-free ones on isolated chains. The edge SET is the
    * oracle-proven q31 kNN result (rank ≤ 3, symmetrized), so the
    * float cosine never reaches the compared output — only integer
    * counts do. Spark runs the degree-ordered O(m^1.5) wedge algorithm;
    * the oracle counts the same triangles with the naive a<b<c triple
    * join (identical result, different plan — the triangle set is a
    * property of the graph). At 100 TB the same operator runs over the
    * ANN graph (q73/q74's output shape) instead of the brute-force one.
    */
  private val q110 = QuerySpec(
    "q110_triangle_count",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val knn = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
      GraphOps.triangleCounts(
          knn.select(col("q_id").as("src"), col("c_id").as("dst")),
          "src", "dst")
        .orderBy(col("n_tri").desc, col("node"))
    },
    oracle = Some("""
      WITH knn AS (
        SELECT q_id, c_id FROM (
          SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                 CAST(row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id ASC)
                   AS INTEGER) AS rank
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
        WHERE rank <= 3),
      edges AS (
        SELECT DISTINCT least(q_id, c_id) AS u, greatest(q_id, c_id) AS v
        FROM knn),
      tri AS (
        SELECT e1.u AS a, e1.v AS b, e2.v AS c
        FROM edges e1
        JOIN edges e2 ON e2.u = e1.v
        JOIN edges e3 ON e3.u = e1.u AND e3.v = e2.v)
      SELECT node, CAST(count(*) AS BIGINT) AS n_tri
      FROM (SELECT a AS node FROM tri
            UNION ALL SELECT b FROM tri
            UNION ALL SELECT c FROM tri)
      GROUP BY node
      ORDER BY n_tri DESC, node"""))

  /** q111: intra-document line dedup (LineDedup.intraDoc) — strip each
    * document's OWN repeated lines, the within-doc complement of q103's
    * corpus-level rule and the only dedup operator that needs NO
    * shuffle at all. Same line-planting pattern as q103 (corpus text is
    * single-line): tokens re-wrapped 6 per line, a shared nav header
    * planted at both the top AND the bottom of every doc (the repeat
    * the operator must catch), and docs ≡0 mod 3 additionally repeat
    * their own first body line. Natural 6-token chunk collisions within
    * a doc dedupe too.
    */
  private val q111 = QuerySpec(
    "q111_intradoc_dedup",
    (s, dir) => {
      val lined = Tables.documents(s, dir)
        .withColumn("__toks", TextFns.tokens(col("text")))
        .withColumn("__nc", expr("(size(__toks) + 5) div 6").cast("int"))
        .withColumn("__body", when(col("__nc") >= 1,
            transform(sequence(lit(0), col("__nc") - 1),
              i => array_join(slice(col("__toks"), i * 6 + 1, lit(6)), " ")))
          .otherwise(array().cast("array<string>")))
        .withColumn("raw", concat_ws("\n", concat(
          array(lit("menu home about contact")),
          col("__body"),
          array(lit("menu home about contact")),
          when(pmod(col("doc_id"), lit(3)) === 0 && col("__nc") >= 1,
              array(array_join(slice(col("__toks"), 1, 6), " ")))
            .otherwise(array().cast("array<string>")))))
        .select(col("doc_id"), col("raw"))
      LineDedup.intraDoc(lined, "doc_id", "raw")
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents),
      lined AS (
        SELECT doc_id,
          ['menu home about contact']
          || CASE WHEN len(w) >= 1 THEN
               list_transform(range(0, (len(w) + 5) // 6),
                 i -> array_to_string(w[i*6+1:i*6+6], ' '))
             ELSE [] END
          || ['menu home about contact']
          || CASE WHEN doc_id % 3 = 0 AND len(w) >= 1
               THEN [array_to_string(w[1:6], ' ')] ELSE [] END AS ls
        FROM t),
      kept AS (
        SELECT doc_id, ls,
               list_filter(ls, (x, i) -> list_position(ls, x) = i) AS ks
        FROM lined)
      SELECT doc_id,
             CAST(len(ls) AS INTEGER) AS n_lines,
             CAST(len(ks) AS INTEGER) AS n_kept,
             array_to_string(ks, chr(10)) AS clean
      FROM kept
      ORDER BY doc_id"""))

  val specs: Seq[QuerySpec] = Seq(q110, q111)
}
