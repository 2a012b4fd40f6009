package graft.queries

import graft.Tables
import graft.functions.TextFns
import graft.operators.{GraphOps, LineDedup, Similarity}
import org.apache.spark.sql.functions._

/** Corpus-structure family: graph transitivity over the embedding
  * similarity graph (q110), within-document line dedup (q111), and the
  * per-source profile in sketch + exact-twin form (q112/q113) —
  * structure signals at scopes the earlier families don't cover: the
  * corpus-level neighbor graph's clustering shape, the single
  * document's internal repetition (zero-shuffle), and the fixed-memory
  * estimator pattern a 100 TB data card runs.
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

  /** q112: per-source corpus profile in SKETCH form
    * (CorpusStats.sketchProfile) — HLL++ vocabulary estimate + GK
    * quantile p90 length, the fixed-memory estimators that replace
    * exact distinct/percentile at 100 TB. Sketch registers aren't
    * engine-portable → rows-only check; q113 is the oracle-checked
    * exact twin and ApproxSpec pins the sketch-vs-exact error bound
    * differentially (the q29→q69 / q32→q74 pattern).
    */
  private val q112 = QuerySpec(
    "q112_sketch_profile",
    (s, dir) =>
      graft.operators.CorpusStats
        .sketchProfile(Tables.documents(s, dir), "source", "text")
        .orderBy(col("source")))

  /** q113: exact twin of q112 (CorpusStats.distinctProfile) — same
    * shape with count(DISTINCT) and the q53 p·(n−1)-interpolated exact
    * percentile; p90 rounded to 2dp on both sides (interpolation is
    * engine-exact on integer lengths per the q53 precedent, rounding
    * removes any last-ulp concern). */
  private val q113 = QuerySpec(
    "q113_distinct_profile",
    (s, dir) =>
      graft.operators.CorpusStats
        .distinctProfile(Tables.documents(s, dir), "source", "text")
        .withColumn("p90_chars", round(col("p90_chars"), 2))
        .orderBy(col("source")),
    oracle = Some("""
      WITH lens AS (
        SELECT coalesce(CAST(source AS VARCHAR), '(none)') AS source,
               CAST(count(*) AS BIGINT) AS n_docs,
               quantile_cont(length(coalesce(text, '')), 0.9) AS p90_chars
        FROM documents GROUP BY 1),
      vocab AS (
        SELECT source, CAST(count(DISTINCT tok) AS BIGINT) AS n_distinct_tokens
        FROM (
          SELECT coalesce(CAST(source AS VARCHAR), '(none)') AS source,
                 unnest(list_filter(string_split_regex(text, '\s+'),
                   x -> x <> '')) AS tok
          FROM documents)
        GROUP BY 1)
      SELECT l.source, l.n_docs,
             coalesce(v.n_distinct_tokens, 0) AS n_distinct_tokens,
             round(CAST(l.p90_chars AS DOUBLE), 2) AS p90_chars
      FROM lens l LEFT JOIN vocab v ON v.source = l.source
      ORDER BY l.source"""))

  /** q114: synchronous label propagation (GraphOps.labelPropagation) —
    * two rounds of majority-label communities over the same symmetrized
    * kNN graph as q110: the topic-bucketing complement to q51's
    * connected components (any-path merge) and q110's triangles (local
    * transitivity). Deterministic by synchrony + smallest-label
    * tie-break, so the oracle unrolls both rounds as CTEs. */
  private val q114 = QuerySpec(
    "q114_label_prop",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val knn = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
      GraphOps.labelPropagation(
          knn.select(col("q_id").as("src"), col("c_id").as("dst")),
          "src", "dst", iters = 2)
        .orderBy(col("node"))
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
        SELECT DISTINCT u, v FROM (
          SELECT q_id AS u, c_id AS v FROM knn
          UNION ALL SELECT c_id, q_id FROM knn)
        WHERE u <> v),
      l0 AS (SELECT DISTINCT u AS node, u AS label FROM edges),
      c1 AS (
        SELECT e.v AS node, l.label, count(*) AS c
        FROM edges e JOIN l0 l ON l.node = e.u
        GROUP BY 1, 2),
      l1 AS (
        SELECT node, label FROM (
          SELECT node, label, row_number() OVER (PARTITION BY node
            ORDER BY c DESC, label ASC) AS rk
          FROM c1) WHERE rk = 1),
      c2 AS (
        SELECT e.v AS node, l.label, count(*) AS c
        FROM edges e JOIN l1 l ON l.node = e.u
        GROUP BY 1, 2),
      l2 AS (
        SELECT node, label FROM (
          SELECT node, label, row_number() OVER (PARTITION BY node
            ORDER BY c DESC, label ASC) AS rk
          FROM c2) WHERE rk = 1)
      SELECT node, label FROM l2 ORDER BY node"""))

  /** q115: bounded-round k-core peeling (GraphOps.kCore) — the dense
    * blob of the kNN graph: two peels at k=4 strip the organic
    * periphery (454 of 500 nodes at sf0.01) and keep the mutually
    * reinforcing core the dedup family would inspect. Fixed rounds
    * unroll into the oracle; output keeps each survivor's current
    * degree (rows with deg < 4 are exactly the next round's drops). */
  private val q115 = QuerySpec(
    "q115_kcore",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val knn = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
      GraphOps.kCore(
          knn.select(col("q_id").as("src"), col("c_id").as("dst")),
          "src", "dst", k = 4, rounds = 2)
        .orderBy(col("node"))
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
      e0 AS (
        SELECT DISTINCT u, v FROM (
          SELECT q_id AS u, c_id AS v FROM knn
          UNION ALL SELECT c_id, q_id FROM knn)
        WHERE u <> v),
      s1 AS (SELECT u AS node FROM e0 GROUP BY 1 HAVING count(*) >= 4),
      e1 AS (SELECT e.u, e.v FROM e0 e
             WHERE e.u IN (SELECT node FROM s1)
               AND e.v IN (SELECT node FROM s1)),
      s2 AS (SELECT u AS node FROM e1 GROUP BY 1 HAVING count(*) >= 4),
      e2 AS (SELECT e.u, e.v FROM e1 e
             WHERE e.u IN (SELECT node FROM s2)
               AND e.v IN (SELECT node FROM s2))
      SELECT u AS node, CAST(count(*) AS BIGINT) AS deg
      FROM e2 GROUP BY 1 ORDER BY node"""))

  /** q116: leakage-free train/val/test split
    * (Sampling.clusterSafeSplit) — whole near-dup clusters assigned to
    * one split via the PORTABLE md5 hash of the cluster label, so no
    * eval row has a train near-duplicate. Pairs from the unguarded
    * minhash graph; the oracle rebuilds q51's recursive-CTE clusters
    * and applies the identical md5 basis-point bucket (q88's portable
    * hash formula). */
  private val q116 = QuerySpec(
    "q116_cluster_split",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // maxBucket unguarded: the recursive oracle clusters the exact
      // uncapped pair graph (the q51 convention)
      val pairs = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text",
        shingleN = 3, numHashes = 128, bands = 32, threshold = 0.8,
        maxBucket = Int.MaxValue)
      graft.operators.Sampling.clusterSafeSplit(docs, "doc_id", pairs,
          Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
        .select(col("doc_id"), col("cluster"), col("split"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH RECURSIVE
      toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(
            CASE WHEN len(w) >= 3 THEN
              list_transform(range(1, len(w) - 1),
                i -> array_to_string(w[i:i+2], ' '))
            ELSE [array_to_string(w, ' ')] END) AS s
          FROM toks)),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS isect
        FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        GROUP BY 1, 2),
      prs AS (
        SELECT id_a, id_b FROM inter
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
        WHERE CAST(isect AS DOUBLE) / (sa.sz + sb.sz - isect) >= 0.8),
      edges AS (
        SELECT id_a AS s, id_b AS d FROM prs
        UNION ALL SELECT id_b, id_a FROM prs),
      reach(doc, r) AS (
        SELECT doc_id, doc_id FROM documents
        UNION
        SELECT reach.doc, e.d FROM reach JOIN edges e ON reach.r = e.s),
      labels AS (SELECT doc, min(r) AS cluster FROM reach GROUP BY doc),
      bkt AS (
        SELECT doc AS doc_id, cluster,
               ('0x' || substring(md5('split42_' || CAST(cluster AS VARCHAR)),
                 1, 15))::BIGINT % 10000 AS bp
        FROM labels)
      SELECT doc_id, cluster,
             CASE WHEN bp < 8000 THEN 'train'
                  WHEN bp < 9000 THEN 'val' ELSE 'test' END AS split
      FROM bkt ORDER BY doc_id"""))

  val specs: Seq[QuerySpec] = Seq(q110, q111, q112, q113, q114, q115, q116)
}
