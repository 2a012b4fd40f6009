package graft.queries

import graft.Tables
import graft.functions.TextFns
import graft.operators.{KMeans, LineDedup, Retrieval, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Round-5 retrieval + corpus-surgery extensions: corpus-level line
  * deduplication (q103), BM25 keyword retrieval (q104), hybrid
  * lexical+embedding reciprocal-rank fusion (q105), and epoch
  * replication — the upsampling half of mixture design (q106). All
  * four fully oracle-checked; determinism comes from the established
  * tricks (micro-quantized idf, integer RRF terms, md5 shuffle keys,
  * first-occurrence line winners).
  */
object RetrievalOps {

  /** The fixed keyword query q104/q105 share — three mid-frequency
    * corpus terms, so idf spread and tf saturation both exercise. */
  private val QueryTerms = Seq("spark", "window", "merge")

  /** q103: corpus-level line dedup (LineDedup.firstOccurrence) — the
    * CCNet-style boilerplate-line strip. The corpus text is single-line,
    * so the query PLANTS deterministic line structure first (q100's
    * planting pattern): every doc's tokens are re-wrapped 8 per line,
    * docs ≡0 mod 4 gain a shared newsletter header, ≡0 mod 6 a shared
    * copyright footer — both boilerplate lines provably survive only in
    * their first carrier (doc 0), and natural 8-token chunk collisions
    * dedupe too. */
  private val q103 = QuerySpec(
    "q103_line_dedup",
    (s, dir) => {
      val lined = Tables.documents(s, dir)
        .withColumn("__toks", TextFns.tokens(col("text")))
        .withColumn("__nc", expr("(size(__toks) + 7) div 8").cast("int"))
        .withColumn("__body", when(col("__nc") >= 1,
            transform(sequence(lit(0), col("__nc") - 1),
              i => array_join(slice(col("__toks"), i * 8 + 1, lit(8)), " ")))
          .otherwise(array().cast("array<string>")))
        .withColumn("raw", concat_ws("\n", concat(
          when(pmod(col("doc_id"), lit(4)) === 0,
              array(lit("subscribe to our newsletter today")))
            .otherwise(array().cast("array<string>")),
          col("__body"),
          when(pmod(col("doc_id"), lit(6)) === 0,
              array(lit("copyright footer all rights reserved")))
            .otherwise(array().cast("array<string>")))))
        .select(col("doc_id"), col("raw"))
      LineDedup.firstOccurrence(lined, "doc_id", "raw")
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents),
      lined AS (
        SELECT doc_id,
          CASE WHEN doc_id % 4 = 0
            THEN ['subscribe to our newsletter today'] ELSE [] END
          || CASE WHEN len(w) >= 1 THEN
               list_transform(range(0, (len(w) + 7) // 8),
                 i -> array_to_string(w[i*8+1:i*8+8], ' '))
             ELSE [] END
          || CASE WHEN doc_id % 6 = 0
            THEN ['copyright footer all rights reserved'] ELSE [] END
          AS lines
        FROM t),
      occ AS (
        SELECT doc_id, u.p AS pos, u.l AS line FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(lines)+1),
            i -> {'p': i, 'l': lines[i]})) AS u
          FROM lined)),
      rk AS (
        SELECT doc_id, pos, line,
               row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rk
        FROM occ),
      reb AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS clean
        FROM rk WHERE rk = 1 GROUP BY 1),
      cnt AS (SELECT doc_id, count(*) AS n_lines FROM occ GROUP BY 1)
      SELECT d.doc_id,
             CAST(coalesce(cnt.n_lines, 0) AS INTEGER) AS n_lines,
             CAST(coalesce(reb.n_kept, 0) AS INTEGER) AS n_kept,
             coalesce(reb.clean, '') AS clean
      FROM documents d
      LEFT JOIN cnt USING (doc_id)
      LEFT JOIN reb USING (doc_id)
      ORDER BY d.doc_id"""))

  /** q104: Okapi BM25 top-50 (Retrieval.bm25TopK) for a fixed keyword
    * query — idf micro-quantized per term, per-(doc,term) contribution
    * rounded in one fixed-shape IEEE expression, doc totals exact
    * integer sums (the q93 determinism playbook applied to ranking). */
  private val q104 = QuerySpec(
    "q104_bm25_topk",
    (s, dir) =>
      Retrieval.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
          QueryTerms, k = 50)
        .orderBy(col("rank")),
    oracle = Some("""
      WITH dl AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> '')) AS BIGINT) AS dl
        FROM documents),
      stats AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS dl_sum FROM dl),
      toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> '')) AS token
        FROM documents),
      hits AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'window', 'merge') GROUP BY 1, 2),
      dfr AS (
        SELECT token,
               CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - cdf + 0.5)
                 / (cdf + 0.5)) * 1000000, 0) AS BIGINT) AS idf_micro
        FROM (SELECT token, count(*) AS cdf FROM hits GROUP BY 1)
        CROSS JOIN stats),
      con AS (
        SELECT h.doc_id,
               CAST(round(CAST(idf_micro AS DOUBLE) *
                 (tf * (1.2 + 1) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))),
                 0) AS BIGINT) AS c
        FROM hits h
        JOIN dl USING (doc_id) JOIN dfr USING (token)
        CROSS JOIN (SELECT CAST(dl_sum AS DOUBLE) / n_docs AS avgdl FROM stats)),
      sc AS (
        SELECT doc_id, CAST(count(*) AS INTEGER) AS n_hits,
               CAST(sum(c) AS BIGINT) AS score_micro
        FROM con GROUP BY 1
        ORDER BY score_micro DESC, doc_id LIMIT 50)
      SELECT CAST(row_number() OVER (ORDER BY score_micro DESC, doc_id)
               AS INTEGER) AS rank,
             doc_id, n_hits, score_micro,
             round(CAST(score_micro AS DOUBLE) / 1000000.0, 4) AS score
      FROM sc ORDER BY rank"""))

  /** q105: hybrid retrieval — BM25 (q104's query) fused with exact
    * cosine top-50 around a fixed query embedding (vec_id 7, joined on
    * the doc_id=vec_id convention) by reciprocal-rank fusion
    * (Retrieval.rrfFuse). RRF terms are pure integer `10⁶ div (60+rank)`
    * — no float anywhere in the fused ranking. */
  private val q105 = QuerySpec(
    "q105_rrf_fusion",
    (s, dir) => {
      val emb = Tables.embeddings(s, dir)
      val bm = Retrieval.bm25TopK(Tables.documents(s, dir), "doc_id", "text",
          QueryTerms, k = 50)
        .select(col("doc_id"), col("rank"))
      val knn = Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") === 7), "vec_id", "embedding", k = 50)
        .select(col("c_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(bm, knn), "doc_id", k = 20)
        .orderBy(col("rank"))
    },
    oracle = Some("""
      WITH dl AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> '')) AS BIGINT) AS dl
        FROM documents),
      stats AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS dl_sum FROM dl),
      toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> '')) AS token
        FROM documents),
      hits AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'window', 'merge') GROUP BY 1, 2),
      dfr AS (
        SELECT token,
               CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - cdf + 0.5)
                 / (cdf + 0.5)) * 1000000, 0) AS BIGINT) AS idf_micro
        FROM (SELECT token, count(*) AS cdf FROM hits GROUP BY 1)
        CROSS JOIN stats),
      con AS (
        SELECT h.doc_id,
               CAST(round(CAST(idf_micro AS DOUBLE) *
                 (tf * (1.2 + 1) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))),
                 0) AS BIGINT) AS c
        FROM hits h
        JOIN dl USING (doc_id) JOIN dfr USING (token)
        CROSS JOIN (SELECT CAST(dl_sum AS DOUBLE) / n_docs AS avgdl FROM stats)),
      bm AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY sm DESC, doc_id)
                 AS INTEGER) AS rank
        FROM (SELECT doc_id, sum(c) AS sm FROM con GROUP BY 1
              ORDER BY sm DESC, doc_id LIMIT 50) x),
      knn AS (
        SELECT c_id AS doc_id, rank FROM (
          SELECT b.vec_id AS c_id,
                 CAST(row_number() OVER (ORDER BY
                   list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])) DESC,
                   b.vec_id) AS INTEGER) AS rank
          FROM embeddings b,
               (SELECT embedding FROM embeddings WHERE vec_id = 7) q
          WHERE b.vec_id <> 7)
        WHERE rank <= 50),
      uni AS (
        SELECT doc_id, 1000000 // (60 + rank) AS r FROM bm
        UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM knn),
      f AS (
        SELECT doc_id, CAST(count(*) AS INTEGER) AS n_lists,
               CAST(sum(r) AS BIGINT) AS rrf_micro
        FROM uni GROUP BY 1
        ORDER BY rrf_micro DESC, doc_id LIMIT 20)
      SELECT CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
               AS INTEGER) AS rank,
             doc_id, n_lists, rrf_micro,
             round(CAST(rrf_micro AS DOUBLE) / 1000000.0, 6) AS rrf_score
      FROM f ORDER BY rank"""))

  /** q106: epoch replication (Sampling.epochReplicate) — src0 upsampled
    * 3×, src1 2×, src2 dropped, every other source 1×; each copy takes
    * a deterministic global training position over the replicated
    * stream (md5 of the id#epoch composite — the q84 shuffle-key
    * convention extended to copies). */
  private val q106 = QuerySpec(
    "q106_epoch_mix",
    (s, dir) =>
      Sampling.epochReplicate(
          Tables.documents(s, dir).select(col("doc_id"), col("source")),
          "doc_id", "source",
          Map("src0" -> 3, "src1" -> 2, "src2" -> 0), defaultEpochs = 1)
        .select(col("doc_id"), col("source"), col("epoch"), col("pos"))
        .orderBy(col("doc_id"), col("epoch")),
    oracle = Some("""
      WITH e AS (
        SELECT doc_id, source,
               CASE source WHEN 'src0' THEN 3 WHEN 'src1' THEN 2
                 WHEN 'src2' THEN 0 ELSE 1 END AS ne
        FROM documents),
      r AS (
        SELECT doc_id, source,
               CAST(unnest(range(1, ne + 1)) AS INTEGER) AS epoch
        FROM e)
      SELECT doc_id, source, epoch,
             CAST(row_number() OVER (ORDER BY
               md5('42_' || CAST(doc_id AS VARCHAR) || '#'
                 || CAST(epoch AS VARCHAR)),
               CAST(doc_id AS VARCHAR) || '#' || CAST(epoch AS VARCHAR))
               AS BIGINT) AS pos
      FROM r ORDER BY doc_id, epoch"""))

  /** q107: distributed Lloyd k-means (KMeans.fitAssign) — 2 training
    * rounds from the portable md5 seed draw, then the final
    * assignment. Everything after the one-time micro-quantization is
    * integer arithmetic (exact squared distances, truncating integer
    * centroid means), so a SQL engine unrolling the same two rounds
    * reproduces the clustering bit for bit — a trained-model oracle,
    * not just a scoring one. */
  private val q107 = QuerySpec(
    "q107_kmeans",
    (s, dir) =>
      KMeans.fitAssign(Tables.embeddings(s, dir), "vec_id", "embedding",
          k = 8, iters = 2)
        .orderBy(col("vec_id")),
    oracle = Some("""
      WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                 x -> CAST(round(CAST(x AS DOUBLE) * 1000000, 0) AS BIGINT)) AS v
        FROM embeddings),
      seeded AS (
        SELECT vec_id, v,
               CAST(('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))
                 AS BIGINT) % 1000000 AS r
        FROM q),
      init AS (
        SELECT CAST(row_number() OVER (ORDER BY r, vec_id) AS INTEGER) AS cid, v
        FROM seeded ORDER BY r, vec_id LIMIT 8),
      d1 AS (
        SELECT q.vec_id, c.cid,
               CAST(list_sum(list_transform(range(1, 65),
                 i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS BIGINT) AS dist
        FROM q CROSS JOIN init c),
      a1 AS (
        SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
          FROM d1) WHERE rk = 1),
      m1 AS (
        SELECT a1.cid, t.i, CAST(sum(q.v[t.i]) AS BIGINT) // count(*) AS ci
        FROM a1 JOIN q USING (vec_id)
        CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS i) t
        GROUP BY 1, 2),
      c1 AS (
        SELECT init.cid, coalesce(m.nv, init.v) AS v
        FROM init LEFT JOIN (
          SELECT cid, list(ci ORDER BY i) AS nv FROM m1 GROUP BY 1) m
          USING (cid)),
      d2 AS (
        SELECT q.vec_id, c.cid,
               CAST(list_sum(list_transform(range(1, 65),
                 i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS BIGINT) AS dist
        FROM q CROSS JOIN c1 c),
      a2 AS (
        SELECT vec_id, cid FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
          FROM d2) WHERE rk = 1),
      m2 AS (
        SELECT a2.cid, t.i, CAST(sum(q.v[t.i]) AS BIGINT) // count(*) AS ci
        FROM a2 JOIN q USING (vec_id)
        CROSS JOIN (SELECT CAST(unnest(range(1, 65)) AS INTEGER) AS i) t
        GROUP BY 1, 2),
      c2 AS (
        SELECT c1.cid, coalesce(m.nv, c1.v) AS v
        FROM c1 LEFT JOIN (
          SELECT cid, list(ci ORDER BY i) AS nv FROM m2 GROUP BY 1) m
          USING (cid)),
      dF AS (
        SELECT q.vec_id, c.cid,
               CAST(list_sum(list_transform(range(1, 65),
                 i -> (q.v[i] - c.v[i]) * (q.v[i] - c.v[i]))) AS BIGINT) AS dist
        FROM q CROSS JOIN c2 c)
      SELECT vec_id, cid AS cluster, dist AS dist_sq_micro FROM (
        SELECT vec_id, cid, dist,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
        FROM dF) WHERE rk = 1
      ORDER BY vec_id"""))

  /** q108: winnowing fingerprint match report (Winnowing.matchPairs)
    * — MOSS-style near-verbatim-reuse detection: 4-gram hashes, window
    * 4, rightmost-min tie-break packed into one integer key so the SQL
    * oracle reproduces the selected fingerprint set exactly. maxDf
    * guard OFF at this call site (the oracle models the unguarded
    * report — the q27/q69 convention for guarded operators). */
  private val q108 = QuerySpec(
    "q108_winnow_pairs",
    (s, dir) =>
      graft.operators.Winnowing.matchPairs(Tables.documents(s, dir),
          "doc_id", "text", k = 4, w = 4, maxDf = Int.MaxValue, topN = 25),
    oracle = Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents),
      grams AS (
        SELECT doc_id, u.p AS pos, u.g AS gram, len(w) - 3 AS n_grams
        FROM (
          SELECT doc_id, w,
                 unnest(list_transform(range(1, greatest(len(w) - 2, 1)),
                   i -> {'p': i, 'g': array_to_string(w[i:i+3], ' ')})) AS u
          FROM t WHERE len(w) >= 4)),
      keyed AS (
        SELECT doc_id, pos, n_grams,
               (CAST(('0x' || substring(md5(gram), 1, 15)) AS BIGINT)
                 % 274877906944) * 33554432 + (16777216 - pos) AS key
        FROM grams),
      wmin AS (
        SELECT doc_id, pos, n_grams,
               min(key) OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wkey
        FROM keyed),
      fp AS (
        SELECT DISTINCT doc_id, wkey // 33554432 AS fp_hash
        FROM wmin WHERE pos <= greatest(n_grams - 3, 1)),
      pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(count(*) AS BIGINT) AS n_shared
        FROM fp a JOIN fp b
          ON a.fp_hash = b.fp_hash AND a.doc_id < b.doc_id
        GROUP BY 1, 2)
      SELECT doc_a, doc_b, n_shared
      FROM pairs ORDER BY n_shared DESC, doc_a, doc_b LIMIT 25"""))

  /** q109: integer-exact PageRank (GraphOps.pageRank) — authority
    * weighting over the customer→supplier purchase graph (orders ⋈
    * lineitem, two power-iteration rounds), the link-side curation
    * signal. All arithmetic is truncating-integer micro-units, so the
    * oracle unrolls the same two rounds exactly. */
  private val q109 = QuerySpec(
    "q109_pagerank",
    (s, dir) => {
      val o = Tables.orders(s, dir)
      val l = Tables.lineitem(s, dir)
      val edges = o.join(l, col("l_orderkey") === col("o_orderkey"))
        .select(concat(lit("c"), col("o_custkey").cast("string")).as("src"),
          concat(lit("s"), col("l_suppkey").cast("string")).as("dst"))
      graft.operators.GraphOps.pageRank(edges, "src", "dst", iters = 2)
        .orderBy(col("rank_micro").desc, col("node"))
        .limit(25)
    },
    oracle = Some("""
      WITH edges AS (
        SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                        's' || CAST(l.l_suppkey AS VARCHAR) AS dst
        FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
      nodes AS (
        SELECT src AS node FROM edges UNION SELECT dst FROM edges),
      outdeg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
      r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
      i1 AS (
        SELECT e.dst AS node, sum(r0.r // od.d) AS m
        FROM edges e
        JOIN r0 ON r0.node = e.src
        JOIN outdeg od ON od.src = e.src
        GROUP BY 1),
      r1 AS (
        SELECT n.node,
               CAST(150000 + (8500 * coalesce(i1.m, 0)) // 10000 AS BIGINT) AS r
        FROM nodes n LEFT JOIN i1 ON i1.node = n.node),
      i2 AS (
        SELECT e.dst AS node, sum(r1.r // od.d) AS m
        FROM edges e
        JOIN r1 ON r1.node = e.src
        JOIN outdeg od ON od.src = e.src
        GROUP BY 1),
      r2 AS (
        SELECT n.node,
               CAST(150000 + (8500 * coalesce(i2.m, 0)) // 10000 AS BIGINT) AS r
        FROM nodes n LEFT JOIN i2 ON i2.node = n.node)
      SELECT node, r AS rank_micro FROM r2
      ORDER BY r DESC, node LIMIT 25"""))

  /** q127: exact phrase search under the oracle —
    * [[graft.operators.Retrieval.phraseSearch]] for the phrase
    * "table table": a REPEATED-word phrase on purpose, the case naive
    * position joins get wrong, with overlapping runs in the corpus
    * ("table table table" counts twice). DuckDB replays the whole
    * anchor-vote algebra: same whitespace tokenizer (the q20
    * convention), per-(pos, i) votes on pos − i, complete-vote anchors
    * counted per doc. Positions are 0-based in Spark and 1-based in
    * DuckDB — anchors differ by a constant, counts are identical,
    * and only counts are emitted. */
  private val q127 = QuerySpec(
    "q127_phrase_search",
    (s, dir) =>
      graft.operators.Retrieval.phraseSearch(Tables.documents(s, dir),
          "doc_id", "text", Seq("table", "table"))
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents)),
      ph(i, w) AS (VALUES (0, 'table'), (1, 'table')),
      aligned AS (
        SELECT doc_id, pos - i AS anchor
        FROM toks JOIN ph ON tok = w),
      occ AS (
        SELECT doc_id, anchor FROM aligned
        GROUP BY doc_id, anchor HAVING count(*) = 2)
      SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ
      FROM occ GROUP BY doc_id ORDER BY doc_id"""))

  /** The three ranking replays (BM25 / query likelihood / embedding
    * kNN, each top-50) shared by the q165 and q171 fusion oracles —
    * byte-identical to q165's original inline prefix. */
  private val triModalRankingsSql: String = """
      WITH dl AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> '')) AS BIGINT) AS dl
        FROM documents),
      stats AS (
        SELECT count(*) AS n_docs, CAST(sum(dl) AS BIGINT) AS dl_sum FROM dl),
      toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> '')) AS token
        FROM documents),
      hits AS (
        SELECT doc_id, token, count(*) AS tf FROM toks
        WHERE token IN ('spark', 'window', 'merge') GROUP BY 1, 2),
      dfr AS (
        SELECT token,
               CAST(round(ln(1.0 + (CAST(n_docs AS DOUBLE) - cdf + 0.5)
                 / (cdf + 0.5)) * 1000000, 0) AS BIGINT) AS idf_micro
        FROM (SELECT token, count(*) AS cdf FROM hits GROUP BY 1)
        CROSS JOIN stats),
      con AS (
        SELECT h.doc_id,
               CAST(round(CAST(idf_micro AS DOUBLE) *
                 (tf * (1.2 + 1) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl))),
                 0) AS BIGINT) AS c
        FROM hits h
        JOIN dl USING (doc_id) JOIN dfr USING (token)
        CROSS JOIN (SELECT CAST(dl_sum AS DOUBLE) / n_docs AS avgdl FROM stats)),
      bm AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY sm DESC, doc_id)
                 AS INTEGER) AS rank
        FROM (SELECT doc_id, sum(c) AS sm FROM con GROUP BY 1
              ORDER BY sm DESC, doc_id LIMIT 50) x),
      qct AS (SELECT CAST(sum(dl) AS BIGINT) AS ct FROM dl),
      qstats AS (
        SELECT token, CAST(sum(tf) AS BIGINT) AS cf FROM hits GROUP BY token),
      qcon AS (
        SELECT l.doc_id,
               CAST(round(ln(
                 (CAST(coalesce(h.tf, 0) AS DOUBLE)
                   + (2000.0 * s.cf) / (SELECT ct FROM qct))
                 / (CAST(l.dl AS DOUBLE) + 2000.0)) * 1000000, 0) AS BIGINT)
                 AS c_micro
        FROM dl l
        CROSS JOIN qstats s
        LEFT JOIN hits h ON h.doc_id = l.doc_id AND h.token = s.token),
      ql AS (
        SELECT doc_id,
               CAST(row_number() OVER (ORDER BY sm DESC, doc_id)
                 AS INTEGER) AS rank
        FROM (SELECT doc_id, sum(c_micro) AS sm FROM qcon GROUP BY 1
              ORDER BY sm DESC, doc_id LIMIT 50) x),
      knn AS (
        SELECT c_id AS doc_id, rank FROM (
          SELECT b.vec_id AS c_id,
                 CAST(row_number() OVER (ORDER BY
                   list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
                                          CAST(b.embedding AS DOUBLE[])) DESC,
                   b.vec_id) AS INTEGER) AS rank
          FROM embeddings b,
               (SELECT embedding FROM embeddings WHERE vec_id = 7) q
          WHERE b.vec_id <> 7)
        WHERE rank <= 50)"""

  /** q164: query-likelihood retrieval
    * ([[graft.operators.Retrieval.queryLikelihoodTopK]], Zhai &
    * Lafferty 2001) — the Dirichlet-smoothed LM ranking over q104's
    * query terms: absent terms penalize through the collection prior
    * (where BM25 skips them), each contribution one micro-quantized
    * fixed-order expression, top-50 replayed bit for bit. */
  private val q164 = QuerySpec(
    "q164_query_likelihood",
    (s, dir) =>
      graft.operators.Retrieval.queryLikelihoodTopK(
        Tables.documents(s, dir), "doc_id", "text",
        Seq("spark", "window", "merge"), k = 50),
    oracle = Some(graft.operators.Retrieval.queryLikelihoodOracle(
      "documents", "doc_id", "text", Seq("spark", "window", "merge"),
      k = 50)))

  /** q165: tri-modal retrieval fusion — BM25 (probabilistic), query
    * likelihood (language-model), and embedding kNN (semantic) rank
    * the same need, fused by integer RRF: the production multi-ranker
    * shape (each model misses differently; fusion is robust to any
    * one's blind spot). Pure composition of q104/q164/q31 machinery
    * through [[graft.operators.Retrieval.rrfFuse]]; the oracle chains
    * all three replays and the integer fusion. */
  private val q165 = QuerySpec(
    "q165_trimodal_fusion",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val bm = Retrieval.bm25TopK(docs, "doc_id", "text", QueryTerms, k = 50)
        .select(col("doc_id"), col("rank"))
      val ql = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
          QueryTerms, k = 50)
        .select(col("doc_id"), col("rank"))
      val knn = Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") === 7), "vec_id", "embedding", k = 50)
        .select(col("c_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuse(Seq(bm, ql, knn), "doc_id", k = 20)
        .orderBy(col("rank"))
    },
    oracle = Some(triModalRankingsSql + """,
      uni AS (
        SELECT doc_id, 1000000 // (60 + rank) AS r FROM bm
        UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM ql
        UNION ALL SELECT doc_id, 1000000 // (60 + rank) FROM knn),
      f AS (
        SELECT doc_id, CAST(count(*) AS INTEGER) AS n_lists,
               CAST(sum(r) AS BIGINT) AS rrf_micro
        FROM uni GROUP BY 1
        ORDER BY rrf_micro DESC, doc_id LIMIT 20)
      SELECT CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
               AS INTEGER) AS rank,
             doc_id, n_lists, rrf_micro,
             round(CAST(rrf_micro AS DOUBLE) / 1000000.0, 6) AS rrf_score
      FROM f ORDER BY rank"""))

  /** q171: WEIGHTED tri-modal fusion
    * ([[graft.operators.Retrieval.rrfFuseWeighted]]) — q165 with the
    * ranker mix as DATA: lexical-heavy 1.5×/1.0×/0.5× basis-point
    * weights (the tuning a lexical-benchmark deployment would ship),
    * every contribution (wBp·⌊10⁶/(c+rank)⌋) div 10⁴ exact. The
    * oracle reuses q165's three ranking replays and applies the same
    * integer weighting. */
  private val q171 = QuerySpec(
    "q171_weighted_fusion",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val emb = Tables.embeddings(s, dir)
      val bm = Retrieval.bm25TopK(docs, "doc_id", "text", QueryTerms, k = 50)
        .select(col("doc_id"), col("rank"))
      val ql = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
          QueryTerms, k = 50)
        .select(col("doc_id"), col("rank"))
      val knn = Similarity.bruteForceTopK(
          emb, emb.filter(col("vec_id") === 7), "vec_id", "embedding", k = 50)
        .select(col("c_id").as("doc_id"), col("rank"))
      Retrieval.rrfFuseWeighted(
          Seq((bm, 15000L), (ql, 10000L), (knn, 5000L)), "doc_id", k = 20)
        .orderBy(col("rank"))
    },
    oracle = Some(triModalRankingsSql + """,
      uni AS (
        SELECT doc_id, (15000 * (1000000 // (60 + rank))) // 10000 AS r FROM bm
        UNION ALL SELECT doc_id, (10000 * (1000000 // (60 + rank))) // 10000 FROM ql
        UNION ALL SELECT doc_id, (5000 * (1000000 // (60 + rank))) // 10000 FROM knn),
      f AS (
        SELECT doc_id, CAST(count(*) AS INTEGER) AS n_lists,
               CAST(sum(r) AS BIGINT) AS rrf_micro
        FROM uni GROUP BY 1
        ORDER BY rrf_micro DESC, doc_id LIMIT 20)
      SELECT CAST(row_number() OVER (ORDER BY rrf_micro DESC, doc_id)
               AS INTEGER) AS rank,
             doc_id, n_lists, rrf_micro,
             round(CAST(rrf_micro AS DOUBLE) / 1000000.0, 6) AS rrf_score
      FROM f ORDER BY rank"""))

  val specs: Seq[QuerySpec] =
    Seq(q103, q104, q105, q106, q107, q108, q109, q127, q164, q165, q171)
}
