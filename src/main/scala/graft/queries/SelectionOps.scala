package graft.queries

import graft.Tables
import graft.operators.{KMeans, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Selection-and-evaluation family: weighted corpus sampling (q117,
  * q120), the declarative session-window operator in oracle-checkable
  * batch form (q118), ANN recall measurement (q119), NFC normalization
  * audit (q121), contrastive hard-negative mining (q122), and the
  * incremental-ingest snapshot diff (q123) — the pieces that decide
  * WHAT a training run sees, segment user activity, quantify what an
  * approximate index loses versus ground truth, and bound what a daily
  * re-ingest must reprocess.
  */
object SelectionOps {

  /** q117: A-ES weighted sampling ([[Sampling.weightedSample]]) — the
    * top-50 documents under n_chars-proportional inclusion (longer
    * docs more likely, the usual proxy for token-weighted corpus
    * subsampling). The portable md5 uniform is passed at this call
    * site so DuckDB replays the exact draw (the production default is
    * the cheaper xxhash64); the emitted `es_key` is the quantized
    * nano-log A-ES key itself, so the oracle re-derives the full
    * ordering evidence, not just the survivor set. */
  private val q117 = QuerySpec(
    "q117_weighted_sample",
    (s, dir) =>
      Sampling.weightedSample(Tables.documents(s, dir), "doc_id", "n_chars",
          k = 50, seed = 42L, uniform = Sampling.md5Uniform)
        .select(col("doc_id"), col("source"), col("n_chars"), col("es_key"))
        .orderBy(col("es_key").desc, col("doc_id")),
    oracle = Some("""
      WITH keyed AS (
        SELECT doc_id, source, n_chars,
               CAST(floor(ln((CAST(concat('0x',
                        substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 12))
                        AS BIGINT) + 0.5) / 281474976710656.0)
                      / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS es_key
        FROM documents
        WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0)
      SELECT doc_id, source, n_chars, es_key
      FROM keyed
      ORDER BY es_key DESC, doc_id
      LIMIT 50"""))

  /** q118: gap-based sessionization via the DECLARATIVE session_window
    * operator (30-minute gap) — the engine-native counterpart of q56's
    * hand-built lag/flag/cumsum sessions, and the batch form of the
    * streaming sessionizer (StreamOps.sessionWindowAgg uses the same
    * operator). NOT bit-identical to q56: session_window splits at
    * `diff >= gap` on full microsecond timestamps (window end
    * exclusive), while q56 tests `diff > gap` on SECOND-truncated
    * unix_timestamps — two session definitions that disagree on
    * sub-second gaps around the boundary; each query carries its own
    * oracle of its own definition. The oracle here mirrors
    * `diff >= gap` at full precision. Timestamps leave as formatted
    * strings (FIXTURES §C). Scale shape: one shuffle on user_id, then
    * per-key ordered merge — identical to what the hand-built window
    * variant costs; no extra stage for the native operator. */
  private val q118 = QuerySpec(
    "q118_session_native",
    (s, dir) =>
      Tables.events(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
          date_format(col("w.end"), "yyyy-MM-dd HH:mm:ss").as("session_end"),
          col("n_events"))
        .orderBy(col("user_id"), col("session_start")),
    oracle = Some("""
      WITH g AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_s
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      sess AS (
        SELECT user_id, ts,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
        FROM g)
      SELECT user_id,
             strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
             CAST(count(*) AS BIGINT) AS n_events
      FROM sess
      GROUP BY user_id, sid
      ORDER BY user_id, session_start"""))

  /** q119: ANN recall@3 per query point — the evaluation harness for
    * the approximate index family: exact brute-force top-3 (q31's
    * oracle-proven baseline) LEFT-joined against the portable SRP-LSH
    * top-3 (q74's md5-derived planes), n_hit = |exact ∩ lsh| per
    * query. recall3 is the exact rational n_hit/3 rounded to 4 — no
    * float accumulation. Whole-corpus mean ≈ 0.92 on the testdata
    * (the 1−(1−p⁴)¹⁶ analysis at q32). The exact side is the O(n²)
    * baseline — an EVALUATION query by construction, run on a sampled
    * slice at scale (the estimator needs only enough query points for
    * a confidence interval, not the whole corpus); the LSH side is
    * the sub-quadratic production path being graded. */
  private val q119 = QuerySpec(
    "q119_ann_recall",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val exact = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
        .select(col("q_id"), col("c_id"))
      val lsh = Similarity.lshTopK(e, "vec_id", "embedding",
          k = 3, tables = 16, planes = 4,
          component = Similarity.portablePlaneComponent)
        .select(col("q_id"), col("c_id"), lit(1L).as("hit"))
      exact.join(lsh, Seq("q_id", "c_id"), "left")
        .groupBy(col("q_id"))
        .agg(sum(coalesce(col("hit"), lit(0L))).as("n_hit"))
        .select(col("q_id"), col("n_hit"),
          round(col("n_hit").cast("double") / 3.0, 4).as("recall3"))
        .orderBy(col("q_id"))
    },
    oracle = Some("""
      WITH dims AS (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
               unnest(embedding)::DOUBLE AS v
        FROM embeddings),
      comps AS (
        SELECT t AS tbl, p AS pl, d AS dim,
               (('0x' || substring(md5(CAST(t AS VARCHAR) || '_' || CAST(p AS VARCHAR) || '_' || CAST(d AS VARCHAR)), 1, 15))::BIGINT
                 % 2000000) / 1000000.0 - 1.0 AS w
        FROM range(16) rt(t), range(4) rp(p), range(64) rd(d)),
      dots AS (
        SELECT dims.vec_id, comps.tbl, comps.pl, sum(dims.v * comps.w) AS dot
        FROM dims JOIN comps ON comps.dim = dims.dim
        GROUP BY 1, 2, 3),
      buckets AS (
        SELECT vec_id, tbl,
               CAST(sum(CASE WHEN dot >= 0 THEN (1::BIGINT << pl) ELSE 0::BIGINT END) AS BIGINT) AS bucket
        FROM dots GROUP BY 1, 2),
      cands AS (
        SELECT DISTINCT a.vec_id AS q_id, b.vec_id AS c_id
        FROM buckets a JOIN buckets b
          ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.vec_id <> b.vec_id),
      scored AS (
        SELECT q_id, c_id,
               list_cosine_similarity(CAST(qa.embedding AS DOUBLE[]),
                                      CAST(ca.embedding AS DOUBLE[])) AS sim
        FROM cands
        JOIN embeddings qa ON qa.vec_id = q_id
        JOIN embeddings ca ON ca.vec_id = c_id),
      lsh AS (
        SELECT q_id, c_id FROM (
          SELECT q_id, c_id,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, c_id ASC) AS rank
          FROM scored)
        WHERE rank <= 3),
      exact AS (
        SELECT q_id, c_id FROM (
          SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                     CAST(b.embedding AS DOUBLE[])) DESC, b.vec_id ASC) AS rank
          FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
        WHERE rank <= 3)
      SELECT e.q_id AS q_id,
             CAST(count(l.c_id) AS BIGINT) AS n_hit,
             round(CAST(count(l.c_id) AS DOUBLE) / 3.0, 4) AS recall3
      FROM exact e LEFT JOIN lsh l ON l.q_id = e.q_id AND l.c_id = e.c_id
      GROUP BY e.q_id
      ORDER BY q_id"""))

  /** q120: balanced per-source A-ES —
    * [[Sampling.weightedSamplePerGroup]] keeps the 5 highest-keyed
    * docs of EVERY source (q117's keys, grouped), the balanced form a
    * per-source eval slice needs where the global heap would let one
    * huge source crowd out the rest. The rank ≤ 5 filter is planned as
    * WindowGroupLimit: a per-partition top-5 heap runs BEFORE the
    * group-key shuffle (plan-audited), so the exchanged volume is
    * ≤ 5·partitions rows per source, not the corpus. */
  private val q120 = QuerySpec(
    "q120_group_sample",
    (s, dir) =>
      Sampling.weightedSamplePerGroup(Tables.documents(s, dir), "doc_id",
          "n_chars", "source", kPerGroup = 5, seed = 42L,
          uniform = Sampling.md5Uniform)
        .select(col("doc_id"), col("source"), col("n_chars"), col("es_key"))
        .orderBy(col("source"), col("es_key").desc, col("doc_id")),
    oracle = Some("""
      WITH keyed AS (
        SELECT doc_id, source, n_chars,
               CAST(floor(ln((CAST(concat('0x',
                        substring(md5(CAST(doc_id AS VARCHAR) || ':42'), 1, 12))
                        AS BIGINT) + 0.5) / 281474976710656.0)
                      / CAST(n_chars AS DOUBLE) * 1e9) AS BIGINT) AS es_key
        FROM documents
        WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0),
      ranked AS (
        SELECT doc_id, source, n_chars, es_key,
               row_number() OVER (PARTITION BY source
                 ORDER BY es_key DESC, doc_id ASC) AS rk
        FROM keyed)
      SELECT doc_id, source, n_chars, es_key
      FROM ranked WHERE rk <= 5
      ORDER BY source, es_key DESC, doc_id"""))

  /** q121: NFC normalization audit under the oracle — every doc gets a
    * DECOMPOSED suffix (" Cafe" + combining acute U+0301; the corpus
    * itself is synthetic ASCII, so the canonical-equivalence case is
    * constructed in-query), then the native [[graft.functions.UnicodeNorm]]
    * expression composes it. The compared md5 of the normalized string
    * pins the exact output BYTES against DuckDB's nfc_normalize —
    * proving canonical composition, not just length bookkeeping. The
    * expression runs inside whole-stage codegen with an is-normalized
    * fast path (UnicodeNormSpec asserts both). */
  private val q121 = QuerySpec(
    "q121_unicode_nfc",
    (s, dir) => {
      val raw = concat(col("text"), lit(" Cafe\u0301"))
      Tables.documents(s, dir)
        .select(col("doc_id"), raw.as("raw"))
        .withColumn("nfc", graft.functions.UnicodeNorm.nfc(col("raw")))
        .select(col("doc_id"),
          length(col("raw")).cast("long").as("len_dec"),
          length(col("nfc")).cast("long").as("len_nfc"),
          (col("nfc") =!= col("raw")).as("changed"),
          md5(col("nfc")).as("nfc_hash"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH dec AS (
        SELECT doc_id, text || ' Cafe' || chr(769) AS raw
        FROM documents),
      norm AS (
        SELECT doc_id, raw, nfc_normalize(raw) AS nfc FROM dec)
      SELECT doc_id,
             CAST(length(raw) AS BIGINT) AS len_dec,
             CAST(length(nfc) AS BIGINT) AS len_nfc,
             (nfc <> raw) AS changed,
             md5(nfc) AS nfc_hash
      FROM norm
      ORDER BY doc_id"""))

  /** q122: contrastive hard-negative mining under the oracle —
    * [[Similarity.hardNegatives]] with the md5 centroid draw
    * (portableCentroidRank, the q73 machinery), so DuckDB replays the
    * ENTIRE mining run: centroid selection, nearest-2-of-8 cell
    * assignment, shared-cell candidate generation, the cross-label
    * predicate, the 0.95 false-negative ceiling, and the exact cosine
    * top-5. This is the query that builds contrastive training batches:
    * rank-1 is the hardest usable negative for each anchor. The cosine
    * doubles agree between engines (the q31/q73 sequential-kernel
    * precedent); rank ties break on candidate id in both.
    *
    * The ceiling is 0.35 HERE, not the production-default 0.95: this
    * synthetic corpus's hottest cross-label pair sits at cosine ≈0.51,
    * so 0.95 would be vacuous and the oracle would never witness the
    * excision semantics. At 0.35 the cap provably bites (the top of
    * the unfiltered ranking is cut) while every anchor still fills
    * k=5. SimilaritySpec pins the default-ceiling behavior on a
    * planted near-identical cross-label pair. */
  private val q122 = QuerySpec(
    "q122_hard_negatives",
    (s, dir) =>
      Similarity.hardNegatives(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label", k = 5, nCells = 8, nProbe = 2,
          ceiling = 0.35,
          centroidRank = Similarity.portableCentroidRank)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("sim"), 4).as("sim"))
        .orderBy(col("q_id"), col("rank")),
    oracle = Some("""
      WITH cent AS (
        SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cvec
        FROM embeddings
        ORDER BY ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 1000000,
                 vec_id
        LIMIT 8),
      assign AS (
        SELECT id, cell FROM (
          SELECT e.vec_id AS id, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                            c.cell ASC) AS rnk
          FROM embeddings e CROSS JOIN cent c)
        WHERE rnk <= 2),
      cands AS (
        SELECT DISTINCT a.id AS q_id, b.id AS c_id
        FROM assign a JOIN assign b ON a.cell = b.cell AND a.id <> b.id),
      scored AS (
        SELECT q_id, c_id,
               list_cosine_similarity(CAST(qa.embedding AS DOUBLE[]),
                                      CAST(ca.embedding AS DOUBLE[])) AS sim
        FROM cands
        JOIN embeddings qa ON qa.vec_id = q_id
        JOIN embeddings ca ON ca.vec_id = c_id
        WHERE qa.label <> ca.label)
      SELECT q_id, rank, c_id, round(sim, 4) AS sim FROM (
        SELECT q_id, c_id, sim,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, c_id ASC) AS INTEGER) AS rank
        FROM scored WHERE sim < 0.35)
      WHERE rank <= 5
      ORDER BY q_id, rank"""))

  /** q123: snapshot diff under the oracle — two corpus versions are
    * constructed in-query from the documents table (every 10th doc
    * missing from prev = `added`; every doc_id%10==3 missing from cur
    * = `removed`; every 7th surviving doc gets a " v2" suffix in cur =
    * `changed`; the rest `unchanged`), then
    * [[graft.operators.SnapshotDiff.diff]] classifies them. The md5
    * fingerprint is passed at this call site (production default is
    * the cheaper xxhash64) so DuckDB replays the exact comparison,
    * fingerprints included — not just the membership algebra. All four
    * statuses occur on this corpus (343/57/50/50 at sf0.01). */
  private val q123 = QuerySpec(
    "q123_snapshot_diff",
    (s, dir) => {
      val docs = Tables.documents(s, dir).select(col("doc_id"), col("text"))
      val prev = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val cur = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
        .withColumn("text",
          when(pmod(col("doc_id"), lit(7)) === 0,
              concat(col("text"), lit(" v2")))
            .otherwise(col("text")))
      graft.operators.SnapshotDiff.diff(prev, cur, "doc_id", "text",
          fingerprint = md5(_))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },
    oracle = Some("""
      WITH prev AS (
        SELECT doc_id, md5(coalesce(text, '')) AS fa
        FROM documents WHERE doc_id % 10 <> 0),
      cur AS (
        SELECT doc_id,
               md5(coalesce(CASE WHEN doc_id % 7 = 0 THEN text || ' v2'
                                 ELSE text END, '')) AS fb
        FROM documents WHERE doc_id % 10 <> 3),
      j AS (
        SELECT coalesce(p.doc_id, c.doc_id) AS doc_id, fa, fb
        FROM prev p FULL OUTER JOIN cur c ON p.doc_id = c.doc_id)
      SELECT doc_id,
             CASE WHEN fa IS NULL THEN 'added'
                  WHEN fb IS NULL THEN 'removed'
                  WHEN fa = fb THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM j ORDER BY doc_id"""))

  /** q124: ratio-margin pair mining under the oracle —
    * [[Similarity.marginRescore]] over the exact self-kNN (k=3), the
    * Artetxe–Schwenk criterion that rescales each candidate cosine by
    * the two endpoints' neighborhood means so hub vectors stop winning
    * on raw similarity. Integer-exact end to end: sims quantize to
    * 1e-6 units, neighborhood sums add exactly (DuckDB's HUGEINT sum
    * cast back), and the 1e-4-unit margin uses truncating division in
    * both engines (`div` ≡ `//`). The result visibly REORDERS pairs
    * relative to raw cosine on this corpus — the hub correction doing
    * its job under the oracle's eyes. */
  private val q124 = QuerySpec(
    "q124_margin_pairs",
    (s, dir) => {
      val e = Tables.embeddings(s, dir)
      val knn = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
      Similarity.marginRescore(knn, 3)
        .select(col("q_id"), col("c_id"), round(col("sim"), 4).as("sim"),
          col("margin_u"))
        .orderBy(col("q_id"), col("margin_u").desc, col("c_id"))
    },
    oracle = Some("""
      WITH scored AS (
        SELECT a.vec_id AS q_id, b.vec_id AS c_id,
               list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(b.embedding AS DOUBLE[])) AS sim
        FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id),
      knn AS (
        SELECT q_id, c_id, sim,
               CAST(round(sim * 1000000) AS BIGINT) AS sim_u FROM (
          SELECT q_id, c_id, sim,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, c_id ASC) AS rnk
          FROM scored)
        WHERE rnk <= 3),
      nb AS (
        SELECT q_id, CAST(sum(sim_u) AS BIGINT) AS nbsum
        FROM knn GROUP BY q_id)
      SELECT k.q_id, k.c_id, round(k.sim, 4) AS sim,
             CASE WHEN nq.nbsum + nc.nbsum = 0 THEN NULL
                  ELSE (2 * 3 * k.sim_u * 10000) // (nq.nbsum + nc.nbsum)
             END AS margin_u
      FROM knn k
      JOIN nb nq ON nq.q_id = k.q_id
      JOIN nb nc ON nc.q_id = k.c_id
      ORDER BY k.q_id, margin_u DESC, k.c_id"""))

  /** q125: per-source distribution drift under the oracle —
    * [[graft.operators.CorpusStats.distributionDrift]] between the two
    * q123-style snapshot versions (cur additionally DOUBLES every 7th
    * doc's text, a realistic extraction regression), total-variation
    * distance over 200-char-wide length histograms in exact 1e-4
    * units. On this corpus the drifted sources land at 800–1600
    * (different mutation density per source), the stable shape reads
    * 0, and sources present on only one side read NULL — existence is
    * q123's job, shape is this query's. Every arithmetic step is
    * integer (DECIMAL(38,0) cross-products vs DuckDB HUGEINT,
    * truncating div), so the oracle matches bit-for-bit. */
  private val q125 = QuerySpec(
    "q125_dist_drift",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), col("source"), col("text"))
      val prev = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      val cur = docs.filter(pmod(col("doc_id"), lit(10)) =!= 3)
        .withColumn("text", when(pmod(col("doc_id"), lit(7)) === 0,
            concat(col("text"), lit(" "), col("text")))
          .otherwise(col("text")))
      graft.operators.CorpusStats.distributionDrift(
          prev.withColumn("len", length(col("text")).cast("long")),
          cur.withColumn("len", length(col("text")).cast("long")),
          "source", "len", bucketWidth = 200L)
        .select(col("grp").as("source"), col("n_prev"), col("n_cur"),
          col("tvd_u"))
        .orderBy("source")
    },
    oracle = Some("""
      WITH prev AS (
        SELECT source, length(text) AS v
        FROM documents WHERE doc_id % 10 <> 0),
      cur AS (
        SELECT source, length(CASE WHEN doc_id % 7 = 0 THEN text || ' ' || text
                                   ELSE text END) AS v
        FROM documents WHERE doc_id % 10 <> 3),
      ha AS (SELECT source, v // 200 AS bucket, count(*) AS ca
             FROM prev GROUP BY 1, 2),
      hb AS (SELECT source, v // 200 AS bucket, count(*) AS cb
             FROM cur GROUP BY 1, 2),
      j AS (
        SELECT coalesce(a.source, b.source) AS source,
               coalesce(a.bucket, b.bucket) AS bucket,
               coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
        FROM ha a FULL OUTER JOIN hb b
          ON a.source = b.source AND a.bucket = b.bucket),
      tot AS (
        SELECT source, CAST(sum(ca) AS HUGEINT) AS na,
               CAST(sum(cb) AS HUGEINT) AS nb
        FROM j GROUP BY 1),
      agg AS (
        SELECT j.source, na, nb,
               sum(abs(CAST(ca AS HUGEINT) * nb - CAST(cb AS HUGEINT) * na)) AS num
        FROM j JOIN tot ON j.source = tot.source
        GROUP BY 1, 2, 3)
      SELECT source, CAST(na AS BIGINT) AS n_prev, CAST(nb AS BIGINT) AS n_cur,
             CASE WHEN na = 0 OR nb = 0 THEN NULL
                  ELSE CAST((num * 10000) // (2 * na * nb) AS BIGINT)
             END AS tvd_u
      FROM agg ORDER BY source"""))

  /** q126: contrastive triplet assembly under the oracle —
    * [[Similarity.contrastiveTriplets]] with the q73/q122 portable
    * centroid draw: per anchor the nearest same-label positive and the
    * hard-negative top-5 (q122's ceiling-0.35 semantics) assembled
    * into the (anchor, positive, negatives[]) training rows, all from
    * ONE shared scored-candidate pass. DuckDB replays both branches
    * and the ordered negative array (hardest first, id tie-break);
    * pos_sim rounds to 4 places, and on this corpus every anchor
    * fills both branches — the NULL-positive / empty-negatives
    * degenerate shapes are pinned by SimilaritySpec fixtures
    * instead. The negative list is projected to a comma-joined string
    * at the oracle boundary (`neg_ids_csv`) because the driver's
    * hash comparison cannot factorize array cells. */
  private val q126 = QuerySpec(
    "q126_triplets",
    (s, dir) =>
      Similarity.contrastiveTriplets(Tables.embeddings(s, dir),
          "vec_id", "embedding", "label", kNeg = 5, nCells = 8, nProbe = 2,
          ceiling = 0.35,
          centroidRank = Similarity.portableCentroidRank)
        .select(col("anchor_id"), col("pos_id"),
          round(col("pos_sim"), 4).as("pos_sim"),
          array_join(col("neg_ids").cast("array<string>"), ",")
            .as("neg_ids_csv"))
        .orderBy(col("anchor_id")),
    oracle = Some("""
      WITH cent AS (
        SELECT vec_id AS cell, CAST(embedding AS DOUBLE[]) AS cvec
        FROM embeddings
        ORDER BY ('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 15))::BIGINT % 1000000,
                 vec_id
        LIMIT 8),
      assign AS (
        SELECT id, cell FROM (
          SELECT e.vec_id AS id, c.cell,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cvec) DESC,
                            c.cell ASC) AS rnk
          FROM embeddings e CROSS JOIN cent c)
        WHERE rnk <= 2),
      cands AS (
        SELECT DISTINCT a.id AS q_id, b.id AS c_id
        FROM assign a JOIN assign b ON a.cell = b.cell AND a.id <> b.id),
      scored AS (
        SELECT q_id, c_id, qa.label AS ql, ca.label AS cl,
               list_cosine_similarity(CAST(qa.embedding AS DOUBLE[]),
                                      CAST(ca.embedding AS DOUBLE[])) AS sim
        FROM cands
        JOIN embeddings qa ON qa.vec_id = q_id
        JOIN embeddings ca ON ca.vec_id = c_id),
      pos AS (
        SELECT q_id, c_id AS pos_id, round(sim, 4) AS pos_sim FROM (
          SELECT q_id, c_id, sim,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, c_id ASC) AS rnk
          FROM scored WHERE ql = cl)
        WHERE rnk = 1),
      neg AS (
        SELECT q_id, list(c_id ORDER BY sim DESC, c_id ASC) AS neg_ids FROM (
          SELECT q_id, c_id, sim,
                 row_number() OVER (PARTITION BY q_id
                   ORDER BY sim DESC, c_id ASC) AS rnk
          FROM scored WHERE ql <> cl AND sim < 0.35)
        WHERE rnk <= 5
        GROUP BY q_id)
      SELECT coalesce(p.q_id, n.q_id) AS anchor_id, pos_id, pos_sim,
             array_to_string(coalesce(neg_ids, CAST([] AS BIGINT[])), ',')
               AS neg_ids_csv
      FROM pos p FULL OUTER JOIN neg n ON p.q_id = n.q_id
      ORDER BY anchor_id"""))

  /** q140: cluster-balanced selection — the diversity-flattening
    * curation recipe (cluster the embedding space, then draw EQUAL
    * per-cluster samples so over-represented modes can't dominate the
    * training mix; the cluster-and-sample step in SemDeDup-class
    * pipelines): [[KMeans.fitAssign]]'s integer k-means (q107, oracle-
    * proven) composed with the portable per-group A-ES draw
    * ([[Sampling.weightedSamplePerGroup]] at weight 1 — uniform within
    * the cluster, q117's md5 key). Both stages already carry oracles;
    * this row proves the COMPOSITION bit-for-bit: DuckDB re-trains the
    * clustering and replays each cluster's sample walk. Scale shape:
    * the k-means pass (bounded model round-trips) + ONE cluster-key
    * window over ≤ n rows — no new shuffles beyond the components'. */
  private val q140 = QuerySpec(
    "q140_cluster_balanced",
    (s, dir) => {
      val assigned = KMeans.fitAssign(Tables.embeddings(s, dir),
          "vec_id", "embedding", k = 8, iters = 2)
        .select(col("vec_id"), col("cluster"))
      Sampling.weightedSamplePerGroup(
          assigned.withColumn("w", lit(1.0)), "vec_id", "w", "cluster",
          kPerGroup = 20, seed = 42L, uniform = Sampling.md5Uniform)
        .select(col("cluster"), col("vec_id"), col("es_key"))
        .orderBy(col("cluster"), col("vec_id"))
    },
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
        FROM q CROSS JOIN c2 c),
      aF AS (
        SELECT vec_id, cid AS cluster FROM (
          SELECT vec_id, cid,
                 row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rk
          FROM dF) WHERE rk = 1),
      keyed AS (
        SELECT vec_id, cluster,
               CAST(floor(ln((CAST(concat('0x',
                        substring(md5(CAST(vec_id AS VARCHAR) || ':42'), 1, 12))
                        AS BIGINT) + 0.5) / 281474976710656.0)
                      / 1.0 * 1e9) AS BIGINT) AS es_key
        FROM aF),
      pick AS (
        SELECT cluster, vec_id, es_key FROM (
          SELECT cluster, vec_id, es_key,
                 row_number() OVER (PARTITION BY cluster
                   ORDER BY es_key DESC, vec_id) AS rk
          FROM keyed) WHERE rk <= 20)
      SELECT cluster, vec_id, es_key FROM pick
      ORDER BY cluster, vec_id"""))

  val specs: Seq[QuerySpec] =
    Seq(q117, q118, q119, q120, q121, q122, q123, q124, q125, q126, q140)
}
