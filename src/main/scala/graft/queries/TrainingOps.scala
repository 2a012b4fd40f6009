package graft.queries

import graft.Tables
import graft.functions.{ScalarFns, TextFns}
import graft.operators.Similarity
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-3 training-data operators: PII redaction, repetition-based
  * quality signals, quantized ANN, and deterministic per-source quota
  * sampling. All four are oracle-checked — the PII patterns are written
  * in the Java∩RE2 regex subset, the repetition fractions are exact
  * rationals, the quantized dot products are exact small integers, and
  * the quota ranks order by md5.
  */
object TrainingOps {

  /** q77: PII redaction audit. The corpus text is digit-free, so the
    * query first APPENDS a deterministic synthetic contact line
    * (email + IPv4 + phone derived from doc_id) — the redaction then
    * provably fires on every row, and the oracle rebuilds the same
    * line. Output: per-doc PII counts plus the fully redacted text.
    * Narrow regexp work only — no shuffle at any scale. */
  private val q77 = QuerySpec(
    "q77_pii_redact",
    (s, dir) => {
      val withContact = Tables.documents(s, dir)
        .withColumn("raw",
          concat(col("text"),
            lit(" contact user"), col("doc_id"), lit("@mail.example.com"),
            lit(" from 10."), pmod(col("doc_id"), lit(200)), lit(".0.1"),
            lit(" tel +1-555-"),
            lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")))
      withContact.select(
          col("doc_id"),
          TextFns.piiCount(col("raw"), TextFns.emailRe).as("n_emails"),
          TextFns.piiCount(col("raw"), TextFns.ipv4Re).as("n_ips"),
          TextFns.piiCount(col("raw"), TextFns.phoneRe).as("n_phones"),
          TextFns.redactPii(col("raw")).as("clean"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH raw AS (
        SELECT doc_id,
               text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@mail.example.com'
                    || ' from 10.' || CAST(doc_id % 200 AS VARCHAR) || '.0.1'
                    || ' tel +1-555-'
                    || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
               AS n_emails,
             CAST(len(regexp_extract_all(raw,
               '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INTEGER)
               AS n_ips,
             CAST(len(regexp_extract_all(raw,
               '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS INTEGER) AS n_phones,
             regexp_replace(
               regexp_replace(
                 regexp_replace(raw,
                   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                   '<EMAIL>', 'g'),
                 '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
                 '<IP>', 'g'),
               '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS clean
      FROM raw
      ORDER BY doc_id"""))

  /** q78: repetition quality signals (Gopher-style) — share of the most
    * frequent token and share of duplicated word bigrams, exact
    * rational rounding. One narrow UDF pass per doc; no shuffle. */
  private val q78 = QuerySpec(
    "q78_repetition",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"), TextFns.repetitionStats(col("text")).as("r"))
        .select(
          col("doc_id"),
          col("r.n_tokens").as("n_tokens"),
          coalesce(ScalarFns.roundFrac(col("r.top_token_count").cast("long"),
            col("r.n_tokens").cast("long"), 4), lit(0.0)).as("top_token_frac"),
          coalesce(ScalarFns.roundFrac(
            (col("r.n_bigrams") - col("r.n_distinct_bigrams")).cast("long"),
            col("r.n_bigrams").cast("long"), 4), lit(0.0)).as("dup_bigram_frac"))
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents),
      tc AS (
        SELECT doc_id, x AS tok, count(*) AS c
        FROM t, unnest(w) AS u(x) GROUP BY 1, 2),
      tp AS (
        SELECT doc_id, CAST(max(c) AS BIGINT) AS topc,
               CAST(sum(c) AS BIGINT) AS n
        FROM tc GROUP BY 1),
      bm AS (
        SELECT doc_id,
               CAST(len(b) AS BIGINT) AS t2,
               CAST(len(list_distinct(b)) AS BIGINT) AS d2
        FROM (SELECT doc_id,
                CASE WHEN len(w) >= 2 THEN
                  list_transform(range(1, len(w)), i -> w[i] || ' ' || w[i+1])
                ELSE [array_to_string(w, ' ')] END AS b
              FROM t))
      -- NULL text mirrors the Spark side's NULL stats struct:
      -- n_tokens NULL, both fractions 0.0 (w IS NULL only for NULL
      -- text; empty text filters to an empty — not NULL — list)
      SELECT t.doc_id,
             CASE WHEN t.w IS NULL THEN NULL
               ELSE CAST(coalesce(tp.n, 0) AS INTEGER) END AS n_tokens,
             CASE WHEN t.w IS NULL THEN 0.0
               WHEN coalesce(tp.n, 0) > 0
               THEN CAST((tp.topc * 20000 + tp.n) // (tp.n * 2) AS DOUBLE) / 10000.0
               ELSE 0.0 END AS top_token_frac,
             CASE WHEN t.w IS NULL THEN 0.0
               WHEN bm.t2 > 0
               THEN CAST(((bm.t2 - bm.d2) * 20000 + bm.t2) // (bm.t2 * 2) AS DOUBLE) / 10000.0
               ELSE 0.0 END AS dup_bigram_frac
      FROM t
      LEFT JOIN tp ON tp.doc_id = t.doc_id
      JOIN bm ON bm.doc_id = t.doc_id
      ORDER BY t.doc_id"""))

  /** q79: int8-quantized knn top-3 (Similarity.quantizedTopK) — the
    * memory-bandwidth scale path for ANN. Quantized dot products are
    * exact integers, so the full index is oracle-checkable (unlike
    * float-cosine ranking, reproducible only by arithmetic-order
    * luck). */
  private val q79 = QuerySpec(
    "q79_ann_quantized",
    (s, dir) =>
      Similarity.quantizedTopK(Tables.embeddings(s, dir), "vec_id",
          "embedding", k = 3)
        .select(col("q_id"), col("rank"), col("c_id"), col("qdot"))
        .orderBy(col("q_id"), col("rank")),
    oracle = Some("""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               list_max(list_transform(CAST(embedding AS DOUBLE[]),
                 x -> abs(x))) AS mx
        FROM embeddings),
      q AS (
        SELECT vec_id,
               CASE WHEN mx = 0 THEN list_transform(emb, x -> 0.0)
                    ELSE list_transform(emb,
                      x -> floor(x * (127.0 / mx) + 0.5)) END AS qv
        FROM v)
      SELECT q_id, rank, c_id, qdot FROM (
        SELECT a.vec_id AS q_id, b.vec_id AS c_id,
               CAST(list_dot_product(a.qv, b.qv) AS BIGINT) AS qdot,
               CAST(row_number() OVER (PARTITION BY a.vec_id
                 ORDER BY list_dot_product(a.qv, b.qv) DESC, b.vec_id ASC)
                 AS INTEGER) AS rank
        FROM q a JOIN q b ON a.vec_id <> b.vec_id)
      WHERE rank <= 3
      ORDER BY q_id, rank"""))

  /** q80: deterministic per-source quota sampling — mixture control for
    * training corpora: at most N docs per source, chosen by md5 rank so
    * any engine reproduces the sample and reruns are stable. The window
    * shuffles once on source. A mega-source cannot flood the window
    * partition: rk <= 5 triggers WindowGroupLimit, which caps each map
    * partition's contribution to 5 rows per source BEFORE the shuffle
    * (plan-audited) — so the window sees ≤ 5·numPartitions rows per
    * source, not the source's full doc list. For PROPORTIONAL sampling
    * use Sampling.hashSplit (no window at all). */
  private val q80 = QuerySpec(
    "q80_source_quota",
    (s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      Tables.documents(s, dir)
        .withColumn("rk", row_number().over(w).cast("int"))
        .filter(col("rk") <= 5)
        .select(col("source"), col("rk"), col("doc_id"))
        .orderBy(col("source"), col("rk"))
    },
    oracle = Some("""
      SELECT source, rk, doc_id FROM (
        SELECT source, doc_id,
               CAST(row_number() OVER (PARTITION BY source
                 ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS INTEGER) AS rk
        FROM documents)
      WHERE rk <= 5
      ORDER BY source, rk"""))

  /** q81: overlapping token-window chunking (window 64, stride 32) —
    * the context-length prep step before packing (q50/q70): long
    * documents become training-sized pieces, short ones pass through
    * as a single (possibly empty) chunk. Pure narrow expressions:
    * tokenize → posexplode over the stride sequence → slice; no
    * shuffle at any corpus size. NULL text is chunked as empty (both
    * engines coalesce first). */
  private val q81 = QuerySpec(
    "q81_chunking",
    (s, dir) =>
      graft.operators.Chunking.tokenWindows(
          Tables.documents(s, dir), "doc_id", "text", window = 64, stride = 32)
        .orderBy(col("doc_id"), col("chunk_id")),
    oracle = Some("""
      WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                 x -> x <> '') AS w
        FROM documents),
      c AS (
        SELECT doc_id, w, i AS s
        FROM t, unnest(range(1, greatest(len(w) - 32, 1) + 1, 32)) AS r(i))
      SELECT doc_id,
             CAST((s - 1) // 32 AS INTEGER) AS chunk_id,
             CAST(len(w[s:s+63]) AS INTEGER) AS n_chunk_tokens,
             array_to_string(w[s:s+63], ' ') AS chunk_text
      FROM c
      ORDER BY doc_id, chunk_id"""))

  /** q82: LSH-banded decontamination (Decontaminate.nearDupLeaksLsh) —
    * q72's scale twin, the q27/q28 sharing pattern across the corpus
    * boundary: candidates come from cross-corpus MinHash band
    * collisions instead of the full co-shingle join, then exact
    * verification makes precision 1.0. At threshold 0.8 with 128
    * hashes / 32 bands the band-curve miss probability is ≈5·10⁻⁸, so
    * the output equals the exact cross-corpus pairs and shares their
    * oracle. */
  private val q82 = QuerySpec(
    "q82_decontaminate_lsh",
    (s, dir) => {
      import graft.operators.Decontaminate
      val docs = Tables.documents(s, dir)
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) < "2"
      // maxBucket unguarded: the oracle computes the exact uncapped
      // cross-corpus pair set
      Decontaminate.nearDupLeaksLsh(
          docs.filter(!isEval), docs.filter(isEval),
          "doc_id", "text", n = 3, numHashes = 128, bands = 32,
          threshold = 0.8, maxBucket = Int.MaxValue)
        .orderBy(col("eval_id"), col("train_id"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2' AS is_eval,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT doc_id, is_eval, s FROM (
          SELECT doc_id, is_eval, unnest(
            CASE WHEN len(w) >= 3 THEN
              list_transform(range(1, len(w) - 1),
                i -> array_to_string(w[i:i+2], ' '))
            ELSE [array_to_string(w, ' ')] END) AS s
          FROM toks)),
      sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
      inter AS (
        SELECT e.doc_id AS eval_id, t.doc_id AS train_id, count(*) AS isect
        FROM sh e JOIN sh t ON e.s = t.s AND e.is_eval AND NOT t.is_eval
        GROUP BY 1, 2)
      SELECT eval_id, train_id,
             round(CAST(isect AS DOUBLE) / (se.sz + st.sz - isect), 6) AS jaccard
      FROM inter
      JOIN sizes se ON se.doc_id = eval_id
      JOIN sizes st ON st.doc_id = train_id
      WHERE CAST(isect AS DOUBLE) / (se.sz + st.sz - isect) >= 0.8
      ORDER BY eval_id, train_id"""))

  /** q135: SEMANTIC decontamination
    * ([[graft.operators.Decontaminate.semanticLeaks]]) — embedding-
    * cosine leakage across the q82 train/eval split, the detector for
    * paraphrased benchmark leakage every lexical detector is blind to.
    * IVF shared-cell candidates over the unioned corpora (portable
    * centroid draw on the packed 2·id+isEval key), cross-boundary
    * pairs only, threshold 0.35 (the q30/q86 tail convention on these
    * unclustered embeddings). The oracle replays the packing, the
    * centroid draw, nProbe assignment, boundary parity, and the
    * cosine filter. */
  private val q135 = QuerySpec(
    "q135_semantic_decontaminate",
    (s, dir) => {
      import graft.operators.Decontaminate
      val e = Tables.embeddings(s, dir)
      val isEval = substring(md5(col("vec_id").cast("string")), 1, 1) < "2"
      Decontaminate.semanticLeaks(e.filter(!isEval), e.filter(isEval),
          "vec_id", "embedding", threshold = 0.35, nCells = 8, nProbe = 2,
          centroidRank = Similarity.portableCentroidRank)
        .select(col("eval_id"), col("train_id"),
          round(col("sim"), 4).as("sim"))
        .orderBy(col("eval_id"), col("train_id"))
    },
    oracle = Some("""
      WITH vecs AS (
        SELECT CAST(vec_id * 2 +
                 CASE WHEN substring(md5(CAST(vec_id AS VARCHAR)), 1, 1) < '2'
                      THEN 1 ELSE 0 END AS BIGINT) AS uid,
               CAST(embedding AS DOUBLE[]) AS v
        FROM embeddings),
      cent AS (
        SELECT uid AS cell, v AS cvec FROM vecs
        ORDER BY ('0x' || substring(md5(CAST(uid AS VARCHAR)), 1, 15))::BIGINT % 1000000,
                 uid
        LIMIT 8),
      assign AS (
        SELECT uid, cell FROM (
          SELECT vecs.uid, c.cell,
                 row_number() OVER (PARTITION BY vecs.uid
                   ORDER BY list_cosine_similarity(v, cvec) DESC, c.cell ASC) AS rnk
          FROM vecs CROSS JOIN cent c)
        WHERE rnk <= 2),
      pairs AS (
        SELECT DISTINCT t.uid AS t_uid, e.uid AS e_uid
        FROM assign t JOIN assign e
          ON t.cell = e.cell AND t.uid % 2 = 0 AND e.uid % 2 = 1)
      SELECT (e_uid - 1) // 2 AS eval_id, t_uid // 2 AS train_id,
             round(list_cosine_similarity(tv.v, ev.v), 4) AS sim
      FROM pairs
      JOIN vecs tv ON tv.uid = t_uid
      JOIN vecs ev ON ev.uid = e_uid
      WHERE list_cosine_similarity(tv.v, ev.v) >= 0.35
      ORDER BY eval_id, train_id"""))

  /** Synthetic conversation derivation shared by q154/q155: documents
    * become turns (conv = doc_id div 4, turn = doc_id mod 4), roles
    * system/user/assistant by turn parity — deterministic, both
    * engines derive the identical relation. */
  private def turnsOf(s: org.apache.spark.sql.SparkSession, dir: String) =
    Tables.documents(s, dir).select(
      expr("doc_id div 4").as("conv_id"),
      pmod(col("doc_id"), lit(4)).cast("int").as("turn_idx"),
      when(pmod(col("doc_id"), lit(4)) === 0, "system")
        .when(pmod(col("doc_id"), lit(4)) % 2 === 1, "assistant")
        .otherwise("user").as("role"),
      col("text"))

  private val turnsSql = """
        SELECT CAST(doc_id // 4 AS BIGINT) AS conv_id,
               CAST(doc_id % 4 AS INTEGER) AS turn_idx,
               CASE WHEN doc_id % 4 = 0 THEN 'system'
                    WHEN (doc_id % 4) % 2 = 1 THEN 'assistant'
                    ELSE 'user' END AS role,
               text
        FROM documents"""

  /** q154: SFT loss-mask spans ([[graft.operators.Dialogue.maskSpans]])
    * — per turn, the exact half-open whitespace-token span it occupies
    * in the assembled sequence and whether the trainer computes loss
    * on it (assistant only). The oracle replays template rendering
    * (`<|role|> text`, tag = one token), per-turn counts, and the
    * cumulative offset walk as a window over turn order. */
  private val q154 = QuerySpec(
    "q154_sft_mask_spans",
    (s, dir) =>
      graft.operators.Dialogue.maskSpans(turnsOf(s, dir), "conv_id",
          "turn_idx", "role", "text")
        .orderBy(col("conv_id"), col("turn_idx")),
    oracle = Some(s"""
      WITH turns AS ($turnsSql),
      seg AS (
        SELECT conv_id, turn_idx, role,
               CAST(len(list_filter(string_split_regex(
                 '<|' || role || '|> ' || coalesce(text, ''), '\\s+'),
                 x -> x <> '')) AS BIGINT) AS ntok
        FROM turns),
      off AS (
        SELECT conv_id, turn_idx, role, ntok,
               CAST(coalesce(sum(ntok) OVER (PARTITION BY conv_id
                 ORDER BY turn_idx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS tok_start
        FROM seg)
      SELECT conv_id, turn_idx, role, tok_start,
             CAST(tok_start + ntok AS BIGINT) AS tok_end,
             role = 'assistant' AS loss_mask
      FROM off
      ORDER BY conv_id, turn_idx"""))

  /** q155: assembled SFT sequences ([[graft.operators.Dialogue.assemble]])
    * — one training row per conversation: turn count, exact token
    * total, and the template-joined text (q154 carries the span
    * layout; this carries the sequence the spans index into). */
  private val q155 = QuerySpec(
    "q155_sft_assemble",
    (s, dir) =>
      graft.operators.Dialogue.assemble(turnsOf(s, dir), "conv_id",
          "turn_idx", "role", "text")
        .select(col("conv_id"), col("n_turns"), col("n_tokens"), col("text"))
        .orderBy(col("conv_id")),
    oracle = Some(s"""
      WITH turns AS ($turnsSql),
      seg AS (
        SELECT conv_id, turn_idx,
               '<|' || role || '|> ' || coalesce(text, '') AS seg
        FROM turns),
      n AS (
        SELECT conv_id, turn_idx, seg,
               CAST(len(list_filter(string_split_regex(seg, '\\s+'),
                 x -> x <> '')) AS BIGINT) AS ntok
        FROM seg)
      SELECT conv_id, CAST(count(*) AS INTEGER) AS n_turns,
             CAST(sum(ntok) AS BIGINT) AS n_tokens,
             string_agg(seg, ' ' ORDER BY turn_idx) AS text
      FROM n
      GROUP BY conv_id
      ORDER BY conv_id"""))

  /** q157: T5 span corruption ([[graft.operators.Denoise.spanCorrupt]])
    * — denoising input/target pairs at the published 15%/mean-3 rates
    * via the deterministic block-hash variant; the oracle replays
    * tokenization, the md5 block draw, sentinel numbering, and both
    * assembled strings bit for bit. */
  private val q157 = QuerySpec(
    "q157_span_corrupt",
    (s, dir) =>
      graft.operators.Denoise.spanCorrupt(Tables.documents(s, dir),
          "doc_id", "text")
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH t AS (
        SELECT doc_id,
               coalesce(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> ''), []) AS w
        FROM documents),
      base AS (
        SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
               CAST(len(w) // 5 AS INTEGER) AS nf
        FROM t),
      bl AS (
        SELECT doc_id, w, n, nf,
               list_transform(range(0, nf), b -> struct_pack(
                 b := CAST(b AS INTEGER),
                 c := CAST(('0x' || substring(md5(
                        CAST(doc_id AS VARCHAR) || ':0:'
                          || CAST(b AS VARCHAR)), 1, 15)) AS BIGINT)
                      % 4 = 0)) AS bs
        FROM base)
      SELECT doc_id, n AS n_tokens,
             CAST(len(list_filter(bs, x -> x.c)) AS INTEGER) AS n_spans,
             CAST(len(list_filter(bs, x -> x.c)) * 3 AS BIGINT) AS n_dropped,
             coalesce(array_to_string(flatten(list_concat(
               list_transform(bs, x -> CASE WHEN x.c
                 THEN list_concat(
                   ['<extra_id_' || CAST(len(list_filter(bs,
                      y -> y.c AND y.b < x.b)) AS VARCHAR) || '>'],
                   w[x.b*5+4 : x.b*5+5])
                 ELSE w[x.b*5+1 : x.b*5+5] END),
               [w[nf*5+1 : CAST(n AS INTEGER)]])), ' '), '') AS input_text,
             coalesce(array_to_string(flatten(list_concat(
               list_transform(list_filter(bs, x -> x.c), x ->
                 list_concat(
                   ['<extra_id_' || CAST(len(list_filter(bs,
                      y -> y.c AND y.b < x.b)) AS VARCHAR) || '>'],
                   w[x.b*5+1 : x.b*5+3])),
               [['<extra_id_'
                 || CAST(len(list_filter(bs, x -> x.c)) AS VARCHAR)
                 || '>']])), ' '), '') AS target_text
      FROM bl
      ORDER BY doc_id"""))

  /** q158: DPO preference pairs
    * ([[graft.operators.Dialogue.preferencePairs]]) — per synthetic
    * prompt (doc_id div 4), the best-vs-worst response pair by token
    * count (a deterministic stand-in score; real pipelines feed a
    * reward/quality model's output), zero-margin prompts dropped.
    * The oracle replays the two arg-extremes as rank-1 windows. */
  private val q158 = QuerySpec(
    "q158_preference_pairs",
    (s, dir) =>
      graft.operators.Dialogue.preferencePairs(
          Tables.documents(s, dir).select(
            expr("doc_id div 4").as("prompt_id"),
            col("doc_id").as("response_id"),
            TextFns.tokenCount(col("text")).cast("long").as("score")),
          "prompt_id", "response_id", "score")
        .orderBy(col("prompt_id")),
    oracle = Some("""
      WITH r AS (
        SELECT CAST(doc_id // 4 AS BIGINT) AS prompt_id,
               doc_id AS response_id,
               CAST(len(list_filter(string_split_regex(coalesce(text, ''),
                 '\s+'), x -> x <> '')) AS BIGINT) AS score
        FROM documents),
      ranked AS (
        SELECT prompt_id, response_id, score,
               row_number() OVER (PARTITION BY prompt_id
                 ORDER BY score DESC, response_id ASC) AS rc,
               row_number() OVER (PARTITION BY prompt_id
                 ORDER BY score ASC, response_id ASC) AS rr,
               count(*) OVER (PARTITION BY prompt_id) AS n
        FROM r)
      SELECT c.prompt_id, CAST(c.n AS BIGINT) AS n_responses,
             c.response_id AS chosen_id, c.score AS chosen_score,
             j.response_id AS rejected_id, j.score AS rejected_score,
             c.score - j.score AS margin
      FROM ranked c JOIN ranked j
        ON c.prompt_id = j.prompt_id AND c.rc = 1 AND j.rr = 1
      WHERE c.score - j.score > 0
      ORDER BY c.prompt_id"""))

  /** q159: UL2 prefix-LM split ([[graft.operators.Denoise.prefixSplit]])
    * — each doc becomes a (prefix, continuation) pair, split point
    * drawn deterministically over the U(0.25, 0.75) band in basis
    * points; the oracle replays the hash draw, the clamp, and both
    * halves. */
  private val q159 = QuerySpec(
    "q159_prefix_split",
    (s, dir) =>
      graft.operators.Denoise.prefixSplit(Tables.documents(s, dir),
          "doc_id", "text")
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH t AS (
        SELECT doc_id,
               coalesce(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> ''), []) AS w
        FROM documents),
      base AS (
        SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
               2500 + CAST(('0x' || substring(md5(
                 CAST(doc_id AS VARCHAR) || ':ps:0'), 1, 15)) AS BIGINT)
                 % 5000 AS f
        FROM t
        WHERE len(w) >= 2),
      sp AS (
        SELECT doc_id, w, n,
               greatest(1, least(n - 1, (n * f) // 10000)) AS s
        FROM base)
      SELECT doc_id, n AS n_tokens, CAST(s AS BIGINT) AS split_at,
             coalesce(array_to_string(w[1 : CAST(s AS INT)], ' '), '')
               AS input_text,
             coalesce(array_to_string(
               w[CAST(s + 1 AS INT) : CAST(n AS INT)], ' '), '')
               AS target_text
      FROM sp
      ORDER BY doc_id"""))

  val specs: Seq[QuerySpec] = Seq(q77, q78, q79, q80, q81, q82, q135,
    q154, q155, q157, q158, q159)
}
