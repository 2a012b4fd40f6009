package graft.queries

import graft.Tables
import graft.operators.{CorpusStats, OutlierTrim, UnigramLm}
import org.apache.spark.sql.functions._

/** Round-5 corpus-curation operators — the selection / mix-design /
  * data-card layer on top of the dedup + filtering families: unigram-LM
  * quality scoring (q93), length-outlier trimming (q94), source overlap
  * (q95), Zipf head mass (q96), DSIR target-domain selection (q97),
  * keep-best near-dup resolution (q98), token-budget cut (q99),
  * encoding-damage audit (q100), curriculum ordering (q101), and the
  * per-source curation funnel (q102). All ten are fully
  * oracle-checked; the determinism tricks are documented
  * on the operators (integer-quantized log-probs, dyadic-exact quartile
  * fences, roundFrac rationals, md5 order keys).
  */
object CurationOps {

  /** q93: mean token log-probability under the corpus's own unigram LM
    * (UnigramLm.selfScore) — the CCNet-style quality signal. Documents
    * with no tokens keep a row via the left join (n_tokens 0, score
    * NULL). Per-token logs are quantized to integers once per
    * vocabulary entry, so the per-doc sums are order-independent. */
  private val q93 = QuerySpec(
    "q93_unigram_lm",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      docs.select(col("doc_id"))
        .join(UnigramLm.selfScore(docs, "doc_id", "text"), Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_tokens"), lit(0)).as("n_tokens"),
          col("avg_logprob"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      lm AS (SELECT token, count(*) AS cnt FROM toks GROUP BY 1),
      n AS (SELECT count(*) AS n_total FROM toks),
      lmq AS (
        SELECT token,
               CAST(round(ln(CAST(cnt AS DOUBLE) / n_total) * 1000000, 0) AS BIGINT)
                 AS lp_micro
        FROM lm CROSS JOIN n),
      sc AS (
        SELECT tf.doc_id,
               CAST(sum(tf) AS INTEGER) AS n_tokens,
               sum(tf * lp_micro) AS lp_sum
        FROM tf JOIN lmq USING (token) GROUP BY 1)
      SELECT d.doc_id,
             CAST(coalesce(sc.n_tokens, 0) AS INTEGER) AS n_tokens,
             round(CAST(sc.lp_sum AS DOUBLE) / sc.n_tokens / 1000000.0, 4)
               AS avg_logprob
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      ORDER BY d.doc_id"""))

  /** q94: per-language Tukey-fence trim on document length — keep docs
    * with n_chars inside [q1 − 1.5·iqr, q3 + 1.5·iqr] of their
    * language. Quartile positions are exact dyadic doubles, so both
    * engines compute bit-identical fences (OutlierTrim scaladoc). */
  private val q94 = QuerySpec(
    "q94_length_trim",
    (s, dir) =>
      OutlierTrim.tukey(
          Tables.documents(s, dir).select(col("doc_id"), col("lang"), col("n_chars")),
          "lang", "n_chars")
        .select(col("doc_id"), col("lang"), col("n_chars"))
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH f AS (
        SELECT lang,
               quantile_cont(n_chars, 0.25) AS q1,
               quantile_cont(n_chars, 0.75) AS q3
        FROM documents GROUP BY 1)
      SELECT d.doc_id, d.lang, d.n_chars
      FROM documents d JOIN f ON f.lang = d.lang
      WHERE d.n_chars >= f.q1 - 1.5 * (f.q3 - f.q1)
        AND d.n_chars <= f.q3 + 1.5 * (f.q3 - f.q1)
      ORDER BY d.doc_id"""))

  /** q95: source-pair 3-gram overlap matrix
    * (CorpusStats.sourceNgramOverlap) — which sources are near-copies
    * of each other. Jaccard over DISTINCT shingle sets per source,
    * exact-rational rounding. */
  private val q95 = QuerySpec(
    "q95_source_overlap",
    (s, dir) =>
      CorpusStats.sourceNgramOverlap(Tables.documents(s, dir), "source", "text", n = 3)
        .orderBy(col("src_a"), col("src_b")),
    oracle = Some("""
      WITH toks AS (
        SELECT source,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents),
      sh AS (
        SELECT DISTINCT source, s FROM (
          SELECT source, unnest(
            CASE WHEN len(w) >= 3 THEN
              list_transform(range(1, len(w) - 1),
                i -> array_to_string(w[i:i+2], ' '))
            ELSE [array_to_string(w, ' ')] END) AS s
          FROM toks)
        WHERE s IS NOT NULL AND s <> ''),
      sizes AS (SELECT source, count(*) AS sz FROM sh GROUP BY 1),
      inter AS (
        SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
        FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
        GROUP BY 1, 2)
      SELECT src_a, src_b, n_common,
             CAST((n_common * 2000000 + (sa.sz + sb.sz - n_common))
                  // ((sa.sz + sb.sz - n_common) * 2) AS DOUBLE) / 1000000.0
               AS jaccard
      FROM inter
      JOIN sizes sa ON sa.source = src_a
      JOIN sizes sb ON sb.source = src_b
      ORDER BY src_a, src_b"""))

  /** q96: Zipf head mass per language (CorpusStats.topTokenCoverage) —
    * fraction of token occurrences covered by the 10 most frequent
    * tokens, ties alphabetical; the repetitiveness data-card stat. */
  private val q96 = QuerySpec(
    "q96_zipf_coverage",
    (s, dir) =>
      CorpusStats.topTokenCoverage(Tables.documents(s, dir), "lang", "text", k = 10)
        .withColumnRenamed("grp", "lang")
        .orderBy(col("lang")),
    oracle = Some("""
      WITH toks AS (
        SELECT lang,
               unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
        FROM documents),
      tc AS (SELECT lang, token, count(*) AS c FROM toks GROUP BY 1, 2),
      rk AS (
        SELECT lang, token, c,
               row_number() OVER (PARTITION BY lang ORDER BY c DESC, token) AS rk
        FROM tc)
      SELECT lang,
             CAST(sum(c) AS BIGINT) AS n_tokens,
             max(CASE WHEN rk = 1 THEN token END) AS top_token,
             CAST((sum(CASE WHEN rk <= 10 THEN c ELSE 0 END) * 20000 + sum(c))
                  // (sum(c) * 2) AS DOUBLE) / 10000.0 AS topk_frac
      FROM rk GROUP BY 1 ORDER BY lang"""))

  /** q97: DSIR-style target-domain selection (UnigramLm.dsirTopK) —
    * the 100 documents most like the 'en' slice by per-token
    * log-likelihood ratio between the en-LM and the rest-LM. Exact
    * integer weights; the double ranking key is the same IEEE division
    * in both engines, ties broken by doc_id. */
  private val q97 = QuerySpec(
    "q97_dsir_select",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val target = UnigramLm.build(docs.filter(col("lang") === "en"), "text")
      val source = UnigramLm.build(docs.filter(col("lang") =!= "en"), "text")
      UnigramLm.dsirTopK(docs, "doc_id", "text", target, source, k = 100)
        .select(col("doc_id"), col("n_tokens"), col("llr_sum_micro"),
          col("llr_per_token"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, lang,
               unnest(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS token
        FROM documents),
      tf AS (SELECT doc_id, token, count(*) AS tf FROM toks GROUP BY 1, 2),
      tgt AS (SELECT token, count(*) AS cnt FROM toks WHERE lang = 'en' GROUP BY 1),
      tgtn AS (SELECT sum(cnt) AS n FROM tgt),
      tgtq AS (
        SELECT token,
               CAST(round(ln(CAST(cnt AS DOUBLE) / n) * 1000000, 0) AS BIGINT) AS lp
        FROM tgt CROSS JOIN tgtn),
      src AS (SELECT token, count(*) AS cnt FROM toks WHERE lang <> 'en' GROUP BY 1),
      srcn AS (SELECT sum(cnt) AS n FROM src),
      srcq AS (
        SELECT token,
               CAST(round(ln(CAST(cnt AS DOUBLE) / n) * 1000000, 0) AS BIGINT) AS lp
        FROM src CROSS JOIN srcn),
      sc AS (
        SELECT tf.doc_id,
               CAST(sum(tf) AS INTEGER) AS n_tokens,
               CAST(sum(tf * (coalesce(t.lp, -20000000)
                 - coalesce(s.lp, -20000000))) AS BIGINT) AS llr_sum_micro
        FROM tf
        LEFT JOIN tgtq t USING (token)
        LEFT JOIN srcq s USING (token)
        GROUP BY 1),
      sel AS (
        SELECT * FROM sc
        ORDER BY CAST(llr_sum_micro AS DOUBLE) / n_tokens DESC, doc_id
        LIMIT 100)
      SELECT doc_id, n_tokens, llr_sum_micro,
             round(CAST(llr_sum_micro AS DOUBLE) / n_tokens / 1000000.0, 4)
               AS llr_per_token
      FROM sel ORDER BY doc_id"""))

  /** q98: keep-best near-dup resolution (Dedup.keepBestInClusters) —
    * q51's clusters with the production keep policy: the LONGEST copy
    * (n_chars, ties by min id) survives, not the min-id one. Oracle
    * rebuilds the exact-jaccard cluster graph recursively and ranks
    * inside each cluster. */
  private val q98 = QuerySpec(
    "q98_keep_best",
    (s, dir) =>
      // maxBucket unguarded: the recursive oracle ranks the exact
      // uncapped cluster graph
      graft.operators.Dedup.keepBestInClusters(
          Tables.documents(s, dir), "doc_id", "text", "n_chars",
          shingleN = 3, numHashes = 128, bands = 32, threshold = 0.8,
          maxBucket = Int.MaxValue)
        .orderBy(col("keep_id")),
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
      scored AS (
        SELECT l.doc, l.cluster, d.n_chars
        FROM labels l JOIN documents d ON d.doc_id = l.doc),
      rk AS (
        SELECT doc, cluster, n_chars,
               row_number() OVER (PARTITION BY cluster
                 ORDER BY n_chars DESC, doc) AS rk
        FROM scored),
      gs AS (SELECT cluster, count(*) AS group_size FROM scored GROUP BY 1)
      SELECT rk.doc AS keep_id, gs.group_size, rk.n_chars AS score
      FROM rk JOIN gs USING (cluster)
      WHERE rk.rk = 1
      ORDER BY keep_id"""))

  /** q99: token-budget corpus cut (Sampling.tokenBudgetSelect) — the
    * docs whose running token total in md5-shuffled order stays within
    * 15k tokens (~half the corpus); unbiased "give me N tokens" selection. Token counts
    * use the q33 whitespace convention. */
  private val q99 = QuerySpec(
    "q99_token_budget",
    (s, dir) => {
      import graft.functions.TextFns
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFns.tokenCount(col("text")).cast("long").as("n_tok"))
      graft.operators.Sampling.tokenBudgetSelect(
          docs, "doc_id", "n_tok", budget = 15000L, seed = 42L)
        .select(col("doc_id"), col("n_tok"), col("cum_tokens"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (
        SELECT doc_id,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                 x -> x <> '')) AS BIGINT) AS n_tok
        FROM documents),
      c AS (
        SELECT doc_id, n_tok,
               CAST(sum(n_tok) OVER (
                 ORDER BY md5('42_' || CAST(doc_id AS VARCHAR)), doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                 AS cum_tokens
        FROM t)
      SELECT doc_id, n_tok, cum_tokens
      FROM c WHERE cum_tokens <= 15000
      ORDER BY doc_id"""))

  /** q100: encoding-damage audit + repair (TextFns encoding signals) —
    * U+FFFD replacement chars (lossy decode scars) and raw control
    * chars (binary contamination) counted per doc, damage stripped to
    * spaces. The corpus text is clean, so the query PLANTS deterministic
    * damage first (q77's pattern): docs ≡0 mod 3 gain a replacement
    * char, ≡0 mod 5 two control chars — every branch provably fires. */
  private val q100 = QuerySpec(
    "q100_encoding_audit",
    (s, dir) => {
      import graft.functions.TextFns
      val damaged = Tables.documents(s, dir)
        .withColumn("raw", concat(col("text"),
          when(pmod(col("doc_id"), lit(3)) === 0, lit(" bad\uFFFDdecode"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0, lit(" ctl\u0007\u001Fchars"))
            .otherwise(lit(""))))
      damaged.select(
          col("doc_id"),
          TextFns.piiCount(col("raw"), TextFns.replacementCharRe)
            .as("n_replacement"),
          TextFns.piiCount(col("raw"), TextFns.controlCharRe).as("n_control"),
          TextFns.stripEncodingDamage(col("raw")).as("clean"))
        .withColumn("is_clean",
          col("n_replacement") === 0 && col("n_control") === 0)
        .select(col("doc_id"), col("n_replacement"), col("n_control"),
          col("is_clean"), col("clean"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH raw AS (
        SELECT doc_id,
               text
                 || CASE WHEN doc_id % 3 = 0
                      THEN ' bad' || chr(65533) || 'decode' ELSE '' END
                 || CASE WHEN doc_id % 5 = 0
                      THEN ' ctl' || chr(7) || chr(31) || 'chars' ELSE '' END
                 AS raw
        FROM documents)
      SELECT doc_id,
             CAST(len(regexp_extract_all(raw, chr(65533))) AS INTEGER)
               AS n_replacement,
             CAST(len(regexp_extract_all(raw,
               '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]')) AS INTEGER) AS n_control,
             len(regexp_extract_all(raw, chr(65533))) = 0
               AND len(regexp_extract_all(raw,
                 '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]')) = 0 AS is_clean,
             regexp_replace(
               regexp_replace(raw, chr(65533), ' ', 'g'),
               '[\x00-\x08\x0B\x0C\x0E-\x1F\x7F]', ' ', 'g') AS clean
      FROM raw
      ORDER BY doc_id"""))

  /** q101: sequence-length curriculum order
    * (Sampling.curriculumOrder) — global training positions that walk
    * length bins short→long (250-char bins of n_chars) with a uniform
    * md5 shuffle inside each bin; the "train short sequences first"
    * schedule, fully deterministic and engine-reproducible. */
  private val q101 = QuerySpec(
    "q101_curriculum",
    (s, dir) => {
      val binned = Tables.documents(s, dir)
        .select(col("doc_id"),
          (col("n_chars") / lit(250)).cast("int").as("bin"))
      graft.operators.Sampling.curriculumOrder(binned, "doc_id", "bin")
        .select(col("doc_id"), col("bin"), col("pos"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH t AS (
        SELECT doc_id, CAST(n_chars // 250 AS INTEGER) AS bin
        FROM documents)
      SELECT doc_id, bin,
             CAST(row_number() OVER (
               ORDER BY bin, md5('42_' || CAST(doc_id AS VARCHAR)), doc_id)
               AS BIGINT) AS pos
      FROM t ORDER BY doc_id"""))

  /** q102: per-source curation funnel — the audit table every corpus
    * build publishes: how many docs each source contributes at each
    * deterministic stage (raw → length-trimmed → near-dup survivor →
    * near-dup-decontaminated vs the md5<'2' holdout). Composes OutlierTrim,
    * Dedup.nearDupGroups, and Decontaminate.nearDupLeaksLsh; the oracle rebuilds
    * each stage from the exact-jaccard cluster graph (q51/q82 machinery). */
  private val q102 = QuerySpec(
    "q102_curation_funnel",
    (s, dir) => {
      import graft.operators.{Dedup, Decontaminate, OutlierTrim}
      val docs = Tables.documents(s, dir)
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) < "2"
      val pool = docs.filter(!isEval)
      val holdout = docs.filter(isEval)
      // stage 1: global Tukey trim on n_chars (single fence group)
      val lenOk = OutlierTrim.tukey(
          pool.withColumn("__g", lit("all")), "__g", "n_chars")
        .drop("__g")
      // stage 2: NEAR-dup cluster survivors (min-id per MinHash cluster,
      // q51's machinery) of the trimmed pool
      val kept = lenOk.join(
        Dedup.nearDupGroups(lenOk, "doc_id", "text",
            shingleN = 3, numHashes = 128, bands = 32, threshold = 0.8,
            maxBucket = Int.MaxValue)
          .select(col("keep_id").as("doc_id")),
        Seq("doc_id"), "left_semi")
      // stage 3: drop survivors that near-duplicate the holdout
      // (q82's cross-boundary detector at the same threshold)
      val clean = kept.join(
        Decontaminate.nearDupLeaksLsh(kept, holdout, "doc_id", "text",
            n = 3, numHashes = 128, bands = 32, threshold = 0.8,
            maxBucket = Int.MaxValue)
          .select(col("train_id").as("doc_id")),
        Seq("doc_id"), "left_anti")
      pool.groupBy(col("source")).agg(count(lit(1)).as("n_total"))
        .join(lenOk.groupBy(col("source")).agg(count(lit(1)).as("n_len_ok")),
          Seq("source"), "left")
        .join(kept.groupBy(col("source")).agg(count(lit(1)).as("n_kept")),
          Seq("source"), "left")
        .join(clean.groupBy(col("source")).agg(count(lit(1)).as("n_clean")),
          Seq("source"), "left")
        .select(col("source"), col("n_total"),
          coalesce(col("n_len_ok"), lit(0L)).as("n_len_ok"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          coalesce(col("n_clean"), lit(0L)).as("n_clean"))
        .orderBy(col("source"))
    },
    oracle = Some("""
      WITH RECURSIVE
      pool AS (
        SELECT * FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) >= '2'),
      holdout AS (
        SELECT * FROM documents
        WHERE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2'),
      f AS (
        SELECT quantile_cont(n_chars, 0.25) AS q1,
               quantile_cont(n_chars, 0.75) AS q3
        FROM pool),
      len_ok AS (
        SELECT p.* FROM pool p CROSS JOIN f
        WHERE p.n_chars >= f.q1 - 1.5 * (f.q3 - f.q1)
          AND p.n_chars <= f.q3 + 1.5 * (f.q3 - f.q1)),
      toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM len_ok),
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
        SELECT doc_id, doc_id FROM len_ok
        UNION
        SELECT reach.doc, e.d FROM reach JOIN edges e ON reach.r = e.s),
      labels AS (SELECT doc, min(r) AS cluster FROM reach GROUP BY doc),
      keepers AS (SELECT min(doc) AS doc FROM labels GROUP BY cluster),
      kept AS (
        SELECT l.* FROM len_ok l JOIN keepers k ON k.doc = l.doc_id),
      htoks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM holdout),
      hsh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(
            CASE WHEN len(w) >= 3 THEN
              list_transform(range(1, len(w) - 1),
                i -> array_to_string(w[i:i+2], ' '))
            ELSE [array_to_string(w, ' ')] END) AS s
          FROM htoks)),
      hsizes AS (SELECT doc_id, count(*) AS sz FROM hsh GROUP BY doc_id),
      hinter AS (
        SELECT t.doc_id AS tid, h.doc_id AS hid, count(*) AS isect
        FROM sh t
        JOIN keepers k ON k.doc = t.doc_id
        JOIN hsh h ON t.s = h.s
        GROUP BY 1, 2),
      leaky AS (
        SELECT DISTINCT tid FROM hinter
        JOIN sizes st ON st.doc_id = tid
        JOIN hsizes hs ON hs.doc_id = hid
        WHERE CAST(isect AS DOUBLE) / (st.sz + hs.sz - isect) >= 0.8),
      clean AS (
        SELECT * FROM kept
        WHERE doc_id NOT IN (SELECT tid FROM leaky))
      SELECT p.source,
             count(*) AS n_total,
             CAST(coalesce(l.n, 0) AS BIGINT) AS n_len_ok,
             CAST(coalesce(k.n, 0) AS BIGINT) AS n_kept,
             CAST(coalesce(c.n, 0) AS BIGINT) AS n_clean
      FROM pool p
      LEFT JOIN (SELECT source, count(*) AS n FROM len_ok GROUP BY 1) l
        ON l.source = p.source
      LEFT JOIN (SELECT source, count(*) AS n FROM kept GROUP BY 1) k
        ON k.source = p.source
      LEFT JOIN (SELECT source, count(*) AS n FROM clean GROUP BY 1) c
        ON c.source = p.source
      GROUP BY p.source, l.n, k.n, c.n
      ORDER BY p.source"""))

  /** q128: collocation mining under the oracle —
    * [[graft.operators.CorpusStats.collocations]] (window 3,
    * minCount 50, top 40): windowed co-occurrence counts plus the
    * integer-exact association lift (the argument of PMI's log as a
    * 1e-6-unit rational — no floating log for the engines to disagree
    * over). The oracle generates pairs with the equivalent relational
    * self-join (b.pos ∈ (a.pos, a.pos+3]) — CurationOpsSpec proves the
    * operator's scan-local HOF generation equals exactly that — and
    * replays marginals, totals, and the HUGEINT lift division. */
  private val q128 = QuerySpec(
    "q128_collocations",
    (s, dir) =>
      graft.operators.CorpusStats.collocations(Tables.documents(s, dir),
        "text", window = 3, minCount = 50L, topN = 40),
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok
        FROM (SELECT doc_id,
                     list_filter(string_split_regex(text, '\s+'),
                                 x -> x <> '') AS t
              FROM documents)),
      pairs AS (
        SELECT least(a.tok, b.tok) AS w1, greatest(a.tok, b.tok) AS w2
        FROM toks a JOIN toks b
          ON a.doc_id = b.doc_id AND b.pos > a.pos AND b.pos <= a.pos + 3),
      agg AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pairs
        FROM pairs GROUP BY 1, 2),
      marg AS (
        SELECT w, CAST(sum(m) AS BIGINT) AS m FROM (
          SELECT w1 AS w,
                 n_pairs * (CASE WHEN w1 = w2 THEN 2 ELSE 1 END) AS m
          FROM agg
          UNION ALL
          SELECT w2 AS w, n_pairs AS m FROM agg WHERE w1 <> w2)
        GROUP BY w),
      tot AS (SELECT CAST(sum(n_pairs) AS HUGEINT) AS t FROM agg)
      SELECT w1, w2, n_pairs,
             CAST((4 * t * CAST(n_pairs AS HUGEINT) * 1000000)
                  // (CAST(m1.m AS HUGEINT) * m2.m) AS BIGINT) AS lift_micro
      FROM agg, tot
      JOIN marg m1 ON m1.w = w1
      JOIN marg m2 ON m2.w = w2
      WHERE n_pairs >= 50
      ORDER BY n_pairs DESC, w1, w2
      LIMIT 40"""))

  /** q129: per-document multi-language identification
    * ([[graft.operators.LangId.predict]]) — character-trigram profile
    * scoring over 20 languages, integer-exact rank weights, argmax with
    * lexicographic tie-break, "und" when no profile trigram occurs. The
    * oracle replays the identical trigram extraction, profile VALUES
    * table, and scoring ([[graft.operators.LangId.docSql]] — generated
    * from the SAME profile constants as the Spark plan, so the two
    * sides cannot drift). */
  private val q129 = QuerySpec(
    "q129_lang_profile",
    (s, dir) =>
      graft.operators.LangId.predict(Tables.documents(s, dir), "doc_id", "text")
        .orderBy(col("doc_id")),
    oracle = Some(
      graft.operators.LangId.docSql("documents", "doc_id", "text") +
        "\n      ORDER BY doc_id"))

  /** q134: bigram-LM self-scoring ([[graft.operators.BigramLm]]) —
    * the conditional-probability quality gate one order above q93:
    * mean ln p(wᵢ|wᵢ₋₁) per doc, unseen bigrams backing off to the
    * continuation's unigram log-prob − 5 (stupid backoff), unigram-OOV
    * impossible under self-scoring but the oracle mirrors the floor
    * anyway. Same determinism contract as q93: one ln per distinct
    * (bi/uni)gram quantized to integer micro-units, order-independent
    * integer sums, display division last. Docs with < 2 tokens keep a
    * row with NULL avg. */
  private val q134 = QuerySpec(
    "q134_bigram_lm",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      graft.operators.BigramLm.selfScore(docs, "doc_id", "text")
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                           x -> x <> '') AS w
        FROM documents),
      pairs AS (
        SELECT doc_id,
               list_extract(w, CAST(i AS INT)) AS w1,
               list_extract(w, CAST(i + 1 AS INT)) AS w2
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
              FROM toks WHERE len(w) >= 2)),
      bc AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY 1, 2),
      ctx AS (SELECT w1, sum(cnt) AS ctx_cnt FROM bc GROUP BY 1),
      lm AS (
        SELECT w1, w2,
               CAST(round(ln(CAST(cnt AS DOUBLE) / ctx_cnt) * 1000000, 0) AS BIGINT)
                 AS lp_micro
        FROM bc JOIN ctx USING (w1)),
      ut AS (SELECT unnest(w) AS token FROM toks),
      uc AS (SELECT token, count(*) AS cnt FROM ut GROUP BY 1),
      un AS (SELECT count(*) AS n_total FROM ut),
      ulm AS (
        SELECT token,
               CAST(round(ln(CAST(cnt AS DOUBLE) / n_total) * 1000000, 0) AS BIGINT)
                 AS uni_lp
        FROM uc CROSS JOIN un),
      tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM pairs GROUP BY 1, 2, 3),
      sc AS (
        SELECT tf.doc_id,
               CAST(sum(tf) AS INTEGER) AS n_bigrams,
               sum(tf * coalesce(lm.lp_micro,
                     coalesce(ulm.uni_lp, -20000000) + -5000000)) AS lp_sum
        FROM tf
        LEFT JOIN lm ON lm.w1 = tf.w1 AND lm.w2 = tf.w2
        LEFT JOIN ulm ON ulm.token = tf.w2
        GROUP BY 1)
      SELECT d.doc_id,
             CAST(coalesce(sc.n_bigrams, 0) AS INTEGER) AS n_bigrams,
             CAST(coalesce(sc.lp_sum, 0) AS BIGINT) AS lp_sum_micro,
             CASE WHEN sc.n_bigrams > 0 THEN
               round(CAST(sc.lp_sum AS DOUBLE) / sc.n_bigrams / 1000000.0, 4)
             END AS avg_logprob
      FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id
      ORDER BY d.doc_id"""))

  /** q144: Gopher rule-based quality filter
    * ([[graft.operators.QualityRules.report]], Rae et al. 2021
    * Appendix A1.1) — seven structural rules as per-doc flags, every
    * threshold cross-multiplied to integer arithmetic so both engines
    * agree bit for bit. The corpus text is clean prose, so the query
    * PLANTS deterministic violations AND satisfactions (the q100
    * pattern): docs ≡0 mod 7 gain three bullet lines, ≡0 mod 11 two
    * ellipsis-terminated lines, ≡0 mod 13 a run of `#` symbols,
    * ≡0 mod 2 a stopword-rich sentence (the synthetic corpus has no
    * natural English stopwords), ≡0 mod 17 two hundred 25-char words
    * (drives mean word length past 10) — every rule provably fires
    * both ways. */
  private val q144 = QuerySpec(
    "q144_gopher_rules",
    (s, dir) => {
      val planted = Tables.documents(s, dir)
        .withColumn("raw", concat(col("text"),
          when(pmod(col("doc_id"), lit(7)) === 0,
            lit("\n- bullet one\n- bullet two\n- bullet three"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(11)) === 0,
            lit("\ntrailing thought...\nanother…"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(13)) === 0,
            lit(" ## ## ## ## ## ## ## ##"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(2)) === 0,
            lit(" the cat and that dog have been with us to be of note"))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(17)) === 0,
            repeat(lit(" pneumonoultramicroscopics"), 200))
            .otherwise(lit(""))))
      graft.operators.QualityRules.report(planted, "doc_id", "raw")
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH raw AS (
        SELECT doc_id,
               text
                 || CASE WHEN doc_id % 7 = 0
                      THEN chr(10) || '- bullet one' || chr(10)
                        || '- bullet two' || chr(10) || '- bullet three'
                      ELSE '' END
                 || CASE WHEN doc_id % 11 = 0
                      THEN chr(10) || 'trailing thought...' || chr(10)
                        || 'another' || chr(8230)
                      ELSE '' END
                 || CASE WHEN doc_id % 13 = 0
                      THEN ' ## ## ## ## ## ## ## ##' ELSE '' END
                 || CASE WHEN doc_id % 2 = 0
                      THEN ' the cat and that dog have been with us to be of note'
                      ELSE '' END
                 || CASE WHEN doc_id % 17 = 0
                      THEN repeat(' pneumonoultramicroscopics', 200)
                      ELSE '' END
                 AS raw
        FROM documents),
      base AS (
        SELECT doc_id, raw,
               list_filter(string_split_regex(raw, '\s+'), x -> x <> '') AS w,
               string_split(raw, chr(10)) AS lines
        FROM raw),
      m AS (
        SELECT doc_id,
               CAST(len(lines) AS BIGINT) AS n_lines,
               CAST(len(w) AS BIGINT) AS n_words,
               CAST(coalesce(list_sum(list_transform(w, x -> length(x))), 0)
                 AS BIGINT) AS sum_len,
               CAST((length(raw) - length(replace(raw, '#', '')))
                 + (length(raw) - length(replace(raw, chr(8230), '')))
                 + ((length(raw) - length(replace(raw, '...', ''))) // 3)
                 AS BIGINT) AS n_sym,
               CAST(len(list_filter(lines, l ->
                 starts_with(ltrim(l), '- ') OR starts_with(ltrim(l), '* ')
                   OR starts_with(ltrim(l), chr(8226) || ' ')))
                 AS BIGINT) AS n_bullet,
               CAST(len(list_filter(lines, l ->
                 ends_with(rtrim(l), '...') OR ends_with(rtrim(l), chr(8230))))
                 AS BIGINT) AS n_ellipsis,
               CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                 AS BIGINT) AS n_alpha,
               (CASE WHEN list_contains(list_transform(w, x -> lower(x)), 'the') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(list_transform(w, x -> lower(x)), 'be') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(list_transform(w, x -> lower(x)), 'to') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(list_transform(w, x -> lower(x)), 'of') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(list_transform(w, x -> lower(x)), 'and') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(list_transform(w, x -> lower(x)), 'that') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(list_transform(w, x -> lower(x)), 'have') THEN 1 ELSE 0 END
                + CASE WHEN list_contains(list_transform(w, x -> lower(x)), 'with') THEN 1 ELSE 0 END)
                 AS n_stops
        FROM base)
      SELECT doc_id, n_lines, n_words,
             n_words >= 50 AND n_words <= 100000 AS r_word_count,
             n_words > 0 AND 3 * n_words <= sum_len
               AND sum_len <= 10 * n_words AS r_mean_word_len,
             n_sym * 10 <= n_words AS r_symbol_ratio,
             n_bullet * 10 <= n_lines AS r_bullet_lines,
             n_ellipsis * 10 < n_lines * 3 AS r_ellipsis_lines,
             n_words > 0 AND n_alpha * 5 >= n_words * 4 AS r_alpha_words,
             n_stops >= 2 AS r_stopwords,
             (n_words >= 50 AND n_words <= 100000)
               AND (n_words > 0 AND 3 * n_words <= sum_len
                 AND sum_len <= 10 * n_words)
               AND (n_sym * 10 <= n_words)
               AND (n_bullet * 10 <= n_lines)
               AND (n_ellipsis * 10 < n_lines * 3)
               AND (n_words > 0 AND n_alpha * 5 >= n_words * 4)
               AND (n_stops >= 2) AS pass
      FROM m
      ORDER BY doc_id"""))

  /** q148: C4 line-level cleaning ([[graft.operators.QualityRules.c4Clean]],
    * Raffel et al. 2020 §2.2). The corpus text is single-line
    * punctuation-free prose, so the query PLANTS every rule both ways
    * (the q144 pattern): docs ≡0 mod 2 gain a proper kept sentence,
    * mod 7 a kept question, mod 17 a kept end-quote line, mod 3 a
    * too-short punctuated line, mod 5 a javascript line, mod 11 an
    * inline "lorem ipsum", mod 13 a curly-brace code line; the base
    * line itself always dies (no terminal punctuation). minKeptLines=2
    * so the doc gate needs two planted keepers (mod 14/34/119…),
    * firing both ways across the corpus. */
  private val q148 = QuerySpec(
    "q148_c4_clean",
    (s, dir) => {
      val planted = Tables.documents(s, dir)
        .withColumn("raw", concat(col("text"),
          when(pmod(col("doc_id"), lit(2)) === 0,
            lit("\nthis planted sentence talks about data pipelines and ends well."))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(3)) === 0,
            lit("\nshort one.")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(5)) === 0,
            lit("\nenable the javascript runtime to keep reading this page."))
            .otherwise(lit("")),
          when(pmod(col("doc_id"), lit(7)) === 0,
            lit("\nwhy not ask a question instead?")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(11)) === 0,
            lit(" lorem ipsum dolor sit amet")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(13)) === 0,
            lit("\nfunction() { return 1; }")).otherwise(lit("")),
          when(pmod(col("doc_id"), lit(17)) === 0,
            lit("\nhe said \"the corpus is clean.\"")).otherwise(lit(""))))
      graft.operators.QualityRules.c4Clean(planted, "doc_id", "raw",
          minWordsPerLine = 3, minKeptLines = 2)
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH raw AS (
        SELECT doc_id,
               text
                 || CASE WHEN doc_id % 2 = 0
                      THEN chr(10) || 'this planted sentence talks about data pipelines and ends well.'
                      ELSE '' END
                 || CASE WHEN doc_id % 3 = 0
                      THEN chr(10) || 'short one.' ELSE '' END
                 || CASE WHEN doc_id % 5 = 0
                      THEN chr(10) || 'enable the javascript runtime to keep reading this page.'
                      ELSE '' END
                 || CASE WHEN doc_id % 7 = 0
                      THEN chr(10) || 'why not ask a question instead?'
                      ELSE '' END
                 || CASE WHEN doc_id % 11 = 0
                      THEN ' lorem ipsum dolor sit amet' ELSE '' END
                 || CASE WHEN doc_id % 13 = 0
                      THEN chr(10) || 'function() { return 1; }' ELSE '' END
                 || CASE WHEN doc_id % 17 = 0
                      THEN chr(10) || 'he said ' || chr(34)
                        || 'the corpus is clean.' || chr(34)
                      ELSE '' END
                 AS raw
        FROM documents),
      m AS (
        SELECT doc_id, raw,
               string_split(raw, chr(10)) AS lines,
               list_filter(string_split(raw, chr(10)), l ->
                 (ends_with(rtrim(l), '.') OR ends_with(rtrim(l), '!')
                   OR ends_with(rtrim(l), '?') OR ends_with(rtrim(l), chr(34)))
                 AND len(list_filter(string_split_regex(l, '\s+'),
                       x -> x <> '')) >= 3
                 AND NOT contains(lower(l), 'javascript')) AS kept
        FROM raw)
      SELECT doc_id,
             CAST(len(lines) AS BIGINT) AS n_lines,
             CAST(len(kept) AS BIGINT) AS n_kept,
             len(kept) >= 2 AS r_min_lines,
             NOT contains(lower(raw), 'lorem ipsum') AS r_lorem,
             NOT (contains(raw, '{') OR contains(raw, '}')) AS r_brace,
             (len(kept) >= 2
               AND NOT contains(lower(raw), 'lorem ipsum')
               AND NOT (contains(raw, '{') OR contains(raw, '}'))) AS pass,
             coalesce(array_to_string(kept, chr(10)), '') AS clean_text
      FROM m
      ORDER BY doc_id"""))

  /** q150: CCNet perplexity buckets
    * ([[graft.operators.BigramLm.perplexityBuckets]], Wenzek et al.
    * 2020) — per-source head/middle/tail cut on the exact-integer
    * per-bigram cost. The oracle extends q134's LM chain with the
    * integer cost and a plain `ntile` window (tiny data on the oracle
    * side; the Spark side earns the same numbers from the two-phase
    * banded ranking + ANSI-NTILE arithmetic — the q84 no-hot-window
    * shape). */
  private val q150 = QuerySpec(
    "q150_perplexity_buckets",
    (s, dir) =>
      graft.operators.BigramLm.perplexityBuckets(
          Tables.documents(s, dir), "doc_id", "text", "source", nBuckets = 3)
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                           x -> x <> '') AS w
        FROM documents),
      pairs AS (
        SELECT doc_id,
               list_extract(w, CAST(i AS INT)) AS w1,
               list_extract(w, CAST(i + 1 AS INT)) AS w2
        FROM (SELECT doc_id, w, unnest(range(1, len(w))) AS i
              FROM toks WHERE len(w) >= 2)),
      bc AS (SELECT w1, w2, count(*) AS cnt FROM pairs GROUP BY 1, 2),
      ctx AS (SELECT w1, sum(cnt) AS ctx_cnt FROM bc GROUP BY 1),
      lm AS (
        SELECT w1, w2,
               CAST(round(ln(CAST(cnt AS DOUBLE) / ctx_cnt) * 1000000, 0) AS BIGINT)
                 AS lp_micro
        FROM bc JOIN ctx USING (w1)),
      ut AS (SELECT unnest(w) AS token FROM toks),
      uc AS (SELECT token, count(*) AS cnt FROM ut GROUP BY 1),
      un AS (SELECT count(*) AS n_total FROM ut),
      ulm AS (
        SELECT token,
               CAST(round(ln(CAST(cnt AS DOUBLE) / n_total) * 1000000, 0) AS BIGINT)
                 AS uni_lp
        FROM uc CROSS JOIN un),
      tf AS (SELECT doc_id, w1, w2, count(*) AS tf FROM pairs GROUP BY 1, 2, 3),
      sc AS (
        SELECT tf.doc_id,
               CAST(sum(tf) AS INTEGER) AS n_bigrams,
               sum(tf * coalesce(lm.lp_micro,
                     coalesce(ulm.uni_lp, -20000000) + -5000000)) AS lp_sum
        FROM tf
        LEFT JOIN lm ON lm.w1 = tf.w1 AND lm.w2 = tf.w2
        LEFT JOIN ulm ON ulm.token = tf.w2
        GROUP BY 1),
      scg AS (
        SELECT d.doc_id, d.source,
               CAST(coalesce(sc.n_bigrams, 0) AS INTEGER) AS n_bigrams,
               CASE WHEN sc.n_bigrams > 0
                 THEN CAST((-sc.lp_sum) * 1000 // sc.n_bigrams AS BIGINT)
                 END AS cost_milli
        FROM documents d LEFT JOIN sc ON sc.doc_id = d.doc_id)
      SELECT doc_id, source, n_bigrams, cost_milli,
             CAST(ntile(3) OVER (PARTITION BY source
               ORDER BY cost_milli, doc_id) AS INT) AS bucket
      FROM scg WHERE cost_milli IS NOT NULL
      UNION ALL
      SELECT doc_id, source, n_bigrams, NULL, NULL
      FROM scg WHERE cost_milli IS NULL
      ORDER BY doc_id"""))

  /** q156: token-distribution KL drift
    * ([[graft.operators.UnigramLm.klDrift]]) — the corpus-version
    * language alarm: per-token KL contributions of the md5-tail slice
    * (P, the q82 "eval" convention) against its complement (Q), top
    * 20 drivers plus the corpus-level total. Integer-exact
    * contributions over the micro-quantized LMs; only the final
    * normalization divides, as a double. */
  private val q156 = QuerySpec(
    "q156_kl_drift",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val isP = substring(md5(col("doc_id").cast("string")), 1, 1) < "2"
      graft.operators.UnigramLm.klDrift(
          docs.filter(isP), docs.filter(!isP), "text", k = 20)
        .orderBy(col("rank"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2' AS is_p,
               unnest(list_filter(string_split_regex(coalesce(text, ''), '\s+'),
                 x -> x <> '')) AS token
        FROM documents),
      cp AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
             FROM toks WHERE is_p GROUP BY 1),
      cq AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt
             FROM toks WHERE NOT is_p GROUP BY 1),
      lp AS (
        SELECT token, cnt,
               CAST(round(ln(CAST(cnt AS DOUBLE)
                 / (SELECT sum(cnt) FROM cp)) * 1000000, 0) AS BIGINT)
                 AS lp_micro
        FROM cp),
      lq AS (
        SELECT token,
               CAST(round(ln(CAST(cnt AS DOUBLE)
                 / (SELECT sum(cnt) FROM cq)) * 1000000, 0) AS BIGINT)
                 AS lp_micro
        FROM cq),
      contrib AS MATERIALIZED (
        SELECT lp.token, lp.cnt AS cnt_p, lp.lp_micro AS lp_p_micro,
               lq.lp_micro AS lp_q_micro,
               CAST(lp.cnt * (lp.lp_micro - coalesce(lq.lp_micro, -20000000))
                 AS BIGINT) AS contrib_micro
        FROM lp LEFT JOIN lq USING (token)),
      tot AS (SELECT sum(contrib_micro) AS s, sum(cnt_p) AS n FROM contrib)
      SELECT CAST(row_number() OVER (ORDER BY contrib_micro DESC, token ASC)
               AS INTEGER) AS rank,
             token, cnt_p, lp_p_micro, lp_q_micro, contrib_micro,
             round(CAST((SELECT s FROM tot) AS DOUBLE)
               / (SELECT n FROM tot) / 1000000.0, 6) AS kl_nats
      FROM contrib
      ORDER BY contrib_micro DESC, token ASC
      LIMIT 20"""))

  /** The synthetic crawl page both q173/q174 sides construct from the
    * documents table — exercises every extractor rule: title with a
    * named entity, style + script elements (dropped with content),
    * block breaks, the full entity spectrum (named, decimal ASCII,
    * hex ASCII, non-ASCII numeric which must pass THROUGH), a real
    * link, a fragment-only link (excluded), and a comment hiding
    * markup. */
  private val htmlPageSql =
    """'<html><head><title>Doc ' || CAST(doc_id AS VARCHAR) ||
      ' &amp; Co</title><style>p{color:red}</style></head><body>' ||
      '<h1>Report</h1><p>' || text || '</p>' ||
      '<script>var x = 1 &lt; 2;</script>' ||
      '<p>A &lt;tag&gt; &quot;quoted&quot; &#65;&#x42; &#955; B</p>' ||
      '<a href="/doc/' || CAST(doc_id * 7 % 500 AS VARCHAR) ||
      '">next</a><a href=''#frag''>skip</a>' ||
      '<!-- hidden <p>comment</p> --></body></html>'"""
      .replaceAll("\n\\s+", " ")

  private def htmlPage: org.apache.spark.sql.Column = concat(
    lit("<html><head><title>Doc "), col("doc_id").cast("string"),
    lit(" &amp; Co</title><style>p{color:red}</style></head><body>"),
    lit("<h1>Report</h1><p>"), col("text"), lit("</p>"),
    lit("<script>var x = 1 &lt; 2;</script>"),
    lit("<p>A &lt;tag&gt; &quot;quoted&quot; &#65;&#x42; &#955; B</p>"),
    lit("<a href=\"/doc/"), (col("doc_id") * 7 % 500).cast("string"),
    lit("\">next</a><a href='#frag'>skip</a>"),
    lit("<!-- hidden <p>comment</p> --></body></html>"))

  /** q173: HTML → text extraction
    * ([[graft.operators.HtmlExtract.extractText]]) — the crawl-to-text
    * stage before every other curation operator: comments/script/style
    * dropped with their content, block ends become line breaks, tags
    * strip, entities decode (named + printable-ASCII numeric; the
    * non-ASCII `&#955;` passes through by the documented portable
    * rule), lines whitespace-normalize. DuckDB replays the entire
    * chain over the identically-constructed page. */
  private val q173 = QuerySpec(
    "q173_html_extract",
    (s, dir) =>
      graft.operators.HtmlExtract.extractText(
          Tables.documents(s, dir).withColumn("html", htmlPage),
          "doc_id", "html")
        .orderBy(col("doc_id")),
    oracle = Some(graft.operators.HtmlExtract.extractOracle(
      "documents", "doc_id", htmlPageSql)),
    bench = true)

  /** q174: crawl-link extraction
    * ([[graft.operators.HtmlExtract.links]]) — the edge list a crawl
    * graph consumes (q109's PageRank input shape): every `<a href>`
    * target in document order, fragment-only links excluded. */
  private val q174 = QuerySpec(
    "q174_html_links",
    (s, dir) =>
      graft.operators.HtmlExtract.links(
          Tables.documents(s, dir).withColumn("html", htmlPage),
          "doc_id", "html")
        .orderBy(col("doc_id"), col("pos")),
    oracle = Some(s"""
      WITH raw AS (
        SELECT doc_id, $htmlPageSql AS h FROM documents),
      l AS (
        SELECT doc_id,
               regexp_extract_all(h,
                 '(?is)<a\\s[^>]*href=["'']([^"''#][^"'']*)["'']', 1) AS ls
        FROM raw)
      SELECT doc_id,
             CAST(generate_subscripts(ls, 1) - 1 AS INTEGER) AS pos,
             unnest(ls) AS href
      FROM l
      ORDER BY doc_id, pos"""))

  /** The synthetic crawl URL both q175/q176 sides construct: an
    * optional `news.` subdomain, a per-source registrable label, and
    * a TLD split between `.com` and the multi-part `.co.uk` — so the
    * registered-domain arithmetic (2 vs 3 labels) and the suffix
    * matching both get exercised on every engine. */
  private val urlSql =
    """'https://' || (CASE WHEN doc_id % 3 = 0 THEN 'news.' ELSE '' END) ||
      'example-' || source ||
      (CASE WHEN doc_id % 4 = 0 THEN '.co.uk' ELSE '.com' END) ||
      '/p/' || CAST(doc_id AS VARCHAR)""".replaceAll("\n\\s+", " ")

  private def urlCol: org.apache.spark.sql.Column = concat(
    lit("https://"),
    when(col("doc_id") % 3 === 0, lit("news.")).otherwise(lit("")),
    lit("example-"), col("source"),
    when(col("doc_id") % 4 === 0, lit(".co.uk")).otherwise(lit(".com")),
    lit("/p/"), col("doc_id").cast("string"))

  /** q175: per-domain triage report
    * ([[graft.operators.UrlCuration.domainReport]]) — the URL-first
    * curation table (RefinedWeb/FineWeb order: judge domains before
    * scoring a byte of text): host regexp → registered domain
    * (label arithmetic over the multi-part-TLD list) → one domain-key
    * aggregate of doc counts, token counts, and the q36 quality
    * integer's half-up mean. */
  private val q175 = QuerySpec(
    "q175_domain_report",
    (s, dir) =>
      graft.operators.UrlCuration.domainReport(
          Tables.documents(s, dir).withColumn("url", urlCol), "url", "text")
        .orderBy(col("domain")),
    oracle = Some(graft.operators.UrlCuration.domainReportOracle(
      "documents", urlSql, "text")))

  /** q176: blocklist gate with SUFFIX semantics
    * ([[graft.operators.UrlCuration.blocklistFilter]]) — blocking a
    * registered domain drops its subdomains too, and blocking a bare
    * public suffix (`co.uk`) drops everything under it; the blocklist
    * joins as broadcast DATA against each host's exploded suffix set,
    * never a per-row regex loop. */
  private val q176 = QuerySpec(
    "q176_url_blocklist",
    (s, dir) => {
      import s.implicits._
      val blocked = Seq("example-src3.com", "co.uk").toDF("domain")
      graft.operators.UrlCuration.blocklistFilter(
          Tables.documents(s, dir).withColumn("url", urlCol), "url", blocked)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(s"""
      WITH h AS (
        SELECT doc_id,
               lower(regexp_extract($urlSql,
                 '^(?:[a-zA-Z][a-zA-Z0-9+.-]*://)?(?:[^/@?#]*@)?([^/:?#]+)',
                 1)) AS host
        FROM documents),
      sfx AS (
        SELECT doc_id,
               list_transform(range(1, len(string_split(host, '.')) + 1),
                 i -> array_to_string(string_split(host, '.')[i:], '.')) AS ss
        FROM h)
      SELECT doc_id FROM sfx
      WHERE NOT list_has_any(ss, ['example-src3.com', 'co.uk'])
      ORDER BY doc_id"""))

  /** The q179 rule snippet — every PSL rule class on a few lines:
    * normal multi-part (`co.uk`, `gov.au`), wildcard (`*.ck`,
    * `*.kobe.jp`), exception (`!www.ck`), single-label anchors, a
    * private-section platform suffix (`blogspot.com`), and `.com`
    * deliberately ABSENT so the implicit `*` fallback is exercised
    * too. Parsed by the real parser (comment line included). */
  private val psl179 = graft.operators.UrlCuration.parsePsl(Seq(
    "// q179 test rules", "uk", "co.uk", "au", "gov.au",
    "ck", "*.ck", "!www.ck", "jp", "*.kobe.jp", "blogspot.com"))

  /** The q179 URL mix: subdomain-SHARDED hosts under a third-level
    * registrable suffix (`a0.shard-src.gov.au` — must collapse),
    * plain `co.uk`, platform subdomains (registrants under
    * `blogspot.com`), the wildcard+exception pair (`sub.www.ck` →
    * registered `www.ck`), a wildcard-made public suffix
    * (`shop.other.kobe.jp` stays 4 labels), and unlisted `.com`
    * falling back to the implicit `*` rule. */
  private val url179Sql =
    """'https://' || (CASE doc_id % 6
        WHEN 0 THEN 'a' || CAST(doc_id % 3 AS VARCHAR) || '.shard-'
                    || source || '.gov.au'
        WHEN 1 THEN 'example-' || source || '.co.uk'
        WHEN 2 THEN source || '.blogspot.com'
        WHEN 3 THEN 'sub.www.ck'
        WHEN 4 THEN 'shop.other.kobe.jp'
        ELSE 'news.example-' || source || '.com' END) ||
      '/p/' || CAST(doc_id AS VARCHAR)""".replaceAll("\n\\s+", " ")

  private def url179: org.apache.spark.sql.Column = concat(
    lit("https://"),
    when(col("doc_id") % 6 === 0,
        concat(lit("a"), (col("doc_id") % 3).cast("string"),
          lit(".shard-"), col("source"), lit(".gov.au")))
      .when(col("doc_id") % 6 === 1,
        concat(lit("example-"), col("source"), lit(".co.uk")))
      .when(col("doc_id") % 6 === 2,
        concat(col("source"), lit(".blogspot.com")))
      .when(col("doc_id") % 6 === 3, lit("sub.www.ck"))
      .when(col("doc_id") % 6 === 4, lit("shop.other.kobe.jp"))
      .otherwise(concat(lit("news.example-"), col("source"), lit(".com"))),
    lit("/p/"), col("doc_id").cast("string"))

  /** q179: per-domain report under the FULL PSL algorithm
    * ([[graft.operators.UrlCuration.domainReportPsl]]) — rules join
    * as a broadcast equi-keyed relation (never a literal, never a
    * per-row loop), wildcard stems count +1, a matching exception
    * prevails, unmatched TLDs fall to the implicit `*`. The
    * subdomain-sharded `gov.au` hosts MUST collapse to one
    * registered-domain row each — the property that makes per-domain
    * quotas ungameable. DuckDB replays rule parsing (as VALUES),
    * resolution, and the quality integer end to end. */
  private val q179 = QuerySpec(
    "q179_psl_domain_report",
    (s, dir) =>
      graft.operators.UrlCuration.domainReportPsl(
          Tables.documents(s, dir).withColumn("url", url179),
          "url", "text",
          graft.operators.UrlCuration.pslRuleRelation(s, psl179))
        .orderBy(col("domain")),
    oracle = Some(graft.operators.UrlCuration.domainReportPslOracle(
      "documents", url179Sql, "text", psl179, "doc_id")))

  /** q180: crawl-archive ingestion end to end
    * ([[graft.io.WarcRecords.splitRecords]] ∘ extraction) — both
    * sides synthesize multi-record WARC archives from the documents
    * table (10 archives of ~50 records each: version line, Type/URI/
    * Content-Length headers, CRLF-CRLF, payload), the Spark side
    * scans them with the content-length-driven byte scanner, and the
    * extracted prose replays through the full q173 entity chain.
    * DuckDB rebuilds the identical archives (`string_agg` ordered by
    * doc id ≡ the sorted-collect), splits on the record marker, and
    * cuts each payload at its DECLARED length via substring — exact
    * here because the fixture is ASCII (byte = char); the scanner's
    * byte-true behavior on multibyte and marker-bearing payloads is
    * spec-pinned where SQL replay cannot reach. */
  private val q180 = QuerySpec(
    "q180_warc_extract",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val rec = docs.select(
        (col("doc_id") % 10).as("aid"), col("doc_id"),
        concat(
          lit("WARC/1.0\r\nWARC-Type: response\r\n" +
            "WARC-Target-URI: https://example-"),
          col("source"), lit(".com/p/"), col("doc_id").cast("string"),
          lit("\r\nContent-Length: "),
          octet_length(htmlPage).cast("string"),
          lit("\r\n\r\n"), htmlPage, lit("\r\n\r\n")).as("rec"))
      val archives = rec.groupBy(col("aid"))
        .agg(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec")), "").as("content"))
      val records = graft.io.WarcRecords
        .splitRecords(archives, "aid", "content")
        .withColumn("__k",
          struct(col("aid").cast("long").as("archive_id"),
            col("record_idx").as("record_idx"),
            col("target_uri").as("url")))
        .withColumn("html", col("payload").cast("string"))
      graft.operators.HtmlExtract.extractText(records, "__k", "html")
        .select(col("__k.archive_id").as("archive_id"),
          col("__k.record_idx").as("record_idx"),
          col("__k.url").as("url"), col("title"), col("text"))
        .orderBy(col("archive_id"), col("record_idx"))
    },
    oracle = Some(graft.operators.HtmlExtract.extractOracle(
      s"""(WITH braw AS (
            SELECT doc_id, doc_id % 10 AS aid, source,
                   $htmlPageSql AS hh
            FROM documents),
          brec AS (
            SELECT aid, doc_id,
              'WARC/1.0' || chr(13) || chr(10) ||
              'WARC-Type: response' || chr(13) || chr(10) ||
              'WARC-Target-URI: https://example-' || source || '.com/p/' ||
                CAST(doc_id AS VARCHAR) || chr(13) || chr(10) ||
              'Content-Length: ' || CAST(strlen(hh) AS VARCHAR) ||
                chr(13) || chr(10) || chr(13) || chr(10) ||
              hh || chr(13) || chr(10) || chr(13) || chr(10) AS r
            FROM braw),
          arch AS (
            SELECT aid, string_agg(r, '' ORDER BY doc_id) AS content
            FROM brec GROUP BY aid),
          p0 AS (
            SELECT aid, string_split(content,
              'WARC/1.0' || chr(13) || chr(10)) AS ps
            FROM arch),
          pieces AS (
            SELECT aid,
                   CAST(generate_subscripts(ps, 1) - 2 AS INTEGER)
                     AS record_idx,
                   unnest(ps) AS piece
            FROM p0),
          good AS (SELECT * FROM pieces WHERE record_idx >= 0),
          recs AS (
            SELECT aid, record_idx,
              substring(piece, 1, strpos(piece,
                chr(13)||chr(10)||chr(13)||chr(10)) - 1) AS hdr,
              substring(piece,
                strpos(piece, chr(13)||chr(10)||chr(13)||chr(10)) + 4,
                CAST(regexp_extract(substring(piece, 1, strpos(piece,
                    chr(13)||chr(10)||chr(13)||chr(10)) - 1),
                  'Content-Length: ([0-9]+)', 1) AS BIGINT)) AS payload
            FROM good)
          SELECT CAST(aid AS BIGINT) AS archive_id, record_idx,
                 regexp_extract(hdr, 'WARC-Target-URI: ([^\\r\\n]+)', 1)
                   AS url,
                 payload
          FROM recs) w""",
      "archive_id, record_idx, url", "payload")))

  /** q207: the MEDIA leg of the crawl scanner
    * ([[graft.io.WarcRecords.toCrawlMedia]]) — archives carrying
    * BINARY payloads (real PNG renders, a real RIFF/WAVE track, the
    * GFV1 frame container, plain HTML, and an HTTP-ENVELOPED PNG)
    * split by the same content-length scanner and route to the Media
    * shape by the BODY's magic: html drops to the document leg's
    * territory, the enveloped PNG routes to image ONLY because the
    * byte-level envelope strip ran before the sniff (enveloped bytes
    * start with `HTTP/`, not a magic), and `WARC-Date` surfaces as
    * the per-record event time. The oracle replays the class→kind map
    * and the date over the same ids (the q205 thin-routing pattern —
    * the kind pipelines' CONTENTS are q194–q204's job; this pins that
    * crawl archives now FEED them). q180's text leg is untouched:
    * the two legs partition the archive by content. */
  private val q207 = QuerySpec(
    "q207_warc_media_extract",
    (s, dir) => {
      import graft.multimodal.{AudioWave, Multimodal, PerceptualHash}
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val mkRec = udf((id: Long) => {
        val g = id / 5
        val payload: Array[Byte] = (id % 5) match {
          case 0 => PerceptualHash.renderGrayImage(16, 16, g, g % 5 + 1,
            g % 11 + 1, 0, 0, "png")
          case 1 => AudioWave.writeWav(
            Array.tabulate(256)(t => (((g + t) % 64 - 32) * 256).toInt),
            16000, 16)
          case 2 => Multimodal.packImageFrames(Seq(
            PerceptualHash.renderGrayImage(16, 16, g, 2, 3, 0, 0, "png")))
          case 3 =>
            s"<html><body><p>plain page $g</p></body></html>"
              .getBytes("UTF-8")
          case _ =>
            val png = PerceptualHash.renderGrayImage(16, 16, g + 7,
              g % 5 + 1, g % 11 + 1, 0, 0, "png")
            ("HTTP/1.1 200 OK\r\n" +
              "Content-Type: application/octet-stream\r\n\r\n")
              .getBytes("ISO-8859-1") ++ png
        }
        (s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: https://m.example/$id\r\n" +
          "WARC-Date: 2026-01-02T03:04:05Z\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n")
          .getBytes("ISO-8859-1") ++
          payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
      })
      val concatBytes = udf((rs: Seq[Array[Byte]]) => rs.flatten.toArray)
      val archives = docs
        .select((col("doc_id") % 10).as("aid"), col("doc_id"),
          mkRec(col("doc_id")).as("rec"))
        .groupBy(col("aid"))
        .agg(concatBytes(transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec"))).as("content"))
      graft.io.WarcRecords.toCrawlMedia(archives, "aid", "content")
        .select(col("url"), col("kind"),
          unix_micros(col("mtime")).as("mtime_us"))
        .orderBy(col("url"))
    },
    oracle = Some("""
      SELECT 'https://m.example/' || CAST(doc_id AS VARCHAR) AS url,
             CASE doc_id % 5 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  WHEN 2 THEN 'video' ELSE 'image' END AS kind,
             epoch_us(TIMESTAMP '2026-01-02 03:04:05') AS mtime_us
      FROM documents WHERE doc_id < 300 AND doc_id % 5 <> 3
      ORDER BY url"""))

  /** q209: the SHARED single-pass crawl splitter
    * ([[graft.io.WarcRecords.toCrawlRecordsRouted]]) — ONE
    * content-length scan routes every response record by its stripped
    * body's magic into doc-or-media territory, where composing the
    * two single-leg operators (q180's text leg + q207's media leg)
    * would inflate and parse every archive TWICE — at crawl scale
    * decompression dominates ingest cost, so the routed split is the
    * plan shape [[graft.pipelines.StreamingIngestPipeline
    * .runArchiveIngest]] runs per micro-batch. Six record classes in
    * one archive mix: a real PNG, a RIFF/WAVE track, the GFV1 frame
    * container, plain HTML (→ doc, text carried through), an
    * HTTP-ENVELOPED PNG (→ image ONLY because the byte-level strip
    * runs before the sniff), and an HTTP-ENVELOPED HTML page (→ doc
    * whose TEXT is the stripped body — the doc-side envelope cut
    * pinned in the same pass). The oracle replays the class→kind map,
    * both doc classes' exact text, and the per-record WARC-Date. */
  private val q209 = QuerySpec(
    "q209_warc_routed_split",
    (s, dir) => {
      import graft.multimodal.{AudioWave, Multimodal, PerceptualHash}
      val docs = Tables.documents(s, dir).filter(col("doc_id") < 300)
      val mkRec = udf((id: Long) => {
        val g = id / 6
        val payload: Array[Byte] = (id % 6) match {
          case 0 => PerceptualHash.renderGrayImage(16, 16, g, g % 5 + 1,
            g % 11 + 1, 0, 0, "png")
          case 1 => AudioWave.writeWav(
            Array.tabulate(256)(t => (((g + t) % 64 - 32) * 256).toInt),
            16000, 16)
          case 2 => Multimodal.packImageFrames(Seq(
            PerceptualHash.renderGrayImage(16, 16, g, 2, 3, 0, 0, "png")))
          case 3 =>
            s"<html><body><p>plain page $g</p></body></html>"
              .getBytes("UTF-8")
          case 4 =>
            val png = PerceptualHash.renderGrayImage(16, 16, g + 7,
              g % 5 + 1, g % 11 + 1, 0, 0, "png")
            ("HTTP/1.1 200 OK\r\n" +
              "Content-Type: application/octet-stream\r\n\r\n")
              .getBytes("ISO-8859-1") ++ png
          case _ =>
            ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
              s"<html><body><p>enveloped page $g</p></body></html>")
              .getBytes("ISO-8859-1")
        }
        (s"WARC/1.0\r\nWARC-Type: response\r\n" +
          s"WARC-Target-URI: https://r.example/$id\r\n" +
          "WARC-Date: 2026-01-02T03:04:05Z\r\n" +
          s"Content-Length: ${payload.length}\r\n\r\n")
          .getBytes("ISO-8859-1") ++
          payload ++ "\r\n\r\n".getBytes("ISO-8859-1")
      })
      val concatBytes = udf((rs: Seq[Array[Byte]]) => rs.flatten.toArray)
      val archives = docs
        .select((col("doc_id") % 10).as("aid"), col("doc_id"),
          mkRec(col("doc_id")).as("rec"))
        .groupBy(col("aid"))
        .agg(concatBytes(transform(
          array_sort(collect_list(struct(col("doc_id"), col("rec")))),
          x => x.getField("rec"))).as("content"))
      graft.io.WarcRecords.toCrawlRecordsRouted(archives, "aid", "content")
        .select(col("url"), col("kind"), col("text"),
          unix_micros(col("mtime")).as("mtime_us"))
        .orderBy(col("url"))
    },
    oracle = Some("""
      SELECT 'https://r.example/' || CAST(doc_id AS VARCHAR) AS url,
             CASE doc_id % 6 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                  WHEN 2 THEN 'video' WHEN 3 THEN 'doc' WHEN 4 THEN 'image'
                  ELSE 'doc' END AS kind,
             CASE doc_id % 6
               WHEN 3 THEN '<html><body><p>plain page '
                 || CAST(doc_id // 6 AS VARCHAR) || '</p></body></html>'
               WHEN 5 THEN '<html><body><p>enveloped page '
                 || CAST(doc_id // 6 AS VARCHAR) || '</p></body></html>'
               ELSE NULL END AS text,
             epoch_us(TIMESTAMP '2026-01-02 03:04:05') AS mtime_us
      FROM documents WHERE doc_id < 300
      ORDER BY url"""))

  /** The q186/q187 messy-URL mix: every canonicalization rule class —
    * upper-case scheme/host + default https port + tracker + fragment
    * (0), default http port + shuffled params (1), already canonical
    * (2), all-tracker query (3), duplicate param names out of order
    * (4), bare host with no path (5), mixed trackers (6), query with
    * NO path (7 — the authority must cut at '?', the params must
    * still drop/sort, and the empty path becomes '/'). Classes
    * 1/3/4/5/6/7 omit doc_id from the URL, so each (source, class)
    * group canonicalizes to ONE form — the q187 dedup fixture. */
  private val url186Sql =
    """CASE doc_id % 8
        WHEN 0 THEN 'HTTPS://Example-' || upper(source)
                    || '.COM:443/Path/' || CAST(doc_id AS VARCHAR)
                    || '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR)
                    || '#sec-2'
        WHEN 1 THEN 'http://example-' || source || '.com:80/a?b=2&a=1'
        WHEN 2 THEN 'https://example-' || source || '.com/p/'
                    || CAST(doc_id AS VARCHAR)
        WHEN 3 THEN 'https://example-' || source
                    || '.com/p?gclid=zz&x=1&utm_campaign=c'
        WHEN 4 THEN 'http://EXAMPLE-' || source || '.com/q?z=9&y=8&z=1'
        WHEN 5 THEN 'https://example-' || source || '.com'
        WHEN 6 THEN 'https://example-' || source
                    || '.com/t?fbclid=abc&utm_medium=m'
        ELSE 'https://Example-' || source || '.com?b=2&A=1&utm_x=9' END"""
      .replaceAll("\n\\s+", " ")

  private def url186: org.apache.spark.sql.Column = {
    val d = col("doc_id").cast("string")
    when(col("doc_id") % 8 === 0,
        concat(lit("HTTPS://Example-"), upper(col("source")),
          lit(".COM:443/Path/"), d, lit("?utm_source=feed&id="), d,
          lit("#sec-2")))
      .when(col("doc_id") % 8 === 1,
        concat(lit("http://example-"), col("source"),
          lit(".com:80/a?b=2&a=1")))
      .when(col("doc_id") % 8 === 2,
        concat(lit("https://example-"), col("source"), lit(".com/p/"), d))
      .when(col("doc_id") % 8 === 3,
        concat(lit("https://example-"), col("source"),
          lit(".com/p?gclid=zz&x=1&utm_campaign=c")))
      .when(col("doc_id") % 8 === 4,
        concat(lit("http://EXAMPLE-"), col("source"),
          lit(".com/q?z=9&y=8&z=1")))
      .when(col("doc_id") % 8 === 5,
        concat(lit("https://example-"), col("source"), lit(".com")))
      .when(col("doc_id") % 8 === 6,
        concat(lit("https://example-"), col("source"),
          lit(".com/t?fbclid=abc&utm_medium=m")))
      .otherwise(concat(lit("https://Example-"), col("source"),
        lit(".com?b=2&A=1&utm_x=9")))
  }

  /** q186: URL canonicalization
    * ([[graft.operators.UrlCuration.canonicalUrl]]) — the crawl-dedup
    * front normalizer: fragment/default-port/case/tracking-parameter
    * noise collapses and surviving query params sort, all as narrow
    * engine-portable string/array arithmetic (no UDF, no parse_url).
    * DuckDB replays every step — the split points, the port strips,
    * the tracker filter (same interpolated lists), the binary param
    * sort — bit for bit on the full messy mix. */
  private val q186 = QuerySpec(
    "q186_url_canonicalize",
    (s, dir) =>
      Tables.documents(s, dir)
        .select(col("doc_id"),
          graft.operators.UrlCuration.canonicalUrl(url186).as("canonical"))
        .orderBy(col("doc_id")),
    oracle = Some(s"""
      WITH src AS (SELECT doc_id, $url186Sql AS url FROM documents),
      ${graft.operators.UrlCuration.canonicalUrlCtes("src", "doc_id", "url")}
      SELECT doc_id, canonical FROM ccanon ORDER BY doc_id"""))

  /** q187: canonical-URL dedup
    * ([[graft.operators.UrlCuration.canonicalUrlDedup]]) — the stage
    * the canonicalizer exists for: one survivor per canonical form
    * (smallest doc id, the dedup family's keep-best rule), NULL-url
    * rows all kept. Classes 1/3/4/5/6 of the mix collapse to one row
    * per (source, class); a planted NULL-url row rides through.
    * DuckDB elects the same keepers from the same canonical relation. */
  private val q187 = QuerySpec(
    "q187_url_canonical_dedup",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir)
        .select(col("doc_id"), url186.as("url"))
        .unionByName(Seq((9999993L, null.asInstanceOf[String]))
          .toDF("doc_id", "url"))
      graft.operators.UrlCuration.canonicalUrlDedup(docs, "url", "doc_id")
        .orderBy(col("doc_id"))
    },
    oracle = Some(s"""
      WITH src AS (
        SELECT doc_id, $url186Sql AS url FROM documents
        UNION ALL SELECT 9999993, NULL),
      ${graft.operators.UrlCuration.canonicalUrlCtes("src", "doc_id", "url")},
      keep AS (
        SELECT min(doc_id) AS doc_id FROM ccanon
        WHERE canonical IS NOT NULL GROUP BY canonical
        UNION ALL
        SELECT doc_id FROM ccanon WHERE canonical IS NULL)
      SELECT s.doc_id, s.url FROM src s JOIN keep USING (doc_id)
      ORDER BY s.doc_id"""))

  /** The q188/q189 meta-signal page mix: robots noindex in both
    * attribute orders and cases (0, 1), `<link rel=canonical>` in
    * both orders/quote styles with case- and tracker-noised targets
    * that canonicalize EQUAL per source (2, 3 — the q189 collapse
    * pair), a plain page (4), a RELATIVE declared canonical (5 —
    * must resolve against the fetch URL, collapsing within a source
    * but NEVER across sources), a commented-out noindex plus a
    * robots-nocontent meta (6 — neither is a robots directive; the
    * page must survive the gate), and rel="canonical-alt" (7 — a
    * DIFFERENT declaration, not a canonical; falls back to the fetch
    * URL). */
  private val page188Sql =
    """CASE doc_id % 8
        WHEN 0 THEN '<html><head><meta name="robots" content="nofollow, noindex"></head><body><p>' || text || '</p></body></html>'
        WHEN 1 THEN '<html><head><META CONTENT=''NOINDEX'' NAME=''Robots''></head><body><p>' || text || '</p></body></html>'
        WHEN 2 THEN '<html><head><link rel="canonical" href="https://Canon-' || source || '.example/Article"></head><body><p>' || text || '</p></body></html>'
        WHEN 3 THEN '<html><head><link href=''https://canon-' || source || '.example/Article?utm_x=1'' rel=''canonical''></head><body><p>' || text || '</p></body></html>'
        WHEN 4 THEN '<html><head></head><body><p>' || text || '</p></body></html>'
        WHEN 5 THEN '<html><head><link rel="canonical" href="/Article"></head><body><p>' || text || '</p></body></html>'
        WHEN 6 THEN '<html><head><!-- <meta name="robots" content="noindex"> --><meta name="robots-nocontent" content="noindex"></head><body><p>' || text || '</p></body></html>'
        ELSE '<html><head><link rel="canonical-alt" href="https://alt-' || source || '.example/x"></head><body><p>' || text || '</p></body></html>' END"""
      .replaceAll("\n\\s+", " ")

  private def page188: org.apache.spark.sql.Column = {
    val body = concat(lit("<body><p>"), col("text"), lit("</p></body></html>"))
    when(col("doc_id") % 8 === 0, concat(
        lit("<html><head><meta name=\"robots\" " +
          "content=\"nofollow, noindex\"></head>"), body))
      .when(col("doc_id") % 8 === 1, concat(
        lit("<html><head><META CONTENT='NOINDEX' NAME='Robots'></head>"),
        body))
      .when(col("doc_id") % 8 === 2, concat(
        lit("<html><head><link rel=\"canonical\" href=\"https://Canon-"),
        col("source"), lit(".example/Article\"></head>"), body))
      .when(col("doc_id") % 8 === 3, concat(
        lit("<html><head><link href='https://canon-"), col("source"),
        lit(".example/Article?utm_x=1' rel='canonical'></head>"), body))
      .when(col("doc_id") % 8 === 4, concat(
        lit("<html><head></head>"), body))
      .when(col("doc_id") % 8 === 5, concat(
        lit("<html><head><link rel=\"canonical\" href=\"/Article\">" +
          "</head>"), body))
      .when(col("doc_id") % 8 === 6, concat(
        lit("<html><head><!-- <meta name=\"robots\" content=\"noindex\">" +
          " --><meta name=\"robots-nocontent\" content=\"noindex\">" +
          "</head>"), body))
      .otherwise(concat(
        lit("<html><head><link rel=\"canonical-alt\" href=\"https://alt-"),
        col("source"), lit(".example/x\"></head>"), body))
  }

  private def sqlPat(p: String): String = p.replace("'", "''")

  /** q188: page-level meta signals
    * ([[graft.operators.HtmlExtract.noindex]] /
    * [[graft.operators.HtmlExtract.canonicalHref]]) — the two head
    * directives a production crawl processor honors before content is
    * read: the robots noindex flag (a page's request to stay out —
    * load-bearing for a training corpus) and the site's own canonical
    * URL declaration. Both engines run the IDENTICAL four regex
    * patterns (RE2-safe: no lookahead) over pages exercising both
    * attribute orders, cases, and quote styles. */
  private val q188 = QuerySpec(
    "q188_html_meta_signals",
    (s, dir) =>
      Tables.documents(s, dir).withColumn("html", page188)
        .select(col("doc_id"),
          graft.operators.HtmlExtract.noindex(col("html")).as("noindex"),
          graft.operators.HtmlExtract.canonicalHref(col("html"))
            .as("canonical"))
        .orderBy(col("doc_id")),
    oracle = Some(s"""
      WITH src AS (
        SELECT doc_id, regexp_replace($page188Sql, '${sqlPat(
          graft.operators.HtmlExtract.CommentPat)}', ' ', 'g') AS h
        FROM documents)
      SELECT doc_id,
             coalesce(
               contains(lower(regexp_extract(h, '${sqlPat(
                 graft.operators.HtmlExtract.NoindexPatA)}', 1)), 'noindex')
               OR contains(lower(regexp_extract(h, '${sqlPat(
                 graft.operators.HtmlExtract.NoindexPatB)}', 1)), 'noindex'),
               false) AS noindex,
             CASE WHEN regexp_extract(h, '${sqlPat(
               graft.operators.HtmlExtract.CanonicalPatA)}', 1) <> ''
                  THEN regexp_extract(h, '${sqlPat(
                    graft.operators.HtmlExtract.CanonicalPatA)}', 1)
                  ELSE regexp_extract(h, '${sqlPat(
                    graft.operators.HtmlExtract.CanonicalPatB)}', 1)
             END AS canonical
      FROM src ORDER BY doc_id"""))

  /** q189: the meta-aware crawl gate COMPOSED
    * ([[graft.operators.HtmlExtract.dropNoindex]] →
    * [[graft.operators.UrlCuration.canonicalLinkDedup]]): noindex
    * pages drop first, then pages collapse on the canonical form of
    * their DECLARED canonical target (falling back to the fetch URL)
    * — classes 2 and 3 of the mix declare case-/tracker-noised
    * targets that canonicalize equal per source, so each source keeps
    * its smallest doc id; plain pages keep their unique URLs. DuckDB
    * replays signals, gate, canonicalization, and keeper election end
    * to end. */
  private val q189 = QuerySpec(
    "q189_html_canonical_gate",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
        .withColumn("html", page188)
        .withColumn("url", concat(lit("https://example-"), col("source"),
          lit(".com/p/"), col("doc_id").cast("string")))
      val gated = graft.operators.HtmlExtract.dropNoindex(docs, "html")
        .withColumn("cl",
          graft.operators.HtmlExtract.canonicalHref(col("html")))
      graft.operators.UrlCuration.canonicalLinkDedup(gated, "url", "cl",
          "doc_id")
        .select(col("doc_id"), col("url"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(s"""
      WITH src AS (
        SELECT doc_id, regexp_replace($page188Sql, '${sqlPat(
          graft.operators.HtmlExtract.CommentPat)}', ' ', 'g') AS h,
               'https://example-' || source || '.com/p/'
                 || CAST(doc_id AS VARCHAR) AS url
        FROM documents),
      sigs AS (
        SELECT doc_id, url,
               coalesce(
                 contains(lower(regexp_extract(h, '${sqlPat(
                   graft.operators.HtmlExtract.NoindexPatA)}', 1)), 'noindex')
                 OR contains(lower(regexp_extract(h, '${sqlPat(
                   graft.operators.HtmlExtract.NoindexPatB)}', 1)),
                   'noindex'), false) AS nix,
               CASE WHEN regexp_extract(h, '${sqlPat(
                 graft.operators.HtmlExtract.CanonicalPatA)}', 1) <> ''
                    THEN regexp_extract(h, '${sqlPat(
                      graft.operators.HtmlExtract.CanonicalPatA)}', 1)
                    ELSE regexp_extract(h, '${sqlPat(
                      graft.operators.HtmlExtract.CanonicalPatB)}', 1)
               END AS cl
        FROM src),
      gated AS (SELECT doc_id, url, cl FROM sigs WHERE NOT nix),
      resolved AS (
        SELECT doc_id, url,
               ${graft.operators.UrlCuration.resolveHrefSql("url", "cl")}
                 AS rurl
        FROM gated),
      ${graft.operators.UrlCuration.canonicalUrlCtes("resolved", "doc_id",
        "rurl")},
      keep AS (
        SELECT min(doc_id) AS doc_id FROM ccanon
        WHERE canonical IS NOT NULL GROUP BY canonical
        UNION ALL
        SELECT doc_id FROM ccanon WHERE canonical IS NULL)
      SELECT g.doc_id, g.url FROM gated g JOIN keep USING (doc_id)
      ORDER BY g.doc_id"""))

  /** q213: media-reference resolution
    * ([[graft.operators.UrlCuration.resolveMediaRef]]) — the
    * doc→media ownership join's key resolver, oracle-checked over
    * every rule class: absolute refs pass verbatim,
    * protocol-relative take the base scheme, root-relative take the
    * origin (query cut from the authority), PATH-relative join the
    * base DIRECTORY (query/fragment stripped, last segment dropped)
    * with `./` collapse and bounded `../` folding, empty refs
    * resolve to NULL (a page is not its own media object), and an
    * empty base path directories to origin + '/'. The SQL side
    * replays the exact expression ([[graft.operators.UrlCuration
    * .resolveMediaRefSql]] — shared regexes, RE2-safe, 'g' flags
    * matching Spark's all-occurrences-per-pass). */
  private val q213 = QuerySpec(
    "q213_media_ref_resolve",
    (s, dir) => {
      import graft.operators.UrlCuration
      val d = col("doc_id").cast("string")
      val url = when(col("doc_id") % 8 === 2,
          concat(lit("https://d.example/a/b/p?x=1&y="), d))
        .when(col("doc_id") % 8 === 3,
          lit("https://d.example/a/b/page.html"))
        .when(col("doc_id") % 8 === 4,
          lit("https://d.example/a/b/c/page.html"))
        .when(col("doc_id") % 8 === 5,
          lit("https://d.example/a/page.html#frag"))
        .when(col("doc_id") % 8 === 7, lit("https://d.example"))
        .otherwise(lit("https://d.example/x/p"))
      val ref = when(col("doc_id") % 8 === 0,
          concat(lit("http://cdn.example/i/"), d, lit(".png")))
        .when(col("doc_id") % 8 === 1,
          concat(lit("//cdn.example/i/"), d, lit(".png")))
        .when(col("doc_id") % 8 === 2,
          concat(lit("/m/"), d, lit(".png")))
        .when(col("doc_id") % 8 === 3,
          concat(lit("img/"), d, lit(".png")))
        .when(col("doc_id") % 8 === 4,
          concat(lit("../../shared/"), d, lit(".png")))
        .when(col("doc_id") % 8 === 5,
          concat(lit("./x/"), d, lit(".png")))
        .when(col("doc_id") % 8 === 6, lit(""))
        .otherwise(concat(lit("pic"), d, lit(".png")))
      Tables.documents(s, dir).filter(col("doc_id") < 400)
        .select(col("doc_id"),
          UrlCuration.resolveMediaRef(url, ref).as("resolved"))
        .orderBy(col("doc_id"))
    },
    oracle = Some(s"""
      WITH f AS (
        SELECT doc_id,
          CASE doc_id % 8
            WHEN 2 THEN 'https://d.example/a/b/p?x=1&y='
                        || CAST(doc_id AS VARCHAR)
            WHEN 3 THEN 'https://d.example/a/b/page.html'
            WHEN 4 THEN 'https://d.example/a/b/c/page.html'
            WHEN 5 THEN 'https://d.example/a/page.html#frag'
            WHEN 7 THEN 'https://d.example'
            ELSE 'https://d.example/x/p' END AS u,
          CASE doc_id % 8
            WHEN 0 THEN 'http://cdn.example/i/'
                        || CAST(doc_id AS VARCHAR) || '.png'
            WHEN 1 THEN '//cdn.example/i/'
                        || CAST(doc_id AS VARCHAR) || '.png'
            WHEN 2 THEN '/m/' || CAST(doc_id AS VARCHAR) || '.png'
            WHEN 3 THEN 'img/' || CAST(doc_id AS VARCHAR) || '.png'
            WHEN 4 THEN '../../shared/'
                        || CAST(doc_id AS VARCHAR) || '.png'
            WHEN 5 THEN './x/' || CAST(doc_id AS VARCHAR) || '.png'
            WHEN 6 THEN ''
            ELSE 'pic' || CAST(doc_id AS VARCHAR) || '.png' END AS h
        FROM documents WHERE doc_id < 400)
      SELECT doc_id,
             ${graft.operators.UrlCuration.resolveMediaRefSql("u", "h")}
               AS resolved
      FROM f ORDER BY doc_id"""))

  val specs: Seq[QuerySpec] =
    Seq(q93, q94, q95, q96, q97, q98, q99, q100, q101, q102, q128, q129,
      q134, q144, q148, q150, q156, q173, q174, q175, q176, q179, q180,
      q186, q187, q188, q189, q207, q209, q213)
}
