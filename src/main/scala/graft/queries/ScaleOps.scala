package graft.queries

import graft.Tables
import graft.operators.{Decontaminate, Dedup, Sampling, Similarity}
import org.apache.spark.sql.functions._

/** Round-3 scale-path operators: Bloom-filter incremental dedup,
  * deterministic global corpus shuffle, exact shared-n-gram
  * decontamination, and embedding-cosine semantic dedup. All four are
  * oracle-checked — the Bloom filter never changes the answer (only
  * the plan), the shuffle key and cell draw are md5-derived, and the
  * cosine doubles agree between engines (the q30/q73 precedent).
  */
object ScaleOps {

  /** q83: Bloom-filter incremental dedup (Dedup.bloomDedupe) — the
    * "new crawl batch vs 100 TB historical index" shape. The index is
    * the md5-first-hex < '4' quarter of the corpus, the batch is the
    * rest; survivors are batch docs whose content is not in the index.
    * The result is provably the plain anti join (bloom false positives
    * are re-verified, false negatives impossible) — which is exactly
    * what the oracle runs. */
  private val q83 = QuerySpec(
    "q83_bloom_dedup",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val inIndex = substring(md5(col("doc_id").cast("string")), 1, 1) < "4"
      Dedup.bloomDedupe(docs.filter(!inIndex), docs.filter(inIndex),
          "doc_id", "text", expectedItems = 10000L, fpp = 0.01)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    },
    oracle = Some("""
      WITH fp AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '4' AS is_idx,
               md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp
        FROM documents)
      SELECT n.doc_id
      FROM fp n
      WHERE NOT n.is_idx
        AND (n.fp IS NULL OR n.fp NOT IN
             (SELECT fp FROM fp WHERE is_idx AND fp IS NOT NULL))
      ORDER BY n.doc_id"""))

  /** q84: deterministic global corpus shuffle
    * (Sampling.deterministicShuffle) — epoch-order randomization with
    * exact positions, assigned by two-phase bucketed ranking instead of
    * a single-task global window. The oracle IS the global window: both
    * engines order by (md5('42_' || id), id), so positions match
    * exactly. */
  private val q84 = QuerySpec(
    "q84_corpus_shuffle",
    (s, dir) =>
      Sampling.deterministicShuffle(
          Tables.documents(s, dir).select(col("doc_id")), "doc_id", seed = 42L)
        .select(col("pos"), col("doc_id"))
        .orderBy(col("pos")),
    oracle = Some("""
      SELECT CAST(row_number() OVER (
               ORDER BY md5('42_' || CAST(doc_id AS VARCHAR)), doc_id)
             AS BIGINT) AS pos,
             doc_id
      FROM documents
      ORDER BY pos"""))

  /** q85: exact shared-n-gram decontamination (Decontaminate.ngramLeaks)
    * — the GPT-3-style "any verbatim shared 13-gram" detector, the
    * strict companion of q72/q82's Jaccard forms. Same md5 eval/train
    * split as q82; n_shared counts DISTINCT shared grams. */
  private val q85 = QuerySpec(
    "q85_ngram_leaks",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) < "2"
      Decontaminate.ngramLeaks(docs.filter(!isEval), docs.filter(isEval),
          "doc_id", "text", n = 13)
        .orderBy(col("eval_id"), col("train_id"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2' AS is_eval,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents),
      g AS (
        SELECT DISTINCT doc_id, is_eval, s FROM (
          SELECT doc_id, is_eval, unnest(
            CASE WHEN len(w) >= 13 THEN
              list_transform(range(1, len(w) - 11),
                i -> array_to_string(w[i:i+12], ' '))
            ELSE [array_to_string(w, ' ')] END) AS s
          FROM toks))
      SELECT e.doc_id AS eval_id, t.doc_id AS train_id,
             CAST(count(*) AS INTEGER) AS n_shared
      FROM g e JOIN g t ON e.s = t.s AND e.is_eval AND NOT t.is_eval
      GROUP BY 1, 2
      ORDER BY 1, 2"""))

  /** q86: semantic dedup (Similarity.semanticDedupe) — embedding-cosine
    * near-dup removal inside nearest-centroid cells, SemDeDup-style.
    * Portable md5 centroid draw (the q73 pattern) so DuckDB replays
    * centroid selection, nearest-cell assignment, the within-cell
    * cosine prune, and the greedy-by-id drop rule. Threshold 0.35
    * matches q30's near-dup bar on this corpus. */
  private val q86 = QuerySpec(
    "q86_semantic_dedup",
    (s, dir) =>
      Similarity.semanticDedupe(Tables.embeddings(s, dir), "vec_id",
          "embedding", nCells = 8, threshold = 0.35,
          centroidRank = Similarity.portableCentroidRank)
        .select(col("id").as("vec_id"), col("cell"))
        .orderBy(col("vec_id")),
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
        WHERE rnk <= 1),
      dropped AS (
        SELECT DISTINCT b.id
        FROM assign a
        JOIN assign b ON a.cell = b.cell AND a.id < b.id
        JOIN embeddings va ON va.vec_id = a.id
        JOIN embeddings vb ON vb.vec_id = b.id
        WHERE list_cosine_similarity(CAST(va.embedding AS DOUBLE[]),
                                     CAST(vb.embedding AS DOUBLE[])) >= 0.35)
      SELECT a.id AS vec_id, a.cell
      FROM assign a
      WHERE a.id NOT IN (SELECT id FROM dropped)
      ORDER BY vec_id"""))

  /** q87: corpus-level boilerplate fraction (Dedup.boilerplateFraction)
    * — share of each doc's distinct 3-gram shingles occurring in ≥ 10
    * docs, the templated-content quality signal (C4/MassiveText
    * style); the corpus-level companion of q78's within-doc repetition
    * signals. */
  private val q87 = QuerySpec(
    "q87_boilerplate_frac",
    (s, dir) =>
      Dedup.boilerplateFraction(Tables.documents(s, dir), "doc_id", "text",
          n = 3, minDocs = 10)
        .select(col("doc").as("doc_id"), col("n_shingles"), col("n_common"),
          col("boilerplate_frac"))
        .orderBy(col("doc_id")),
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents WHERE text IS NOT NULL),
      sh AS (
        SELECT DISTINCT doc_id, s FROM (
          SELECT doc_id, unnest(
            CASE WHEN len(w) >= 3 THEN
              list_transform(range(1, len(w) - 1),
                i -> array_to_string(w[i:i+2], ' '))
            ELSE [array_to_string(w, ' ')] END) AS s
          FROM toks)),
      common AS (SELECT s FROM sh GROUP BY s HAVING count(*) >= 10),
      nc AS (SELECT doc_id, count(*) AS n_common
             FROM sh JOIN common USING (s) GROUP BY 1),
      sz AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY 1)
      SELECT sz.doc_id,
             CAST(sz.n_shingles AS INTEGER) AS n_shingles,
             CAST(coalesce(nc.n_common, 0) AS INTEGER) AS n_common,
             CAST((coalesce(nc.n_common, 0) * 20000 + sz.n_shingles)
                  // (sz.n_shingles * 2) AS DOUBLE) / 10000.0
               AS boilerplate_frac
      FROM sz LEFT JOIN nc ON nc.doc_id = sz.doc_id
      ORDER BY sz.doc_id"""))

  /** q88: temperature-scaled mixture resample
    * (Sampling.temperatureMixture, α=½) — domains damped toward √n so
    * small sources punch above their row count, rates computed in
    * exact integer arithmetic (floor-sqrt weights) so any engine
    * reproduces membership bit-for-bit. The "domain" here is a derived
    * 4:2:1-skewed bucketing of doc_id (the corpus's real sources are
    * uniform — skew is what makes the reweighting visible). */
  private val q88 = QuerySpec(
    "q88_mixture_temperature",
    (s, dir) => {
      val grp = when(pmod(col("doc_id"), lit(7)) < 4, "big")
        .when(pmod(col("doc_id"), lit(7)) < 6, "mid")
        .otherwise("small")
      Sampling.temperatureMixture(
          Tables.documents(s, dir).withColumn("grp", grp)
            .select(col("doc_id"), col("grp")),
          "doc_id", "grp", budget = 200L)
        .select(col("grp"), col("rate_bp"), col("doc_id"))
        .orderBy(col("grp"), col("doc_id"))
    },
    oracle = Some("""
      WITH d AS (
        SELECT doc_id,
               CASE WHEN doc_id % 7 < 4 THEN 'big'
                    WHEN doc_id % 7 < 6 THEN 'mid'
                    ELSE 'small' END AS grp
        FROM documents),
      counts AS (
        SELECT grp, count(*) AS n,
               CAST(floor(sqrt(count(*))) AS BIGINT) AS w
        FROM d GROUP BY grp),
      rates AS (
        SELECT grp, CAST(least(10000, greatest(1,
                 (200::HUGEINT * w * 10000) // ((SELECT sum(w) FROM counts) * n)))
               AS BIGINT) AS rate_bp
        FROM counts)
      SELECT d.grp, r.rate_bp, d.doc_id
      FROM d JOIN rates r ON r.grp = d.grp
      WHERE ('0x' || substring(md5('mix_' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT
              % 10000 < r.rate_bp
      ORDER BY d.grp, d.doc_id"""))

  /** q89: two-stage ANN — quantized candidates, exact re-rank
    * (Similarity.quantizedRerank): q79's int8 index generates top-12
    * candidates per query, exact cosine restores float ranking for the
    * top-3. Both stages deterministic, so DuckDB replays the full
    * pipeline: quantize → integer-dot candidate ranks → cosine
    * re-rank. */
  private val q89 = QuerySpec(
    "q89_quantized_rerank",
    (s, dir) =>
      graft.operators.Similarity.quantizedRerank(
          Tables.embeddings(s, dir), "vec_id", "embedding",
          k = 3, overfetch = 4)
        .select(col("q_id"), col("rank"), col("c_id"),
          round(col("sim"), 4).as("sim"))
        .orderBy(col("q_id"), col("rank")),
    oracle = Some("""
      WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb,
               list_max(list_transform(CAST(embedding AS DOUBLE[]),
                 x -> abs(x))) AS mx
        FROM embeddings),
      q AS (
        SELECT vec_id, emb,
               CASE WHEN mx = 0 THEN list_transform(emb, x -> 0.0)
                    ELSE list_transform(emb,
                      x -> floor(x * (127.0 / mx) + 0.5)) END AS qv
        FROM v),
      cands AS (
        SELECT q_id, c_id FROM (
          SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                 row_number() OVER (PARTITION BY a.vec_id
                   ORDER BY list_dot_product(a.qv, b.qv) DESC, b.vec_id ASC)
                   AS rnk
          FROM q a JOIN q b ON a.vec_id <> b.vec_id)
        WHERE rnk <= 12),
      scored AS (
        SELECT q_id, c_id,
               list_cosine_similarity(qa.emb, ca.emb) AS sim
        FROM cands
        JOIN q qa ON qa.vec_id = q_id
        JOIN q ca ON ca.vec_id = c_id)
      SELECT q_id, rank, c_id, round(sim, 4) AS sim FROM (
        SELECT q_id, c_id, sim,
               CAST(row_number() OVER (PARTITION BY q_id
                 ORDER BY sim DESC, c_id ASC) AS INTEGER) AS rank
        FROM scored)
      WHERE rank <= 3
      ORDER BY q_id, rank"""))

  /** q90: vocabulary build + token-id encoding (operators.Vocabulary)
    * — top-50 corpus vocabulary by (count desc, token asc), then every
    * document's tokens to integer ids, OOV → 0. The tokenize-to-ids
    * step training tensors are made of; restricted here to the first
    * 8 tokens of the first 40 docs so the oracle output stays compact
    * while covering in-vocab, OOV, and ordering. */
  private val q90 = QuerySpec(
    "q90_token_ids",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = graft.operators.Vocabulary.build(docs, "text", 50)
      graft.operators.Vocabulary.encode(
          docs.filter(col("doc_id") < 40), vocab, "doc_id", "text")
        .filter(col("pos") < 8)
        .select(col("id").as("doc_id"), col("pos"), col("tok"), col("tok_id"))
        .orderBy(col("doc_id"), col("pos"))
    },
    oracle = Some("""
      WITH tok AS (
        SELECT doc_id, w[i] AS tok, CAST(i - 1 AS INTEGER) AS pos
        FROM (SELECT doc_id,
                list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
              FROM documents) t,
             unnest(range(1, len(w) + 1)) AS r(i)),
      vocab AS (
        SELECT tok, CAST(row_number() OVER (ORDER BY n DESC, tok ASC) AS INTEGER)
                 AS tok_id
        FROM (SELECT tok, count(*) AS n FROM tok GROUP BY tok
              ORDER BY n DESC, tok ASC LIMIT 50))
      SELECT t.doc_id, t.pos, t.tok, coalesce(v.tok_id, 0) AS tok_id
      FROM tok t LEFT JOIN vocab v ON v.tok = t.tok
      WHERE t.doc_id < 40 AND t.pos < 8
      ORDER BY t.doc_id, t.pos"""))

  /** q91: corpus profiling report (operators.CorpusReport) — the
    * data-card summary: per-source doc/token counts, exact-rational
    * mean quality, interpolated median length, plus the ROLLUP grand
    * total. The quality column mirrors q36's oracle expression; the
    * median follows q53's percentile/quantile_cont parity. */
  private val q91 = QuerySpec(
    "q91_corpus_report",
    (s, dir) =>
      graft.operators.CorpusReport.bySource(
          Tables.documents(s, dir), "text", "source")
        .orderBy(col("source")),
    oracle = Some("""
      WITH t AS (
        SELECT source, text,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        FROM documents),
      m AS (
        SELECT source,
          CAST(len(toks) AS BIGINT) AS n,
          CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
            x -> x <> '' AND x IN ('the','a','an','and','or','of','to',
            'in','is','it','that','for','on','with','as','was','at','by','this')))
            AS BIGINT) AS m1,
          CAST(coalesce(list_sum(list_transform(toks, x -> length(x))), 0)
            AS BIGINT) AS s,
          CAST(length(text) AS BIGINT) AS c,
          CAST(length(text)
            - length(regexp_replace(text, '[!-/:-@\[-`{-~0-9]', '', 'g'))
            AS BIGINT) AS pd
        FROM t),
      perdoc AS (
        SELECT source,
               coalesce(n, 0) AS nt,
               CASE WHEN n > 0 AND c > 0 THEN
                 (2 * (least(m1 * c * 16000, n * c * 4000)
                       + (CASE WHEN s >= n * 2 AND s <= n * 12
                          THEN n * c * 4000 ELSE 0 END)
                       + (n * c * 2000 - least(pd * n * 4000, n * c * 2000)))
                  + n * c) // (n * c * 2)
               ELSE 0 END AS qk
        FROM m)
      SELECT source, n_docs, n_tokens, mean_quality, median_tokens, max_tokens
      FROM (
        SELECT CASE WHEN grouping(source) = 1 THEN 'ALL'
                    ELSE coalesce(source, '(none)') END AS source,
               count(*) AS n_docs,
               CAST(sum(nt) AS BIGINT) AS n_tokens,
               CAST((sum(qk) * 2 + count(*)) // (count(*) * 2) AS DOUBLE)
                 / 10000.0 AS mean_quality,
               quantile_cont(nt, 0.5) AS median_tokens,
               max(nt) AS max_tokens
        FROM perdoc
        GROUP BY ROLLUP(source))
      ORDER BY source"""))

  /** q131: distributed BPE merge learning
    * ([[graft.operators.Vocabulary.bpeMerges]], Sennrich 2016) — 10
    * merge rounds over the word-frequency table, each round one
    * vocab-sized pair census with (count desc, pair asc) tie-break.
    * The oracle replays all 10 rounds UNROLLED (generated CTE chain —
    * pair census, best pair, island-parity greedy rewrite per round),
    * so the full learning trajectory is hash-checked, not just the
    * final state. */
  private val q131 = QuerySpec(
    "q131_bpe_merges",
    (s, dir) =>
      graft.operators.Vocabulary.bpeMerges(Tables.documents(s, dir), "text", 10)
        .orderBy(col("rank")),
    oracle = Some(
      graft.operators.Vocabulary.bpeMergesOracle("documents", "text", 10)))

  /** q132: the word segmentations under those 10 learned merges
    * ([[graft.operators.Vocabulary.bpeSegments]]) — every corpus word's
    * subword encoding, the artifact a tokenizer ships. Same generated
    * oracle chain as q131, projected at seq10. */
  private val q132 = QuerySpec(
    "q132_bpe_segments",
    (s, dir) =>
      graft.operators.Vocabulary.bpeSegments(Tables.documents(s, dir), "text", 10)
        .orderBy(col("word")),
    oracle = Some(
      graft.operators.Vocabulary.bpeSegmentsOracle("documents", "text", 10)))

  /** q133: per-document subword encoding under the learned merges
    * ([[graft.operators.Vocabulary.bpeEncode]]) — the full
    * corpus→tensor tokenizer path (tokenize → broadcast segmentation
    * join → subword explode → alphabet ids); restricted to the q90
    * window (first 8 words of the first 40 docs) so the oracle output
    * stays compact while covering multi-subword words and id
    * determinism. */
  private val q133 = QuerySpec(
    "q133_bpe_encode",
    (s, dir) =>
      graft.operators.Vocabulary.bpeEncode(Tables.documents(s, dir), "doc_id", "text", 10)
        .filter(col("doc_id") < 40 && col("word_pos") < 8)
        .orderBy(col("doc_id"), col("word_pos"), col("sub_pos")),
    oracle = Some(graft.operators.Vocabulary.bpeEncodeOracle(
      "documents", "doc_id", "text", 10, "doc_id < 40 AND word_pos < 8")))

  /** q136: tokenizer fertility per source
    * ([[graft.operators.Vocabulary.bpeFertility]]) — subwords spent
    * per word of each source slice under the 10-merge table, in exact
    * integer basis points; the metric that grades whether a learned
    * vocabulary serves every corpus slice or only its head. Ordered by
    * source; same generated oracle chain as q131-q133. */
  private val q136 = QuerySpec(
    "q136_bpe_fertility",
    (s, dir) =>
      graft.operators.Vocabulary.bpeFertility(Tables.documents(s, dir),
          "text", "source", 10)
        .orderBy(col("source")),
    oracle = Some(graft.operators.Vocabulary.bpeFertilityOracle(
      "documents", "text", "source", 10)))

  /** q145: per-train-doc contamination fraction
    * ([[graft.operators.Decontaminate.contaminationFraction]]) — q85's
    * detector turned into the drop-side score: the share of each train
    * doc's distinct 13-grams found anywhere in the eval suite, in
    * exact-integer basis points. Same md5 eval/train split as
    * q82/q85; n=5 instead of 13 so the synthetic corpus produces
    * non-trivial fractions. */
  private val q145 = QuerySpec(
    "q145_contamination_frac",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val isEval = substring(md5(col("doc_id").cast("string")), 1, 1) < "2"
      Decontaminate.contaminationFraction(docs.filter(!isEval),
          docs.filter(isEval), "doc_id", "text", n = 5)
        .orderBy(col("train_id"))
    },
    oracle = Some("""
      WITH toks AS (
        SELECT doc_id,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) < '2' AS is_eval,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
        FROM documents),
      g AS (
        -- s IS NOT NULL: a NULL-text doc yields w = NULL -> s = NULL;
        -- the operator's shingleSets reports n_grams = 0 for such docs,
        -- so the oracle must not count the NULL gram as 1
        SELECT DISTINCT doc_id, is_eval, s FROM (
          SELECT doc_id, is_eval, unnest(
            CASE WHEN len(w) >= 5 THEN
              list_transform(range(1, len(w) - 3),
                i -> array_to_string(w[i:i+4], ' '))
            ELSE [array_to_string(w, ' ')] END) AS s
          FROM toks) WHERE s IS NOT NULL),
      eg AS (SELECT DISTINCT s FROM g WHERE is_eval),
      tot AS (
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
        FROM g WHERE NOT is_eval GROUP BY 1),
      hit AS (
        SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_contaminated
        FROM g t JOIN eg USING (s)
        WHERE NOT t.is_eval GROUP BY 1)
      SELECT t.doc_id AS train_id,
             coalesce(tot.n_grams, 0) AS n_grams,
             coalesce(hit.n_contaminated, 0) AS n_contaminated,
             CASE WHEN tot.n_grams > 0 THEN
               coalesce(hit.n_contaminated, 0) * 10000 // tot.n_grams
             END AS frac_bp
      FROM (SELECT doc_id FROM toks WHERE NOT is_eval) t
      LEFT JOIN tot USING (doc_id)
      LEFT JOIN hit USING (doc_id)
      ORDER BY train_id"""))

  /** q146: unigram-tokenizer seed vocabulary
    * ([[graft.operators.UnigramTokenizer.seedVocab]], Kudo 2018) — all
    * 24 corpus characters plus the top substrings to 80 pieces, each
    * scored by its micro-quantized unigram log-prob. DuckDB replays
    * the candidate walk, the (weight desc, piece asc) selection, and
    * the one-ln-per-piece quantization exactly. */
  private val q146 = QuerySpec(
    "q146_unigram_vocab",
    (s, dir) =>
      graft.operators.UnigramTokenizer.seedVocab(
          Tables.documents(s, dir), "text", vocabSize = 80, maxPieceLen = 4)
        .orderBy(col("piece")),
    oracle = Some(graft.operators.UnigramTokenizer.seedVocabOracle(
      "documents", "text", vocabSize = 80, maxPieceLen = 4)))

  /** q147: Viterbi segmentation under the seed unigram LM
    * ([[graft.operators.UnigramTokenizer.segmentWords]]) — every
    * distinct corpus word gets its exact minimum-cost piece path,
    * ties toward longer pieces via the packed integer argmin key. The
    * oracle unrolls the DP to the corpus's 8-char max word length
    * (the bpeCtes chain pattern) and replays best path, piece walk,
    * and integer path cost bit for bit. */
  private val q147 = QuerySpec(
    "q147_unigram_segments",
    (s, dir) =>
      graft.operators.UnigramTokenizer.segmentWords(
          Tables.documents(s, dir), "text", vocabSize = 80, maxPieceLen = 4)
        .orderBy(col("word")),
    oracle = Some(graft.operators.UnigramTokenizer.segmentsOracle(
      "documents", "text", vocabSize = 80, maxPieceLen = 4, maxWordLen = 8)))

  /** q149: unigram-LM hard-EM re-estimation
    * ([[graft.operators.UnigramTokenizer.emReweight]], Kudo 2018
    * §3.2's refine step, Viterbi-count variant) — piece weights
    * recounted from every word's best path, unused multi-char pieces
    * pruned, single chars floored at 1 (coverage), log-probs
    * re-quantized. The oracle replays seed → Viterbi → recount →
    * prune → re-quantize end to end on top of q147's DP chain. */
  private val q149 = QuerySpec(
    "q149_unigram_em",
    (s, dir) =>
      graft.operators.UnigramTokenizer.emReweight(
          Tables.documents(s, dir), "text", vocabSize = 80, maxPieceLen = 4)
        .orderBy(col("piece")),
    oracle = Some(graft.operators.UnigramTokenizer.emOracle(
      "documents", "text", vocabSize = 80, maxPieceLen = 4, maxWordLen = 8)))

  /** q151: per-document unigram-LM encoding
    * ([[graft.operators.UnigramTokenizer.encode]]) — the full
    * corpus→tensor path under the seed unigram vocabulary, q133's
    * twin for the second tokenizer family; restricted to the q133
    * window (first 8 words of the first 40 docs) so the oracle stays
    * compact while covering multi-piece words and id determinism. */
  private val q151 = QuerySpec(
    "q151_unigram_encode",
    (s, dir) =>
      graft.operators.UnigramTokenizer.encode(Tables.documents(s, dir),
          "doc_id", "text", vocabSize = 80, maxPieceLen = 4)
        .filter(col("doc_id") < 40 && col("word_pos") < 8)
        .orderBy(col("doc_id"), col("word_pos"), col("piece_pos")),
    oracle = Some(graft.operators.UnigramTokenizer.encodeOracle(
      "documents", "doc_id", "text", vocabSize = 80, maxPieceLen = 4,
      maxWordLen = 8, where = "doc_id < 40 AND word_pos < 8")))

  /** q152: frozen-vocabulary encoding
    * ([[graft.operators.UnigramTokenizer.encodeWith]]) — the apply
    * side of the tokenizer lifecycle: the vocabulary learns from the
    * corpus, then encodes the corpus PLUS a planted later-crawl doc
    * containing a word ("zx") whose characters the training alphabet
    * (a–y minus x, z — measured) never saw. The unspellable word must
    * come through as its own single piece with a NULL id (the <unk>
    * convention); the planted doc's in-alphabet words encode
    * normally. Output restricted to the q133 window + the plant. */
  private val q152 = QuerySpec(
    "q152_unigram_frozen_vocab",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = graft.operators.UnigramTokenizer.seedVocab(
        docs, "text", vocabSize = 80, maxPieceLen = 4)
      import s.implicits._
      val crawl = docs.select(col("doc_id"), col("text"))
        .union(Seq((9999991L, "the zx data")).toDF("doc_id", "text"))
      graft.operators.UnigramTokenizer.encodeWith(crawl, "doc_id", "text",
          vocab, maxPieceLen = 4)
        .filter((col("doc_id") < 40 || col("doc_id") === 9999991L)
          && col("word_pos") < 8)
        .orderBy(col("doc_id"), col("word_pos"), col("piece_pos"))
    },
    oracle = Some(graft.operators.UnigramTokenizer.encodeWithOracle(
      "documents",
      "(SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT 9999991, 'the zx data')",
      "doc_id", "text", vocabSize = 80, maxPieceLen = 4, maxWordLen = 8,
      where = "(doc_id < 40 OR doc_id = 9999991) AND word_pos < 8")))

  /** q153: frozen-BPE encoding
    * ([[graft.operators.Vocabulary.bpeEncodeWith]]) — q152's twin for
    * the BPE family: the 10-round merge list and alphabet learn from
    * the corpus, then encode the corpus PLUS a planted later-crawl
    * doc. BPE is open-vocabulary, so the out-of-alphabet word "zx"
    * still SEGMENTS (to its characters) but its symbols carry NULL
    * ids — unknown at the symbol level, not the word level (the
    * designed contrast with the unigram tokenizer's unspellable
    * words). Output restricted to the q133 window + the plant. */
  private val q153 = QuerySpec(
    "q153_bpe_frozen_vocab",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      // ONE learn produces merges + alphabet + the reusable
      // segmentation table; the frozen apply folds merges only over
      // the crawl's NOVEL words (here: "zx") — previously this query
      // paid the full learn twice (bpeMerges + bpeVocab) plus a third
      // corpus word count in the apply
      val model = graft.operators.Vocabulary.bpeLearnAll(docs, "text", 10)
      import s.implicits._
      val crawl = docs.select(col("doc_id"), col("text"))
        .union(Seq((9999992L, "the zx data")).toDF("doc_id", "text"))
      graft.operators.Vocabulary.bpeEncodeWithModel(crawl, "doc_id", "text",
          model)
        .filter((col("doc_id") < 40 || col("doc_id") === 9999992L)
          && col("word_pos") < 8)
        .orderBy(col("doc_id"), col("word_pos"), col("sub_pos"))
    },
    oracle = Some(graft.operators.Vocabulary.bpeEncodeWithOracle(
      "documents",
      "(SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT 9999992, 'the zx data')",
      "doc_id", "text", numMerges = 10,
      where = "(doc_id < 40 OR doc_id = 9999992) AND word_pos < 8")),
    bench = true)

  /** q160: unigram-tokenizer fertility per source
    * ([[graft.operators.UnigramTokenizer.fertility]]) — q136's twin
    * for the second family: pieces spent per word of each source
    * slice under the 80-piece seed, exact basis points, directly
    * comparable with the BPE numbers per slice. */
  private val q160 = QuerySpec(
    "q160_unigram_fertility",
    (s, dir) =>
      graft.operators.UnigramTokenizer.fertility(Tables.documents(s, dir),
          "text", "source", vocabSize = 80, maxPieceLen = 4)
        .orderBy(col("source")),
    oracle = Some(graft.operators.UnigramTokenizer.fertilityOracle(
      "documents", "text", "source", vocabSize = 80, maxPieceLen = 4,
      maxWordLen = 8)))

  /** q161: frozen-vocabulary coverage
    * ([[graft.operators.UnigramTokenizer.coverage]]) — the q152
    * lifecycle's drift alarm: per source, the share of token
    * occurrences yesterday's vocabulary cannot spell, on the corpus
    * plus a planted out-of-alphabet source ("newsrc" full of x/z
    * words) — which must report a high unspellable rate while every
    * original source reports 0. */
  private val q161 = QuerySpec(
    "q161_vocab_coverage",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = graft.operators.UnigramTokenizer.seedVocab(
        docs, "text", vocabSize = 80, maxPieceLen = 4)
      import s.implicits._
      val crawl = docs.select(col("source"), col("text"))
        .union(Seq(("newsrc", "zx xz zz the xx data zq"))
          .toDF("source", "text"))
      graft.operators.UnigramTokenizer.coverage(crawl, "text", "source",
          vocab, maxPieceLen = 4)
        .orderBy(col("source"))
    },
    oracle = Some(graft.operators.UnigramTokenizer.coverageOracle(
      "documents",
      "(SELECT source, text FROM documents " +
        "UNION ALL SELECT 'newsrc', 'zx xz zz the xx data zq')",
      "text", "source", vocabSize = 80, maxPieceLen = 4, maxWordLen = 8)))

  /** q162: signed feature hashing
    * ([[graft.operators.FeatureHash.hashedTf]], Weinberger et al.
    * 2009) — the trainless text→vector bridge into the ANN family:
    * sparse (doc, bucket, weight) rows under the portable md5 bucket
    * + sign draws, exact integer sums, zero-cancelled buckets
    * dropped. dim 64 matches the embeddings table so the dense form
    * drops into every vector operator unchanged. */
  private val q162 = QuerySpec(
    "q162_feature_hash",
    (s, dir) =>
      graft.operators.FeatureHash.hashedTf(Tables.documents(s, dir),
          "doc_id", "text", dim = 64)
        .orderBy(col("doc_id"), col("bucket")),
    oracle = Some(graft.operators.FeatureHash.hashedTfOracle(
      "documents", "doc_id", "text", dim = 64)))

  /** q163: hashed TF-IDF ([[graft.operators.FeatureHash.hashedTfIdf]])
    * — the HashingTF→IDF pair with bucket-level document frequency;
    * exact-integer weighting, bucket-sized idf relation broadcast. */
  private val q163 = QuerySpec(
    "q163_hashed_tfidf",
    (s, dir) =>
      graft.operators.FeatureHash.hashedTfIdf(Tables.documents(s, dir),
          "doc_id", "text", dim = 64)
        .orderBy(col("doc_id"), col("bucket")),
    oracle = Some(graft.operators.FeatureHash.hashedTfIdfOracle(
      "documents", "doc_id", "text", dim = 64)))

  /** The q166 fixed micro-weights: q68's deterministic ±0.009 comb in
    * micro units, one weight per hash bucket, bias +0.0025. Small
    * magnitudes keep most margins inside the sigmoid's live range so
    * the score column actually discriminates on this corpus. */
  private val q166W: Seq[Long] = (0 until 64).map(i => ((i * 37 % 19) - 9) * 1000L)

  /** q166: model-based quality scoring with FIXED weights
    * ([[graft.ml.QualityFilter.scoreWithMicro]]) — the DCLM/
    * FineWeb-Edu classifier stage's scoring path, fully
    * oracle-checked via the q68 fixed-weights precedent: hashed term
    * frequencies (q162's portable md5 draws) × integer micro-weights
    * → an exact long margin; only the final sigmoid touches doubles.
    * Trained-model determinism is q167's job. */
  private val q166 = QuerySpec(
    "q166_quality_score_fixed",
    (s, dir) =>
      graft.ml.QualityFilter.scoreWithMicro(Tables.documents(s, dir),
          "doc_id", "text", q166W, biasMicro = 2500L)
        .orderBy(col("doc_id")),
    oracle = Some(graft.ml.QualityFilter.scoreMicroOracle(
      "documents", "doc_id", "text", q166W, biasMicro = 2500L)))

  /** q167: quality-classifier training determinism, oracle-witnessed
    * (the q92 pattern for the [[graft.ml.QualityFilter]] lifecycle):
    * train the hashed-TF + binary-LR model TWICE on an identically-
    * prepared labeled frame (label = English doc, a genuinely mixed
    * binary on this corpus) and report corpus size, feature dim, and keep-decision
    * disagreements at P ≥ 0.5 between the two fits. The conditioned
    * layout makes the fits bit-identical → n_disagree is exactly 0,
    * which DuckDB states independently. */
  private val q167 = QuerySpec(
    "q167_quality_model_determinism",
    (s, dir) => {
      import graft.ml.QualityFilter
      val labeled = Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          when(col("lang") === "en", 1).otherwise(0).as("label"))
      val m1 = QualityFilter.train(labeled, "doc_id", "text", "label",
        dim = 256, maxIter = 5)
      val m2 = QualityFilter.train(labeled, "doc_id", "text", "label",
        dim = 256, maxIter = 5)
      val s1 = QualityFilter.score(m1, labeled, "doc_id", "text")
        .select(col("doc_id"), (col("p_quality") >= 0.5).as("k1"))
      val s2 = QualityFilter.score(m2, labeled, "doc_id", "text")
        .select(col("doc_id"), (col("p_quality") >= 0.5).as("k2"))
      s1.join(s2, "doc_id")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("k1") =!= col("k2"), 1L).otherwise(0L)).as("n_disagree"))
        .withColumn("n_features", lit(m1.numFeatures))
        .select(col("n_docs"), col("n_features"), col("n_disagree"))
    },
    oracle = Some("""
      SELECT count(*) AS n_docs,
             CAST(256 AS INT) AS n_features,
             CAST(0 AS BIGINT) AS n_disagree
      FROM documents"""))

  /** q169: unigram-LM EM to a target vocabulary
    * ([[graft.operators.UnigramTokenizer.emTrain]], Kudo 2018 §3.2)
    * — q149's single refine+prune round iterated under the
    * SentencePiece shrink schedule: 3 rounds from the 80-piece seed
    * toward a 30-piece target at shrink 0.75 (integer basis points —
    * with the corpus alphabet at 24 chars the schedule BITES every
    * round: the multi-piece pool cuts 15 -> 12 -> 9 geometrically,
    * so the prune arithmetic is engine-exact). The oracle replays
    * every round — DP, recount, char floor, shrink prune,
    * renormalization — against the previous round's vocabulary. */
  private val q169 = QuerySpec(
    "q169_unigram_em_train",
    (s, dir) =>
      graft.operators.UnigramTokenizer.emTrain(Tables.documents(s, dir),
          "text", seedSize = 80, targetSize = 30, rounds = 3,
          shrinkBp = 7500, maxPieceLen = 4)
        .orderBy(col("piece")),
    oracle = Some(graft.operators.UnigramTokenizer.emTrainOracle(
      "documents", "text", seedSize = 80, targetSize = 30, rounds = 3,
      shrinkBp = 7500, maxPieceLen = 4, maxWordLen = 8)))

  /** q170: the full production tokenizer lifecycle in one query —
    * [[graft.operators.UnigramTokenizer.emTrain]] (q169's EM-to-target
    * schedule) trains the vocabulary, then
    * [[graft.operators.UnigramTokenizer.encodeWith]] (q152's frozen
    * applier) encodes the corpus PLUS a planted later-crawl doc under
    * it: train → freeze → apply, the exact composition
    * TokenizerArtifacts persists across jobs. The planted "zx" is
    * UNSPELLABLE (x/z sit outside the 24-char corpus alphabet — the
    * q161 fixture's measured fact) and must surface as the single
    * NULL-id <unk> row. Output restricted to the q133 window + the
    * plant. */
  private val q170 = QuerySpec(
    "q170_unigram_em_frozen_apply",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val vocab = graft.operators.UnigramTokenizer.emTrain(docs, "text",
        seedSize = 80, targetSize = 30, rounds = 3, shrinkBp = 7500,
        maxPieceLen = 4)
      import s.implicits._
      val crawl = docs.select(col("doc_id"), col("text"))
        .union(Seq((9999994L, "the zx data")).toDF("doc_id", "text"))
      graft.operators.UnigramTokenizer.encodeWith(crawl, "doc_id", "text",
          vocab, maxPieceLen = 4)
        .filter((col("doc_id") < 40 || col("doc_id") === 9999994L)
          && col("word_pos") < 8)
        .orderBy(col("doc_id"), col("word_pos"), col("piece_pos"))
    },
    oracle = Some(graft.operators.UnigramTokenizer.emApplyOracle(
      "documents",
      "(SELECT doc_id, text FROM documents " +
        "UNION ALL SELECT 9999994, 'the zx data')",
      "doc_id", "text", seedSize = 80, targetSize = 30, rounds = 3,
      shrinkBp = 7500, maxPieceLen = 4, maxWordLen = 8,
      where = "(doc_id < 40 OR doc_id = 9999994) AND word_pos < 8")))

  /** q172: BATCHED BPE learning against the SEQUENTIAL oracle — the
    * driver-checked form of the batched-disjoint equivalence proof:
    * the Spark side learns q131's 10 merges at `batch = 8` (multiple
    * pairs accepted per census job wherever the four acceptance rules
    * allow), while the DuckDB oracle replays the strictly SEQUENTIAL
    * 10-round unroll. A hash match means the batched loop produced
    * the exact sequential merge table on real data — every round, not
    * just on the spec fixtures. */
  private val q172 = QuerySpec(
    "q172_bpe_merges_batched",
    (s, dir) =>
      graft.operators.Vocabulary.bpeMerges(Tables.documents(s, dir),
          "text", numMerges = 10, batch = 8)
        .orderBy(col("rank")),
    oracle = Some(graft.operators.Vocabulary.bpeMergesOracle(
      "documents", "text", numMerges = 10)))

  /** q190: BPE frozen-vocabulary coverage drift
    * ([[graft.operators.Vocabulary.bpeCoverageWithModel]]) — q161's
    * twin for the BPE lifecycle, closing the two-tokenizer symmetry:
    * per source, the share of subword occurrences the frozen alphabet
    * cannot id. BPE is open-vocabulary at the word level, so drift
    * surfaces as unknown SYMBOLS — the planted 'alien' slice carries
    * characters (x, z) outside the training alphabet and must show a
    * nonzero unknown_bp while every trained source reads 0. One
    * learn feeds segmentation + alphabet (the bpeLearnAll path);
    * DuckDB replays learn, frozen apply, and the per-group integer
    * basis points end to end. */
  private val q190 = QuerySpec(
    "q190_bpe_coverage",
    (s, dir) => {
      val docs = Tables.documents(s, dir)
      val model = graft.operators.Vocabulary.bpeLearnAll(docs, "text", 10)
      import s.implicits._
      val crawl = docs.select(col("source"), col("text"))
        .union(Seq(("alien", "the zx data qq"), ("alien", "zzz xx"))
          .toDF("source", "text"))
      graft.operators.Vocabulary
        .bpeCoverageWithModel(crawl, "source", "text", model)
        .orderBy(col("source"))
    },
    oracle = Some(graft.operators.Vocabulary.bpeCoverageOracle(
      "documents",
      "(SELECT source, text FROM documents " +
        "UNION ALL SELECT 'alien', 'the zx data qq' " +
        "UNION ALL SELECT 'alien', 'zzz xx')",
      "text", "source", numMerges = 10)))

  /** q191: Unicode-script composition per source
    * ([[graft.operators.LangId.scriptMix]]) — the worldwide
    * complement to the q149 n-gram language profiles: per slice, the
    * exact-basis-point share of each major script block, the signal
    * that routes text to the right language pipeline (or flags
    * mixed-script spam) with no model at all. Classification is pure
    * string-range comparison over codepoint-indexed substrings
    * (UTF-8 binary order IS codepoint order), so DuckDB replays it
    * bit for bit — planted Cyrillic/CJK/kana/mixed slices included. */
  private val q191 = QuerySpec(
    "q191_script_mix",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select(col("source"), col("text"))
        .union(Seq(
          ("ru", "привет мир 2024 год"),
          ("zh", "你好 世界 数据"),
          ("jp", "こんにちは カタカナ 漢字"),
          ("mix", "hello мир 你好 123 — Ωμέγα")).toDF("source", "text"))
      graft.operators.LangId.scriptMix(docs, "source", "text")
        .orderBy(col("source"))
    },
    oracle = Some(graft.operators.LangId.scriptMixOracle(
      "(SELECT source, text FROM documents UNION ALL " +
        "SELECT 'ru', 'привет мир 2024 год' UNION ALL " +
        "SELECT 'zh', '你好 世界 数据' UNION ALL " +
        "SELECT 'jp', 'こんにちは カタカナ 漢字' UNION ALL " +
        "SELECT 'mix', 'hello мир 你好 123 — Ωμέγα')",
      "source", "text")))

  /** q192: mixed-script (homoglyph) word share per source
    * ([[graft.operators.LangId.mixedScriptWords]]) — q191's
    * word-grain sibling and the confusable-spam signal: a word whose
    * letters span two script blocks ("раypal") is the classic
    * spoofing shape, while clean multilingual prose is script-pure
    * per word. Digits and punctuation are neutral, so codes and
    * "привет2024" stay clean. The planted 'homo' slice carries two
    * spliced words among clean ones; trained sources read 0. DuckDB
    * replays the per-word distinct-script arithmetic bit for bit. */
  private val q192 = QuerySpec(
    "q192_mixed_script_words",
    (s, dir) => {
      import s.implicits._
      val docs = Tables.documents(s, dir).select(col("source"), col("text"))
        .union(Seq(
          ("homo", "get раypal now mixѕcript alert"),
          ("homo", "привет2024 hello x86 clean"),
          ("ru2", "чистый русский текст без примесей"))
          .toDF("source", "text"))
      graft.operators.LangId.mixedScriptWords(docs, "source", "text")
        .orderBy(col("source"))
    },
    oracle = Some(graft.operators.LangId.mixedScriptWordsOracle(
      "(SELECT source, text FROM documents UNION ALL " +
        "SELECT 'homo', 'get раypal now mixѕcript alert' UNION ALL " +
        "SELECT 'homo', 'привет2024 hello x86 clean' UNION ALL " +
        "SELECT 'ru2', 'чистый русский текст без примесей')",
      "source", "text")))

  val specs: Seq[QuerySpec] = Seq(q83, q84, q85, q86, q87, q88, q89, q90, q91,
    q131, q132, q133, q136, q145, q146, q147, q149, q151, q152, q153, q160,
    q161, q162, q163, q166, q167, q169, q170, q172, q190, q191, q192)
}
