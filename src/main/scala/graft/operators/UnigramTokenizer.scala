package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SentencePiece-style unigram-LM tokenization (Kudo, "Subword
  * Regularization: Improving Neural Network Translation Models with
  * Multiple Subword Candidates", 2018) — the OTHER major subword
  * algorithm next to BPE ([[Vocabulary]] q131-q133): score every
  * subword piece by a unigram language model and segment each word
  * with the Viterbi best path (minimum total negative log-prob).
  *
  * The family covers the tokenizer lifecycle end to end: SEED
  * vocabulary (Kudo §3's starting point — all frequent substrings
  * scored by occurrence, q146), exact Viterbi segmentation (q147),
  * one hard-EM refine-and-prune round ([[emReweight]], q149),
  * corpus→tensor encoding ([[encode]], q151), FROZEN-vocabulary apply
  * with `<unk>` rows ([[encodeWith]], q152), per-slice fertility
  * (q160) and frozen-vocab coverage/drift (q161) — every stage
  * replayed bit for bit by generated DuckDB oracles.
  *
  * Determinism contract (the [[UnigramLm]] rule): piece
  * log-probabilities are quantized ONCE to integer micro-units
  * (`round(ln(w/W)·10⁶)` — one `ln` per vocabulary entry), so path
  * costs are exact integer sums; the Viterbi argmin packs
  * `(cost, piece_len)` into one integer key (`k = cost·32 + (32−len)`,
  * len ≤ 16 < 32) so ties break toward the LONGER piece identically
  * in any engine.
  *
  * Scale shape (the BPE trick, [[Vocabulary]] scaladoc): the corpus
  * is touched ONCE by the word-count shuffle; candidate extraction,
  * vocabulary scoring, and Viterbi all run over the WORD-FREQUENCY
  * relation (distinct words ≪ corpus tokens by Heaps' law), with the
  * piece table broadcast into the candidate join. The Viterbi DP is a
  * single higher-order-function pass per word — no per-position
  * shuffle, no driver loop; document encoding would broadcast-join
  * the finished word→pieces table exactly like [[Vocabulary.bpeEncode]].
  */
object UnigramTokenizer {

  /** (word, cnt) corpus word frequencies. */
  private[graft] def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextFns.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** All (start, len) substrings of `word` up to `maxPieceLen`,
    * exploded as (i, l, piece) — every occurrence position counts
    * once, so a piece's weight is Σ cnt(word)·occurrences. */
  private def candidates(words: DataFrame, maxPieceLen: Int): DataFrame =
    words.select(col("word"), col("cnt"),
      explode(flatten(transform(sequence(lit(1), length(col("word"))), i =>
        transform(sequence(lit(1),
          least(lit(maxPieceLen), length(col("word")) - i + 1)), l =>
          struct(i.cast("int").as("i"), l.cast("int").as("l"),
            col("word").substr(i, l).as("piece")))))).as("c"))
      .select(col("word"), col("cnt"),
        col("c.i").as("i"), col("c.l").as("l"), col("c.piece").as("piece"))

  /** Seed vocabulary from word-frequency `words`: ALL single
    * characters (coverage guarantee — every corpus word stays
    * segmentable) plus the top multi-char substrings by
    * (weight desc, piece asc) until `vocabSize` pieces.
    * Output: (piece, weight, lp_micro). */
  private def seedFromWords(words: DataFrame, vocabSize: Int,
                            maxPieceLen: Int): DataFrame = {
    // the piece-weight relation is referenced FOUR times in the final
    // plan (chars, the top-k slice, and both sides of the broadcast
    // total) — eager localCheckpoint materializes it once
    // (vocab-sized blocks, freed by the ContextCleaner when the plan
    // is GC'd) so the candidate explode beneath it runs exactly once
    // per call instead of once per reference (measured: the lazy form
    // re-scanned the corpus ~5× at WeakScale 16×)
    val weights = candidates(words, maxPieceLen)
      .groupBy(col("piece")).agg(sum(col("cnt")).as("weight"))
      .localCheckpoint()
    val chars = weights.filter(length(col("piece")) === 1)
    val nChars = chars.count()
    require(vocabSize > nChars,
      s"vocabSize ($vocabSize) must exceed the corpus alphabet " +
        s"($nChars single-char pieces are always kept)")
    val multi = TopK.global(weights.filter(length(col("piece")) > 1),
      (vocabSize - nChars).toInt, col("weight").desc, col("piece").asc)
    val sel = chars.union(multi)
    // scalar total via broadcast cross join (the W1 pattern) — the
    // plan stays fully distributed, no driver round trip
    sel.crossJoin(broadcast(sel.agg(sum(col("weight")).as("__w"))))
      .select(col("piece"), col("weight"),
        round(log(col("weight").cast("double") / col("__w")) * lit(1e6), 0)
          .cast("long").as("lp_micro"))
  }

  /** Seed unigram vocabulary of the corpus: (piece, weight,
    * lp_micro) — see [[seedFromWords]]. */
  def seedVocab(docs: DataFrame, textCol: String, vocabSize: Int,
                maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen must be in [1, 16] (len packs into 5 bits of the " +
        s"Viterbi key), got $maxPieceLen")
    seedFromWords(wordCounts(docs, textCol), vocabSize, maxPieceLen)
  }

  /** Viterbi-segment every distinct corpus word under the seed
    * vocabulary: (word, cnt, encoding, n_pieces, cost_micro) with
    * `encoding` the space-joined best-path pieces, `cost_micro` the
    * exact integer path cost (Σ −lp_micro), ties broken toward longer
    * pieces then handled identically in both engines by the packed
    * key. One HOF pass per word; the piece table is broadcast. */
  def segmentWords(docs: DataFrame, textCol: String, vocabSize: Int,
                   maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen must be in [1, 16], got $maxPieceLen")
    // the word relation feeds the vocabulary AND the DP join of the
    // RETURNED lazy plan — a persist + finally-unpersist here would
    // evict before the caller ever executes (the original form did,
    // turning one corpus pass into ~7 at WeakScale 16×); eager
    // localCheckpoint pins the Heaps-bounded relation until the plan
    // is GC'd and truncates the corpus scan out of every reference
    val words = wordCounts(docs, textCol).localCheckpoint()
    viterbi(words, seedFromWords(words, vocabSize, maxPieceLen), maxPieceLen)
  }

  /** The Viterbi DP over a (word, cnt) relation under a (piece, …,
    * lp_micro) vocabulary — the shared tail of [[segmentWords]] and
    * [[emReweight]]. `words` must already be checkpointed (it feeds
    * both the candidate join and the DP join of the returned lazy
    * plan). */
  private[graft] def viterbi(words: DataFrame, seed: DataFrame,
                             maxPieceLen: Int): DataFrame = {
    locally {
      val pieces = seed
        .select(col("piece"), (-col("lp_micro")).as("cost"))
      // in-vocab candidates keyed by END position j and length l;
      // key = j·32 + l is unique per (j, l) so the map build is
      // collect-order-independent
      val cand = candidates(words, maxPieceLen)
        .join(broadcast(pieces), "piece")
        .select(col("word"),
          ((col("i") + col("l") - 1) * 32 + col("l")).cast("long").as("k"),
          col("cost"))
      val cmap = cand.groupBy(col("word"))
        .agg(map_from_entries(collect_list(struct(col("k"), col("cost"))))
          .as("cmap"))
      // LEFT join + empty-map fallback: at learn time every word has
      // candidates (its own characters are in the vocabulary), but
      // under a FIXED vocabulary (encodeWith) a word whose characters
      // the training corpus never saw has none — it must stay in the
      // relation and fall through the DP with a NULL path cost (the
      // unsegmentable marker), not silently vanish in an inner join
      val dp = words.join(cmap, Seq("word"), "left")
        .withColumn("cmap",
          coalesce(col("cmap"), expr("cast(map() as map<bigint,bigint>)")))
        .withColumn("dp", aggregate(
          sequence(lit(1), length(col("word"))),
          // the zero MUST declare nullable elements: array(lit(0L))
          // infers containsNull=false, and appending the DP's NULL
          // (unreachable position under a fixed vocabulary) into a
          // non-nullable array silently materializes 0 — a phantom
          // zero-cost path (caught by the q152 oracle)
          struct(array(lit(0L)).cast("array<long>").as("best"),
            array().cast("array<long>").as("bp")),
          (acc, j) => {
            // k = (best[j−l] + cost(piece ending at j, len l))·32 +
            // (32 − l): min picks lowest cost, then LONGEST piece
            val keys = filter(
              transform(sequence(lit(1), least(lit(maxPieceLen), j)), l =>
                (element_at(acc("best"), (j - l + 1).cast("int")) +
                  element_at(col("cmap"), (j * 32 + l).cast("long"))) * 32 +
                  (lit(32) - l)),
              x => x.isNotNull)
            val mk = array_min(keys)
            struct(
              concat(acc("best"),
                // exact integer floor-div by 32 (keys are nonnegative):
                // matches the oracle's `// 32` unconditionally, with no
                // 2^53 double-precision ceiling on cumulative cost ×32
                array(shiftright(mk.cast("long"), 5)))
                .as("best"),
              concat(acc("bp"), array(lit(32L) - pmod(mk, lit(32L))))
                .as("bp"))
          }))
        .select(col("word"), col("cnt"),
          col("dp.best").as("best"), col("dp.bp").as("bp"))
      // backward walk: at most len(word) steps; once pos hits 0 the
      // remaining iterations are no-ops
      dp.withColumn("pieces", aggregate(
          sequence(lit(1), length(col("word"))),
          struct(length(col("word")).cast("long").as("pos"),
            array().cast("array<string>").as("ps")),
          (acc, _) => {
            val l = element_at(col("bp"), acc("pos").cast("int"))
            when(acc("pos") > 0,
              struct((acc("pos") - l).as("pos"),
                concat(
                  array(col("word").substr(
                    (acc("pos") - l + 1).cast("int"), l.cast("int"))),
                  acc("ps")).as("ps")))
              .otherwise(struct(acc("pos").as("pos"), acc("ps").as("ps")))
          },
          acc => acc("ps")))
        .select(col("word"), col("cnt"),
          concat_ws(" ", col("pieces")).as("encoding"),
          size(col("pieces")).as("n_pieces"),
          element_at(col("best"), length(col("word")) + 1)
            .as("cost_micro"))
    }
  }

  /** One hard-EM (Viterbi-EM) re-estimation round over the seed
    * vocabulary — the refine step of Kudo §3.2's iterate-and-prune
    * loop in its deterministic hard variant: piece counts are taken
    * from the Viterbi BEST path only (not the full lattice
    * expectation), so both engines replay the round exactly.
    *
    * New weight per piece = Σ over corpus words of cnt(word) ×
    * occurrences in the word's best path; multi-char pieces the
    * Viterbi never uses are PRUNED (they carried probability mass the
    * segmentation cannot spend — Kudo's prune, by used-mass instead
    * of likelihood loss); single characters are always kept with a
    * Laplace floor of 1 (the coverage guarantee — an unseen-in-paths
    * char must stay segmentable, and ln(0) is not a log-prob).
    * Log-probs are re-quantized from the new weights by the same
    * one-ln-per-piece micro rule.
    *
    * Output: (piece, weight, lp_micro) — same shape as [[seedVocab]],
    * so rounds compose; the q149 oracle replays seed → Viterbi →
    * recount → re-quantize end to end. Scale: corpus touched once
    * (the [[segmentWords]] word-count shuffle); everything after runs
    * over the word- and vocab-sized relations. */
  def emReweight(docs: DataFrame, textCol: String, vocabSize: Int,
                 maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen must be in [1, 16], got $maxPieceLen")
    val words = wordCounts(docs, textCol).localCheckpoint()
    val seed = seedFromWords(words, vocabSize, maxPieceLen)
    val counts = viterbi(words, seed, maxPieceLen)
      .select(col("cnt"),
        explode(split(col("encoding"), " ")).as("piece"))
      .groupBy(col("piece")).agg(sum(col("cnt")).as("vcount"))
    val refined = seed.select(col("piece"))
      .join(counts, Seq("piece"), "left")
      .select(col("piece"),
        when(length(col("piece")) === 1,
          greatest(coalesce(col("vcount"), lit(0L)), lit(1L)))
          .otherwise(col("vcount")).as("weight"))
      .filter(col("weight").isNotNull)
    refined.crossJoin(broadcast(refined.agg(sum(col("weight")).as("__w"))))
      .select(col("piece"), col("weight"),
        round(log(col("weight").cast("double") / col("__w")) * lit(1e6), 0)
          .cast("long").as("lp_micro"))
  }

  /** Hard-EM to a TARGET vocabulary — the SentencePiece training
    * schedule (Kudo 2018 §3.2: EM rounds interleaved with pruning the
    * least-useful pieces by a shrink factor until the target size):
    * [[emReweight]]'s refine+prune round ITERATED `rounds` times, each
    * round keeping every single-char piece (the coverage guarantee)
    * plus the top multi-char pieces by best-path usage —
    * max(targetSize − |alphabet|, ⌈|multi|·shrinkBp/10⁴⌉) of them, so
    * the vocabulary shrinks geometrically and floors at the target.
    *
    * Determinism/portability: usage counts are exact integers, the
    * prune rank is (weight desc, piece asc), and the shrink arithmetic
    * is pure integer basis points — [[emTrainOracle]] replays every
    * round bit-for-bit. Scale: the word relation checkpoints ONCE
    * (corpus pays one tokenize+count shuffle total); each round is a
    * vocab-broadcast Viterbi over the DISTINCT-WORD relation plus two
    * vocab-sized aggregates, and the evolving vocabulary
    * eager-checkpoints per round (vocab-sized blocks — the
    * bpeMerges 16-round cadence concern doesn't arise because the
    * checkpointed relation here is the MODEL, not the corpus). Driver
    * round-trips are two vocab-sized counts per round. */
  def emTrain(docs: DataFrame, textCol: String, seedSize: Int,
              targetSize: Int, rounds: Int, shrinkBp: Int = 7500,
              maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen must be in [1, 16], got $maxPieceLen")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    require(shrinkBp >= 1 && shrinkBp <= 10000,
      s"shrinkBp must be in [1, 10000], got $shrinkBp")
    val words = wordCounts(docs, textCol).localCheckpoint()
    var vocab = seedFromWords(words, seedSize, maxPieceLen)
      .localCheckpoint()
    (1 to rounds).foreach { _ =>
      val vcounts = viterbi(words, vocab, maxPieceLen)
        .select(col("cnt"),
          explode(split(col("encoding"), " ")).as("piece"))
        .groupBy(col("piece")).agg(sum(col("cnt")).as("vcount"))
      val reweighted = vocab.select(col("piece"))
        .join(vcounts, Seq("piece"), "left")
        .select(col("piece"),
          when(length(col("piece")) === 1,
            greatest(coalesce(col("vcount"), lit(0L)), lit(1L)))
            .otherwise(col("vcount")).as("weight"))
        .filter(col("weight").isNotNull)
        .localCheckpoint()
      val chars = reweighted.filter(length(col("piece")) === 1)
      val multi = reweighted.filter(length(col("piece")) > 1)
      val nChars = chars.count()
      val nMulti = multi.count()
      val keepMulti = math.max(targetSize - nChars,
        (nMulti * shrinkBp + 9999L) / 10000L)
      val kept = chars.union(TopK.global(multi,
        math.min(keepMulti, nMulti).toInt,
        col("weight").desc, col("piece").asc))
      vocab = kept
        .crossJoin(broadcast(kept.agg(sum(col("weight")).as("__w"))))
        .select(col("piece"), col("weight"),
          round(log(col("weight").cast("double") / col("__w")) * lit(1e6), 0)
            .cast("long").as("lp_micro"))
        .localCheckpoint()
    }
    vocab
  }

  /** Document encoding under the seed unigram LM — the full
    * corpus→tensor path, [[Vocabulary.bpeEncode]]'s twin for this
    * tokenizer family: (idCol, word_pos, piece_pos, piece, piece_id),
    * positions 0-based, piece ids 1-based by (piece asc) over the
    * FULL seed vocabulary (not just used pieces — the id space is the
    * one [[seedVocab]] publishes, stable across encode calls). The
    * corpus is tokenized once (narrow posexplode) and joined against
    * the BROADCAST word→pieces table (word-relation-sized); the
    * corpus itself never shuffles. */
  def encode(docs: DataFrame, idCol: String, textCol: String,
             vocabSize: Int, maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen must be in [1, 16], got $maxPieceLen")
    import org.apache.spark.sql.expressions.Window
    val words = wordCounts(docs, textCol).localCheckpoint()
    val seed = seedFromWords(words, vocabSize, maxPieceLen)
    val segs = viterbi(words, seed, maxPieceLen)
      .select(col("word"), split(col("encoding"), " ").as("ps"))
    // vocab-sized ranking window — the bpeEncode alphabet precedent
    val pieceIds = seed.select(col("piece"))
      .withColumn("piece_id",
        row_number().over(Window.orderBy(col("piece"))).cast("int"))
    docs
      .select(col(idCol).as("id"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("word_pos", "word")))
      .join(broadcast(segs), "word")
      .select(col("id"), col("word_pos").cast("int").as("word_pos"),
        posexplode(col("ps")).as(Seq("piece_pos", "piece")))
      .join(broadcast(pieceIds), "piece")
      .select(col("id").as(idCol), col("word_pos"),
        col("piece_pos").cast("int").as("piece_pos"),
        col("piece"), col("piece_id"))
  }

  /** Viterbi-encode `docs` under a FIXED vocabulary — the apply side
    * of the tokenizer lifecycle: learn once ([[seedVocab]] /
    * [[emReweight]]), persist the (piece, lp_micro) table, apply it
    * to every later crawl without relearning (the production shape —
    * a tokenizer is learned on a reference corpus and FROZEN; [[encode]]
    * relearns per call and is the corpus-self form). Same output
    * shape and id space as [[encode]]: piece ids are 1-based (piece
    * asc) over the GIVEN vocabulary.
    *
    * Words the vocabulary cannot spell (a character the training
    * corpus never saw ⇒ no candidate path; the Viterbi cost comes
    * back NULL) are emitted as ONE row per token occurrence —
    * (word_pos, piece_pos 0, piece = the word itself, piece_id NULL)
    * — the `<unk>` convention; callers map or drop NULL-id rows.
    * Scale: identical to [[encode]] — one narrow posexplode over the
    * corpus, word→pieces and piece-id tables broadcast, the new
    * corpus pays one word-count shuffle. */
  def encodeWith(docs: DataFrame, idCol: String, textCol: String,
                 vocab: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen must be in [1, 16], got $maxPieceLen")
    import org.apache.spark.sql.expressions.Window
    val words = wordCounts(docs, textCol).localCheckpoint()
    val segs = viterbi(words,
        vocab.select(col("piece"), col("lp_micro")), maxPieceLen)
      .select(col("word"),
        when(col("cost_micro").isNotNull, split(col("encoding"), " "))
          .otherwise(array(col("word"))).as("ps"))
    val pieceIds = vocab.select(col("piece"))
      .withColumn("piece_id",
        row_number().over(Window.orderBy(col("piece"))).cast("int"))
    docs
      .select(col(idCol).as("id"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("word_pos", "word")))
      .join(broadcast(segs), "word")
      .select(col("id"), col("word_pos").cast("int").as("word_pos"),
        posexplode(col("ps")).as(Seq("piece_pos", "piece")))
      // LEFT: an unsegmentable word's stand-in piece has no vocab id
      .join(broadcast(pieceIds), Seq("piece"), "left")
      .select(col("id").as(idCol), col("word_pos"),
        col("piece_pos").cast("int").as("piece_pos"),
        col("piece"), col("piece_id"))
  }

  /** Tokenizer fertility per group under the seed unigram LM —
    * [[Vocabulary.bpeFertility]]'s twin for this family: pieces spent
    * per word of each `groupCol` slice, exact integer basis points.
    * The same grade with the same semantics, so the two tokenizer
    * families are comparable on equal footing per corpus slice.
    * Token occurrences join the BROADCAST word→n_pieces table; one
    * group-key aggregate; the corpus never shuffles. */
  def fertility(docs: DataFrame, textCol: String, groupCol: String,
                vocabSize: Int, maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen must be in [1, 16], got $maxPieceLen")
    val words = wordCounts(docs, textCol).localCheckpoint()
    val segs = viterbi(words,
        seedFromWords(words, vocabSize, maxPieceLen), maxPieceLen)
      .select(col("word"), col("n_pieces").cast("long").as("n_sub"))
    docs
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("word"))
      .join(broadcast(segs), "word")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_sub")).as("n_subwords"))
      .withColumn("fertility_bp", expr("n_subwords * 10000 div n_words"))
  }

  /** Frozen-vocabulary coverage per group — the vocab-drift alarm for
    * the apply side ([[encodeWith]]): of each slice's token
    * occurrences, how many words can yesterday's vocabulary NOT spell
    * (no Viterbi path — a character the training corpus never saw)?
    * A rising unspellable rate on a new crawl means the frozen
    * tokenizer no longer fits the data (new language, new script,
    * encoding damage upstream) — re-learn before the `<unk>` flood
    * reaches training. Output: (groupCol, n_words, n_unspellable,
    * unspellable_bp — exact basis points). Word relation from the
    * apply corpus, vocabulary broadcast; one group-key aggregate. */
  def coverage(docs: DataFrame, textCol: String, groupCol: String,
               vocab: DataFrame, maxPieceLen: Int = 4): DataFrame = {
    require(maxPieceLen >= 1 && maxPieceLen <= 16,
      s"maxPieceLen must be in [1, 16], got $maxPieceLen")
    val words = wordCounts(docs, textCol).localCheckpoint()
    val segs = viterbi(words,
        vocab.select(col("piece"), col("lp_micro")), maxPieceLen)
      .select(col("word"), col("cost_micro").isNull.as("__oov"))
    docs
      .select(col(groupCol), explode(TextFns.tokens(col(textCol))).as("word"))
      .join(broadcast(segs), "word")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_words"),
        sum(when(col("__oov"), 1L).otherwise(0L)).as("n_unspellable"))
      .withColumn("unspellable_bp",
        expr("n_unspellable * 10000 div n_words"))
  }

  /** DuckDB replay of [[coverage]]: the two-table DP chain with the
    * NULL-cost unspellable marker, aggregated per group. */
  def coverageOracle(seedTable: String, applyTable: String,
                     textCol: String, groupCol: String, vocabSize: Int,
                     maxPieceLen: Int, maxWordLen: Int): String =
    dpCtes(seedTable, textCol, vocabSize, maxPieceLen, maxWordLen,
      Some(applyTable)) + s""",
      segs AS (SELECT word, list_extract(best, len + 1) IS NULL AS oov
               FROM w$maxWordLen),
      occ AS (
        SELECT $groupCol, unnest(list_filter(
          string_split_regex(coalesce($textCol, ''), '\\s+'),
          x -> x <> '')) AS word
        FROM $applyTable)
      SELECT $groupCol,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT)
               AS n_unspellable,
             CAST(sum(CASE WHEN oov THEN 1 ELSE 0 END) * 10000 // count(*)
               AS BIGINT) AS unspellable_bp
      FROM occ JOIN segs USING (word)
      GROUP BY $groupCol
      ORDER BY $groupCol"""

  /** DuckDB replay of [[fertility]] — the [[Vocabulary.bpeFertilityOracle]]
    * tail over the unigram DP chain. */
  def fertilityOracle(table: String, textCol: String, groupCol: String,
                      vocabSize: Int, maxPieceLen: Int,
                      maxWordLen: Int): String =
    dpCtes(table, textCol, vocabSize, maxPieceLen, maxWordLen) + s""",
      segs AS (SELECT word, CAST(len(pieces) AS BIGINT) AS n_sub
               FROM w$maxWordLen),
      occ AS (
        SELECT $groupCol, unnest(list_filter(
          string_split_regex(coalesce($textCol, ''), '\\s+'),
          x -> x <> '')) AS word
        FROM $table)
      SELECT $groupCol,
             CAST(count(*) AS BIGINT) AS n_words,
             CAST(sum(n_sub) AS BIGINT) AS n_subwords,
             CAST(sum(n_sub) * 10000 // count(*) AS BIGINT) AS fertility_bp
      FROM occ JOIN segs USING (word)
      GROUP BY $groupCol
      ORDER BY $groupCol"""

  // ---- DuckDB oracle generators --------------------------------------

  /** Shared CTE prefix: word counts, candidate substrings, seed
    * selection, and integer piece costs — the exact relations the
    * Spark operators build. */
  private def seedCtes(table: String, textCol: String, vocabSize: Int,
                       maxPieceLen: Int): String = s"""
      WITH wrds AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt, length(word) AS len
        FROM (SELECT unnest(list_filter(
                string_split_regex(coalesce($textCol, ''), '\\s+'),
                x -> x <> '')) AS word
              FROM $table)
        GROUP BY word),
      cand0 AS (
        SELECT word, cnt, CAST(i AS INT) AS i, CAST(l AS INT) AS l,
               substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece
        FROM wrds,
             unnest(range(1, len + 1)) r(i),
             unnest(range(1, ${maxPieceLen + 1})) q(l)
        WHERE i + l - 1 <= len),
      pw AS (
        SELECT piece, CAST(sum(cnt) AS BIGINT) AS weight
        FROM cand0 GROUP BY 1),
      chars AS (SELECT piece, weight FROM pw WHERE length(piece) = 1),
      multi AS (
        SELECT piece, weight FROM (
          SELECT piece, weight,
                 row_number() OVER (ORDER BY weight DESC, piece ASC) AS rn
          FROM pw WHERE length(piece) > 1)
        WHERE rn <= $vocabSize - (SELECT count(*) FROM chars)),
      sel AS MATERIALIZED (
        SELECT piece, weight FROM chars
        UNION ALL SELECT piece, weight FROM multi),
      pcost AS MATERIALIZED (
        SELECT piece, weight,
               CAST(round(ln(CAST(weight AS DOUBLE)
                 / (SELECT sum(weight) FROM sel)) * 1000000, 0) AS BIGINT)
                 AS lp_micro
        FROM sel)"""

  /** DuckDB replay of [[seedVocab]]. */
  def seedVocabOracle(table: String, textCol: String, vocabSize: Int,
                      maxPieceLen: Int): String =
    seedCtes(table, textCol, vocabSize, maxPieceLen) + """
      SELECT piece, weight, lp_micro FROM pcost
      ORDER BY piece"""

  /** DuckDB replay of [[segmentWords]]: the Viterbi DP unrolled to
    * `maxWordLen` chained steps (one per word position — the
    * [[Vocabulary.bpeCtes]] unroll pattern) followed by `maxWordLen`
    * backward-walk steps. Fails loudly (NULL propagation → hash
    * mismatch) if the corpus ever contains a word longer than
    * `maxWordLen`. */
  def segmentsOracle(table: String, textCol: String, vocabSize: Int,
                     maxPieceLen: Int, maxWordLen: Int): String =
    dpCtes(table, textCol, vocabSize, maxPieceLen, maxWordLen) + s"""
      SELECT word, cnt, array_to_string(pieces, ' ') AS encoding,
             CAST(len(pieces) AS INT) AS n_pieces,
             list_extract(best, len + 1) AS cost_micro
      FROM w$maxWordLen
      ORDER BY word"""

  /** DuckDB replay of [[emReweight]]: the full [[segmentsOracle]] DP
    * chain, then the best-path piece recount, the char floor, the
    * unused-multi prune, and the micro re-quantization. */
  def emOracle(table: String, textCol: String, vocabSize: Int,
               maxPieceLen: Int, maxWordLen: Int): String =
    dpCtes(table, textCol, vocabSize, maxPieceLen, maxWordLen) + s""",
      vcounts AS (
        SELECT piece, CAST(sum(cnt) AS BIGINT) AS vcount
        FROM (SELECT cnt, unnest(pieces) AS piece FROM w$maxWordLen)
        GROUP BY piece),
      refined AS MATERIALIZED (
        SELECT piece, weight FROM (
          SELECT p.piece,
                 CASE WHEN length(p.piece) = 1
                      THEN greatest(coalesce(c.vcount, 0), 1)
                      ELSE c.vcount END AS weight
          FROM pcost p LEFT JOIN vcounts c USING (piece))
        WHERE weight IS NOT NULL)
      SELECT piece, weight,
             CAST(round(ln(CAST(weight AS DOUBLE)
               / (SELECT sum(weight) FROM refined)) * 1000000, 0) AS BIGINT)
               AS lp_micro
      FROM refined
      ORDER BY piece"""

  /** DuckDB replay of [[encode]]: the [[segmentsOracle]] DP chain,
    * piece ids ranked over the seed vocabulary, corpus tokenization,
    * and the per-word piece explode. `where` restricts the OUTPUT
    * only (the vocabulary still learns from the whole table, matching
    * the Spark side). */
  def encodeOracle(table: String, idCol: String, textCol: String,
                   vocabSize: Int, maxPieceLen: Int, maxWordLen: Int,
                   where: String): String =
    dpCtes(table, textCol, vocabSize, maxPieceLen, maxWordLen) + s""",
      segs AS (SELECT word, pieces FROM w$maxWordLen),
      pid AS (
        SELECT piece,
               CAST(row_number() OVER (ORDER BY piece) AS INTEGER) AS piece_id
        FROM pcost),
      tok AS (
        SELECT $idCol, CAST(i - 1 AS INTEGER) AS word_pos, w[i] AS word
        FROM (SELECT $idCol, list_filter(
                string_split_regex(coalesce($textCol, ''), '\\s+'),
                x -> x <> '') AS w
              FROM $table) t,
             unnest(range(1, len(w) + 1)) AS r(i)),
      sub AS (
        SELECT t.$idCol, t.word_pos,
               CAST(generate_subscripts(s.pieces, 1) - 1 AS INTEGER) AS piece_pos,
               unnest(s.pieces) AS piece
        FROM tok t JOIN segs s ON s.word = t.word)
      SELECT b.$idCol, b.word_pos, b.piece_pos, b.piece, v.piece_id
      FROM sub b JOIN pid v USING (piece)
      WHERE $where
      ORDER BY b.$idCol, b.word_pos, b.piece_pos"""

  /** DuckDB replay of [[encodeWith]]: the vocabulary learns from
    * `seedTable`, the DP runs over `applyTable`'s words, words the
    * vocabulary cannot spell collapse to their `[word]` stand-in with
    * a NULL id via the LEFT id join. `where` restricts the OUTPUT
    * only. */
  def encodeWithOracle(seedTable: String, applyTable: String,
                       idCol: String, textCol: String, vocabSize: Int,
                       maxPieceLen: Int, maxWordLen: Int,
                       where: String): String =
    dpCtes(seedTable, textCol, vocabSize, maxPieceLen, maxWordLen,
      Some(applyTable)) + s""",
      segs AS (
        SELECT word,
               CASE WHEN list_extract(best, len + 1) IS NULL
                 THEN [word] ELSE pieces END AS pieces
        FROM w$maxWordLen),
      pid AS (
        SELECT piece,
               CAST(row_number() OVER (ORDER BY piece) AS INTEGER) AS piece_id
        FROM pcost),
      tok AS (
        SELECT $idCol, CAST(i - 1 AS INTEGER) AS word_pos, w[i] AS word
        FROM (SELECT $idCol, list_filter(
                string_split_regex(coalesce($textCol, ''), '\\s+'),
                x -> x <> '') AS w
              FROM $applyTable) t,
             unnest(range(1, len(w) + 1)) AS r(i)),
      sub AS (
        SELECT t.$idCol, t.word_pos,
               CAST(generate_subscripts(s.pieces, 1) - 1 AS INTEGER) AS piece_pos,
               unnest(s.pieces) AS piece
        FROM tok t JOIN segs s ON s.word = t.word)
      SELECT b.$idCol, b.word_pos, b.piece_pos, b.piece, v.piece_id
      FROM sub b LEFT JOIN pid v USING (piece)
      WHERE $where
      ORDER BY b.$idCol, b.word_pos, b.piece_pos"""

  /** Shared [[segmentsOracle]]/[[emOracle]]/[[encodeWithOracle]]
    * chain: seed CTEs from `table` + the Viterbi DP over the words of
    * `applyTable` (defaults to the seed table — the learn-time form)
    * unrolled to `maxWordLen` steps + the backward walk — ends at CTE
    * `wN` for N = maxWordLen (word, cnt, len, best, bp, pieces).
    *
    * Unreachable positions (a word the vocabulary cannot spell —
    * only possible when applyTable ≠ table) append NULL to best/bp,
    * exactly like the Spark DP's filtered-empty argmin, so
    * `best[len+1] IS NULL` marks the unsegmentable words and index
    * alignment is preserved for every later position. */
  private def dpCtes(table: String, textCol: String, vocabSize: Int,
                     maxPieceLen: Int, maxWordLen: Int,
                     applyTable: Option[String] = None): String = {
    val sb = new StringBuilder(
      seedCtes(table, textCol, vocabSize, maxPieceLen))
    val at = applyTable.getOrElse(table)
    sb.append(s""",
      awrds AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt, length(word) AS len
        FROM (SELECT unnest(list_filter(
                string_split_regex(coalesce($textCol, ''), '\\s+'),
                x -> x <> '')) AS word
              FROM $at)
        GROUP BY word),
      acand AS (
        SELECT word, CAST(i AS INT) AS i, CAST(l AS INT) AS l,
               substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece
        FROM awrds,
             unnest(range(1, len + 1)) r(i),
             unnest(range(1, ${maxPieceLen + 1})) q(l)
        WHERE i + l - 1 <= len)""")
    sb.append(dpChain("", "pcost", maxWordLen))
    sb.toString
  }

  /** One Viterbi DP + backward walk over the shared `awrds`/`acand`
    * relations under vocabulary relation `vocabRel` (piece,
    * lp_micro), every generated CTE name prefixed with `p` — so a
    * multi-round oracle ([[emTrainOracle]]) can chain one DP per EM
    * round against that round's vocabulary. Ends at CTE
    * `${p}w$maxWordLen` (word, cnt, len, best, bp, pieces). */
  private def dpChain(p: String, vocabRel: String, maxWordLen: Int,
                      wordsRel: String = "awrds",
                      candRel: String = "acand"): String = {
    val sb = new StringBuilder
    sb.append(s""",
      ${p}cand AS MATERIALIZED (
        SELECT c.word, CAST(c.i + c.l - 1 AS BIGINT) AS j,
               CAST(c.l AS BIGINT) AS l, -v.lp_micro AS cost
        FROM $candRel c JOIN $vocabRel v USING (piece)),
      ${p}dp0 AS (
        SELECT word, len, cnt, [CAST(0 AS BIGINT)] AS best,
               CAST([] AS BIGINT[]) AS bp
        FROM $wordsRel)""")
    (1 to maxWordLen).foreach { j =>
      sb.append(s""",
      ${p}s$j AS (
        SELECT c.word,
               min((list_extract(d.best, CAST($j - c.l + 1 AS INT)) + c.cost)
                 * 32 + (32 - c.l)) AS k
        FROM ${p}cand c JOIN ${p}dp${j - 1} d USING (word)
        WHERE c.j = $j
        GROUP BY c.word),
      ${p}dp$j AS (
        SELECT d.word, d.len, d.cnt,
               CASE WHEN s.k IS NOT NULL THEN d.best || [s.k // 32]
                    WHEN d.len >= $j THEN d.best || [CAST(NULL AS BIGINT)]
                    ELSE d.best END AS best,
               CASE WHEN s.k IS NOT NULL THEN d.bp || [32 - (s.k % 32)]
                    WHEN d.len >= $j THEN d.bp || [CAST(NULL AS BIGINT)]
                    ELSE d.bp END AS bp
        FROM ${p}dp${j - 1} d LEFT JOIN ${p}s$j s USING (word))""")
    }
    sb.append(s""",
      ${p}w0 AS (
        SELECT word, cnt, len, best, bp, CAST(len AS BIGINT) AS pos,
               CAST([] AS VARCHAR[]) AS pieces
        FROM ${p}dp$maxWordLen)""")
    (1 to maxWordLen).foreach { t =>
      sb.append(s""",
      ${p}w$t AS (
        SELECT word, cnt, len, best, bp,
               CASE WHEN pos > 0
                 THEN pos - list_extract(bp, CAST(pos AS INT))
                 ELSE pos END AS pos,
               CASE WHEN pos > 0
                 THEN [substring(word,
                        CAST(pos - list_extract(bp, CAST(pos AS INT)) + 1
                          AS INT),
                        CAST(list_extract(bp, CAST(pos AS INT)) AS INT))]
                      || pieces
                 ELSE pieces END AS pieces
        FROM ${p}w${t - 1})""")
    }
    sb.toString
  }

  /** DuckDB replay of [[emTrain]]: the seed CTEs, then one full DP
    * chain + recount + char floor + shrink-schedule prune +
    * renormalization PER ROUND, each round's DP running against the
    * previous round's vocabulary relation. */
  def emTrainOracle(table: String, textCol: String, seedSize: Int,
                    targetSize: Int, rounds: Int, shrinkBp: Int,
                    maxPieceLen: Int, maxWordLen: Int): String =
    emTrainCtes(table, textCol, seedSize, targetSize, rounds, shrinkBp,
      maxPieceLen, maxWordLen) + s"""
      SELECT piece, weight, lp_micro FROM v$rounds
      ORDER BY piece"""

  /** The [[emTrainOracle]] CTE chain up to the final vocabulary
    * relation `v$rounds`, shared with [[emApplyOracle]]. */
  private def emTrainCtes(table: String, textCol: String, seedSize: Int,
                          targetSize: Int, rounds: Int, shrinkBp: Int,
                          maxPieceLen: Int, maxWordLen: Int): String = {
    val sb = new StringBuilder(
      seedCtes(table, textCol, seedSize, maxPieceLen))
    sb.append(s""",
      awrds AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt, length(word) AS len
        FROM (SELECT unnest(list_filter(
                string_split_regex(coalesce($textCol, ''), '\\s+'),
                x -> x <> '')) AS word
              FROM $table)
        GROUP BY word),
      acand AS (
        SELECT word, CAST(i AS INT) AS i, CAST(l AS INT) AS l,
               substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece
        FROM awrds,
             unnest(range(1, len + 1)) r(i),
             unnest(range(1, ${maxPieceLen + 1})) q(l)
        WHERE i + l - 1 <= len),
      v0 AS MATERIALIZED (SELECT piece, weight, lp_micro FROM pcost)""")
    (1 to rounds).foreach { r =>
      sb.append(dpChain(s"r$r", s"v${r - 1}", maxWordLen))
      sb.append(s""",
      vc$r AS (
        SELECT piece, CAST(sum(cnt) AS BIGINT) AS vcount
        FROM (SELECT cnt, unnest(pieces) AS piece FROM r${r}w$maxWordLen)
        GROUP BY piece),
      rw$r AS MATERIALIZED (
        SELECT piece, weight FROM (
          SELECT p.piece,
                 CASE WHEN length(p.piece) = 1
                      THEN greatest(coalesce(c.vcount, 0), 1)
                      ELSE c.vcount END AS weight
          FROM v${r - 1} p LEFT JOIN vc$r c USING (piece))
        WHERE weight IS NOT NULL),
      keep$r AS MATERIALIZED (
        SELECT piece, weight FROM rw$r WHERE length(piece) = 1
        UNION ALL
        SELECT piece, weight FROM (
          SELECT piece, weight,
                 row_number() OVER (ORDER BY weight DESC, piece ASC) AS rn
          FROM rw$r WHERE length(piece) > 1)
        WHERE rn <= greatest(
          $targetSize - (SELECT count(*) FROM rw$r WHERE length(piece) = 1),
          ((SELECT count(*) FROM rw$r WHERE length(piece) > 1)
            * $shrinkBp + 9999) // 10000)),
      v$r AS MATERIALIZED (
        SELECT piece, weight,
               CAST(round(ln(CAST(weight AS DOUBLE)
                 / (SELECT sum(weight) FROM keep$r)) * 1000000, 0) AS BIGINT)
                 AS lp_micro
        FROM keep$r)""")
    }
    sb.toString
  }

  /** DuckDB replay of the full production lifecycle
    * [[emTrain]] → [[encodeWith]]: the EM-trained target vocabulary
    * frozen-encodes `applyTable` (the later crawl) — the train chain
    * ends at `v$rounds`, a second word/candidate relation is built
    * from the apply corpus, one more DP runs under the trained
    * vocabulary, and the encodeWith tail (unspellable `[word]`
    * fallback, LEFT piece-id join) emits the token rows. `where`
    * restricts the OUTPUT only. */
  def emApplyOracle(table: String, applyTable: String, idCol: String,
                    textCol: String, seedSize: Int, targetSize: Int,
                    rounds: Int, shrinkBp: Int, maxPieceLen: Int,
                    maxWordLen: Int, where: String): String =
    emTrainCtes(table, textCol, seedSize, targetSize, rounds, shrinkBp,
      maxPieceLen, maxWordLen) + s""",
      bwrds AS MATERIALIZED (
        SELECT word, CAST(count(*) AS BIGINT) AS cnt, length(word) AS len
        FROM (SELECT unnest(list_filter(
                string_split_regex(coalesce($textCol, ''), '\\s+'),
                x -> x <> '')) AS word
              FROM $applyTable)
        GROUP BY word),
      bcand AS (
        SELECT word, CAST(i AS INT) AS i, CAST(l AS INT) AS l,
               substring(word, CAST(i AS INT), CAST(l AS INT)) AS piece
        FROM bwrds,
             unnest(range(1, len + 1)) r(i),
             unnest(range(1, ${maxPieceLen + 1})) q(l)
        WHERE i + l - 1 <= len)""" +
      dpChain("ap", s"v$rounds", maxWordLen, "bwrds", "bcand") + s""",
      segs AS (
        SELECT word,
               CASE WHEN list_extract(best, len + 1) IS NULL
                 THEN [word] ELSE pieces END AS pieces
        FROM apw$maxWordLen),
      pid AS (
        SELECT piece,
               CAST(row_number() OVER (ORDER BY piece) AS INTEGER) AS piece_id
        FROM v$rounds),
      tok AS (
        SELECT $idCol, CAST(i - 1 AS INTEGER) AS word_pos, w[i] AS word
        FROM (SELECT $idCol, list_filter(
                string_split_regex(coalesce($textCol, ''), '\\s+'),
                x -> x <> '') AS w
              FROM $applyTable) t,
             unnest(range(1, len(w) + 1)) AS r(i)),
      sub AS (
        SELECT t.$idCol, t.word_pos,
               CAST(generate_subscripts(s.pieces, 1) - 1 AS INTEGER) AS piece_pos,
               unnest(s.pieces) AS piece
        FROM tok t JOIN segs s ON s.word = t.word)
      SELECT b.$idCol, b.word_pos, b.piece_pos, b.piece, v.piece_id
      FROM sub b LEFT JOIN pid v USING (piece)
      WHERE $where
      ORDER BY b.$idCol, b.word_pos, b.piece_pos"""
}
