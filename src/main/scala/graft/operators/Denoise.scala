package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Span-corruption example construction (Raffel et al. 2020 §3.1.4 —
  * the T5 denoising objective; UL2's R-denoiser is the same shape):
  * drop contiguous token spans from each document, replace every
  * dropped span with an ordered sentinel in the INPUT, and emit the
  * dropped spans behind their sentinels as the TARGET — the
  * input/target pair a denoising pre-training dataloader feeds the
  * model.
  *
  * Deterministic block variant (the engine-portable form): tokens are
  * grouped into fixed blocks of `blockSize`; a FULL block is corrupted
  * iff an md5 hash of (idCol, seed, block index) selects it
  * (`pHashMod` buckets, bucket 0 corrupts), and a corrupted block
  * drops its first `spanLen` tokens. Defaults (blockSize 5, spanLen 3,
  * pHashMod 4) corrupt 3/5 · 1/4 = 15% of tokens in mean-3 spans —
  * T5's published rates. Spans cannot overlap by construction (one
  * span per block), the final partial block is never corrupted, and
  * epoch-to-epoch variety comes from `seed` — exactly how a
  * deterministic pipeline re-rolls corruption per epoch without RNG
  * state. Every choice is a pure function of (id, seed, position), so
  * the q157 oracle replays input and target strings bit for bit.
  *
  * Sentinel numbering is per-document span order (`<extra_id_0>` …),
  * and the target terminates with the next unused sentinel (the T5
  * convention). Scale: one narrow projection — tokenize, a
  * block-index transform, two string folds; no shuffle, no join, no
  * per-position explode.
  */
object Denoise {

  /** Prefix-LM split (UL2's S-denoiser / PrefixLM): each document
    * becomes one (prefix → continuation) pair — the model sees the
    * prefix bidirectionally and generates the suffix. The split point
    * is drawn deterministically from md5(id, seed) over the middle
    * band [minFrac, maxFrac] of the token count (UL2 samples U(0.25,
    * 0.75); the hash replaces the RNG so every engine and every rerun
    * agrees, and epochs re-roll via `seed`). Basis-point arithmetic:
    * split = n·frac_bp div 10⁴ with frac_bp = min_bp + hash mod
    * (max_bp − min_bp) — all integers until nothing is left to round.
    *
    * Docs with < 2 tokens cannot split and are DROPPED (no
    * continuation to learn). Output: (idCol, n_tokens, split_at —
    * prefix length ≥ 1, input_text, target_text). One narrow
    * projection; no shuffle. */
  def prefixSplit(docs: DataFrame, idCol: String, textCol: String,
                  minFrac: Double = 0.25, maxFrac: Double = 0.75,
                  seed: Long = 0L): DataFrame = {
    require(minFrac > 0 && maxFrac < 1 && minFrac < maxFrac,
      s"need 0 < minFrac < maxFrac < 1, got [$minFrac, $maxFrac]")
    val minBp = math.round(minFrac * 10000).toInt
    val maxBp = math.round(maxFrac * 10000).toInt
    val toks = coalesce(TextFns.tokens(col(textCol)),
      array().cast("array<string>"))
    val n = size(toks).cast("long")
    val fracBp = lit(minBp.toLong) + pmod(
      Dedup.portableTokenHash(
        concat(col(idCol).cast("string"), lit(":ps:" + seed))),
      lit((maxBp - minBp).toLong))
    // clamp into [1, n−1]: a valid prefix keeps ≥1 token on each side
    val splitAt = greatest(lit(1L),
      least(col("__n") - 1, expr("(__n * __f) div 10000")))
    docs.select(col(idCol), toks.as("__t"), n.as("__n"),
        fracBp.as("__f"))
      .filter(col("__n") >= 2)
      .select(col(idCol), col("__n").as("n_tokens"),
        splitAt.as("split_at"),
        concat_ws(" ", slice(col("__t"), lit(1),
          splitAt.cast("int"))).as("input_text"),
        concat_ws(" ", slice(col("__t"), (splitAt + 1).cast("int"),
          (col("__n") - splitAt).cast("int"))).as("target_text"))
  }

  /** Per-document span-corruption pair:
    * (idCol, n_tokens, n_spans, n_dropped, input_text, target_text).
    * Docs shorter than one full block pass through uncorrupted
    * (n_spans 0, target = the bare terminal sentinel). NULL text →
    * empty token list → ("", "<extra_id_0>"). */
  def spanCorrupt(docs: DataFrame, idCol: String, textCol: String,
                  blockSize: Int = 5, spanLen: Int = 3,
                  pHashMod: Int = 4, seed: Long = 0L): DataFrame = {
    require(blockSize >= 2 && spanLen >= 1 && spanLen < blockSize,
      s"need 1 <= spanLen < blockSize, got spanLen=$spanLen blockSize=$blockSize")
    require(pHashMod >= 2, s"pHashMod must be >= 2, got $pHashMod")
    val toks = coalesce(TextFns.tokens(col(textCol)),
      array().cast("array<string>"))
    val n = size(toks)
    // full blocks only: block b covers tokens [b·B+1, b·B+B] 1-based
    val nFull = (n / blockSize).cast("int")
    val corrupt: Column => Column = b =>
      pmod(Dedup.portableTokenHash(
        concat(col(idCol).cast("string"), lit(":" + seed + ":"),
          b.cast("string"))), lit(pHashMod.toLong)) === 0
    // Spark's sequence DESCENDS when start > stop — sequence(0, -1)
    // is [0, -1], not empty — so a doc with zero full blocks must
    // short-circuit to an empty index array (negative-start slices
    // would otherwise read from the END and duplicate the text;
    // DenoiseSpec pins the short-doc case, which the ≥5-token corpus
    // cannot)
    val blockIdx = when(nFull >= 1, sequence(lit(0), nFull - 1))
      .otherwise(array().cast("array<int>"))
    val blocks = transform(blockIdx, b =>
      struct(b.as("b"), corrupt(b).as("c")))
    // sentinel index of block b = corrupted blocks before it (block
    // counts are ≤ n/blockSize — the quadratic scan is per-doc tiny
    // and replays identically in SQL)
    val sentIdx: (Column, Column) => Column = (bs, b) =>
      size(filter(bs, x => x("c") && x("b") < b))
    docs.select(
        col(idCol), toks.as("__t"), n.as("__n"), nFull.as("__nf"),
        blocks.as("__bs"))
      .select(
        col(idCol),
        col("__n").cast("long").as("n_tokens"),
        size(filter(col("__bs"), x => x("c"))).as("n_spans"),
        (size(filter(col("__bs"), x => x("c"))) * spanLen).cast("long")
          .as("n_dropped"),
        // input: per block, sentinel + kept tail for corrupted blocks,
        // the whole block otherwise; then the uncovered tail tokens
        concat_ws(" ",
          flatten(concat(
            transform(col("__bs"), x =>
              when(x("c"),
                concat(
                  array(concat(lit("<extra_id_"),
                    sentIdx(col("__bs"), x("b")), lit(">"))),
                  slice(col("__t"),
                    x("b") * blockSize + spanLen + 1,
                    lit(blockSize - spanLen))))
                .otherwise(
                  slice(col("__t"), x("b") * blockSize + 1,
                    lit(blockSize)))),
            array(slice(col("__t"), col("__nf") * blockSize + 1,
              greatest(col("__n") - col("__nf") * blockSize, lit(0)))))))
          .as("input_text"),
        // target: sentinel + dropped tokens per corrupted block, then
        // the terminal sentinel
        concat_ws(" ",
          flatten(concat(
            transform(filter(col("__bs"), x => x("c")), x =>
              concat(
                array(concat(lit("<extra_id_"),
                  sentIdx(col("__bs"), x("b")), lit(">"))),
                slice(col("__t"), x("b") * blockSize + 1, lit(spanLen)))),
            array(array(concat(lit("<extra_id_"),
              size(filter(col("__bs"), x => x("c"))), lit(">")))))))
          .as("target_text"))
  }
}
