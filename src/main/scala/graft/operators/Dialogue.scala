package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** SFT dialogue assembly with loss-mask spans — the turn-masking step
  * every supervised-fine-tuning dataloader runs between corpus
  * curation and batching: flatten a conversation's turns into ONE
  * training sequence and record, per turn, the token span it occupies
  * and whether the trainer computes loss on it (assistant turns yes,
  * user/system turns no — the model must not be trained to imitate
  * users).
  *
  * Template: each turn renders as `<|role|> text` and turns join with
  * a single space, so with whitespace tokenization the role tag costs
  * exactly one token and a turn's token count is `1 + tokens(text)` —
  * offsets are exact integers any engine reproduces (the q154/q155
  * oracles replay rendering, counting, and the cumulative walk). Swap
  * in a real tokenizer by feeding the assembled text to
  * [[UnigramTokenizer.encodeWith]]/[[Vocabulary.bpeEncodeWith]] —
  * span arithmetic is tokenizer-agnostic as long as counting and
  * assembly agree, which is why they live in one operator.
  *
  * Scale shape: one groupBy on the conversation key; each
  * conversation's turns meet in a bounded per-entity collect (the
  * accepted per-entity class — a conversation is a document, not a
  * corpus) sorted by turn index, and the offset walk is a single
  * higher-order fold per conversation. No window over a corpus-hot
  * key, no join, nothing driver-side.
  */
object Dialogue {

  private def renderSeg(role: org.apache.spark.sql.Column,
                        text: org.apache.spark.sql.Column) =
    concat(lit("<|"), role, lit("|> "), coalesce(text, lit("")))

  /** Assemble one training sequence per conversation:
    * (convCol, n_turns, n_tokens, text, spans) with `spans` an array
    * of (turn_idx, role, tok_start, tok_end, loss_mask) structs in
    * turn order — tok spans are 0-based, half-open, over whitespace
    * tokens of `text`; `loss_mask` is true iff role == `lossRole`.
    * Turn order is (turnCol asc); duplicate turn indices within one
    * conversation are a caller bug (the sort makes the output
    * deterministic but the spans of duplicates interleave). */
  def assemble(turns: DataFrame, convCol: String, turnCol: String,
               roleCol: String, textCol: String,
               lossRole: String = "assistant"): DataFrame = {
    val seg = turns.select(
      col(convCol), col(turnCol).cast("int").as("__turn"),
      col(roleCol).as("__role"),
      renderSeg(col(roleCol), col(textCol)).as("__seg"))
      .withColumn("__ntok", TextFns.tokenCount(col("__seg")).cast("long"))
    seg.groupBy(col(convCol))
      .agg(array_sort(collect_list(struct(
        col("__turn"), col("__role"), col("__seg"), col("__ntok"))))
        .as("__ts"))
      .select(
        col(convCol),
        size(col("__ts")).as("n_turns"),
        aggregate(col("__ts"), lit(0L), (acc, x) => acc + x("__ntok"))
          .as("n_tokens"),
        concat_ws(" ", transform(col("__ts"), x => x("__seg"))).as("text"),
        aggregate(
          col("__ts"),
          struct(lit(0L).as("off"),
            array().cast("array<struct<turn_idx:int,role:string," +
              "tok_start:bigint,tok_end:bigint,loss_mask:boolean>>")
              .as("spans")),
          (acc, x) => struct(
            (acc("off") + x("__ntok")).as("off"),
            concat(acc("spans"), array(struct(
              x("__turn").as("turn_idx"),
              x("__role").as("role"),
              acc("off").as("tok_start"),
              (acc("off") + x("__ntok")).as("tok_end"),
              (x("__role") === lossRole).as("loss_mask")))).as("spans")),
          acc => acc("spans")).as("spans"))
  }

  /** DPO/RLHF preference-pair assembly: per prompt, pair the BEST and
    * WORST responses by (scoreCol desc, idCol asc) — the standard
    * reduction of a scored response pool to (chosen, rejected)
    * training pairs. Prompts whose best and worst scores tie (single
    * response, or an all-equal pool) carry no preference signal and
    * are DROPPED — a zero-margin pair teaches nothing and a
    * same-response pair is degenerate.
    *
    * Deterministic: ties at either end resolve to the SMALLEST
    * response id on both sides (min-struct aggregation — packed as
    * `min(struct(−score, id))` / `min(struct(score, id))`, so the
    * whole selection is two partial-aggregatable min-structs in ONE
    * groupBy; no per-prompt window, a corpus-hot prompt cannot
    * straggle). `scoreCol` must be integral and above
    * `−Long.MaxValue` (it is negated).
    *
    * Output: (promptCol, n_responses, chosen_id, chosen_score,
    * rejected_id, rejected_score, margin). */
  def preferencePairs(responses: DataFrame, promptCol: String,
                      idCol: String, scoreCol: String): DataFrame =
    responses
      .filter(col(idCol).isNotNull && col(scoreCol).isNotNull)
      .groupBy(col(promptCol))
      .agg(
        count(lit(1)).as("n_responses"),
        min(struct((-col(scoreCol)).as("ns"), col(idCol).as("id")))
          .as("__c"),
        min(struct(col(scoreCol).as("s"), col(idCol).as("id")))
          .as("__r"))
      .select(col(promptCol), col("n_responses"),
        col("__c.id").as("chosen_id"),
        (-col("__c.ns")).as("chosen_score"),
        col("__r.id").as("rejected_id"),
        col("__r.s").as("rejected_score"),
        (-col("__c.ns") - col("__r.s")).as("margin"))
      .filter(col("margin") > 0)

  /** [[assemble]]'s spans exploded to one row per turn — the layout a
    * dataloader joins against the tokenized sequence:
    * (convCol, turn_idx, role, tok_start, tok_end, loss_mask). */
  def maskSpans(turns: DataFrame, convCol: String, turnCol: String,
                roleCol: String, textCol: String,
                lossRole: String = "assistant"): DataFrame =
    assemble(turns, convCol, turnCol, roleCol, textCol, lossRole)
      .select(col(convCol), explode(col("spans")).as("s"))
      .select(col(convCol), col("s.turn_idx"), col("s.role"),
        col("s.tok_start"), col("s.tok_end"), col("s.loss_mask"))
}
