package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus vocabulary construction and token-id encoding — the final
  * tokenize-to-integers step before training tensors exist.
  *
  * [[build]]: top-`size` tokens by corpus frequency, ids 1..size by
  * (count desc, token asc) — fully deterministic, so the same corpus
  * always yields the same vocabulary in any engine. 0 is reserved for
  * OOV by construction (ids start at 1).
  *
  * [[encode]]: every document becomes (id, pos, tok_id) rows, OOV → 0.
  * Emitted EXPLODED rather than as an array column: downstream packing
  * and loss masking are per-token anyway, and at 100 TB the exploded
  * form streams through narrow stages while an array column would
  * concentrate each document's tensor in one row.
  *
  * Scale notes: counting is one shuffle on the token (map-side partial
  * counts); the rank window sorts only the VOCAB relation (distinct
  * tokens ≪ corpus, and the candidate set is pre-filtered to the top
  * `size` per partition class by the count aggregate); encoding is a
  * broadcast join of the vocabulary — the corpus is never shuffled.
  */
object Vocabulary {

  /** Top-`size` tokens by frequency → (tok, n, tok_id). */
  def build(docs: DataFrame, textCol: String, size: Int): DataFrame = {
    val counts = docs
      .select(explode(TextFns.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("n"))
    // the window input is bounded first via TopK.global
    // (TakeOrderedAndProject — no global sort materialization)
    val top = TopK.global(counts, size, col("n").desc, col("tok").asc)
    top.withColumn("tok_id",
      row_number().over(Window.orderBy(col("n").desc, col("tok").asc))
        .cast("int"))
  }

  /** Encode documents against a built vocabulary: (id, pos, tok,
    * tok_id), one row per token occurrence, OOV tokens get id 0.
    * NULL text produces no rows. */
  def encode(docs: DataFrame, vocab: DataFrame, idCol: String,
             textCol: String): DataFrame =
    docs
      .select(col(idCol).as("id"),
        posexplode(TextFns.tokens(col(textCol))).as(Seq("pos", "tok")))
      .join(broadcast(vocab.select(col("tok"), col("tok_id"))),
        Seq("tok"), "left")
      .select(col("id"), col("pos").cast("int").as("pos"), col("tok"),
        coalesce(col("tok_id"), lit(0)).as("tok_id"))
}
