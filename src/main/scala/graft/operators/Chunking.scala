package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking — the context-length prep step
  * between cleaning and packing: long documents become training-sized
  * pieces, short ones pass through as a single (possibly empty) chunk.
  *
  * Pure narrow expressions: tokenize → posexplode over the stride
  * sequence → slice; no shuffle at any corpus size. The last window
  * start is len − window + stride, because later starts would emit
  * chunks wholly contained in their predecessor (duplicated training
  * text); this bound still covers every token and each chunk
  * contributes at least one new one. NULL text chunks as empty.
  */
object Chunking {

  /** (idCol, textCol) → (idCol, chunk_id, n_chunk_tokens, chunk_text),
    * one row per window of `window` tokens every `stride`. */
  def tokenWindows(docs: DataFrame, idCol: String, textCol: String,
                   window: Int = 64, stride: Int = 32): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = graft.functions.TextFns.tokens(coalesce(col(textCol), lit("")))
    docs
      .select(col(idCol), toks.as("__toks"))
      .select(col(idCol),
        posexplode(sequence(lit(1),
          greatest(size(col("__toks")) - (window - stride), lit(1)),
          lit(stride)))
          .as(Seq("chunk_id", "s")),
        col("__toks"))
      .select(
        col(idCol),
        col("chunk_id").cast("int").as("chunk_id"),
        size(slice(col("__toks"), col("s"), lit(window))).as("n_chunk_tokens"),
        array_join(slice(col("__toks"), col("s"), lit(window)), " ")
          .as("chunk_text"))
  }
}
