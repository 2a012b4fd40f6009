package graft.operators

import graft.SparkSpec

/** [[Dialogue]] — SFT assembly + loss-mask spans. q154/q155 prove
  * engine parity on the derived-conversation corpus; this spec pins
  * the template, the offset arithmetic, and the mask rule on a
  * hand-computed conversation. */
class DialogueSpec extends SparkSpec {
  import spark.implicits._

  private val turns = Seq(
    (1L, 0, "system", "be terse"),
    (1L, 1, "user", "what is spark"),
    (1L, 2, "assistant", "a distributed engine"),
    (2L, 0, "user", null.asInstanceOf[String]),
    (2L, 1, "assistant", "ok")
  ).toDF("conv_id", "turn_idx", "role", "text")

  test("assemble: template text, exact token totals, turn order") {
    val rows = Dialogue.assemble(turns, "conv_id", "turn_idx", "role", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getLong(2), r.getString(3))).toMap
    // conv 1: "<|system|> be terse <|user|> what is spark
    //          <|assistant|> a distributed engine" — 3+4+4 tokens
    rows(1L) shouldBe ((3, 11L,
      "<|system|> be terse <|user|> what is spark " +
        "<|assistant|> a distributed engine"))
    // conv 2: NULL text renders as the bare tag (1 token)
    rows(2L) shouldBe ((2, 3L, "<|user|>  <|assistant|> ok"))
  }

  test("maskSpans: half-open spans tile the sequence; loss on assistant only") {
    val s = Dialogue.maskSpans(turns, "conv_id", "turn_idx", "role", "text")
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getString(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    s((1L, 0)) shouldBe (("system", 0L, 3L, false))
    s((1L, 1)) shouldBe (("user", 3L, 7L, false))
    s((1L, 2)) shouldBe (("assistant", 7L, 11L, true))
    s((2L, 0)) shouldBe (("user", 0L, 1L, false))
    s((2L, 1)) shouldBe (("assistant", 1L, 3L, true))
  }

  test("preferencePairs: arg-extremes, smallest-id ties, zero-margin prompts dropped") {
    val resp = Seq[(Long, Long, Option[Long])](
      (1L, 10L, Some(5L)), (1L, 11L, Some(9L)), (1L, 12L, Some(9L)),
      (2L, 20L, Some(7L)), (2L, 21L, Some(7L)), // all equal → dropped
      (3L, 30L, Some(4L)),                      // single → dropped
      (4L, 40L, Some(3L)), (4L, 41L, Some(8L)),
      (5L, 50L, Some(2L)), (5L, 51L, None)      // NULL score excluded
    ).toDF("prompt_id", "response_id", "score")
    val out = Dialogue.preferencePairs(resp, "prompt_id", "response_id",
        "score")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    out.keySet shouldBe Set(1L, 4L)
    out(1L) shouldBe ((3L, 11L, 9L, 10L, 5L, 4L))
    out(4L) shouldBe ((2L, 41L, 8L, 40L, 3L, 5L))
  }

  test("SFT masks survive packing: global spans tile each packed sequence slot") {
    // the full dataloader layout: assemble conversations → greedy-pack
    // by token count → per-bin tensor layout → remap each turn's span
    // to its GLOBAL position = slot tok_start + turn-local offset
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sfDir)
    val turns = docs.select(expr("doc_id div 4").as("conv_id"),
      expr("cast(doc_id % 4 as int)").as("turn_idx"),
      expr("case when doc_id % 4 = 0 then 'system' " +
        "when (doc_id % 4) % 2 = 1 then 'assistant' else 'user' end")
        .as("role"), col("text"))
    val asm = Dialogue.assemble(turns, "conv_id", "turn_idx", "role", "text")
      .withColumnRenamed("conv_id", "doc_id")
    val budget = 4096L // comfortably above the longest conversation
    val layout = Packing.packLayout(
      Packing.greedyPack(asm.select("doc_id", "n_tokens"), "doc_id",
        "n_tokens", budget, groups = 4), budget)
    val global = Dialogue.maskSpans(turns, "conv_id", "turn_idx", "role",
        "text")
      .withColumnRenamed("conv_id", "doc_id")
      .join(layout.select(col("doc_id"), col("pack_group"), col("bin"),
        col("tok_start").as("slot_start"), col("tok_end").as("slot_end")),
        "doc_id")
      .select(col("doc_id"), col("pack_group"), col("bin"),
        (col("slot_start") + col("tok_start")).as("g_start"),
        (col("slot_start") + col("tok_end")).as("g_end"),
        col("slot_start"), col("slot_end"), col("loss_mask"))
    // every turn's global span sits inside its conversation's slot,
    // and the turns of a conversation tile the slot exactly
    global.filter(col("g_start") < col("slot_start")
      || col("g_end") > col("slot_end")).count() shouldBe 0L
    val tiled = global.groupBy("doc_id")
      .agg(max("g_end").as("m"), first("slot_end").as("e"))
      .filter(col("m") =!= col("e"))
    tiled.count() shouldBe 0L
    // loss tokens exist and never overflow a bin's budget
    global.filter(col("loss_mask") && col("g_end") > budget).count() shouldBe 0L
    global.filter(col("loss_mask")).count() should be > 0L
  }

  test("spans and assembled token counts agree over the real corpus derivation") {
    val docs = graft.Tables.documents(spark, sfDir)
    val t = docs.select(
      org.apache.spark.sql.functions.expr("doc_id div 4").as("conv_id"),
      org.apache.spark.sql.functions.expr("cast(doc_id % 4 as int)").as("turn_idx"),
      org.apache.spark.sql.functions.expr(
        "case when doc_id % 4 = 0 then 'system' " +
          "when (doc_id % 4) % 2 = 1 then 'assistant' else 'user' end")
        .as("role"),
      org.apache.spark.sql.functions.col("text"))
    val asm = Dialogue.assemble(t, "conv_id", "turn_idx", "role", "text")
    val fromSpans = Dialogue.maskSpans(t, "conv_id", "turn_idx", "role", "text")
      .groupBy("conv_id")
      .agg(org.apache.spark.sql.functions.max("tok_end").as("max_end"))
    val joined = asm.join(fromSpans, "conv_id")
    joined.filter(org.apache.spark.sql.functions
      .col("n_tokens") =!= org.apache.spark.sql.functions.col("max_end"))
      .count() shouldBe 0L
    joined.count() should be > 100L
  }
}
