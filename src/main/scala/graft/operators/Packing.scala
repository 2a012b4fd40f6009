package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sequence packing: group documents into bins under a token budget —
  * the batch-preparation step before LLM training (concatenate-and-pack
  * with an EOS between docs).
  *
  * Distributed next-fit: docs hash into `groups` independent packing
  * groups (the parallelism unit — bins never cross groups, so no
  * single-partition bottleneck at 100 TB); within a group docs are
  * walked in deterministic id order and a running bin is closed
  * whenever the next doc would exceed the budget. A bin therefore
  * NEVER exceeds the budget unless a single oversized doc forms its
  * own bin (flagged `truncated`). One shuffle on the group key, and
  * the walk STREAMS: rows arrive (group, id)-sorted via
  * sortWithinPartitions (external sort — spills, never materializes)
  * and the per-group state is two Longs, so a group never has to fit
  * in executor memory.
  *
  * (A pure-SQL cumsum/div binning was rejected: a bin whose docs
  * straddle the cumsum boundary can exceed the budget — e.g. docs of
  * 10, 95, 95 tokens at budget 100 put both 95s in one bin.)
  */
object Packing {

  final case class Packed(doc_id: Long, n_tokens: Long, pack_group: Long,
                          bin: Long, truncated: Boolean)

  /** Pack-group count for an n-doc corpus (the `groups = 0` sentinel
    * rule, [[Similarity.suggestCells]] precedent): one group per ~8k
    * docs keeps every group's bin walk a short streamed scan while
    * groups ≫ cores preserves shuffle balance; floor 64 (spread at
    * small n), cap 2²⁰ (group-id arithmetic stays cheap — at the cap
    * even 10¹⁰ docs are ~10⁴ docs/group). */
  def suggestGroups(n: Long): Int =
    math.min(1L << 20, math.max(64L, math.max(0L, n) / 8192L)).toInt

  /** @param groups packing-group count; 0 (the default) auto-sizes via
    *        [[suggestGroups]] at the cost of one id-pruned count()
    * @param groupExpr override for the doc→group assignment (default:
    *        xxhash64 of the id — fast and well-spread; pass e.g.
    *        `pmod(col(id), lit(n))` when external reproducibility
    *        matters more than spread, as q70's oracle does)
    * @return (doc_id, n_tokens, pack_group, bin, truncated) — join back
    *         on doc_id for payloads. */
  def greedyPack(docs: DataFrame, idCol: String, tokenCountCol: String,
                 budget: Long, groups: Int = 0,
                 groupExpr: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(budget > 0 && groups >= 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val nGroups =
      if (groups > 0) groups
      else if (groupExpr.isDefined) 1 // unused: the caller's expr assigns
      else suggestGroups(docs.select(col(idCol)).count())
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(tokenCountCol).cast("long").as("n_tokens"),
        groupExpr.getOrElse(pmod(xxhash64(col(idCol)), lit(nGroups.toLong)))
          .as("pack_group"))
      // hash-shuffle on the group key, then per-partition external
      // sort: each task sees its groups' rows contiguous and id-ordered
      // and the walk below is a pure iterator pass — constant state,
      // nothing materialized (the r6 `it.toSeq.sortBy` required a
      // whole group in memory)
      .repartition(col("pack_group"))
      .sortWithinPartitions(col("pack_group"), col("doc_id"))
      .as[(Long, Long, Long)]
      .mapPartitions { it =>
        var started = false
        var group = 0L
        var bin = 0L
        var used = 0L
        it.map { case (id, toks, g) =>
          if (!started || g != group) {
            started = true; group = g; bin = 0L; used = 0L
          }
          val t = math.max(toks, 0L)
          if (used > 0 && used + t > budget) { bin += 1; used = 0L }
          used += math.min(t, budget)
          Packed(id, toks, group, bin, toks > budget)
        }
      }
      .toDF()
  }

  final case class PackedPiece(doc_id: Long, piece: Int, n_tokens: Long,
                               pack_group: Long, bin: Long)

  /** Split-aware packing: a doc whose token count exceeds the budget
    * becomes ceil(T/budget) budget-sized PIECES carrying a 0-based
    * continuation index `piece` — the production dataloader behavior
    * where long documents chunk ACROSS sequences instead of occupying
    * a flagged over-budget bin ([[greedyPack]]'s `truncated`). Pieces
    * pack exactly like docs: deterministic (doc_id, piece) walk order
    * within the group, running bin closed when the next piece would
    * not fit. Every piece is ≤ budget by construction, so NO bin can
    * exceed the budget and no truncation flag exists — at the
    * token-count level every doc is splittable; an un-splittable atom
    * (a unit that must stay whole) should be packed with
    * [[greedyPack]], which flags it instead. Pieces of one doc share
    * its group (id-keyed assignment), so (doc_id, piece) order inside
    * the layout reassembles the document. Scale shape identical to
    * [[greedyPack]] plus one narrow piece-explode (output rows ≈
    * corpus tokens / budget): one group-key shuffle, streamed walk. */
  def greedyPackSplit(docs: DataFrame, idCol: String, tokenCountCol: String,
                      budget: Long, groups: Int = 0,
                      groupExpr: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(budget > 0 && groups >= 0)
    val spark = docs.sparkSession
    import spark.implicits._
    val nGroups =
      if (groups > 0) groups
      else if (groupExpr.isDefined) 1 // unused: the caller's expr assigns
      else suggestGroups(docs.select(col(idCol)).count())
    // NULL counts coalesce to 0 BEFORE the piece arithmetic: least/
    // greatest skip NULL operands, so a raw NULL would slip through
    // the ceil-div as one piece of n_tokens = budget — a phantom
    // full-budget document
    val nDoc = coalesce(col(tokenCountCol).cast("long"), lit(0L))
    // ceil-div piece count, floor 1 so empty/NULL-count docs still
    // emit their single (possibly zero-token) piece
    val nPieces = greatest(
      expr(s"(greatest(__n_doc, 1L) + ${budget - 1}L) div ${budget}L"),
      lit(1L))
    docs
      .select(col(idCol).cast("long").as("doc_id"), nDoc.as("__n_doc"),
        groupExpr.getOrElse(pmod(xxhash64(col(idCol)), lit(nGroups.toLong)))
          .as("pack_group"))
      .select(col("doc_id"), col("pack_group"), col("__n_doc"),
        explode(sequence(lit(0L), nPieces - 1)).as("piece"))
      .select(col("doc_id"), col("piece").cast("int").as("piece"),
        // non-positive counts pass through raw (greedyPack's contract:
        // the walk clamps, the output reports what the caller said)
        when(col("__n_doc") <= 0, col("__n_doc"))
          .otherwise(least(lit(budget), col("__n_doc") - col("piece") * budget))
          .as("n_tokens"),
        col("pack_group"))
      .repartition(col("pack_group"))
      .sortWithinPartitions(col("pack_group"), col("doc_id"), col("piece"))
      .as[(Long, Int, Long, Long)]
      .mapPartitions { it =>
        var started = false
        var group = 0L
        var bin = 0L
        var used = 0L
        it.map { case (id, piece, toks, g) =>
          if (!started || g != group) {
            started = true; group = g; bin = 0L; used = 0L
          }
          val t = math.max(toks, 0L)
          if (used > 0 && used + t > budget) { bin += 1; used = 0L }
          used += math.min(t, budget)
          PackedPiece(id, piece, toks, group, bin)
        }
      }
      .toDF()
  }

  /** Pack-efficiency report: one row per (pack_group, bin) with its
    * item count, budget-clamped token usage, and integer-basis-point
    * fill rate (`used·10⁴ div budget` — exact, engine-portable; the
    * bpeFertility convention). THE pre-training sanity metric for a
    * packed corpus: mean fill is the fraction of every training step
    * doing useful work, and a low-fill tail tells you the budget or
    * the splitter is mis-sized. Works over [[greedyPack]] or
    * [[greedyPackSplit]] output alike (anything with pack_group/bin/
    * n_tokens); one partial-aggregated (group, bin) shuffle, output is
    * bin-count-sized. */
  def packEfficiency(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0)
    packed
      .groupBy(col("pack_group"), col("bin"))
      .agg(count(lit(1)).as("n_items"),
        sum(least(greatest(col("n_tokens"), lit(0L)), lit(budget)))
          .as("used"))
      .withColumn("fill_bp", expr(s"used * 10000 div ${budget}L"))
  }

  /** The tensor layout of a packed corpus: for every chunk of every
    * (pack_group, bin), its sequence index and token offset span
    * inside the concatenated pack — exactly what a dataloader needs to
    * emit `position_ids` (reset at each tok_start) and the
    * block-diagonal attention mask (attend only within [tok_start,
    * tok_end)). Chunks are ordered by doc_id inside the bin (the same
    * deterministic order [[greedyPack]] walked), effective lengths are
    * budget-clamped exactly as the packer accumulated them, so
    * `max(tok_end) ≤ budget` holds for EVERY bin including oversized
    * single-doc bins. One (group, bin)-key window pass over the
    * bin-sized partitions; nothing corpus-sized re-shuffles.
    * Output: greedyPack's columns + (seq_idx, tok_start, tok_end). */
  def packLayout(packed: DataFrame, budget: Long): DataFrame = {
    require(budget > 0)
    // a greedyPackSplit input carries a `piece` column: order pieces
    // within the bin the same way the packer walked them
    val order =
      if (packed.columns.contains("piece")) Seq(col("doc_id"), col("piece"))
      else Seq(col("doc_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_group"), col("bin")).orderBy(order: _*)
    val eff = least(greatest(col("n_tokens"), lit(0L)), lit(budget))
    packed
      .withColumn("seq_idx", (row_number().over(w) - 1).cast("int"))
      .withColumn("tok_start",
        coalesce(sum(eff).over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("tok_end", col("tok_start") + eff)
  }
}
