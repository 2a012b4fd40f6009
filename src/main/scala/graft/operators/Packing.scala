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
  * own bin (flagged `truncated`). One shuffle on the group key.
  *
  * (A pure-SQL cumsum/div binning was rejected: a bin whose docs
  * straddle the cumsum boundary can exceed the budget — e.g. docs of
  * 10, 95, 95 tokens at budget 100 put both 95s in one bin.)
  */
object Packing {

  final case class Packed(doc_id: Long, n_tokens: Long, pack_group: Long,
                          bin: Long, truncated: Boolean)

  /** @param groupExpr override for the doc→group assignment (default:
    *        xxhash64 of the id — fast and well-spread; pass e.g.
    *        `pmod(col(id), lit(n))` when external reproducibility
    *        matters more than spread, as q70's oracle does)
    * @return (doc_id, n_tokens, pack_group, bin, truncated) — join back
    *         on doc_id for payloads. */
  def greedyPack(docs: DataFrame, idCol: String, tokenCountCol: String,
                 budget: Long, groups: Int = 1024,
                 groupExpr: Option[org.apache.spark.sql.Column] = None): DataFrame = {
    require(budget > 0 && groups > 0)
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long").as("doc_id"),
        col(tokenCountCol).cast("long").as("n_tokens"),
        groupExpr.getOrElse(pmod(xxhash64(col(idCol)), lit(groups.toLong)))
          .as("pack_group"))
      .as[(Long, Long, Long)]
      .groupByKey(_._3)
      .flatMapGroups { (group, it) =>
        val sorted = it.toSeq.sortBy(_._1)
        var bin = 0L
        var used = 0L
        sorted.iterator.map { case (id, toks, _) =>
          val t = math.max(toks, 0L)
          if (used > 0 && used + t > budget) { bin += 1; used = 0L }
          used += math.min(t, budget)
          Packed(id, toks, group, bin, toks > budget)
        }
      }
      .toDF()
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
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("pack_group"), col("bin")).orderBy(col("doc_id"))
    val eff = least(greatest(col("n_tokens"), lit(0L)), lit(budget))
    packed
      .withColumn("seq_idx", (row_number().over(w) - 1).cast("int"))
      .withColumn("tok_start",
        coalesce(sum(eff).over(w.rowsBetween(Long.MinValue, -1)), lit(0L)))
      .withColumn("tok_end", col("tok_start") + eff)
  }
}
