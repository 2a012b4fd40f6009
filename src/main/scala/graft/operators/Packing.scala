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
}
