package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Snapshot-to-snapshot corpus delta: classify every document id as
  * added / removed / changed / unchanged between two corpus versions.
  * This is the gate an incremental 100 TB ingest runs FIRST — the
  * downstream pipeline (dedup, quality, packing) then reprocesses only
  * `added ∪ changed` instead of the whole corpus, and `removed` drives
  * index/bloom retirement (the q83 historical-index complement).
  *
  * Scale shape: each side is fingerprinted MAP-SIDE and immediately
  * projected to (id, fingerprint) — the full-outer join shuffles two
  * narrow 16-byte-ish relations, never document text. One hash join on
  * the id; no other exchange. At 10⁹ docs/side that is the cheapest
  * possible comparison (the id join is unavoidable; everything else is
  * scan-local).
  */
object SnapshotDiff {

  /** Per-id delta between `prev` and `cur`.
    *
    * Contract: `idCol` is unique within each snapshot (a snapshot is a
    * keyed corpus version; duplicate ids would make the full-outer join
    * fan out and the statuses ambiguous). NULL text fingerprints as the
    * empty string — a present-with-NULL-text row is therefore
    * `changed`/`unchanged` like any other, never misread as absent.
    *
    * `fingerprint` defaults to xxhash64 (codegen'd, 8 bytes); pass
    * `md5(_)` where another engine must replay the comparison (the
    * q123 oracle does). Only equality and nullity of the fingerprint
    * are used, so any injective-enough column function works.
    *
    * Output: (id, status) with status ∈ added | removed | changed |
    * unchanged — `added`/`removed` are relative to `cur` (present only
    * in cur = added; present only in prev = removed).
    */
  def diff(prev: DataFrame, cur: DataFrame, idCol: String, textCol: String,
           fingerprint: Column => Column = xxhash64(_)): DataFrame = {
    def side(df: DataFrame, fp: String) = df.select(col(idCol).as("id"),
      fingerprint(coalesce(col(textCol), lit(""))).as(fp))
    side(prev, "__fp_a")
      .join(side(cur, "__fp_b"), Seq("id"), "full_outer")
      .select(col("id"),
        when(col("__fp_a").isNull, "added")
          .when(col("__fp_b").isNull, "removed")
          .when(col("__fp_a") === col("__fp_b"), "unchanged")
          .otherwise("changed").as("status"))
  }

  /** The data-card rollup of [[diff]]: row counts per status — the
    * number an ingest run logs and alerts on (an unexpected `removed`
    * spike usually means an upstream extraction regression, not real
    * deletions). One map-side-combined count on four keys. */
  def summary(prev: DataFrame, cur: DataFrame, idCol: String,
              textCol: String,
              fingerprint: Column => Column = xxhash64(_)): DataFrame =
    diff(prev, cur, idCol, textCol, fingerprint)
      .groupBy(col("status")).agg(count(lit(1)).as("n_docs"))
}
