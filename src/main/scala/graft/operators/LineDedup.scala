package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level line deduplication — the CCNet/RefinedWeb pre-filter
  * that strips boilerplate LINES (nav bars, cookie banners, footers)
  * before any document-level dedup: across the whole corpus each
  * distinct line survives only at its FIRST occurrence (smallest
  * (doc id, line position)); every later copy is dropped and the
  * documents are rebuilt from their surviving lines.
  *
  * Keep rule = lexicographic-min (id, pos) per distinct line: a pure
  * function of the corpus, so the result is deterministic across runs,
  * partitionings, and engines — no "whichever task got there first".
  *
  * 100 TB design: one shuffle, keyed by the line content, with the
  * min-(id, pos) struct aggregated map-side — each partition
  * contributes at most one candidate per distinct line, so the shuffle
  * carries ~|distinct lines| rows, not |line occurrences|. The winner
  * relation joins back on the same key (a self-equi-join on the line,
  * co-partitioned by AQE) and the rebuild is a per-document
  * collect_list — bounded by the document's own line count. For
  * corpora where shuffling full line text is too wide, key by
  * `xxhash64(line)` with an exact line-equality recheck on the joined
  * rows (the [[Dedup.exact]] fingerprint pattern); the string key is
  * used here because it is the form an external SQL engine reproduces
  * verbatim.
  */
object LineDedup {

  /** Split `textCol` on `sep`, drop empty lines, keep each distinct
    * line's first occurrence corpus-wide, and rebuild every document.
    * Documents keep a row even when ALL their lines are deduplicated
    * away (n_kept = 0, clean empty) — dropping them is a separate
    * policy decision for the caller.
    *
    * Output: (idCol, n_lines: int — non-empty lines before dedup,
    * n_kept: int, clean: string — surviving lines re-joined with
    * `sep`).
    */
  def firstOccurrence(df: DataFrame, idCol: String, textCol: String,
                      sep: String = "\n"): DataFrame = {
    // checkpointed: the line relation feeds THREE consumers of the
    // returned lazy plan (census winners, the keep join-back, per-doc
    // counts) — unmaterialized, the corpus-wide split+posexplode pass
    // runs three times (the round-7 multi-consumer audit; the
    // sourceNgramOverlap precedent).
    val lines = df
      .select(col(idCol),
        posexplode(filter(split(col(textCol), java.util.regex.Pattern.quote(sep)),
          l => length(l) > 0)).as(Seq("pos", "line")))
      // eager localCheckpoint, not persist: uniform lifetime with the
      // sibling operators (blocks released by the ContextCleaner when
      // the returned plan is unreferenced; nothing for callers to
      // unpersist)
      .localCheckpoint()
    val winners = lines
      .groupBy(col("line"))
      .agg(min(struct(col(idCol), col("pos"))).as("__w"))
      .select(col("line"), col("__w").getField(idCol).as("__wid"),
        col("__w").getField("pos").as("__wpos"))
    val kept = lines.join(winners, Seq("line"))
      .filter(col(idCol) === col("__wid") && col("pos") === col("__wpos"))
    val rebuilt = kept
      .groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_kept"),
        concat_ws(sep,
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            s => s.getField("line"))).as("clean"))
    val counts = lines.groupBy(col(idCol))
      .agg(count(lit(1)).cast("int").as("n_lines"))
    df.select(col(idCol))
      .join(counts, Seq(idCol), "left")
      .join(rebuilt, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0)).as("n_lines"),
        coalesce(col("n_kept"), lit(0)).as("n_kept"),
        coalesce(col("clean"), lit("")).as("clean"))
  }

  /** Intra-document line dedup — each document keeps only the FIRST
    * occurrence of each of ITS OWN lines (repeated nav separators,
    * pagination artifacts, copy-pasted paragraphs), independent of
    * every other document. The within-doc complement of
    * [[firstOccurrence]]: same split/empty-drop/rebuild conventions,
    * same output shape, but the keep rule is scoped to the document.
    *
    * 100 TB design: ZERO shuffles — where the corpus-level rule needs a
    * global line shuffle to find cross-document winners, the intra-doc
    * rule is a pure per-row computation (split → indexed-filter →
    * rejoin), so it runs entirely inside the scan's projection and
    * composes into any pipeline for free. The first-occurrence test is
    * `array_position(lines, x) == i+1` — an O(L²) string-compare scan
    * per doc. For typical documents (≤10⁴ lines) that is microseconds
    * and beats paying a shuffle; a pathological single doc with 10⁶+
    * lines would instead want the exploded window form (one shuffle,
    * O(L log L)) — at that point the doc is 100 MB+ of text and has
    * upstream problems anyway.
    *
    * Output: (idCol, n_lines: int — non-empty lines before dedup,
    * n_kept: int, clean: string — surviving lines re-joined with
    * `sep`, original order preserved). NULL text → (0, 0, "").
    */
  def intraDoc(df: DataFrame, idCol: String, textCol: String,
               sep: String = "\n"): DataFrame = {
    val split0 = filter(
      split(coalesce(col(textCol), lit("")),
        java.util.regex.Pattern.quote(sep)),
      l => length(l) > 0)
    df.withColumn("__ls", split0)
      .withColumn("__ks",
        filter(col("__ls"), (x, i) => array_position(col("__ls"), x) === i + 1))
      .select(col(idCol),
        size(col("__ls")).as("n_lines"),
        size(col("__ks")).as("n_kept"),
        array_join(col("__ks"), sep).as("clean"))
  }
}
