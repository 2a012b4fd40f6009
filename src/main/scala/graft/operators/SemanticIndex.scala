package graft.operators

import graft.functions.VectorFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Incremental SEMANTIC dedup against a persisted vector-cell index —
  * the third incremental family, completing the matrix the text
  * ([[TextIndex]]) and media ([[graft.multimodal.MediaIndex]])
  * families established: a continuously-ingesting corpus must judge
  * each batch's EMBEDDINGS against everything already admitted
  * (paraphrase-level re-crawls and template families that shingle
  * dedup cannot see — the SemDeDup insight, Abbas et al. 2023,
  * applied incrementally), without ever recomputing pairs over the
  * history.
  *
  * The index is TWO relations, both plain parquet state between runs
  * ([[graft.io.SemanticIndexArtifacts]]):
  *
  *  - `centroids` (cell, cvec): a deterministic portable draw from
  *    the seed corpus ([[Similarity.portableCentroidRank]] — md5
  *    rank, so any engine replays the selection). Centroids are
  *    FROZEN at build time: assignment must be stable across batches
  *    or yesterday's cell boundaries silently differ from today's
  *    (the frozen-tokenizer rule applied to cells); re-centering is
  *    a rebuild, not an append.
  *  - `assigned` (id, cell, vec): every admitted vector in its
  *    PRIMARY (nearest, nProbe=1) cell.
  *
  * Judge semantics ([[incrementalSemanticDups]]): assign the batch to
  * its `nProbe` nearest cells (probing > 1 cell recovers boundary
  * near-dups the primary-cell restriction would miss — the batch side
  * is small, so extra probes are cheap), join history rows in those
  * cells, flag cosine ≥ `threshold`, keeper = smallest matching
  * history id (the families' smallest-id precedence). Same-id pairs
  * are EXCLUDED — a replayed batch row matching its own appended copy
  * is not a duplicate (the replay contract all three families share).
  *
  * Scale shape (the q204/q206 plan contract, asserted in
  * SemanticIndexSpec): the HISTORY relation is never shuffled — batch
  * assignments broadcast into the cell join, history streams map-side;
  * the only history-derived aggregate is the batch-cell-restricted
  * census (map-side-combined (cell, count) partials over the probed
  * cells only). Degenerate crowds are capped two-sided like the text
  * family: a history cell over `maxCell` rows stops matching
  * (documented — a near-singleton cell of boilerplate embeddings
  * would otherwise make every batch pay |cell| cosines), and the
  * exact-oracle call sites pass `Int.MaxValue` (the q28/q206
  * call-site split).
  *
  * NULL/corrupt embeddings carry no evidence: excluded from judging
  * (never dups) and from the delta (never indexed) — the ANN
  * operators' "excluded from the index" contract, the media family's
  * NULL-hash convention.
  *
  * Vectors are CAST to `array<double>` at every boundary: one numeric
  * type on disk and in every cosine, so engine replays (DuckDB
  * `list_cosine_similarity` over `DOUBLE[]`) agree bit-for-bit with
  * the q30/q86 parity convention. */
object SemanticIndex {

  private def asDouble(c: org.apache.spark.sql.Column) =
    c.cast("array<double>")

  private def cleanVecs(df: DataFrame, idCol: String,
                        vecCol: String): DataFrame =
    df.filter(col(vecCol).isNotNull && !exists(col(vecCol), x => x.isNull))
      .select(col(idCol).cast("long").as("id"),
        asDouble(col(vecCol)).as("vec"))

  /** Assign `vecs` (id, vec) to their `nProbe` nearest centroids —
    * (id, cell, vec, prb); the centroid relation broadcasts
    * (cell-count sized). Ties break toward the smaller cell id (the
    * [[Similarity.ivfCells]] rule).
    *
    * Default path: a bounded-heap top-nProbe AGGREGATE
    * ([[TopKAgg]]): the |vecs|×nCells cosine expansion reduces to
    * ≤ nProbe rows per id AT THE MAP SIDE (each id's expansion rows
    * are co-partitioned with their input row), so the assignment
    * shuffle carries |vecs|×nProbe rows instead of sorting the full
    * |vecs|×nCells expansion through a per-id window — at √n-cells
    * sizing on a large corpus that is the difference between a
    * terabyte-scale sort and the batch itself. Ordering (cosine
    * desc, cell asc) is IDENTICAL to the window form's; the one
    * documented divergence is an all-NaN score row (a zero-norm
    * vector): the window form would rank NaN first (Spark sorts NaN
    * high) and assign arbitrary cells, the aggregate SKIPS NaN and
    * assigns such a vector nowhere — no-evidence semantics,
    * strictly saner. `SPARK_GRAFT_SEM_ASSIGN=window` selects the
    * window form (the A/B harness the SCALE.md ladder documents). */
  private[operators] def assignCells(vecs: DataFrame, centroids: DataFrame,
                                     nProbe: Int): DataFrame =
    if (sys.env.get("SPARK_GRAFT_SEM_ASSIGN").contains("window"))
      assignCellsWindow(vecs, centroids, nProbe)
    else assignCellsTopK(vecs, centroids, nProbe)

  private[operators] def assignCellsWindow(vecs: DataFrame,
      centroids: DataFrame, nProbe: Int): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("__sim").desc, col("cell").asc)
    vecs.crossJoin(broadcast(centroids))
      .select(col("id"), col("cell"), col("vec"),
        VectorFns.cosine(col("vec"), col("cvec")).as("__sim"))
      .withColumn("prb", row_number().over(w))
      .filter(col("prb") <= nProbe)
      .select(col("id"), col("cell"), col("vec"), col("prb"))
  }

  private[operators] def assignCellsTopK(vecs: DataFrame,
      centroids: DataFrame, nProbe: Int): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select(col("id"), col("vec"), col("cell"),
        VectorFns.cosine(col("vec"), col("cvec")).as("__sim"))
      .groupBy(col("id"))
      .agg(TopKAgg.topK(nProbe)(col("__sim"), col("cell")).as("__tk"),
        first(col("vec")).as("vec"))
      .select(col("id"), col("vec"),
        posexplode(col("__tk")).as(Seq("__p", "__t")))
      .select(col("id"), col("__t._2").as("cell"), col("vec"),
        (col("__p") + 1).cast("int").as("prb"))

  /** Build the index over `corpus`: frozen portable-draw centroids +
    * the primary-cell assignment of every clean vector. Returns
    * (centroids, assigned). */
  def buildIndex(corpus: DataFrame, idCol: String, vecCol: String,
                 nCells: Int,
                 centroidRank: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                   Similarity.portableCentroidRank): (DataFrame, DataFrame) = {
    val vecs = cleanVecs(corpus, idCol, vecCol)
    val centroids = vecs
      .withColumn("__r", centroidRank(col("id")))
      .orderBy(col("__r"), col("id")).limit(nCells)
      .select(col("id").as("cell"), col("vec").as("cvec"))
    (centroids,
      assignCells(vecs, centroids, nProbe = 1).drop("prb"))
  }

  /** Batch-INTERNAL election over an assigned batch relation
    * (id, cell, vec): v is a dup iff some same-cell u < v has
    * cos(u, v) ≥ threshold (the [[Similarity.semanticDedupe]]
    * greedy-by-id rule); keeper = v's smallest direct match.
    * Batch-bounded: one self-join over the batch's own cells. */
  private[operators] def intraDups(assigned: DataFrame,
                                   threshold: Double): DataFrame = {
    val a = assigned.select(col("cell"), col("id").as("kid"),
      col("vec").as("kvec"))
    val b = assigned.select(col("cell"), col("id").as("dup_id"),
      col("vec").as("dvec"))
    b.join(a, Seq("cell"))
      .filter(col("kid") < col("dup_id"))
      .select(col("dup_id"), col("kid"),
        VectorFns.cosine(col("dvec"), col("kvec")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("dup_id"))
      .agg(min(struct(col("kid"), col("cosine"))).as("m"))
      .select(col("dup_id"), col("m.kid").as("keep_id"),
        col("m.cosine").as("cosine"))
  }

  /** Batch vectors that near-duplicate the INDEX — (dup_id, keep_id,
    * cosine): batch assigned to `nProbe` cells, history joined in
    * those cells (history streams map-side — the batch assignment
    * broadcasts), cosine ≥ threshold, keeper = smallest matching
    * history id; same-id pairs excluded (replay contract). History
    * cells over `maxCell` rows (batch-cell-restricted census) stop
    * matching — the documented degenerate-crowd rule. */
  def incrementalSemanticDups(batch: DataFrame, idCol: String,
      vecCol: String, centroids: DataFrame, history: DataFrame,
      threshold: Double, nProbe: Int = 2,
      maxCell: Int = 4096): DataFrame = {
    val bAssign = assignCells(cleanVecs(batch, idCol, vecCol),
      centroids, nProbe).drop("prb")
    judgeAssigned(bAssign, history, threshold, maxCell)
  }

  /** The history judge over an ALREADY-ASSIGNED batch relation. */
  private def judgeAssigned(bAssign: DataFrame, history: DataFrame,
                            threshold: Double, maxCell: Int): DataFrame = {
    // batch-cell-restricted census: only the probed cells are ever
    // counted, and only (cell, count) partials shuffle
    val okCells = history
      .join(broadcast(bAssign.select(col("cell")).distinct()), Seq("cell"))
      .groupBy(col("cell")).count()
      .filter(col("count") <= maxCell)
      .select(col("cell"))
    val probes = bAssign.join(broadcast(okCells), Seq("cell"))
      .select(col("cell"), col("id").as("dup_id"), col("vec").as("dvec"))
    history
      .select(col("cell"), col("id").as("hid"), col("vec").as("hvec"))
      .join(broadcast(probes), Seq("cell"))
      .filter(col("hid") =!= col("dup_id"))
      .select(col("dup_id"), col("hid"),
        VectorFns.cosine(col("dvec"), col("hvec")).as("cosine"))
      .filter(col("cosine") >= threshold)
      .groupBy(col("dup_id"))
      .agg(min(struct(col("hid"), col("cosine"))).as("m"))
      .select(col("dup_id"), col("m.hid").as("keep_id"),
        col("m.cosine").as("cosine"))
  }

  /** Cell-OCCUPANCY drift report — the q181/q185 retrain-alarm
    * pattern applied to the frozen cells: centroids never move after
    * build, but history keeps growing, and a cell crossing `maxCell`
    * silently stops matching (the documented degenerate-crowd rule).
    * This one-row report measures how much of a BATCH's probe mass
    * lands in capped cells — the fraction of incoming evidence the
    * index can no longer judge:
    * (n_probes, n_probed_cells, n_capped_cells, capped_probes,
    * capped_bp, recell) with capped_bp = capped_probes·10⁴ div
    * n_probes (exact integer basis points — engine-replayable) and
    * `recell` tripping when capped_bp > alarmBp. NULL capped_bp
    * (empty batch) = no evidence, recell false — an empty probe must
    * not page anyone. Alarm ⇒ rebuild with √n cells at compaction
    * cadence ([[graft.io.SemanticIndexArtifacts.recell]] — build IS
    * the rebuild; re-celling re-derives the sizing the alarm judged
    * against). Scale shape: the census is batch-cell-restricted
    * (only probed cells are counted, (cell, count) partials shuffle)
    * and the assignment is pinned once for its three consumers. */
  def cellOccupancyReport(batch: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, history: DataFrame, nProbe: Int = 2,
      maxCell: Int = 4096, alarmBp: Long = 2500): DataFrame = {
    val bAssign = assignCells(cleanVecs(batch, idCol, vecCol), centroids,
      nProbe).localCheckpoint(true)
    val capped = history
      .join(broadcast(bAssign.select(col("cell")).distinct()), Seq("cell"))
      .groupBy(col("cell")).count()
      .filter(col("count") > maxCell)
      .select(col("cell"))
    val probesAgg = bAssign.agg(count(lit(1)).as("n_probes"),
      countDistinct(col("cell")).as("n_probed_cells"))
    val cappedAgg = bAssign.join(broadcast(capped), Seq("cell"))
      .agg(count(lit(1)).as("capped_probes"),
        countDistinct(col("cell")).as("n_capped_cells"))
    probesAgg.crossJoin(cappedAgg)
      .select(col("n_probes"), col("n_probed_cells"),
        col("n_capped_cells"), col("capped_probes"),
        expr("case when n_probes > 0 " +
          "then (capped_probes * 10000) div n_probes end").as("capped_bp"))
      .withColumn("recell", coalesce(col("capped_bp") > alarmBp, lit(false)))
  }

  /** The batch with every index near-duplicate dropped (gate form). */
  def dedupeAgainstIndex(batch: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, history: DataFrame, threshold: Double,
      nProbe: Int = 2, maxCell: Int = 4096): DataFrame =
    batch.join(
      incrementalSemanticDups(batch, idCol, vecCol, centroids, history,
        threshold, nProbe, maxCell)
        .select(col("dup_id").cast("long").as("__d")),
      col(idCol).cast("long") === col("__d"), "left_anti")

  /** Judge + replay-idempotent delta — the families' ingest contract:
    * batch-internal election FIRST (losers never reach the history
    * judge and never append), then the history judge over the
    * survivors, and a delta of the surviving (id, cell, vec) rows at
    * their PRIMARY cell with ids already present in the index
    * excluded — so a foreachBatch redelivery whose first attempt
    * already appended re-presents the SAME survivors (same-id matches
    * are excluded from judging) and appends NOTHING. Returns
    * (dups — intra ∪ cross, delta). */
  def ingestStep(batch: DataFrame, idCol: String, vecCol: String,
      centroids: DataFrame, history: DataFrame, threshold: Double,
      nProbe: Int = 2, maxCell: Int = 4096): (DataFrame, DataFrame) = {
    // eager-pin the assignment (id×nProbe-sized: id, cell, vec, prb)
    // — the mediaHashIndex rule: downstream it feeds the intra
    // election, the census, the probe broadcast, the history join,
    // the present check, AND the delta, and without the pin each
    // consumer replays the |batch|×nCells cosine expansion
    val bAssign = assignCells(cleanVecs(batch, idCol, vecCol),
      centroids, nProbe).localCheckpoint(true)
    // batch-internal election on PRIMARY cells only (the batch's own
    // rows meet in their primary cell exactly as they will live in
    // the index); eager, id-sized: consumed by the prune and the
    // returned verdicts
    val intra = intraDups(bAssign.filter(col("prb") === 1),
      threshold).localCheckpoint(true)
    // the history judge keeps the FULL probe set
    val pruned = bAssign.join(intra.select(col("dup_id").as("id")),
      Seq("id"), "left_anti")
    val cross = judgeAssigned(
      pruned.select(col("cell"), col("id"), col("vec")),
      history, threshold, maxCell).localCheckpoint(true)
    // replay detection: ids already in the index never re-append
    val present = history.select(col("id"))
      .join(broadcast(pruned.select(col("id")).distinct()), Seq("id"))
      .distinct()
    val delta = pruned.filter(col("prb") === 1)
      .join(cross.select(col("dup_id").as("id")).unionByName(present)
        .distinct(), Seq("id"), "left_anti")
      .select(col("id"), col("cell"), col("vec"))
    (intra.unionByName(cross), delta)
  }
}
