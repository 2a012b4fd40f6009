package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over an edge relation — the authority
  * signal of crawl curation: PageRank-weighted host/document sampling
  * is the classic "prefer content that the web itself endorses"
  * selection policy, complementing the content-side quality scores
  * (UnigramLm, TextFns) with a link-side one. Sibling of
  * [[Dedup.connectedComponents]] in the tiny iterative-graph family.
  *
  * Integer-exact power iteration: ranks live in micro-units (r₀ =
  * 10⁶), damping in basis points, and each round computes
  * `rank'(v) = teleport + (d_bp · Σ_{u→v} rank(u) div outdeg(u)) div 10⁴`
  * — every step integer arithmetic with truncating division, so any
  * SQL engine unrolling the same rounds reproduces the ranks bit for
  * bit (the [[KMeans]] playbook applied to link analysis). Dangling
  * nodes keep absorbing rank without redistributing it (the standard
  * simplification — deterministic, and immaterial for RANKING by
  * authority); nodes with no in-edges settle at the teleport floor.
  *
  * 100 TB design: per round, one join of the edge list against the
  * one-row-per-node rank relation (both hash-partitioned on the same
  * key after the first shuffle — AQE reuses the partitioning) and one
  * map-side-combined sum on the destination key; the rank relation is
  * node-sized, never edge-sized. Each round's result is a lazy
  * `localCheckpoint` — the [[Dedup.connectedComponents]] lineage
  * truncation, keeping the plan flat however many rounds run.
  */
object GraphOps {

  /** PageRank over `edges(srcCol, dstCol)` (duplicate edges collapse).
    * Output: (node: string-typed as the input keys, rank_micro: long),
    * one row per node appearing as a source or destination.
    * `dampingBp` is the damping factor in basis points (8500 = 0.85);
    * `r0Micro` the uniform initial rank. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingBp: Long = 8500L,
               r0Micro: Long = 1000000L): DataFrame = {
    require(iters >= 0 && dampingBp >= 0 && dampingBp <= 10000,
      "iters must be non-negative, dampingBp in [0, 10000]")
    val e = edges.select(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node")))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val outdeg = e.groupBy(col("__src")).agg(count(lit(1)).as("__d"))
    // teleport term, exact: (1 − d)·r₀ in the same truncating integer
    // arithmetic the oracle's literal uses
    val teleport = (10000L - dampingBp) * r0Micro / 10000L
    var ranks = nodes.withColumn("rank_micro", lit(r0Micro))
    (1 to iters).foreach { _ =>
      val contrib = e
        .join(ranks.withColumnRenamed("node", "__src"), Seq("__src"))
        .join(outdeg, Seq("__src"))
        .select(col("__dst").as("node"),
          expr("rank_micro div __d").as("__share"))
        .groupBy(col("node"))
        .agg(sum(col("__share")).as("__m"))
      ranks = nodes
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) +
            expr(s"(${dampingBp}L * coalesce(__m, 0L)) div 10000L"))
            .as("rank_micro"))
        .localCheckpoint(false) // lineage truncation, plan stays flat
    }
    ranks
  }

  /** Bounded-round k-core peeling over an undirected graph — dense
    * subgraph extraction: repeatedly drop every node whose current
    * degree is < k, restricting the edge set to survivors each round.
    * On a similarity graph the surviving core is the tightly
    * inter-connected blob (template families, mass near-duplicates,
    * SEO farms) that triangle counts flag locally and this extracts
    * globally; its complement is the "organic" periphery.
    *
    * `rounds` is FIXED (not run-to-convergence): each round is a pure
    * function of the previous edge set, so the whole computation
    * unrolls into SQL for the oracle, and a bounded round count is
    * also the operational choice at scale — each peel is cheap, and
    * after a few rounds the survivor set has essentially stabilized
    * for the screening use-case (run more rounds when the exact core
    * matters; the fixpoint is reached when no node drops).
    *
    * Output: (node — input key type, deg: long — the node's degree in
    * the edge set that survived `rounds` peels). A node with deg < k
    * in the output is one the NEXT round would drop — callers wanting
    * the true k-core filter on `deg >= k` after convergence.
    *
    * 100 TB design: per round, one map-side-combined degree count on
    * the node key and two semi-joins restricting the edge list to
    * survivors (hash joins against the node-sized survivor relation —
    * AQE broadcasts it when small). The edge relation never grows —
    * it only shrinks — and per-round lazy localCheckpoint keeps the
    * plan flat (the [[pageRank]] / [[labelPropagation]] envelope).
    */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
            k: Int, rounds: Int): DataFrame = {
    require(k >= 1 && rounds >= 1, "k and rounds must be >= 1")
    var sym = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (1 to rounds).foreach { _ =>
      // degree on the symmetric form = undirected degree
      val survivors = sym.groupBy(col("u").as("node"))
        .agg(count(lit(1)).as("__d"))
        .filter(col("__d") >= k)
        .select(col("node"))
      sym = sym
        .join(survivors.withColumnRenamed("node", "u"), Seq("u"), "left_semi")
        .join(survivors.withColumnRenamed("node", "v"), Seq("v"), "left_semi")
        .select(col("u"), col("v"))
        .localCheckpoint(false)
    }
    sym.groupBy(col("u").as("node")).agg(count(lit(1)).as("deg"))
  }

  /** Synchronous label propagation over an undirected graph — cheap
    * community detection for the similarity graph: where
    * [[Dedup.connectedComponents]] merges anything with ANY path
    * (correct for near-dup clusters, too coarse for topical
    * structure), label propagation keeps communities where membership
    * is reinforced by neighbor MAJORITY — the topic-bucketing signal
    * of a corpus neighbor graph. Deterministic by construction:
    * synchronous rounds (every round-t label depends only on round-t−1
    * labels, never on update order — the asynchronous variant's
    * nondeterminism is exactly what's excluded), each node starts as
    * its own label and adopts the most frequent neighbor label, ties
    * broken by smallest label. A fixed round count (converged labels
    * simply stop changing) keeps the computation an unrollable pure
    * function of the edge set, so a SQL engine reproduces it exactly.
    *
    * 100 TB design: per round, one edges⋈labels hash join (the label
    * relation is NODE-sized — one 2-column row per node, never
    * edge-sized) into a map-side-combined (node, label) count, then a
    * per-node argmax window partitioned on the node key — partitions
    * are single-node groups, so no skew beyond a node's own degree,
    * and a hot node's window is bounded by its distinct neighbor
    * LABELS, not neighbors. Per-round lazy localCheckpoint keeps the
    * plan flat at any round count (the [[pageRank]] /
    * connectedComponents envelope).
    *
    * Output: (node — input key type, label — same type), one row per
    * node with at least one edge.
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
                       iters: Int): DataFrame = {
    require(iters >= 0, "iters must be non-negative")
    val sym = edges
      .select(col(srcCol).as("u"), col(dstCol).as("v"))
      .union(edges.select(col(dstCol).as("u"), col(srcCol).as("v")))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = sym.select(col("u").as("node")).distinct()
      .withColumn("label", col("node"))
    (1 to iters).foreach { _ =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("node"))
        .orderBy(col("__c").desc, col("label").asc)
      labels = sym
        .join(labels.withColumnRenamed("node", "u"), Seq("u"))
        .groupBy(col("v").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .withColumn("__rk", row_number().over(w))
        .filter(col("__rk") === 1)
        .select(col("node"), col("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Per-node triangle counts over an undirected graph given as a
    * (possibly directed, possibly duplicated) edge relation — the
    * transitivity signal of a similarity graph: near-dup clusters and
    * semantic clumps show up as triangle-dense neighborhoods, isolated
    * chains as triangle-free ones. Node ids must be a total-orderable
    * type (numeric or string); self-loops and duplicate/reverse edges
    * collapse.
    *
    * Output: (node — input key type, n_tri: long) for every node in at
    * least one triangle; each triangle contributes 1 to all three
    * corners.
    *
    * 100 TB design — degree-ordered wedge counting, NOT the naive
    * triple join: every edge is oriented from its lower endpoint to its
    * higher endpoint under the total order K(n) = (deg(n), n). The
    * orientation is acyclic, each triangle has exactly one corner with
    * two out-edges, and — the load-bearing bound — every node's
    * out-degree under K is O(√m) REGARDLESS of its raw degree (a node
    * out-ranks only neighbors of ≥ its own degree, and there can be at
    * most 2√m nodes of degree ≥ √m). So the wedge self-join fans out to
    * O(m^1.5) candidate pairs worst-case instead of the Σdeg² of a
    * naive neighbor join — a celebrity node with 10⁸ followers
    * contributes wedges only through its (bounded) out-list, never a
    * 10¹⁶-pair explosion. Three shuffles total: the degree count, the
    * wedge self-join on the apex key, and the hash semi-join of wedges
    * against the oriented edge list; the degree relation is node-sized
    * and AQE-broadcastable when small.
    */
  def triangleCounts(edges: DataFrame, srcCol: String,
                     dstCol: String): DataFrame = {
    // canonical undirected edge set: u < v, no self-loops, no dups
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("u"),
        greatest(col(srcCol), col(dstCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val deg = und.select(col("u").as("node"))
      .union(und.select(col("v").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    // orient each edge toward the K-larger endpoint, carrying the
    // destination's K so the wedge join can order its two legs
    val du = deg.select(col("node").as("u"), col("deg").as("__du"))
    val dv = deg.select(col("node").as("v"), col("deg").as("__dv"))
    val uFirst = (col("__du") < col("__dv")) ||
      (col("__du") === col("__dv") && col("u") < col("v"))
    // persisted: read three times below (two wedge legs + closing edges)
    val oriented = und.join(du, Seq("u")).join(dv, Seq("v"))
      .select(
        when(uFirst, col("u")).otherwise(col("v")).as("src"),
        when(uFirst, col("v")).otherwise(col("u")).as("dst"),
        when(uFirst, col("__dv")).otherwise(col("__du")).as("ddeg"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // wedges (a→b, a→c) with K(b) < K(c); the closing edge, if present,
    // is oriented b→c by construction
    val e1 = oriented.select(col("src").as("a"), col("dst").as("b"),
      col("ddeg").as("__db"))
    val e2 = oriented.select(col("src").as("a"), col("dst").as("c"),
      col("ddeg").as("__dc"))
    val legOrder = (col("__db") < col("__dc")) ||
      (col("__db") === col("__dc") && col("b") < col("c"))
    val wedges = e1.join(e2, Seq("a")).filter(legOrder)
      .select(col("a"), col("b"), col("c"))
    val closing = oriented.select(col("src").as("b"), col("dst").as("c"))
    val tris = wedges.join(closing, Seq("b", "c"), "left_semi")
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy(col("node"))
      .agg(count(lit(1)).as("n_tri"))
  }
}
