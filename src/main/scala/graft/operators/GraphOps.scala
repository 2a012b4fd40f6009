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
}
