package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011) — the memory-compression
  * leg of the ANN family: split each embedding into `m` contiguous
  * subspaces, learn a small k-means codebook PER subspace, and
  * represent every vector by its `m` nearest-code ids. A 64-dim
  * float32 vector (256 bytes) becomes `m` small ints; at m=8/k=256
  * that is 8 bytes — a 32× compression that is what lets a
  * 10¹⁰-vector corpus keep its index in cluster memory at all. The
  * IVF family (q73/q139) cuts the CANDIDATE COUNT; PQ cuts the BYTES
  * PER CANDIDATE — production systems (IVF-PQ/FAISS) compose both.
  *
  * Scoring is asymmetric distance computation (ADC): a query builds
  * one lookup table of exact squared distances from each of its `m`
  * sub-vectors to that subspace's `k` codes (m·k integer entries,
  * computed once per query), after which scoring a corpus vector is
  * `m` array lookups and an integer sum — no per-pair float kernel,
  * and the corpus side touches only the code relation, never the
  * full vectors.
  *
  * Engine-exact by the [[KMeans]] recipe: micro-quantized integer
  * sub-vectors, exact integer squared distances, first-match argmin =
  * smallest-code-id tie-break, truncating-integer centroid means —
  * so a SQL engine replaying the same rounds reproduces codebooks,
  * codes, and ADC rankings bit for bit (the q142 oracle does).
  *
  * 100 TB design: training cost is bounded by the deterministic
  * md5-rank sample regardless of corpus size (the
  * [[Similarity.ivfCellsTrained]] rule; one TakeOrdered, m bounded
  * fits). Encoding is a pure narrow map against LITERAL codebooks
  * (no join, no shuffle — k·dim longs per subspace in the plan).
  * ADC top-k follows [[Similarity.bruteForceTopK]]'s shape — queries
  * broadcast, corpus streamed — but the streamed side is the code
  * relation (m ints/row), and the bounded-heap aggregate
  * ([[TopKPairs]]) keeps the shuffle at queries × k rows with
  * map-side partial heaps. Distances stay under 2⁵³ (micro elements
  * ≤ ~10⁶ ⇒ per-dim term ≤ 10¹², dim ≤ 10³ ⇒ sums ≤ 10¹⁵ only for
  * pathological norms; at unit-norm embeddings ≈ 10¹³), so the
  * negated-double heap key loses nothing.
  */
object ProductQuant {

  /** Shared daemon pool for overlapping the independent per-subspace
    * codebook fits in [[train]] (the
    * [[graft.pipelines.IngestSinks.archiveSink]] leg-overlap idiom).
    * Sized 4: production m is 2–8, and each fit is a chain of tiny
    * jobs — more in flight than ~4 just fight for executor slots.
    * Futures here never spawn futures, so the shared pool cannot
    * deadlock; concurrent trains queue, which only serializes what
    * was serial before. */
  private lazy val bookFitEc: scala.concurrent.ExecutionContext =
    scala.concurrent.ExecutionContext.fromExecutorService(
      java.util.concurrent.Executors.newFixedThreadPool(4,
        new java.util.concurrent.ThreadFactory {
          private val n = new java.util.concurrent.atomic.AtomicLong(0)
          def newThread(r: Runnable): Thread = {
            val t = new Thread(r, s"pq-book-fit-${n.getAndIncrement()}")
            t.setDaemon(true); t
          }
        }))

  /** A trained PQ model: per subspace its 1-based slice (start, len)
    * into the vector and a [[KMeans.Model]] codebook of micro-space
    * sub-centroids (code ids 1..k, the KMeans cid contract). */
  case class Model(slices: Seq[(Int, Int)], books: Seq[KMeans.Model]) {
    require(slices.nonEmpty && slices.size == books.size,
      s"model needs one codebook per subspace; got ${slices.size} slices, " +
        s"${books.size} books")
    require(books.forall(_.nonEmpty),
      "empty codebook — the corpus had no valid vectors (the " +
        "KMeans.assign fail-loudly rule)")
    def m: Int = slices.size
  }

  /** Rows with a complete `dim`-element vector (the ANN family's
    * contract: NULL vectors, NULL elements, and wrong-length vectors
    * are excluded, never scored against a fake value). */
  private def cleanVecs(df: DataFrame, vecCol: String, dim: Int): DataFrame =
    df.filter(col(vecCol).isNotNull && !exists(col(vecCol), x => x.isNull)
      && size(col(vecCol)) === dim)

  /** Train `m` subspace codebooks of `k` codes each with `iters`
    * integer-Lloyd rounds per subspace, over a bounded deterministic
    * md5-rank sample (`sampleN = 0` auto-sizes to
    * clamp(64·k, 4096, 65536) — constant training cost at any corpus
    * size; a sample larger than the corpus degrades to the full
    * corpus, which is what makes small-corpus oracles exact). All m
    * fits draw their seed codes from the same sample rows
    * ([[KMeans.fit]]'s portable-rank draw), sliced per subspace. */
  def train(df: DataFrame, idCol: String, vecCol: String, dim: Int,
            m: Int, k: Int, iters: Int, sampleN: Int = 0): Model = {
    require(m >= 1, s"m must be >= 1, got $m")
    require(dim >= m && dim % m == 0,
      s"dim must be a positive multiple of m; got dim=$dim, m=$m")
    val len = dim / m
    val n = if (sampleN > 0) sampleN
      else math.min(65536, math.max(4096, 64 * k))
    val sample = cleanVecs(df, vecCol, dim)
      .withColumn("__r", Similarity.portableCentroidRank(col(idCol)))
      .orderBy(col("__r"), col(idCol)).limit(n)
      .select(col(idCol), col(vecCol))
      .cache()
    try {
      val slices = (0 until m).map(s => (s * len + 1, len))
      // the m per-subspace fits are INDEPENDENT Lloyd chains over
      // disjoint slices of the same cached sample — each is a string
      // of tiny driver-orchestrated jobs (init draw + iters
      // assignment/update rounds) whose results never interact, so
      // submitting them serially from one thread pays every job's
      // scheduling tail m times (guide §2.6). Overlap them on the
      // shared pool; order is preserved (futures awaited in slice
      // order) and each fit is deterministic, so the model is
      // bit-identical to the serial form. Measured on the q177 bench
      // entry (in-query trainResidual, m=2, sf0.1 local[32] solo
      // min-of-5): 4.05 s serial → 3.49/3.53 s overlapped.
      val books = {
        val inf = scala.concurrent.duration.Duration.Inf
        slices.map { case (start, sliceLen) =>
          scala.concurrent.Future(KMeans.fit(
            sample.select(col(idCol),
              slice(col(vecCol), start, sliceLen).as("__sub")),
            idCol, "__sub", k, iters))(bookFitEc)
        }.map(f => scala.util.Try(scala.concurrent.Await.result(f, inf)))
          .map(_.get)
      }
      Model(slices, books)
    } finally { sample.unpersist(); () }
  }

  /** Per-subspace distance array of a micro vector against a LITERAL
    * codebook: k exact integer squared distances in code-id order. */
  private def bookDists(micro: Column, start: Int, len: Int,
                        book: KMeans.Model): Column =
    transform(typedlit(book.sortBy(_._1).map(_._2)),
      c => KMeans.sqDistMicro(slice(micro, start, len), c))

  /** Compiled PQ-code argmin kernel: micro vector in, the m 1-based
    * nearest-code ids out, over the model's codebooks captured as
    * primitive arrays. The expression form ([[bookDists]] +
    * array_position/array_min — a `transform` over a `typedlit` book
    * with an `aggregate(zip_with(...))` per code) is a higher-order
    * function chain, which is CodegenFallback: INTERPRETED per row
    * with boxed allocations per (row, code, dim). Invisible at toy
    * arity (k=4), it measured ~20 ms/ROW at production arity
    * (m=8, k=256, dim=64 — the r11 weak-scale ladder caught 41 s for
    * 2 000 rows) where this kernel runs the same exact-integer
    * arithmetic in microseconds. Query-side LUT construction keeps
    * the expression form (query relations are model-sized); every
    * CORPUS-sized encode goes through here. Semantics identical and
    * oracle-pinned: id-sorted book, strict `<` keeps the FIRST
    * minimum = smallest code id, exact integer micro distances. */
  private def codesKernel(model: Model)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val books: Array[Array[Array[Long]]] =
      model.books.map(_.sortBy(_._1).map(_._2.toArray).toArray).toArray
    val starts: Array[Int] = model.slices.map(_._1 - 1).toArray
    val lens: Array[Int] = model.slices.map(_._2).toArray
    udf((mv: scala.collection.Seq[Long]) => {
      val out = new Array[Int](books.length)
      var s = 0
      while (s < books.length) {
        val st = starts(s); val ln = lens(s); val bk = books(s)
        var best = 0
        var bestD = Long.MaxValue
        var c = 0
        while (c < bk.length) {
          val code = bk(c)
          var d = 0L
          var i = 0
          while (i < ln) {
            val t = mv(st + i) - code(i); d += t * t; i += 1
          }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        out(s) = best + 1
        s += 1
      }
      out
    })
  }

  /** Encode every vector to its `m` nearest-code ids — a pure narrow
    * map against the frozen codebooks (no join, no shuffle; this is
    * the pass that shrinks the corpus index 4·dim/m-fold), argmin via
    * the compiled [[codesKernel]]. First minimum = smallest-code-id
    * tie-break, the KMeans convention. Output:
    * (idCol, codes array<int>, 1-based ids). */
  def encode(df: DataFrame, idCol: String, vecCol: String, dim: Int,
             model: Model): DataFrame =
    cleanVecs(df, vecCol, dim)
      .select(col(idCol),
        codesKernel(model)(KMeans.microVec(col(vecCol))).as("codes"))

  /** Query-side ADC lookup tables: (q_id, __lut0..__lut{m-1}), each
    * lut the k exact integer squared distances from the query's
    * sub-vector to that subspace's codes, in code-id order. Built once
    * per query in the (broadcast) projection. */
  private def queryLuts(queries: DataFrame, idCol: String, vecCol: String,
                        dim: Int, model: Model): DataFrame = {
    val micro = KMeans.microVec(col(vecCol))
    val lutCols = model.slices.zip(model.books).zipWithIndex.map {
      case (((start, len), book), i) =>
        bookDists(micro, start, len, book).as(s"__lut$i")
    }
    cleanVecs(queries, vecCol, dim)
      .select(col(idCol).as("q_id") +: lutCols: _*)
  }

  /** The ADC score of a `codes` row against the joined query's lookup
    * tables: m `element_at`s and an integer sum. */
  private def adcScore(model: Model): Column =
    (0 until model.m).map(i =>
      element_at(col(s"__lut$i"), element_at(col("codes"), i + 1)))
      .reduce(_ + _)

  /** Heap top-k over ADC-scored pairs → (q_id, rank, c_id, adc_dist),
    * ranked adc asc / c_id asc ([[TopKPairs]]' negated-double key is
    * exact over these integer magnitudes — class doc). */
  private def adcRank(scored: DataFrame, k: Int): DataFrame =
    scored
      .groupBy(col("q_id"))
      .agg(TopKPairs.topK(k)(-col("__adc"), col("c_id")).as("nn"))
      .select(col("q_id"), posexplode(col("nn")).as(Seq("pos", "p")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("c_id"), (-col("p.sim")).cast("long").as("adc_dist"))

  /** ADC top-k: every `queries` vector against the PQ-encoded
    * `corpus` (self-matches on id excluded). The corpus is scored
    * from CODES ONLY — each query carries its m per-subspace lookup
    * tables (m·k exact integer distances, built once in the broadcast
    * projection) and a candidate costs m `element_at`s and an integer
    * sum. Ranking: adc_dist asc, ties by c_id asc (the negated-double
    * heap key is exact — class doc). Output:
    * (q_id, rank, c_id, adc_dist). */
  def adcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, dim: Int, model: Model, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // the bruteForceTopK fan-out rule: a small corpus arriving as one
    // split would serialize the scoring loop onto a single task
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val codes = encode(corpus, idCol, vecCol, dim, model)
      .select(col(idCol).as("c_id"), col("codes"))
      .repartition(par)
    val q = queryLuts(queries, idCol, vecCol, dim, model)
    val scored = codes.crossJoin(broadcast(q))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("__adc", adcScore(model))
    adcRank(scored, k)
  }

  /** IVF-PQ search (Jégou et al. 2011 §V — the FAISS `IndexIVFPQ`
    * shape, here with `by_residual=false`: codes are learned on the
    * raw vectors, not per-cell residuals, which keeps every stage
    * engine-replayable): a TRAINED coarse quantizer
    * ([[Similarity.ivfCellsTrained]]) prunes CANDIDATES to vectors
    * sharing one of the query's `nProbe` cells, then PQ codes score
    * only those survivors by exact-integer ADC. This composes the two
    * legs of the ANN family — IVF cuts the candidate COUNT
    * (n → ≈ n·nProbe/nCells per query), PQ cuts the BYTES per
    * candidate (4·dim → m small ints) — which is what a production
    * vector index does: at 10¹⁰ vectors the per-query work is the
    * inverted-list fraction, and the corpus-side state the scoring
    * pass touches is the (id, cell) relation plus the m-int code
    * relation; the full float vectors are never read after encoding.
    *
    * Plan shape: cell model + assignment are [[Similarity.ivfCellsTrained]]'s
    * narrow literal peel (no join, no shuffle, constant-bounded
    * training); the query side's probed cells (|Q|·nProbe rows) and
    * LUTs broadcast; candidate generation is one broadcast equi-join
    * on `cell` against the corpus assignment + DISTINCT — never a
    * corpus×queries cross join (PlanAuditSpec pins this); scoring
    * joins the candidate relation to the code relation on id
    * (AQE-splittable shuffle) and reduces through the bounded-heap
    * aggregate (shuffle = queries × k rows).
    *
    * Self-kNN form: `queries` must be drawn from `corpus` (share its
    * id space) — the cell model trains once on the corpus and both
    * sides read their probed cells from the same assignment
    * (the q139 candidate semantics); self-matches excluded. With
    * `nProbe >= nCells` every pair shares a cell and the result
    * equals [[adcTopK]] exactly (spec-proven identity). Output:
    * (q_id, rank, c_id, adc_dist), ranked adc asc / c_id asc. */
  def ivfAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, dim: Int, model: Model, k: Int,
                 nCells: Int, nProbe: Int = 2,
                 ivfIters: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val cells = Similarity.ivfCellsTrained(corpus, idCol, vecCol,
      nCells, nProbe, ivfIters)
    adcOverCells(cells, corpus, queries, idCol, vecCol, dim, model, k)
  }

  /** [[ivfAdcTopK]] behind the TWO-LEVEL coarse quantizer
    * ([[Similarity.ivfCellsTwoLevel]]) — the IVFADC shape past the
    * literal-centroid cap: at 10¹⁰ vectors the √n sizing rule wants
    * ≈10⁵ cells, and a 10⁵·dim literal centroid array is a
    * plan-killing expression tree. Here NO K-sized literal exists
    * anywhere: the only literal model is the ⌈√K⌉ super-centroid
    * array; the K sub-centroids live in a broadcast RELATION and the
    * candidate/scoring tail is byte-identical to [[ivfAdcTopK]]
    * (same cell equi-join, same code-only ADC, PlanAuditSpec pins
    * both properties). Same self-kNN contract and output shape. */
  def ivfAdcTopKTwoLevel(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, dim: Int,
                         model: Model, k: Int, nCells: Int,
                         nProbe: Int = 2, superProbe: Int = 2,
                         ivfIters: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // eager localCheckpoint: the cell relation feeds BOTH the query
    // side and the corpus side of the candidate join (the round-7
    // multi-consumer rule), and its lineage holds the grouped-Lloyd
    // training rounds — n rows of two ints
    val cells = Similarity.ivfCellsTwoLevel(corpus, idCol, vecCol,
        nCells, nProbe, superProbe, ivfIters)
      .localCheckpoint()
    adcOverCells(cells, corpus, queries, idCol, vecCol, dim, model, k)
  }

  /** The shared IVFADC tail: candidates from the cell equi-join
    * (never corpus×queries), ADC scoring from codes only, bounded-heap
    * ranking. `cells` is any (id, cell) coarse assignment. */
  private def adcOverCells(cells: DataFrame, corpus: DataFrame,
                           queries: DataFrame, idCol: String,
                           vecCol: String, dim: Int, model: Model,
                           k: Int): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val codes = encode(corpus, idCol, vecCol, dim, model)
      .select(col(idCol).as("c_id"), col("codes"))
      .repartition(par)
    val q = queryLuts(queries, idCol, vecCol, dim, model)
    val qCells = cells
      .join(broadcast(q.select(col("q_id").as("id"))), "id")
      .select(col("id").as("q_id"), col("cell"))
    val cands = broadcast(qCells)
      .join(cells.select(col("id").as("c_id"), col("cell")), "cell")
      .filter(col("q_id") =!= col("c_id"))
      .select(col("q_id"), col("c_id"))
      .distinct()
    val scored = cands
      .join(codes, "c_id")
      .join(broadcast(q), "q_id")
      .withColumn("__adc", adcScore(model))
    adcRank(scored, k)
  }

  /** Two-stage PQ search: ADC candidate generation (`candK` per
    * query, from codes only) re-ranked by EXACT cosine over the
    * candidates' full vectors — the [[Similarity.quantizedRerank]]
    * shape with PQ in the cheap stage; only queries × candK full
    * vectors are ever touched by the float kernel. Self-kNN form
    * (queries = corpus). Output: (q_id, rank, c_id, sim). */
  def adcRerank(df: DataFrame, idCol: String, vecCol: String, dim: Int,
                model: Model, k: Int, candK: Int): DataFrame = {
    require(candK >= k, s"candK ($candK) must be >= k ($k)")
    val cands = adcTopK(df, df, idCol, vecCol, dim, model, candK)
      .select(col("q_id"), col("c_id"))
    val vecs = cleanVecs(df, vecCol, dim)
      .select(col(idCol), col(vecCol))
    val scored = cands
      .join(vecs.select(col(idCol).as("q_id"), col(vecCol).as("__qv")), "q_id")
      .join(vecs.select(col(idCol).cast("long").as("c_id"),
        col(vecCol).as("__cv")), "c_id")
      .select(col("q_id"), col("c_id"),
        graft.functions.VectorFns.cosine(col("__qv"), col("__cv")).as("sim"))
      .filter(col("sim").isNotNull)
    scored
      .groupBy(col("q_id"))
      .agg(TopKPairs.topK(k)(col("sim"), col("c_id")).as("nn"))
      .select(col("q_id"), posexplode(col("nn")).as(Seq("pos", "p")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("p.id").as("c_id"), col("p.sim").as("sim"))
  }

  // ---- Residual encoding (by_residual = true, the FAISS default) -------

  /** A residual IVF-PQ index: the coarse cell model plus PQ codebooks
    * trained on RESIDUALS (vector − its nearest cell centroid). The
    * residual distribution is tighter than the raw one — the same
    * code budget spends its precision on the within-cell geometry
    * that actually ranks candidates, which is why FAISS defaults to
    * it (Jégou et al. 2011 §IV.B).
    *
    * The coarse model here is the FLAT literal form — the right tool
    * to the documented ~10³-10⁴-cell literal cap (the q139/q143
    * trade); past it, compose with the two-level quantizer by joining
    * residuals from the broadcast sub-centroid RELATION instead of
    * `element_at` on a literal (the q168 pattern — the residual
    * arithmetic itself is join-shape-agnostic). */
  case class ResidualModel(cells: KMeans.Model, pq: Model)

  /** Micro-exact residual of a micro vector against its cell's
    * centroid, re-expressed in the FLOAT domain the PQ machinery
    * consumes: (micro − centroid)/10⁶ as doubles. The round-trip is
    * EXACT — `microVec(round(k/10⁶·10⁶)) = k` for |k| < 2⁵¹ (double
    * mul/div are correctly rounded) — so every downstream distance is
    * the same integer an all-integer replay computes. */
  private def residualExpr(micro: Column, cellCol: Column,
                           cells: KMeans.Model): Column = {
    val cents = typedlit(cells.sortBy(_._1).map(_._2))
    transform(zip_with(micro, element_at(cents, cellCol.cast("int")),
      (a, b) => a - b), x => (x.cast("double") / lit(1e6)))
  }

  /** (idCol, cell, rvec): nearest-cell assignment (dist asc, cid asc
    * — the KMeans argmin rule) + the residual vector. Narrow: one
    * literal-model map, no join, no shuffle. */
  private def residualVecs(df: DataFrame, idCol: String, vecCol: String,
                           dim: Int, cells: KMeans.Model): DataFrame = {
    val ordered = cells.sortBy(_._1)
    val micro = KMeans.microVec(col(vecCol))
    cleanVecs(df, vecCol, dim)
      .withColumn("__m", micro)
      .withColumn("__d", transform(typedlit(ordered.map(_._2)),
        c => KMeans.sqDistMicro(col("__m"), c)))
      .withColumn("cell",
        array_position(col("__d"), array_min(col("__d"))).cast("int"))
      .select(col(idCol), col("cell"),
        residualExpr(col("__m"), col("cell"), cells).as("rvec"))
  }

  /** Train a residual IVF-PQ index: coarse cells on the raw vectors,
    * PQ codebooks on the residuals — BOTH over the bounded
    * deterministic md5-rank sample (clamp(64·nCells, 4096, 65536) for
    * the cells; [[train]] applies its own identical rule to the
    * residual relation), so training cost is constant in corpus size
    * — the ivfCellsTrained/train convention. A sample larger than the
    * corpus degrades to the full corpus, which keeps small-corpus
    * oracles exact. */
  def trainResidual(df: DataFrame, idCol: String, vecCol: String,
                    dim: Int, m: Int, k: Int, iters: Int, nCells: Int,
                    cellIters: Int = 2): ResidualModel = {
    val nCell = math.min(65536, math.max(4096, 64 * nCells))
    val nPq = math.min(65536, math.max(4096, 64 * k))
    // ONE rank-sample draw covers both fits; the sub-draws below are
    // prefixes of the same (rank, id) order, so each equals the draw
    // the corresponding fit would have made against the full corpus
    val sample = cleanVecs(df, vecCol, dim)
      .withColumn("__r", Similarity.portableCentroidRank(col(idCol)))
      .orderBy(col("__r"), col(idCol)).limit(math.max(nCell, nPq))
      .select(col(idCol), col(vecCol), col("__r"))
      .cache()
    try {
      val cells = KMeans.fit(
        sample.orderBy(col("__r"), col(idCol)).limit(nCell)
          .select(col(idCol), col(vecCol)),
        idCol, vecCol, nCells, cellIters)
      // sample-FIRST residuals: [[train]]'s own md5-rank draw over the
      // residual relation would select exactly the rank-top nPq corpus
      // rows (residuals are per-row pure and complete), so computing
      // residuals over that prefix instead of the whole corpus changes
      // nothing downstream — and removes the one full-corpus
      // residual pass training used to pay
      val resid = residualVecs(
        sample.orderBy(col("__r"), col(idCol)).limit(nPq)
          .select(col(idCol), col(vecCol)),
        idCol, vecCol, dim, cells)
      ResidualModel(cells,
        train(resid, idCol, "rvec", dim, m, k, iters, sampleN = nPq))
    } finally { sample.unpersist(); () }
  }

  /** The corpus-side INDEX relation of the FLAT residual form:
    * (c_id, cell, codes array<int>) — nearest cell + residual PQ
    * codes fused into ONE narrow pass (cell assignment, residual, and
    * code argmins are all expressions over the same row — the corpus
    * is scanned once). [[encodeResidualTwoLevel]]'s flat twin: this
    * is the relation a frozen flat index STORES, serves from
    * ([[ivfAdcResidualTopKOverCodes]]), and appends to (encode a
    * fresh batch with the frozen model, union on — spec-proven
    * ≡ batch rebuild). */
  def encodeResidual(df: DataFrame, idCol: String, vecCol: String,
                     dim: Int, model: ResidualModel): DataFrame = {
    val rv = residualVecs(df, idCol, vecCol, dim, model.cells)
    rv.select(col(idCol).as("c_id"), col("cell"),
      codesKernel(model.pq)(KMeans.microVec(col("rvec"))).as("codes"))
  }

  /** Residual IVF-PQ search: candidates share one of the query's
    * `nProbe` nearest cells (as [[ivfAdcTopK]]); scoring is ADC over
    * RESIDUAL codes — the query's lookup tables are built PER PROBED
    * CELL from the query's residual against that cell (FAISS's
    * per-list LUT recomputation), |Q|·nProbe LUT rows, broadcast.
    * Exact integer distances end to end; self-kNN form; output
    * (q_id, rank, c_id, adc_dist) ranked adc asc / c_id asc. */
  def ivfAdcResidualTopK(corpus: DataFrame, queries: DataFrame,
                         idCol: String, vecCol: String, dim: Int,
                         model: ResidualModel, k: Int,
                         nProbe: Int = 2): DataFrame = {
    // repartition for the scoring fan-out (the adcTopK rule: a small
    // corpus arriving as one split would serialize the scoring loop)
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    val codes = encodeResidual(corpus, idCol, vecCol, dim, model)
      .repartition(par)
    ivfAdcResidualTopKOverCodes(codes, queries, idCol, vecCol, dim,
      model, k, nProbe)
  }

  /** Search over a PRECOMPUTED flat (c_id, cell, codes) relation —
    * [[ivfAdcResidualTopKTwoLevelOverCodes]]' flat twin, closing the
    * API asymmetry where only the two-level form could serve a
    * LOADED index without re-encoding the corpus: `codes` is a stored
    * [[encodeResidual]] relation (or stored ∪ appended batches);
    * only the query side touches the model. The caller owns `codes`'
    * partitioning (a loaded parquet relation is already split). */
  def ivfAdcResidualTopKOverCodes(codes: DataFrame, queries: DataFrame,
                                  idCol: String, vecCol: String, dim: Int,
                                  model: ResidualModel, k: Int,
                                  nProbe: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // query side: nProbe nearest cells via a narrow sorted-struct
    // slice over the literal model, then one LUT row per (q, cell)
    // from the query's residual AGAINST THAT CELL
    val ordered = model.cells.sortBy(_._1)
    val probed = cleanVecs(queries, vecCol, dim)
      .withColumn("__m", KMeans.microVec(col(vecCol)))
      .withColumn("__dc", sort_array(zip_with(
        transform(typedlit(ordered.map(_._2)),
          c => KMeans.sqDistMicro(col("__m"), c)),
        sequence(lit(1), lit(ordered.size)),
        (d, i) => struct(d.as("d"), i.cast("int").as("cell")))))
      .select(col(idCol).as("q_id"), col("__m"),
        explode(slice(col("__dc"), 1, math.min(nProbe, ordered.size)))
          .as("t"))
      .select(col("q_id"), col("__m"), col("t.cell").as("cell"))
    val lutCols = model.pq.slices.zip(model.pq.books).zipWithIndex.map {
      case (((start, len), book), i) =>
        transform(typedlit(book.sortBy(_._1).map(_._2)),
          c => KMeans.sqDistMicro(
            slice(KMeans.microVec(
              residualExpr(col("__m"), col("cell"), model.cells)),
              start, len), c)).as(s"__lut$i")
    }
    val luts = probed.select(
      Seq(col("q_id"), col("cell")) ++ lutCols: _*)
    // every corpus point lives in exactly ONE cell (nearest-only
    // assignment), so each (q, c) pair meets at most once — no
    // distinct/dedup stage needed (FAISS's scan-own-list property)
    val scored = codes
      .join(broadcast(luts), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("__adc", adcScore(model.pq))
    adcRank(scored, k)
  }

  // ---- Residual ∘ two-level: the no-K-literal residual index ----------

  /** Residual IVF-PQ over the TWO-LEVEL coarse quantizer — the
    * composition that removes the last literal-cap constraint from
    * the highest-recall index form: cells come from
    * [[Similarity.TwoLevelModel]] (⌈√K⌉ literal supers + a broadcast
    * sub RELATION), and residuals subtract the cell centroid via a
    * broadcast JOIN on the cell id instead of `element_at` on a
    * K-sized literal. Everything else is the q177 shape. */
  case class ResidualTwoLevelModel(cells: Similarity.TwoLevelModel,
                                   pq: Model)

  /** (cell, cvec): the sub relation keyed by the flat cell id. */
  private def cellVecsOf(tl: Similarity.TwoLevelModel): DataFrame =
    tl.sub.select(
      ((col("super") - 1) * tl.nSub + col("sub")).cast("int").as("cell"),
      col("cvec"))

  /** (idCol, cell, rvec): nearest two-level cell (within the
    * superProbe beam) + the join-shaped residual. */
  private def residualVecsTwoLevel(df: DataFrame, idCol: String,
                                   vecCol: String, dim: Int,
                                   tl: Similarity.TwoLevelModel,
                                   superProbe: Int): DataFrame = {
    val assign1 = Similarity.assignTwoLevelCells(df, idCol, vecCol, tl,
        nProbe = 1, superProbe = superProbe)
      .select(col("id").as(idCol), col("cell"))
    cleanVecs(df, vecCol, dim)
      .select(col(idCol), KMeans.microVec(col(vecCol)).as("__m"))
      .join(assign1, idCol)
      .join(broadcast(cellVecsOf(tl)), "cell")
      .select(col(idCol), col("cell"),
        transform(zip_with(col("__m"), col("cvec"), (a, b) => a - b),
          x => x.cast("double") / lit(1e6)).as("rvec"))
  }

  /** The ONE corpus-linear pass of a composed train: the rank-top `n`
    * clean rows, cached. Every k-means fit downstream draws its own
    * md5-rank sample as a PREFIX of this relation — bit-identical to
    * the draw it would have made against the full corpus, because the
    * rank is a pure function of the row id (shared by every fit) and
    * a rank-ordered TakeOrdered over a rank-ordered prefix returns
    * that prefix. Before this, a composed build (OPQ alternation +
    * super cells + sub cells + m residual books ≈ a dozen fits) paid
    * a dozen corpus-linear TakeOrdered selections; now it pays one
    * (the r11 `opq_train_q184` weak-scale finding). */
  private def sharedTrainSample(df: DataFrame, idCol: String,
                                vecCol: String, dim: Int,
                                n: Int): DataFrame =
    cleanVecs(df, vecCol, dim)
      .withColumn("__r", Similarity.portableCentroidRank(col(idCol)))
      .orderBy(col("__r"), col(idCol)).limit(n)
      .select(col(idCol), col(vecCol))
      .cache()

  /** Train the composed index: two-level cells on the raw vectors,
    * PQ codebooks on the join-shaped residuals (both sample-bounded;
    * [[train]] applies its own rank-sample rule to the residual
    * relation). All fits draw prefixes of ONE cached
    * [[sharedTrainSample]] — one corpus selection pass total instead
    * of one per fit; bit-identical by the prefix argument there.
    * (The shared draw applies the ANN-family cleanVecs contract
    * uniformly, so wrong-length vectors are excluded from cell
    * training too — previously only NULL-element rows were.) */
  def trainResidualTwoLevel(df: DataFrame, idCol: String, vecCol: String,
                            dim: Int, m: Int, k: Int, iters: Int,
                            nCells: Int, cellIters: Int = 2,
                            superProbe: Int = 2): ResidualTwoLevelModel = {
    // auto-cell sizing counts cleanVecs rows (NULL AND wrong-length
    // excluded) — the same population sharedTrainSample trains on, and
    // the same count trainOpqResidualTwoLevel resolves, so the two
    // composed-train entry points pick identical nCells on any corpus
    val kCells = if (nCells > 0) nCells
      else Similarity.suggestCells(cleanVecs(df, vecCol, dim).count())
    val nTl = math.min(262144, math.max(4096, 64 * kCells))
    val nPq = math.min(65536, math.max(4096, 64 * k))
    val shared = sharedTrainSample(df, idCol, vecCol, dim,
      math.max(nTl, nPq))
    try {
      val tl = Similarity.trainTwoLevelCells(shared, idCol, vecCol,
        kCells, cellIters, sampleN = nTl)
      // sample-FIRST residuals (the trainResidual argument): [[train]]'s
      // rank draw over the residual relation is the rank-top nPq corpus
      // rows, so residuals are computed over that prefix only
      val pqSample = shared
        .withColumn("__r", Similarity.portableCentroidRank(col(idCol)))
        .orderBy(col("__r"), col(idCol)).limit(nPq)
        .select(col(idCol), col(vecCol))
      val resid = residualVecsTwoLevel(pqSample, idCol, vecCol, dim, tl,
        superProbe)
      ResidualTwoLevelModel(tl,
        train(resid, idCol, "rvec", dim, m, k, iters, sampleN = nPq))
    } finally { shared.unpersist(); () }
  }

  /** The corpus-side INDEX relation of the residual two-level form:
    * (c_id, cell, codes array<int>) — nearest two-level cell +
    * residual PQ codes, one fused narrow pass (cell assignment,
    * residual join, code argmins over the same row). This is the
    * relation a frozen index STORES and serves from — and the
    * assign-only APPEND path: encoding a fresh vector batch with a
    * loaded frozen model (no retrain) and unioning it onto the stored
    * relation is exactly what a batch rebuild over old ∪ new computes
    * (encode is a pure per-row function of the frozen model —
    * spec-proven append ≡ rebuild), so incremental ingest is a union,
    * never a retrain. Pair with [[residualDriftReportTwoLevel]] to
    * decide WHEN the frozen model has drifted enough to retrain. */
  def encodeResidualTwoLevel(df: DataFrame, idCol: String, vecCol: String,
                             dim: Int, model: ResidualTwoLevelModel,
                             superProbe: Int = 2): DataFrame = {
    val rv = residualVecsTwoLevel(df, idCol, vecCol, dim, model.cells,
      superProbe)
    rv.select(col(idCol).as("c_id"), col("cell"),
      codesKernel(model.pq)(KMeans.microVec(col("rvec"))).as("codes"))
  }

  /** [[ivfAdcResidualTopK]] behind the two-level quantizer: same
    * candidate semantics (one cell per corpus point, per-(q, cell)
    * LUTs), NO K-sized literal anywhere — the super model is the only
    * literal centroid array in the plan. Output
    * (q_id, rank, c_id, adc_dist), adc asc / c_id asc. */
  def ivfAdcResidualTopKTwoLevel(corpus: DataFrame, queries: DataFrame,
                                 idCol: String, vecCol: String, dim: Int,
                                 model: ResidualTwoLevelModel, k: Int,
                                 nProbe: Int = 2,
                                 superProbe: Int = 2): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    // the adcTopK fan-out rule: a small corpus arriving as one split
    // would serialize the scoring loop onto a single task
    val codes = encodeResidualTwoLevel(corpus, idCol, vecCol, dim, model,
      superProbe).repartition(par)
    ivfAdcResidualTopKTwoLevelOverCodes(codes, queries, idCol, vecCol,
      dim, model, k, nProbe, superProbe)
  }

  /** Search over a PRECOMPUTED (c_id, cell, codes) relation — the
    * serve-frozen / incremental-append form of
    * [[ivfAdcResidualTopKTwoLevel]]: `codes` is a stored index
    * relation (or stored ∪ [[encodeResidualTwoLevel]] of an appended
    * batch), loaded as data; only the query side touches the model.
    * The caller owns `codes`' partitioning (a loaded parquet relation
    * is already split; repartition only if it arrives as one file). */
  def ivfAdcResidualTopKTwoLevelOverCodes(codes: DataFrame,
                                          queries: DataFrame,
                                          idCol: String, vecCol: String,
                                          dim: Int,
                                          model: ResidualTwoLevelModel,
                                          k: Int, nProbe: Int = 2,
                                          superProbe: Int = 2): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val probed = Similarity.assignTwoLevelCells(queries, idCol, vecCol,
        model.cells, nProbe, superProbe)
      .select(col("id").as("q_id"), col("cell"))
    val qr = cleanVecs(queries, vecCol, dim)
      .select(col(idCol).as("q_id"), KMeans.microVec(col(vecCol)).as("__m"))
      .join(probed, "q_id")
      .join(broadcast(cellVecsOf(model.cells)), "cell")
      .withColumn("__rm", zip_with(col("__m"), col("cvec"), (a, b) => a - b))
    val lutCols = model.pq.slices.zip(model.pq.books).zipWithIndex.map {
      case (((start, len), book), i) =>
        bookDists(col("__rm"), start, len, book).as(s"__lut$i")
    }
    val luts = qr.select(Seq(col("q_id"), col("cell")) ++ lutCols: _*)
    val scored = codes
      .join(broadcast(luts), Seq("cell"))
      .filter(col("q_id") =!= col("c_id"))
      .withColumn("__adc", adcScore(model.pq))
    adcRank(scored, k)
  }

  // ---- OPQ: learned orthogonal rotation before PQ ----------------------
  // (Ge et al., "Optimized Product Quantization", CVPR 2013 — the
  // non-parametric alternation, the next rung on the FAISS ladder
  // after residual encoding: a pre-rotation decorrelates the fixed
  // subspace slices so the same code budget quantizes better.)

  /** An OPQ model: the micro-quantized dim×dim rotation (row-major,
    * entries = round(R_ij·10⁶) — the quantization is what makes the
    * rotated domain ENGINE-REPLAYABLE: both engines apply the same
    * integer matrix, so near-orthogonality after rounding costs
    * recall nothing and exactness nothing) plus PQ codebooks trained
    * in the rotated domain. The rotation is dim² longs — model-sized,
    * far under the documented literal cap (a 10²-10³ dim embedding is
    * 10⁴-10⁶ entries; pass it as a broadcast relation past ~10⁴ the
    * same way the two-level sub-centroids join). */
  case class OpqModel(rotation: Seq[Seq[Long]], pq: Model) {
    require(rotation.nonEmpty && rotation.forall(_.size == rotation.size),
      "rotation must be square dim×dim")
    def dim: Int = rotation.size
  }

  /** The micro identity — [[trainOpq]]'s starting point and the
    * no-op rotation for composing un-rotated paths uniformly. */
  def identityRotation(dim: Int): Seq[Seq[Long]] =
    Seq.tabulate(dim, dim)((i, j) => if (i == j) 1000000L else 0L)

  // floor((Rµ·vµ)/10⁶) with a positive-offset trick: Spark `div` and
  // DuckDB `//` agree (truncation = floor) only for nonnegative
  // numerators, and double division + floor can be off by an ulp at
  // integer boundaries — so shift by 10¹⁵ (far above any |Σ Rµ·vµ|
  // at micro magnitudes), integer-divide, shift back by 10⁹.
  private val RotOffset = 1000000000000000L
  private val RotOffsetOut = 1000000000L

  /** The rotation as a ONE-ROW broadcast relation (__rot:
    * array<array<long>>): the matrix is DATA joined in, never a dim²
    * expression literal — the same move that freed the two-level
    * sub-centroids from K-sized literals. A dim=10³ rotation would be
    * a 10⁶-entry literal in every rotated plan (and its analysis/
    * codegen constant); as a broadcast row it is one 1-row
    * BroadcastNestedLoopJoin build side — the scalar-agg-broadcast
    * pattern (q22) — and plan size stays O(1) in dim. */
  private def rotationRelation(spark: org.apache.spark.sql.SparkSession,
                               rotation: Seq[Seq[Long]]): DataFrame = {
    import spark.implicits._
    Seq(Tuple1(rotation.map(_.toSeq))).toDF("__rot")
  }

  /** Rotated micro vector of a micro vector against a rotation held
    * in COLUMN `rot` — exact integers end to end. Out-of-range inputs
    * FAIL LOUDLY: the offset-floor trick is only floor while
    * |Σ Rµ·vµ| < 10¹⁵ (vectors of norm ≲ 10³ at micro magnitudes, by
    * Cauchy-Schwarz with unit-norm rotation rows); past it Spark div
    * would truncate toward zero — a silent cross-engine off-by-one —
    * so the guard raises instead of encoding wrong. */
  private def rotateMicroCol(micro: Column, rot: Column, dim: Int): Column = {
    val dots = transform(sequence(lit(1), lit(dim)), i =>
      aggregate(zip_with(element_at(rot, i.cast("int")), micro,
        (a, b) => a * b), lit(0L), (acc, x) => acc + x))
    transform(dots, d =>
      when(abs(d) < lit(RotOffset),
        call_function("div", d + lit(RotOffset), lit(1000000L))
          - lit(RotOffsetOut))
        .otherwise(raise_error(concat(
          lit("rotate: |R·v| exceeds the 10^15 offset-floor bound "),
          lit("(input vector norm out of the documented ~10^3 range): "),
          abs(d).cast("string"))).cast("long")))
  }

  /** Attach `__rv` (the rotated FLOAT vector the PQ machinery
    * consumes) to any relation carrying a micro vector in `microCol`
    * — one broadcast of the one-row rotation relation, narrow
    * otherwise. Micro round-trip is exact (the residualExpr
    * argument). */
  private def withRotated(df: DataFrame, microCol: String, dim: Int,
                          rotation: Seq[Seq[Long]]): DataFrame =
    df.crossJoin(broadcast(rotationRelation(df.sparkSession, rotation)))
      .withColumn("__rv",
        transform(rotateMicroCol(col(microCol), col("__rot"), dim),
          x => x.cast("double") / lit(1e6)))
      .drop("__rot")

  /** (idCol, __rv): every vector rotated into the PQ domain, as the
    * float relation the PQ machinery consumes (micro round-trip is
    * exact — the residualExpr argument). This IS the opt-in OPQ
    * pre-stage: feed `__rv` to [[train]]/[[trainResidual]]/their
    * searches and the whole existing stack runs in the rotated
    * domain unchanged. The matrix rides as a one-row broadcast
    * relation, never a dim² plan literal ([[rotationRelation]]). */
  def rotate(df: DataFrame, idCol: String, vecCol: String, dim: Int,
             rotation: Seq[Seq[Long]]): DataFrame = {
    require(rotation.size == dim,
      s"rotation is ${rotation.size}×${rotation.size}, vectors dim $dim")
    withRotated(
      cleanVecs(df, vecCol, dim)
        .select(col(idCol), KMeans.microVec(col(vecCol)).as("__xm")),
      "__xm", dim, rotation)
      .select(col(idCol), col("__rv"))
  }

  /** Micro reconstruction of a `codes` row from literal codebooks:
    * the per-subspace assigned centroids concatenated back to a full
    * dim vector — the Y side of the Procrustes update. */
  private def decodeExpr(model: Model): Column =
    concat(model.slices.zip(model.books).zipWithIndex.map {
      case (((_, _), book), s) =>
        element_at(typedlit(book.sortBy(_._1).map(_._2)),
          element_at(col("codes"), s + 1))
    }: _*)

  /** Orthogonal-Procrustes update: R = argmax_{RᵀR=I} tr(R·A) with
    * A_ij = Σ_n x_i y_j = U S Vᵀ → R = V Uᵀ. Driver-side SVD of a
    * dim×dim matrix (model-sized); the result is immediately
    * micro-quantized, so cross-engine exactness never depends on the
    * LAPACK path — the quantized matrix is DATA. */
  private def procrustes(a: Array[Long], dim: Int): Seq[Seq[Long]] = {
    val A = breeze.linalg.DenseMatrix.tabulate(dim, dim)(
      (i, j) => a(i * dim + j).toDouble)
    val breeze.linalg.svd.SVD(u, _, vt) = breeze.linalg.svd(A)
    val r = vt.t * u.t
    Seq.tabulate(dim, dim)((i, j) => math.round(r(i, j) * 1e6))
  }

  /** Train OPQ: `opqIters` alternations of (fit PQ codebooks in the
    * current rotation) / (Procrustes-update the rotation toward the
    * codebooks' reconstructions), then one final codebook fit in the
    * final rotation. Everything is bounded by the deterministic
    * md5-rank sample ([[train]]'s rule): per alternation one m-fit
    * train, one encode, and ONE dim×dim cross-covariance aggregate —
    * accumulated in EXACT longs per partition (order-independent ⇒
    * partitioning-independent ⇒ bit-identical refits, the q183
    * witness) and collected as O(partitions·dim²), never corpus rows.
    * Training cost is constant in corpus size. */
  def trainOpq(df: DataFrame, idCol: String, vecCol: String, dim: Int,
               m: Int, k: Int, iters: Int, opqIters: Int = 3,
               sampleN: Int = 0): OpqModel = {
    require(opqIters >= 1, s"opqIters must be >= 1, got $opqIters")
    val n = if (sampleN > 0) sampleN
      else math.min(65536, math.max(4096, 64 * k))
    val spark = df.sparkSession
    import spark.implicits._
    val sample = cleanVecs(df, vecCol, dim)
      .withColumn("__r", Similarity.portableCentroidRank(col(idCol)))
      .orderBy(col("__r"), col(idCol)).limit(n)
      .select(col(idCol), KMeans.microVec(col(vecCol)).as("__xm"))
      .cache()
    try {
      var rot = identityRotation(dim)
      def rotated = withRotated(sample, "__xm", dim, rot)
      for (_ <- 1 to opqIters) {
        val pq = train(rotated, idCol, "__rv", dim, m, k, iters, sampleN = n)
        val pairs = rotated
          .join(encode(rotated, idCol, "__rv", dim, pq), idCol)
          .select(col("__xm"), decodeExpr(pq).as("__ym"))
          .as[(Seq[Long], Seq[Long])]
        val partials = pairs.mapPartitions { it =>
          val acc = new Array[Long](dim * dim)
          it.foreach { case (x, y) =>
            var i = 0
            while (i < dim) {
              val xi = x(i); var j = 0
              while (j < dim) { acc(i * dim + j) += xi * y(j); j += 1 }
              i += 1
            }
          }
          Iterator(acc.toSeq)
        }.collect()
        val a = new Array[Long](dim * dim)
        partials.foreach { p =>
          var t = 0
          while (t < dim * dim) { a(t) += p(t); t += 1 }
        }
        rot = procrustes(a, dim)
      }
      OpqModel(rot, train(rotated, idCol, "__rv", dim, m, k, iters,
        sampleN = n))
    } finally { sample.unpersist(); () }
  }

  /** ADC top-k in the learned rotated domain: both sides rotate
    * narrowly (literal matrix, no join, no shuffle), then the
    * standard [[adcTopK]] runs unchanged. Compose with the IVF paths
    * the same way — `rotate` the corpus once and feed any search in
    * this file. */
  def opqAdcTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, dim: Int, model: OpqModel,
                 k: Int): DataFrame =
    adcTopK(rotate(corpus, idCol, vecCol, dim, model.rotation),
      rotate(queries, idCol, vecCol, dim, model.rotation),
      idCol, "__rv", dim, model.pq, k)

  // ---- OPQ ∘ residual ∘ two-level: the full production lifecycle -------
  // The best-recall composition (measured opq∘residual 0.850 vs
  // residual 0.767, ProductQuantSpec) promoted from a spec-only
  // demonstration to a first-class index form: trainable, persistable
  // (io/VectorIndexArtifacts.saveOpqResidualTwoLevel), servable over a
  // stored code relation, appendable per micro-batch
  // (StreamOps.opqIndexAppendEachBatch), and drift-alarmed — every
  // stage operating in the learned rotated domain.

  /** The composed index: a learned (or fixed) micro rotation in front
    * of a residual ∘ two-level index trained in the rotated domain.
    * No K-sized literal anywhere (the q178 property) and no dim²
    * literal (the rotation rides as a one-row broadcast relation). */
  case class OpqResidualTwoLevelModel(rotation: Seq[Seq[Long]],
                                      inner: ResidualTwoLevelModel) {
    require(rotation.nonEmpty && rotation.forall(_.size == rotation.size),
      "rotation must be square dim×dim")
    def dim: Int = rotation.size
  }

  /** Train the composed index: the rotation from [[trainOpq]]'s
    * Procrustes alternation (the standard OPQ objective — flat-PQ
    * reconstruction error), then the residual ∘ two-level index
    * trained on the ROTATED vectors. Everything is sample-bounded;
    * the alternation's flat codebooks are training scaffolding only
    * (the served codebooks are the residual-domain ones). */
  def trainOpqResidualTwoLevel(df: DataFrame, idCol: String, vecCol: String,
                               dim: Int, m: Int, k: Int, iters: Int,
                               nCells: Int, cellIters: Int = 2,
                               superProbe: Int = 2, opqIters: Int = 3,
                               sampleN: Int = 0): OpqResidualTwoLevelModel = {
    // ONE corpus selection feeds the whole composition: the OPQ
    // alternation, the two-level cells, and the residual books all
    // draw rank prefixes of the same cached sample (bit-identical to
    // their full-corpus draws — the sharedTrainSample argument; the
    // rotation step commutes with the prefix because rotate is
    // per-row and the rank is a pure function of the id)
    val kCells = if (nCells > 0) nCells
      else Similarity.suggestCells(cleanVecs(df, vecCol, dim).count())
    val nOpq = if (sampleN > 0) sampleN
      else math.min(65536, math.max(4096, 64 * k))
    val nTl = math.min(262144, math.max(4096, 64 * kCells))
    val nPq = math.min(65536, math.max(4096, 64 * k))
    val shared = sharedTrainSample(df, idCol, vecCol, dim,
      math.max(nOpq, math.max(nTl, nPq)))
    try {
      val rot = trainOpq(shared, idCol, vecCol, dim, m, k, iters, opqIters,
        sampleN = nOpq).rotation
      val rotated = rotate(shared, idCol, vecCol, dim, rot)
      OpqResidualTwoLevelModel(rot,
        trainResidualTwoLevel(rotated, idCol, "__rv", dim, m, k, iters,
          kCells, cellIters, superProbe))
    } finally { shared.unpersist(); () }
  }

  /** The stored code relation of the composed index: rotate, then
    * [[encodeResidualTwoLevel]] — (c_id, cell, codes) in the rotated
    * domain. Appends are frozen-model encodes unioned on (the
    * assign-only rule; spec-proven ≡ batch rebuild). */
  def encodeOpqResidualTwoLevel(df: DataFrame, idCol: String,
                                vecCol: String, dim: Int,
                                model: OpqResidualTwoLevelModel,
                                superProbe: Int = 2): DataFrame =
    encodeResidualTwoLevel(rotate(df, idCol, vecCol, dim, model.rotation),
      idCol, "__rv", dim, model.inner, superProbe)

  /** Serve-frozen search of the composed index over a precomputed
    * (c_id, cell, codes) relation: queries rotate (one broadcast
    * row), then [[ivfAdcResidualTopKTwoLevelOverCodes]] runs in the
    * rotated domain. Output (q_id, rank, c_id, adc_dist). */
  def opqResidualTopKTwoLevelOverCodes(codes: DataFrame, queries: DataFrame,
                                       idCol: String, vecCol: String,
                                       dim: Int,
                                       model: OpqResidualTwoLevelModel,
                                       k: Int, nProbe: Int = 2,
                                       superProbe: Int = 2): DataFrame =
    ivfAdcResidualTopKTwoLevelOverCodes(codes,
      rotate(queries, idCol, vecCol, dim, model.rotation),
      idCol, "__rv", dim, model.inner, k, nProbe, superProbe)

  /** Fused build-and-search of the composed index (the self-kNN
    * convenience form; production serving goes through
    * [[encodeOpqResidualTwoLevel]] + [[opqResidualTopKTwoLevelOverCodes]]). */
  def opqResidualTopKTwoLevel(corpus: DataFrame, queries: DataFrame,
                              idCol: String, vecCol: String, dim: Int,
                              model: OpqResidualTwoLevelModel, k: Int,
                              nProbe: Int = 2,
                              superProbe: Int = 2): DataFrame = {
    val par = corpus.sparkSession.sparkContext.defaultParallelism
    opqResidualTopKTwoLevelOverCodes(
      encodeOpqResidualTwoLevel(corpus, idCol, vecCol, dim, model,
        superProbe).repartition(par),
      queries, idCol, vecCol, dim, model, k, nProbe, superProbe)
  }

  /** [[residualDriftReportTwoLevel]] in the rotated domain — the
    * composed index's retrain alarm: both sides rotate (broadcast
    * row, narrow otherwise), then the norm passes and the exact
    * basis-point report run unchanged against the inner model's
    * cells. */
  def opqResidualDriftReportTwoLevel(model: OpqResidualTwoLevelModel,
                                     baseline: DataFrame,
                                     appended: DataFrame, idCol: String,
                                     vecCol: String, dim: Int,
                                     superProbe: Int = 2,
                                     alarmBp: Long = 12500): DataFrame =
    residualDriftReportTwoLevel(model.inner,
      rotate(baseline, idCol, vecCol, dim, model.rotation),
      rotate(appended, idCol, vecCol, dim, model.rotation),
      idCol, "__rv", dim, superProbe, alarmBp)

  // ---- Retrain alarm: residual-magnitude drift -------------------------

  /** Assemble the one-row drift report from two per-vector
    * squared-residual-norm relations (each a single `__n2` BIGINT
    * column). All integer: msr = Σ‖r‖²_micro² div n (floor),
    * drift_bp = new_msr·10⁴ div base_msr. `retrain` trips when the
    * appended batch's mean squared residual exceeds `alarmBp` basis
    * points of the baseline's — the FAISS-folk retrain heuristic
    * (residuals growing ⇒ the frozen centroids no longer sit where
    * the data is ⇒ candidate lists degrade before recall visibly
    * does). NULL msr/drift (empty side or zero baseline) = no
    * evidence, retrain false — an empty probe must not page anyone. */
  private def driftReport(base: DataFrame, appended: DataFrame,
                          alarmBp: Long): DataFrame = {
    // Σ‖r‖² accumulates in DECIMAL(38,0): per-row norms reach ~10¹⁵
    // at micro magnitudes, so a BIGINT sum wraps past ~10⁴ rows —
    // an alarm that silently wraps at production corpus size is worse
    // than none. Decimal keeps the sum exact to ~10²³ rows; the
    // floor-division back to BIGINT msr is unchanged (and DuckDB's
    // HUGEINT sum replays it — the q181/q185 oracles).
    val b = base.agg(count(lit(1)).as("n_base"),
      sum(col("__n2").cast("decimal(38,0)")).as("__sb"))
    val a = appended.agg(count(lit(1)).as("n_new"),
      sum(col("__n2").cast("decimal(38,0)")).as("__sa"))
    b.crossJoin(a)
      .select(col("n_base"), col("n_new"),
        expr("__sb div n_base").as("base_msr"),
        expr("__sa div n_new").as("new_msr"),
        // the ×10⁴ widens in decimal as well: msr itself can sit at
        // ~10¹⁵ (high-norm corpora), where a BIGINT product overflows
        expr("case when n_base > 0 and n_new > 0 and __sb div n_base > 0 " +
          "then ((__sa div n_new) * cast(10000 as decimal(38,0))) " +
          "div (__sb div n_base) end")
          .as("drift_bp"))
      .withColumn("retrain",
        coalesce(col("drift_bp") > alarmBp, lit(false)))
  }

  /** Per-vector squared residual norm (micro² BIGINT) against the
    * FLAT cell model: the min over centroids of the exact integer
    * squared distance — assignment is argmin, so the min IS the
    * assigned cell's residual. One narrow literal-model pass. */
  private def residualNorms2(df: DataFrame, vecCol: String, dim: Int,
                             cells: KMeans.Model): DataFrame =
    cleanVecs(df, vecCol, dim)
      .select(array_min(transform(typedlit(cells.sortBy(_._1).map(_._2)),
        c => KMeans.sqDistMicro(KMeans.microVec(col(vecCol)), c)))
        .as("__n2"))

  /** Residual-magnitude drift of an appended vector batch vs a
    * baseline (normally: the corpus the index was trained on) under a
    * FROZEN flat residual index — the alarm that decides when
    * assign-only appends ([[encodeResidualTwoLevel]]'s flat twin is
    * [[ivfAdcResidualTopK]]'s internal encoding) have outlived the
    * frozen centroids. One row: (n_base, n_new, base_msr, new_msr,
    * drift_bp, retrain). Exact integers end to end (oracle-checked,
    * q181): norms sum in DECIMAL(38,0) — exact to ~10²³ rows per
    * side, no silent wrap at any corpus size (spec-pinned past 2⁶³)
    * — with the msr floor-division back in BIGINT. Probing a bounded
    * sample is still the right CALL at 100 TB (an alarm needs a
    * consistent estimate, not a corpus pass), but it is a cost
    * choice now, not a correctness requirement. */
  def residualDriftReport(model: ResidualModel, baseline: DataFrame,
                          appended: DataFrame, idCol: String,
                          vecCol: String, dim: Int,
                          alarmBp: Long = 12500): DataFrame =
    driftReport(
      residualNorms2(baseline, vecCol, dim, model.cells),
      residualNorms2(appended, vecCol, dim, model.cells), alarmBp)

  /** [[residualDriftReport]] for the two-level (no-K-literal) form:
    * norms come from the beam assignment + a broadcast join against
    * the sub-centroid relation — the q178 plan shape, integers end to
    * end. */
  def residualDriftReportTwoLevel(model: ResidualTwoLevelModel,
                                  baseline: DataFrame, appended: DataFrame,
                                  idCol: String, vecCol: String, dim: Int,
                                  superProbe: Int = 2,
                                  alarmBp: Long = 12500): DataFrame = {
    def norms(df: DataFrame): DataFrame = {
      val assign1 = Similarity.assignTwoLevelCells(df, idCol, vecCol,
          model.cells, nProbe = 1, superProbe = superProbe)
        .select(col("id").as(idCol), col("cell"))
      cleanVecs(df, vecCol, dim)
        .select(col(idCol), KMeans.microVec(col(vecCol)).as("__m"))
        .join(assign1, idCol)
        .join(broadcast(cellVecsOf(model.cells)), "cell")
        .select(KMeans.sqDistMicro(col("__m"), col("cvec")).as("__n2"))
    }
    driftReport(norms(baseline), norms(appended), alarmBp)
  }
}
