package graft.queries

import graft.SparkSpec

/** Physical-plan audits for the headline queries: the properties that
  * make the 100 TB plan right — predicate pushdown into the parquet
  * scan, column pruning, dimension broadcast, map-side partial
  * aggregation, top-k without a global sort — asserted so a regression
  * in plan shape fails CI even while results stay correct.
  */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.queryExecution.executedPlan.toString
  }

  test("q02: filters push into the parquet scan; schema pruned to used columns") {
    val plan = planOf("q02_filter_project")
    assert(plan.contains("PushedFilters: [IsNotNull(event_type), IsNotNull(value)"), plan)
    assert(plan.contains("EqualTo(event_type,purchase)"), plan)
    assert(plan.contains("GreaterThan(value,50.0)"), plan)
    // full events schema is 6 columns; the scan must not read props/ts
    assert(!plan.contains("props"), "props column not pruned:\n" + plan)
  }

  test("q01: aggregation is partial+final hash agg (map-side combine)") {
    val plan = planOf("q01_pricing_summary")
    assert("HashAggregate".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_"), plan)
  }

  test("q04: dimension joins broadcast; no dimension shuffles") {
    val plan = planOf("q04_join_inner_revenue")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
  }

  test("q25: datamart broadcasts nation/region, single user-key shuffle for pivot") {
    val plan = planOf("q25_datamart")
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    // the pivot compiles to one hash aggregation, not one scan per value
    assert("HashAggregate".r.findAllIn(plan).size <= 4, plan)
  }

  test("q09: global top-k is TakeOrderedAndProject, never a full sort") {
    val plan = planOf("q09_topk_global")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q31: brute-force knn broadcasts the query side (no corpus shuffle)") {
    val plan = planOf("q31_knn_bruteforce")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q78: repetition stats are map-only — no exchange before the oracle sort") {
    val plan = planOf("q78_repetition")
    // exactly ONE exchange: the rangepartitioning for the final ORDER BY
    // (oracle determinism); the stats themselves never shuffle
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
    assert(plan.contains("rangepartitioning") || !plan.contains("Exchange"), plan)
  }

  test("q79: quantized knn broadcasts queries and ranks via the object-hash top-k aggregate") {
    val plan = planOf("q79_ann_quantized")
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("top_k_pairs"), plan)
    // the hoisted quantization max must survive optimization as its own
    // projection column — re-inlined it makes quantization O(dim²)
    assert(plan.contains("__mx"), plan)
  }

  test("q28: LSH bucket aggregation is the single-shuffle bounded collect") {
    val plan = planOf("q28_dedup_minhash")
    assert(plan.contains("bounded_collect"), plan)
    assert(plan.contains("ObjectHashAggregate"), plan)
  }

  test("q60: nation-blocked fuzzy match plans as a hash equi-join, not nested-loop") {
    val plan = planOf("q60_fuzzy_name_pairs")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q58: corpus size N joins as a broadcast, not a driver collect") {
    val plan = planOf("q58_tfidf")
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"), plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("q83: bloom dedup joins are all broadcast — the index is never shuffled") {
    val plan = planOf("q83_bloom_dedup")
    // both the confirm semi-join and the final anti join build on the
    // (tiny) broadcast side; a SortMergeJoin would mean the historical
    // index got dragged through an exchange
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q84: shuffle positions rank inside hash-partitioned buckets; offsets broadcast back") {
    val plan = planOf("q84_corpus_shuffle")
    // the per-bucket window runs under hashpartitioning(__b) — 4096-way
    // parallel — and the cumulative offsets come back as a broadcast
    assert(plan.contains("hashpartitioning(__b"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // exactly one SinglePartition exchange: the 4096-row offsets window
    assert("Exchange SinglePartition".r.findAllIn(plan).size <= 1, plan)
  }

  test("q85: n-gram leak join broadcasts the eval grams; train side never shuffles pre-join") {
    val plan = planOf("q85_ngram_leaks")
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q86: semantic dedup broadcasts centroids and anti-joins the dropped set") {
    val plan = planOf("q86_semantic_dedup")
    // centroid assignment = broadcast nested-loop cross join; the
    // within-cell pair join and the left_anti stay hash joins
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("LeftAnti"), plan)
  }

  test("q94: trim fences broadcast; the corpus is filtered, never shuffled on data") {
    val plan = planOf("q94_length_trim")
    // fence table joins back as a broadcast hash join — the only
    // exchanges are the group-cardinality fence aggregate and the
    // final ORDER BY, both tiny; the corpus side stays narrow
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q93: LM total is a broadcast scalar, not a driver round-trip") {
    val plan = planOf("q93_unigram_lm")
    // the 1-row corpus-total relation enters as BroadcastNestedLoopJoin
    // (cross of 1 row); token-keyed joins stay hash joins
    assert(plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q97: DSIR top-k is TakeOrderedAndProject, never a full sort") {
    val plan = planOf("q97_dsir_select")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("q103: line winners aggregate map-side (partial min) on the line key; doc rebuild joins back") {
    val plan = planOf("q103_line_dedup")
    // each partition emits at most one (line → min (id,pos)) candidate
    // before the shuffle — the property that bounds the line shuffle at
    // ~|distinct lines| rows
    assert(plan.contains("partial_min"), plan)
    assert(plan.contains("partial_count"), plan)
  }

  test("q104: BM25 top-k is TakeOrderedAndProject with map-side partial sums") {
    val plan = planOf("q104_bm25_topk")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(plan.contains("partial_sum"), plan)
    // corpus stats and idf relations enter as broadcasts, never a
    // corpus-sized sort-merge join
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q106: epoch positions rank inside hash-partitioned buckets (q84's two-phase shape)") {
    val plan = planOf("q106_epoch_mix")
    assert(plan.contains("hashpartitioning(__b"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
    // exactly one SinglePartition exchange: the 4096-row offsets window
    assert("Exchange SinglePartition".r.findAllIn(plan).size <= 1, plan)
  }

  test("q110: triangle joins aggregate map-side; no cartesian beyond the documented knn broadcast") {
    val plan = planOf("q110_triangle_count")
    // degree count and per-node triangle count both combine map-side
    assert(plan.contains("partial_count"), plan)
    // the only nested-loop allowed is bruteForceTopK's broadcast of the
    // (small, documented) query side; the triangle machinery itself
    // must stay in hash joins — a CartesianProduct would mean the
    // orientation/wedge algebra regressed to all-pairs
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q111: intra-doc dedup operator is shuffle-free up to the result-edge sort") {
    // the catalog query ends in an orderBy for the oracle; the operator
    // itself (everything below the sort) must contain NO exchange —
    // asserted here on the un-sorted form
    val lined = graft.Tables.documents(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    val plan = graft.operators.LineDedup.intraDoc(lined, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("q117: weighted sample is a narrow projection into TakeOrderedAndProject — zero shuffles") {
    val plan = planOf("q117_weighted_sample")
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Exchange"), plan)
    // the w > 0 guard reaches the parquet scan; text is never read
    assert(plan.contains("GreaterThan(n_chars,0)"), plan)
    assert(!plan.contains("text"), "text column not pruned:\n" + plan)
  }

  test("q118: native session_window merges sessions after ONE user-key shuffle") {
    val plan = planOf("q118_session_native")
    assert(plan.contains("MergingSessions"), plan)
    // partial count before the shuffle (map-side combine)
    assert(plan.contains("partial_count"), plan)
    // one hashpartitioning for the session merge + one rangepartitioning
    // for the oracle ORDER BY — nothing else
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("q120: per-group sample pushes a map-side WindowGroupLimit heap before the shuffle") {
    val plan = planOf("q120_group_sample")
    // Spark's WindowGroupLimit rule recognizes row_number <= k and runs
    // a partial per-partition top-k on the map side — the grouped
    // analogue of TakeOrderedAndProject. Both phases must be present.
    assert(plan.contains("WindowGroupLimit"), plan)
    assert(plan.contains("Partial"), plan)
    // one hashpartitioning for the group window + one rangepartitioning
    // for the oracle ORDER BY
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("q122: hard-negative mining — one centroid broadcast, cell-shuffle candidates, heap top-k") {
    val plan = planOf("q122_hard_negatives")
    // the ONLY nested-loop is vecs × broadcast(8 centroids) inside
    // ivfCells; candidate pairs must come from the cell equi-join —
    // a CartesianProduct would mean mining regressed to all-pairs.
    // (The persisted cells relation prints once per self-join side, so
    // the one physical broadcast appears ≤ 2× in the plan text.)
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnl >= 1 && bnl <= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // per-anchor ranking via the bounded-heap aggregate (map-side
    // partial top-k), not a window over every scored pair
    assert(plan.contains("ObjectHashAggregate"), plan)
    assert(plan.contains("top_k_pairs"), plan)
  }

  private def executedPlanOf(name: String): String = {
    // AQE finalizes joins (e.g. the per-doc best relation's broadcast)
    // only on execution — run first, then read the final plan. The
    // executed string appends the "== Initial Plan ==" section too;
    // slice it off so node counts reflect what actually ran.
    val df = graft.SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    val full = df.queryExecution.executedPlan.toString
    full.split("== Initial Plan ==")(0)
  }

  test("q129: profile joins broadcast, scoring is partial+final agg, no cartesian") {
    val plan = executedPlanOf("q129_lang_profile")
    // two broadcasts: the 1280-row profile into the gram stream, and
    // the per-doc best relation back onto the doc ids
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("partial_sum"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("q130: census is a partial-aggregatable groupBy, NO window over the shingle hash") {
    val plan = executedPlanOf("q130_repeated_spans")
    // a Window.partitionBy(h) cannot map-side combine, so one corpus-hot
    // boilerplate shingle would serialize through a single task — the
    // census must be a two-level hash aggregate instead
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      plan)
    // covered-position sets join back to docs as a broadcast, and
    // nothing plans a cartesian
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q138: split pack walks a streamed sorted iterator — no window, no group materialization") {
    val plan = executedPlanOf("q138_pack_split_pieces")
    // the walk must be mapPartitions over a sortWithinPartitions
    // iterator (constant state), not a window or a grouped
    // materialization; piece derivation is a narrow explode
    assert(plan.contains("MapPartitions"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("Sort"), plan)
  }

  test("trained IVF assignment is a pure narrow map: zero exchanges, no joins") {
    // not a catalog query (kmeans centroids aren't oracle-replayed at
    // nProbe>1) — audit the operator directly: after fit, assigning
    // the corpus to literal centroids must add NO shuffle and NO join
    // of any kind (the hashed path's crossJoin row widening is exactly
    // what this variant removes)
    val e = graft.Tables.embeddings(spark, sfDir)
    val cells = graft.operators.Similarity
      .ivfCellsTrained(e, "vec_id", "embedding", nCells = 8, nProbe = 2,
        iters = 1)
    val plan = cells.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("q80: source-quota rank pushes a map-side WindowGroupLimit heap (mega-source skew bound)") {
    // round-7 window audit: q80 is the one remaining window over a
    // potentially corpus-hot key (a mega-source). It stays safe ONLY
    // because rk <= 5 triggers WindowGroupLimit, which caps each map
    // partition's contribution to 5 rows per source BEFORE the
    // shuffle — pin the optimization so a refactor that breaks the
    // pushdown (e.g. ranking without the literal filter) fails here
    // instead of at 100 TB
    val plan = executedPlanOf("q80_source_quota")
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("q134: bigram LM joins are one-row-per-key hash joins, partial aggs, no cartesian") {
    val plan = executedPlanOf("q134_bigram_lm")
    assert(plan.contains("partial_sum") || plan.contains("partial_count"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the ONLY nested-loop is the unigram LM's 1-row n_total scalar
    // broadcast (UnigramLm.lmFromCounts) — a corpus-sized one would
    // mean an LM join regressed from its equi-key form
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
  }

  test("q135: semantic decontamination pairs via cell equi-join, never all-pairs") {
    val plan = executedPlanOf("q135_semantic_decontaminate")
    // the ONLY nested-loop is vecs × broadcast(8 centroids) inside
    // ivfCells (the persisted cell relation prints once per self-join
    // side → ≤ 2 occurrences); candidates must come from the cell
    // equi-join, and a CartesianProduct would mean the detector
    // regressed to all-pairs across the corpora
    val bnl = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnl >= 1 && bnl <= 2, plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("PQ encode is a pure narrow map: zero exchanges, no joins") {
    // the pass that shrinks a 10^10-vector index 32-fold must never
    // shuffle the corpus — codebooks are literals in the projection
    val e = graft.Tables.embeddings(spark, sfDir)
    val model = graft.operators.ProductQuant.train(e, "vec_id",
      "embedding", dim = 64, m = 2, k = 4, iters = 1)
    val plan = graft.operators.ProductQuant
      .encode(e, "vec_id", "embedding", dim = 64, model)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q142: ADC streams codes against broadcast query LUTs into a heap top-k") {
    val plan = executedPlanOf("q142_ann_pq_adc")
    // exactly the bruteForceTopK shape, but the streamed side is the
    // code relation (m ints/row, not dim floats): one nested loop
    // against the broadcast 20-query LUT set, bounded-heap top-k, no
    // window rank, no cartesian
    assert("BroadcastNestedLoopJoin".r.findAllIn(plan).size <= 1, plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("top_k_pairs"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q143: IVF-PQ candidates come from a cell equi-join, never corpus×queries") {
    val plan = executedPlanOf("q143_ann_ivf_pq")
    // IVF pruning means NO nested-loop/cartesian anywhere: probed
    // cells meet the corpus assignment in a broadcast HASH join, ADC
    // scoring joins code rows by id, and the top-k is the bounded heap
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("top_k_pairs"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q168: two-level IVF-PQ carries NO K-sized literal — only the √K super model") {
    // the property that lets IVFADC scale past ~10^3-10^4 cells: at
    // nCells=64 the flat trained quantizer would plant a 64-entry
    // centroid array in the plan; the two-level path's largest array
    // literal must be the ceil(√64)=8-entry super model (plus the
    // 64-float vectors themselves). Checked on the ANALYZED plan's
    // actual Literal nodes, not the (truncating) plan string.
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.ArrayType
    def maxOuterArrayLit(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case p =>
        p.expressions.flatMap(_.collect {
          // outer = array-of-array literals (centroid MODELS); plain
          // numeric arrays (single vectors, weight combs) don't count
          case l: CatLit if l.dataType.isInstanceOf[ArrayType] &&
            l.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[ArrayType] =>
            l.value.asInstanceOf[ArrayData].numElements()
        })
      }.flatten.foldLeft(0)(math.max)
    val e = graft.Tables.embeddings(spark, sfDir)
    val model = graft.operators.ProductQuant.train(e, "vec_id",
      "embedding", dim = 64, m = 2, k = 4, iters = 1)
    val twoLevel = graft.operators.ProductQuant.ivfAdcTopKTwoLevel(
      e, e.filter(org.apache.spark.sql.functions.col("vec_id") <= 5),
      "vec_id", "embedding", dim = 64, model, k = 3, nCells = 64,
      nProbe = 2, superProbe = 2, ivfIters = 1)
    // largest model literal: max(super model 8, PQ codebook k=4) = 8
    maxOuterArrayLit(twoLevel) should be <= 8
    // contrast: the flat trained quantizer DOES plant a 64-entry model
    val flat = graft.operators.Similarity.ivfCellsTrained(
      e, "vec_id", "embedding", nCells = 64, nProbe = 2, iters = 1)
    maxOuterArrayLit(flat) should be >= 64
    // and the candidate/scoring tail keeps the q143 shape
    val plan = twoLevel.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("top_k_pairs"), plan)
    // the residual ∘ two-level composition (q178) holds the same bound:
    // residuals come from a broadcast JOIN on the cell id, never an
    // element_at over a K-sized literal
    val rtl = graft.operators.ProductQuant.trainResidualTwoLevel(
      e, "vec_id", "embedding", dim = 64, m = 2, k = 4, iters = 1,
      nCells = 64, cellIters = 1)
    val rPlan = graft.operators.ProductQuant.ivfAdcResidualTopKTwoLevel(
      e, e.filter(org.apache.spark.sql.functions.col("vec_id") <= 5),
      "vec_id", "embedding", dim = 64, rtl, k = 3)
    maxOuterArrayLit(rPlan) should be <= 8
  }

  test("q182: the OPQ rotation rides as a broadcast relation, never a dim² plan literal") {
    // a dim=64 rotation as a typedlit is a 64-outer-entry (4096-long)
    // literal in EVERY rotated plan — the K-sized-literal blowup class
    // this spec polices elsewhere, and at dim 10³ a 10⁶-entry
    // expression tree; the rotation must ride as a one-row broadcast
    // relation, leaving the PQ codebooks (k=4) as the largest model
    // literal in the whole rotated search plan
    import org.apache.spark.sql.catalyst.expressions.{Literal => CatLit}
    import org.apache.spark.sql.catalyst.util.ArrayData
    import org.apache.spark.sql.types.ArrayType
    def maxOuterArrayLit(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case p =>
        p.expressions.flatMap(_.collect {
          case l: CatLit if l.dataType.isInstanceOf[ArrayType] &&
            l.dataType.asInstanceOf[ArrayType].elementType.isInstanceOf[ArrayType] =>
            l.value.asInstanceOf[ArrayData].numElements()
        })
      }.flatten.foldLeft(0)(math.max)
    val e = graft.Tables.embeddings(spark, sfDir)
    val rotated = graft.operators.ProductQuant.rotate(e, "vec_id",
      "embedding", 64, graft.operators.ProductQuant.identityRotation(64))
    maxOuterArrayLit(rotated) shouldBe 0
    // the full q182 search (rotate both sides + codebook ADC) holds
    // the bound end to end
    maxOuterArrayLit(
      graft.SparkEntry.queries("q182_ann_opq_rotated")(spark, sfDir)
    ) should be <= 8
  }

  test("q146: seed vocab aggregates map-side and takes the top slice without a global sort") {
    val plan = executedPlanOf("q146_unigram_vocab")
    // candidate weights partial-aggregate before the piece shuffle;
    // the multi-char slice is TakeOrderedAndProject, never a full
    // sort + limit; the corpus total joins back as a broadcast scalar
    assert(plan.contains("partial_"), plan)
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q147: Viterbi DP is one HOF pass per word — no per-position shuffle, no window") {
    val plan = executedPlanOf("q147_unigram_segments")
    // the piece vocabulary and word relation meet in broadcast hash
    // joins; the DP itself is a lambda fold inside a projection — if a
    // Window or cartesian ever appears here the operator regressed to
    // a per-position plan
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 2, plan)
    assert(plan.contains("aggregate(sequence(1, length("), plan)
  }

  test("q186: URL canonicalization is map-only — no join, no exchange before the oracle sort") {
    val plan = executedPlanOf("q186_url_canonicalize")
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
  }

  test("q187: canonical dedup is ONE key shuffle — keeper min-agg partial-combines, no window, no cartesian") {
    val plan = executedPlanOf("q187_url_canonical_dedup")
    // keeper election must be a partial+final hash agg on the
    // canonical key (map-side combine), never a per-key window or a
    // nested-loop pairing
    assert(plan.contains("partial_min"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("q191: script mix partial-aggregates before the group shuffle — one pass, no join") {
    val plan = executedPlanOf("q191_script_mix")
    // the per-character explode must reduce map-side (conditional
    // sums) before anything shuffles; corpus-sized rows cross the
    // wire only as per-group partials
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("Join"), plan)
    assert("Exchange".r.findAllIn(plan).size <= 2, plan)
  }

  test("q148: C4 cleaning is map-only — no exchange before the oracle sort") {
    val plan = executedPlanOf("q148_c4_clean")
    assert("Exchange".r.findAllIn(plan).size <= 1, plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q150: no per-group ntile window — ranks come from (group, band) sub-windows") {
    val plan = executedPlanOf("q150_perplexity_buckets")
    // the bucket must be arithmetic on the banded rank, never an
    // ntile whose group partition would serialize a hot source
    assert(!plan.contains("ntile"), plan)
    // every corpus-sized window partitions by (group, band), not
    // group alone; the only group-partitioned window runs on the
    // (groups × bands)-sized offset relation
    assert(plan.contains("__band"), plan)
    assert(plan.contains("row_number"), plan)
  }

  test("q154: SFT spans are one conversation-key aggregate — no window, no join") {
    val plan = executedPlanOf("q154_sft_mask_spans")
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Join"), plan)
    // conv-key aggregation partials map-side before the one shuffle
    assert(plan.contains("partial_"), plan)
  }

  test("q157/q159: objective prep is map-only — no exchange before the oracle sort") {
    Seq("q157_span_corrupt", "q159_prefix_split").foreach { q =>
      val plan = executedPlanOf(q)
      assert("Exchange".r.findAllIn(plan).size <= 1, s"$q:\n$plan")
      assert(!plan.contains("Join"), s"$q:\n$plan")
    }
  }

  test("q158: preference pairs are one partial-aggregated groupBy — no window") {
    val plan = executedPlanOf("q158_preference_pairs")
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("partial_"), plan)
    assert(!plan.contains("Join"), plan)
  }

  test("q173: HTML extraction is map-only — no exchange before the oracle sort") {
    // the crawl-to-text stage must fuse into the feeding scan: pure
    // regexp/HOF projection, zero shuffles at 100 TB
    val plan = planOf("q173_html_extract")
    val preSort = plan.split("Sort ").last
    assert(!preSort.contains("Exchange") ||
      plan.indexOf("Exchange") > plan.indexOf("Sort"), plan)
    assert(!plan.contains("BatchEvalPython") && !plan.contains("SQL UDF"), plan)
  }

  test("q176: blocklist gate is all HASH joins; the corpus never shuffles pre-join") {
    val plan = planOf("q176_url_blocklist")
    // equi joins only: exploded suffix = blocked domain probes a hash
    // table (O(labels) per host), never a nested-loop scan of the
    // whole broadcast blocklist per corpus row
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // the corpus side reads straight from the scan into the anti join —
    // the only SHUFFLE exchanges are the distinct-hosts aggregate (one
    // narrow string column, partial-agg'd map-side) and the final
    // oracle orderBy; broadcast exchanges are not shuffles
    assert("Exchange (hash|range)partitioning".r
      .findAllIn(plan.split("== Initial")(0)).size <= 2, plan)
  }

  test("q180: archive scan is one aggregate shuffle + a narrow record pass — no join at all") {
    val plan = planOf("q180_warc_extract")
    assert(!plan.contains("Join"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    // archive assembly is the single partial-agg'd groupBy; the record
    // scanner and extraction are narrow; the tail exchange is the
    // oracle sort
    assert("Exchange (hash|range)partitioning".r
      .findAllIn(plan.split("== Initial")(0)).size <= 2, plan)
    assert(plan.contains("MapPartitions"), plan)
  }

  test("q177: residual IVF-PQ — corpus scanned ONCE into codes, cell-key hash join, heap top-k") {
    val plan = planOf("q177_ann_ivf_pq_residual")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("top_k_pairs"), plan)
    assert(!plan.contains("Window"), plan)
    // the fused corpus pass: exactly one embeddings scan feeds the
    // code relation (cell + residual + codes in one projection); the
    // query side adds its own scans, so total scans stay bounded
    val scans = "FileScan parquet".r.findAllIn(plan.split("== Initial")(0)).size
    assert(scans <= 3, s"expected <= 3 corpus scans, got $scans\n" + plan)
  }

  test("q195: perceptual near-dup — payloads never shuffle, band joins are hash equi, no window") {
    val plan = planOf("q195_image_phash_neardup")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    // payload bytes stay inside the narrow decode pass: below the
    // (deepest) mapPartitions kernel there is no exchange — the
    // payload column dies inside the kernel and everything shuffled
    // afterwards is (id, hash/band)-sized
    assert(plan.contains("MapPartitions"), plan)
    assert(!plan.split("MapPartitions").last.contains("Exchange"), plan)
  }

  test("q198: dual-hash near-dup — same audit surface as q195, 8-band joins stay hash equi") {
    val plan = planOf("q198_image_dual_hash_neardup")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("MapPartitions"), plan)
    assert(!plan.split("MapPartitions").last.contains("Exchange"), plan)
  }

  test("q199: perceptual media gate — payloads reach the decode kernel unshuffled, election is semi/anti equi-joins") {
    val plan = planOf("q199_media_doc_gate_perceptual")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    // the one decode pass: payload bytes die inside the mapPartitions
    // kernel with no exchange between it and its scan (the q195 .last
    // check would cross into the SIBLING election branches that
    // legitimately shuffle fingerprint-sized rows after this one)
    assert(plan.contains("MapPartitions"), plan)
    val kernelInput = plan.split("MapPartitions").last
      .split("FileScan").head
    assert(!kernelInput.contains("Exchange"), plan)
  }

  test("q200: video near-dup — frame decode is narrow, pair joins are hash equi, no window") {
    val plan = planOf("q200_video_neardup")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(plan.contains("MapPartitions"), plan)
    assert(!plan.split("MapPartitions").last.contains("Exchange"), plan)
  }

  test("q204: incremental media dedup — no cartesian, batch broadcasts, history joins are broadcast-equi") {
    val plan = planOf("q204_media_incremental_dedup")
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("Window"), plan)
    // every history-vs-batch match is a broadcast equi-join (the batch
    // side broadcasts; MediaIndexSpec pins the stronger history-scan-
    // never-shuffles property on a parquet-backed index)
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(plan.contains("MapPartitions"), plan)
  }

  test("q206: incremental text judge — batch side broadcasts, no cartesian, no window, no sort-merge join") {
    // the FULL executed string, not the sliced one: q206's plan embeds
    // cached InMemoryRelations (the persisted shingle sets) whose
    // stored plan strings carry their own "== Initial Plan ==" marker,
    // and slicing at the first marker truncates the outer plan.
    // Presence counts are still valid (≥) and absence checks stricter.
    val df = graft.SparkEntry.queries("q206_text_incremental_dedup")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // every probe against the history index is a broadcast equi-join
    // (TextIndexSpec pins the stronger history-rows-never-shuffle
    // property on a parquet-backed index); the census and keeper
    // election aggregate map-side
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 3, plan)
    assert(plan.contains("partial_count") || plan.contains("partial_min"),
      plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(!plan.contains("Window"), plan)
  }

  test("q207: WARC media leg is scan → narrow strip/sniff — no join, no payload shuffle") {
    val plan = executedPlanOf("q207_warc_media_extract")
    // one aggregate shuffle assembles the fixture archives; after the
    // scanner everything is narrow projection/filter — media payloads
    // route by body bytes without a join or a second exchange
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("MapPartitions"), plan)
    // exchanges: fixture archive assembly (hash) + oracle sort (range)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }

  test("q209: routed split is ONE scan subtree — no join, one strip/sniff pass, payloads never shuffle") {
    val plan = executedPlanOf("q209_warc_routed_split")
    // the whole point of the shared splitter: BOTH legs come off one
    // scanner pass — exactly one record-splitting MapPartitions chain
    // (scanner + the strip/sniff router), no join gluing legs back
    // together, and no exchange beyond the fixture archive assembly
    assert(!plan.contains("Join"), plan)
    assert(plan.contains("MapPartitions"), plan)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1, plan)
  }

  test("q212 flagship step: text-index history never shuffles raw rows through the FULL archiveIngestStep (media gate on); no cartesian, no BNLJ") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.multimodal.{MediaIndex, Multimodal, PerceptualHash}
    def img(g: Long) = PerceptualHash.renderGrayImage(16, 16, g * 7,
      g % 5 + 1, g % 11 + 1, g % 3, 0, "png")
    // routed-relation shape directly (the scanner's own one-pass plan
    // is the q209 pin); pinned as the step requires
    val routed = Seq(
      (1L, "doc", "https://p.example/a", """<html><body><p>an original
        field report on tidal measurements collected along the northern
        shore over three weeks with one new chart</p>
        <img src="/m/x.png"></body></html>""", null: Array[Byte]),
      (2L, "doc", "https://p.example/b", """<html><body><p>plain prose
        about the history of the lighthouse keepers and the long
        winters they spent maintaining the lamp</p></body></html>""",
        null: Array[Byte]),
      (3L, "image", "https://p.example/m/x.png", null: String, img(21)))
      .toDF("rec_id", "kind", "url", "text", "payload")
      .withColumn("mtime", lit("2026-01-02 03:04:05").cast("timestamp"))
      .localCheckpoint(true)
    val dir = java.nio.file.Files.createTempDirectory("plan_q212")
    val (hb, hs) = graft.operators.TextIndex.buildIndex(
      Seq((100L, "completely unrelated archival seed material about " +
        "ancient trade routes crossing the mountain passes in winter"))
        .toDF("doc_id", "text"), "doc_id", "text")
    hb.write.parquet(s"$dir/text_index_bands")
    hs.write.parquet(s"$dir/text_index_sets")
    MediaIndex.mediaHashIndex(Seq(
      Multimodal.Media(900L, "image", img(4))).toDS())
      .write.parquet(s"$dir/media_index")
    spark.catalog.clearCache()
    val out = graft.pipelines.StreamingIngestPipeline.archiveIngestStep(
      routed,
      spark.read.parquet(s"$dir/text_index_bands"),
      spark.read.parquet(s"$dir/text_index_sets"),
      spark.read.parquet(s"$dir/media_index"),
      extractHtml = true, mediaGate = true, mediaMaxBucket = 64)
    out.docs.select("url").as[String].collect().sorted shouldBe
      Array("https://p.example/a", "https://p.example/b")
    val plan = out.docs.queryExecution.executedPlan
    // the q206 scale contract holds through the WHOLE step: every
    // shuffle whose subtree reads the text index carries only derived
    // batch-bounded relations, never raw `doc`/`shs` rows
    val histShuffles = plan.collect { case s: ShuffleExchangeExec => s }
      .filter(_.collectLeaves().exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.mkString(",")
            .contains("text_index")
        case _ => false
      })
    histShuffles.foreach { s =>
      val cols = s.output.map(_.name).toSet
      assert(!cols.contains("doc") && !cols.contains("shs"),
        s"history index rows shuffled: $cols")
    }
    val ps = plan.toString
    assert(!ps.contains("CartesianProduct"), ps.take(4000))
    assert(!ps.contains("BroadcastNestedLoopJoin"), ps.take(4000))
    spark.catalog.clearCache()
  }

  test("whole-stage codegen active in scalar-heavy queries") {
    // AQE finalizes the physical plan only on execution — run first,
    // then read the final plan. WSCG stages print as `*(n)` prefixes.
    // (Known, accepted: the text-stats projection itself sits OUTSIDE
    // codegen — higher-order functions (filter/aggregate lambdas) don't
    // participate in WSCG; the scan→ColumnarToRow and sort stages do.)
    val df = graft.SparkEntry.queries("q33_text_stats")(spark, sfDir)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1)"), plan)
  }
}
