package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** [[SemanticIndex]] — incremental embedding-level dedup against a
  * persisted vector cell index. q214 proves engine parity (two full
  * cycles, exact cosine elections recomputed in SQL); this spec pins
  * what SQL replay cannot reach: the artifact round-trip (the index
  * really is persistable state, parameters travel with it), the scale
  * contract (history rows never shuffle at judge time), replay
  * idempotency, retraction semantics, NULL-vector handling, and the
  * streaming seat's cross-batch memory. */
class SemanticIndexSpec extends SparkSpec {
  import spark.implicits._

  private def v(a: Double, b: Double, c: Double, d: Double) =
    Seq(a, b, c, d)

  // three well-separated history directions
  private lazy val history = Seq(
    (100L, v(1, 0, 0, 0.1)),
    (101L, v(0, 1, 0, 0.1)),
    (102L, v(0, 0, 1, 0.1)))
    .toDF("vec_id", "embedding")

  // batch: copy of 100 (cross dup), near-copy of 100 (intra dup of 1
  // — both land in one primary cell), a fresh direction, a NULL
  private def batch = Seq(
    (1L, v(1, 0, 0, 0.1)),
    (2L, v(1.001, 0.0005, 0, 0.1)),
    (3L, v(0.5, -0.5, 0.7, 0)),
    (4L, null.asInstanceOf[Seq[Double]]))
    .toDF("vec_id", "embedding")

  test("ingestStep: intra election first, history judge second, NULL vectors carry no evidence; delta = surviving clean vectors only") {
    val (cent, assigned) = SemanticIndex.buildIndex(history, "vec_id",
      "embedding", nCells = 2)
    // nProbe = nCells: every pair is compared, so expectations are
    // independent of which two vectors the portable draw picked
    val (dups, delta) = SemanticIndex.ingestStep(batch, "vec_id",
      "embedding", cent, assigned, threshold = 0.9, nProbe = 2,
      maxCell = Int.MaxValue)
    val d = dups.select("dup_id", "keep_id").as[(Long, Long)]
      .collect().sortBy(_._1)
    d shouldBe Array((1L, 100L), (2L, 1L))
    delta.select("id").as[Long].collect() shouldBe Array(3L)
    // replay: the delta was appended, the SAME batch redelivers —
    // identical survivor set (same-id matches excluded), EMPTY delta
    val (dups2, delta2) = SemanticIndex.ingestStep(batch, "vec_id",
      "embedding", cent, assigned.unionByName(delta), threshold = 0.9,
      nProbe = 2, maxCell = Int.MaxValue)
    dups2.select("dup_id", "keep_id").as[(Long, Long)]
      .collect().sortBy(_._1) shouldBe d
    delta2.count() shouldBe 0L
  }

  test("artifacts: build → load carries parameters; append + compact preserve verdicts; retraction re-admits a retracted keeper's content; legacy reads bridge") {
    import graft.io.SemanticIndexArtifacts
    val dir = java.nio.file.Files.createTempDirectory("sem_idx").toString
    SemanticIndexArtifacts.build(s"$dir/idx", history, "vec_id",
      "embedding", nCells = 2, threshold = 0.9, nProbe = 2,
      maxCell = Int.MaxValue)
    val idx = SemanticIndexArtifacts.load(spark, s"$dir/idx")
    idx.threshold shouldBe 0.9
    idx.nProbe shouldBe 2
    val d1 = idx.dups(batch, "vec_id", "embedding")
      .select("dup_id", "keep_id").as[(Long, Long)].collect().sortBy(_._1)
    d1.map(_._1) shouldBe Array(1L, 2L)
    // ingest through the loaded index, append the delta, reload: the
    // batch's fresh vector is remembered — a re-embed of it now drops
    val (_, delta) = idx.ingest(batch, "vec_id", "embedding")
    SemanticIndexArtifacts.append(s"$dir/idx", delta)
    val idx2 = SemanticIndexArtifacts.load(spark, s"$dir/idx")
    idx2.dups(Seq((31L, v(0.5, -0.5, 0.7, 0))).toDF("vec_id", "embedding"),
        "vec_id", "embedding")
      .select("keep_id").as[Long].collect() shouldBe Array(3L)
    // RETRACT the id-100 keeper: its exact re-crawl now survives
    // (101/102 are far) — and enters the corpus under its new id
    SemanticIndexArtifacts.retract(s"$dir/idx", Seq(100L).toDF("id"))
    val idx3 = SemanticIndexArtifacts.load(spark, s"$dir/idx")
    idx3.dups(Seq((41L, v(1, 0, 0, 0.1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding").count() shouldBe 0L
    // compaction applies tombstones physically, drops the relation,
    // and preserves verdicts through the compacted copy
    SemanticIndexArtifacts.compact(spark, s"$dir/idx", s"$dir/idx2")
    java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$dir/idx2/tombstones")) shouldBe false
    val idxC = SemanticIndexArtifacts.load(spark, s"$dir/idx2")
    idxC.assigned.select("id").as[Long].collect().sorted shouldBe
      Array(3L, 101L, 102L)
    idxC.dups(Seq((41L, v(1, 0, 0, 0.1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding").count() shouldBe 0L
    idxC.dups(Seq((42L, v(0, 1, 0, 0.1))).toDF("vec_id", "embedding"),
      "vec_id", "embedding").select("keep_id").as[Long]
      .collect() shouldBe Array(101L)
  }

  test("scale contract: history assigned rows never enter an exchange at judge time — batch assignments broadcast, history streams map-side") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    import graft.io.SemanticIndexArtifacts
    val dir = java.nio.file.Files.createTempDirectory("sem_plan").toString
    SemanticIndexArtifacts.build(s"$dir/sem_index", history, "vec_id",
      "embedding", nCells = 2, threshold = 0.9, nProbe = 2,
      maxCell = 1000)
    spark.catalog.clearCache()
    val idx = SemanticIndexArtifacts.load(spark, s"$dir/sem_index")
    val dups = idx.dups(batch, "vec_id", "embedding")
    dups.select("dup_id").as[Long].collect().sorted shouldBe
      Array(1L, 2L)
    val plan = dups.queryExecution.executedPlan
    // every shuffle whose subtree reads the index scan must carry only
    // batch-bounded DERIVED relations (the cell census partials, the
    // election partials) — never the raw `vec` payload or `id` rows
    val histShuffles = plan.collect { case s: ShuffleExchangeExec => s }
      .filter(_.collectLeaves().exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.mkString(",").contains("sem_index")
        case _ => false
      })
    histShuffles.foreach { s =>
      val cols = s.output.map(_.name).toSet
      assert(!cols.contains("vec") && !cols.contains("id"),
        s"history index rows shuffled: $cols")
    }
    plan.toString should include ("BroadcastHashJoin")
    // the occupancy report obeys the same rule: its census streams
    // the index map-side — only (cell, count) partials may shuffle
    val rPlan = idx.occupancyReport(batch, "vec_id", "embedding")
      .queryExecution.executedPlan
    rPlan.collect { case s: ShuffleExchangeExec => s }
      .filter(_.collectLeaves().exists {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.mkString(",").contains("sem_index")
        case _ => false
      })
      .foreach { s =>
        val cols = s.output.map(_.name).toSet
        assert(!cols.contains("vec") && !cols.contains("id"),
          s"history rows shuffled in the occupancy census: $cols")
      }
    spark.catalog.clearCache()
  }

  test("runSemanticIngest through the FULL IngestSinks wiring: versioned root, cross-batch memory via the appended delta, compaction after every batch") {
    implicit val ctx = spark.sqlContext
    import graft.pipelines.IngestSinks
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("sem_stream").toString
    IngestSinks.initSemanticIndex(spark, s"$root/idx", history, "vec_id",
      "embedding", nCells = 2, threshold = 0.9, nProbe = 2,
      maxCell = Int.MaxValue)
    val in = MemoryStream[(Long, Seq[Double])]
    val vecs = in.toDF().toDF("vec_id", "embedding")
    val q = graft.pipelines.StreamingIngestPipeline.runSemanticIngest(
        vecs, IngestSinks.semanticIndex(spark, s"$root/idx"),
        "vec_id", "embedding")(
        IngestSinks.semanticSink(spark, s"$root/corpus", s"$root/idx",
          compactEvery = 1))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sem_ckpt").toString)
      .start()
    try {
      in.addData((1L, v(1, 0, 0, 0.1)),      // history dup → drops
        (3L, v(0.5, -0.5, 0.7, 0)))          // fresh → survives + delta
      q.processAllAvailable()
      // batch 1 compacted v0 → v1 (v0 retained for a reader)
      IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
        s"$root/idx/v1"
      in.addData((11L, v(0.5001, -0.5, 0.7, 0)), // re-embed of batch-1's
                                             // survivor: only the delta,
                                             // THROUGH the compacted
                                             // copy, can catch it
        (12L, v(0, 0, 0, 1.0)))              // fresh → survives
      q.processAllAvailable()
    } finally q.stop()
    spark.read.parquet(s"$root/corpus").select("vec_id").as[Long]
      .collect().sorted shouldBe Array(3L, 12L)
    // the live index: 3 seeds + the two admitted vectors
    graft.io.SemanticIndexArtifacts.load(spark,
        IngestSinks.currentIndexPath(spark, s"$root/idx"))
      .assigned.count() shouldBe 5L
  }

  test("assignCellsTopK ≡ assignCellsWindow: identical (id, cell, prb) on real embeddings — the bounded-heap aggregate replaces the window without a verdict change") {
    val vecs = graft.Tables.embeddings(spark, sfDir)
      .select(col("vec_id").cast("long").as("id"),
        col("embedding").cast("array<double>").as("vec"))
    val (cent, _) = SemanticIndex.buildIndex(
      vecs.select(col("id"), col("vec")), "id", "vec", nCells = 16)
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select("id", "cell", "prb").as[(Long, Long, Int)]
        .collect().sorted.toSeq
    val w = norm(SemanticIndex.assignCellsWindow(vecs, cent, nProbe = 3))
    val t = norm(SemanticIndex.assignCellsTopK(vecs, cent, nProbe = 3))
    w should not be empty
    t shouldBe w
  }

  test("cell-occupancy alarm + re-cell: capped_bp is exact, the alarm keys on maxCell, and recellSemanticIndex republishes a √n-cell index that still judges") {
    import graft.pipelines.IngestSinks
    // 120 vectors in THREE well-separated crowds, indexed into ONE
    // cell with maxCell = 100: occupancy 120 > 100, so EVERY probe
    // lands capped — the alarm's fire side is exact (10000 bp), not
    // statistical
    val hist = (0 until 120).map { i =>
      def ax(c: Int) = if (i % 3 == c) 1.0 else 0.0
      (i.toLong, Seq(ax(0), ax(1), ax(2), 0.001 * (i / 3)))
    }.toDF("vec_id", "embedding")
    val root = java.nio.file.Files.createTempDirectory("sem_recell").toString
    IngestSinks.initSemanticIndex(spark, s"$root/idx", hist, "vec_id",
      "embedding", nCells = 1, threshold = 0.9, nProbe = 1, maxCell = 100)
    val idx0 = graft.io.SemanticIndexArtifacts.load(spark,
      IngestSinks.currentIndexPath(spark, s"$root/idx"))
    val batch = hist.select((col("vec_id") + 90000L).as("vec_id"),
      transform(col("embedding"), x => x + lit(1e-4)).as("embedding"))
    val fired = idx0.occupancyReport(batch, "vec_id", "embedding")
      .collect().head
    (fired.getAs[Long]("n_probes"), fired.getAs[Long]("n_probed_cells"),
      fired.getAs[Long]("n_capped_cells"),
      fired.getAs[Long]("capped_probes"),
      fired.getAs[Long]("capped_bp"),
      fired.getAs[Boolean]("recell")) shouldBe
      ((120L, 1L, 1L, 120L, 10000L, true))
    // the same occupancy under a guard with headroom: quiet — the
    // alarm keys on maxCell, not on absolute size
    SemanticIndex.cellOccupancyReport(batch, "vec_id", "embedding",
        idx0.centroids, idx0.assigned, nProbe = 1, maxCell = 4096)
      .collect().head.getAs[Boolean]("recell") shouldBe false
    // re-cell at auto √n: v1 published via the pointer swap with
    // ⌈√120⌉ = 11 fresh portable-draw cells; params travel unchanged
    IngestSinks.recellSemanticIndex(spark, s"$root/idx")
    IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
      s"$root/idx/v1"
    val idx1 = graft.io.SemanticIndexArtifacts.load(spark,
      s"$root/idx/v1")
    idx1.centroids.count() shouldBe 11L
    idx1.assigned.count() shouldBe 120L
    (idx1.threshold, idx1.nProbe, idx1.maxCell) shouldBe ((0.9, 1, 100))
    // the alarm is quiet at the re-derived sizing (mean occupancy
    // ≈ 11 per cell against the same guard)
    idx1.occupancyReport(batch, "vec_id", "embedding")
      .collect().head.getAs[Boolean]("recell") shouldBe false
    // and the recelled index still JUDGES: an exact copy of history
    // vector 7 lands in 7's cell and drops
    idx1.dups(hist.filter(col("vec_id") === 7L)
        .select(lit(7777L).as("vec_id"), col("embedding")),
      "vec_id", "embedding").count() shouldBe 1L
  }

  test("semanticSinkAutoRecell: the alarm wired into the sink cadence — an over-capped index re-cells itself mid-stream, fresh vectors still land") {
    implicit val ctx = spark.sqlContext
    import graft.pipelines.{IngestSinks, StreamingIngestPipeline}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the alarm fixture: 120 vectors in ONE cell, guard 100 —
    // over-capped from the first batch
    val hist = (0 until 120).map { i =>
      def ax(c: Int) = if (i % 3 == c) 1.0 else 0.0
      (i.toLong, Seq(ax(0), ax(1), ax(2), 0.001 * (i / 3)))
    }.toDF("vec_id", "embedding")
    val root = java.nio.file.Files
      .createTempDirectory("sem_autorecell").toString
    IngestSinks.initSemanticIndex(spark, s"$root/idx", hist, "vec_id",
      "embedding", nCells = 1, threshold = 0.9, nProbe = 1, maxCell = 100)
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingIngestPipeline.runSemanticIngest(
        in.toDF().toDF("vec_id", "embedding"),
        IngestSinks.semanticIndex(spark, s"$root/idx"),
        "vec_id", "embedding")(
        IngestSinks.semanticSinkAutoRecell(spark, s"$root/corpus",
          s"$root/idx", "vec_id", "embedding", recellCheckEvery = 1))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sem_ar_ck").toString)
      .start()
    try {
      in.addData((5000L, v(0.5, -0.5, 0.5, 0)),
        (5001L, v(-0.5, 0.5, 0.5, 0)))
      q.processAllAvailable()
    } finally q.stop()
    // the batch appended, the check fired, the re-cell published v1
    IngestSinks.currentIndexPath(spark, s"$root/idx") shouldBe
      s"$root/idx/v1"
    val idx1 = graft.io.SemanticIndexArtifacts.load(spark, s"$root/idx/v1")
    idx1.assigned.count() shouldBe 122L
    idx1.centroids.count() shouldBe
      math.ceil(math.sqrt(122.0)).toLong
    // and the alarm is quiet on the re-celled index
    idx1.occupancyReport(hist, "vec_id", "embedding")
      .collect().head.getAs[Boolean]("recell") shouldBe false
  }

  test("build maxCell=0 auto-derives the guard: ⌈4·n/nCells⌉ floored at 64") {
    val hist = (0 until 120).map { i =>
      def ax(c: Int) = if (i % 3 == c) 1.0 else 0.0
      (i.toLong, Seq(ax(0), ax(1), ax(2), 0.001 * (i / 3)))
    }.toDF("vec_id", "embedding")
    val d = java.nio.file.Files
      .createTempDirectory("sem_autoguard").toString
    graft.io.SemanticIndexArtifacts.build(s"$d/a", hist, "vec_id",
      "embedding", nCells = 2, threshold = 0.9, nProbe = 1, maxCell = 0)
    graft.io.SemanticIndexArtifacts.load(spark, s"$d/a")
      .maxCell shouldBe 240 // 4 × 120/2
    graft.io.SemanticIndexArtifacts.build(s"$d/b",
      hist.filter(col("vec_id") < 6), "vec_id", "embedding",
      nCells = 2, threshold = 0.9, nProbe = 1, maxCell = 0)
    graft.io.SemanticIndexArtifacts.load(spark, s"$d/b")
      .maxCell shouldBe 64 // 4 × 6/2 = 12 → floor 64
  }

  test("runSemanticIngestAudited funnel: the one-row report reconciles by construction, including no-evidence rows and redelivered (already-present) ids") {
    implicit val ctx = spark.sqlContext
    import graft.pipelines.{IngestSinks, StreamingIngestPipeline}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files.createTempDirectory("sem_funnel").toString
    IngestSinks.initSemanticIndex(spark, s"$root/idx", history, "vec_id",
      "embedding", nCells = 2, threshold = 0.9, nProbe = 2,
      maxCell = Int.MaxValue)
    val sink = IngestSinks.semanticSink(spark, s"$root/corpus",
      s"$root/idx")
    val funnels = scala.collection.mutable.ListBuffer[
      org.apache.spark.sql.Row]()
    val in = MemoryStream[(Long, Seq[Double])]
    val q = StreamingIngestPipeline.runSemanticIngestAudited(
        in.toDF().toDF("vec_id", "embedding"),
        IngestSinks.semanticIndex(spark, s"$root/idx"),
        "vec_id", "embedding") { b =>
        funnels += b.funnel().collect().head
        sink(b.survivors, b.delta, b.batchId)
      }
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("sem_funnel_ck").toString)
      .start()
    try {
      // batch 1: cross dup (1), intra dup (2, keeper 1), fresh (3),
      // NULL (4 — no evidence)
      in.addData((1L, v(1, 0, 0, 0.1)), (2L, v(1.001, 0.0005, 0, 0.1)),
        (3L, v(0.5, -0.5, 0.7, 0)),
        (4L, null.asInstanceOf[Seq[Double]]))
      q.processAllAvailable()
      // batch 2: the SAME rows re-presented (redelivery) — 3 is now
      // already present in the index, its delta append suppressed
      in.addData((1L, v(1, 0, 0, 0.1)), (2L, v(1.001, 0.0005, 0, 0.1)),
        (3L, v(0.5, -0.5, 0.7, 0)),
        (4L, null.asInstanceOf[Seq[Double]]))
      q.processAllAvailable()
    } finally q.stop()
    funnels should have size 2
    funnels.foreach { r =>
      // the documented identities — reconciliation by construction
      r.getAs[Long]("vectors_in") - r.getAs[Long]("dup_drops") shouldBe
        r.getAs[Long]("survivors")
      r.getAs[Long]("survivors") - r.getAs[Long]("no_evidence") shouldBe
        r.getAs[Long]("delta_rows") + r.getAs[Long]("already_present")
    }
    val b1 = funnels.head
    (b1.getAs[Long]("vectors_in"), b1.getAs[Long]("no_evidence"),
      b1.getAs[Long]("dup_drops"), b1.getAs[Long]("survivors"),
      b1.getAs[Long]("delta_rows"), b1.getAs[Long]("already_present")) shouldBe
      ((4L, 1L, 2L, 2L, 1L, 0L))
    val b2 = funnels(1)
    (b2.getAs[Long]("vectors_in"), b2.getAs[Long]("no_evidence"),
      b2.getAs[Long]("dup_drops"), b2.getAs[Long]("survivors"),
      b2.getAs[Long]("delta_rows"), b2.getAs[Long]("already_present")) shouldBe
      ((4L, 1L, 2L, 2L, 0L, 1L))
  }
}
