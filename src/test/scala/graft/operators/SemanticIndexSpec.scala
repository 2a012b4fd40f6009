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
}
