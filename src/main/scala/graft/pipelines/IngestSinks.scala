package graft.pipelines

import graft.io.{MediaIndexArtifacts, TextIndexArtifacts}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** WORKED production sinks for the streaming ingest pipelines — the
  * pipeline scaladocs ([[StreamingIngestPipeline.runWithTextIndexGate]],
  * [[StreamingIngestPipeline.runMediaIngestIndexed]],
  * [[StreamingIngestPipeline.runArchiveIngest]]) each ask their sink
  * for three disciplines: a batchId-IDEMPOTENT corpus append, an index
  * delta append to the path the index function re-reads, and periodic
  * compaction. The specs wire those by hand; this object is the
  * copy-paste-safe implementation, so every production loop gets the
  * redelivery guarantees the ingest steps were designed around instead
  * of re-inventing (and mis-inventing) the sink.
  *
  * Index layout: a VERSIONED root — `<root>/v<N>/…` artifact
  * directories with `<root>/CURRENT` (a one-line text file) naming the
  * live version. Appends go to the current version; compaction writes
  * `v<batchId+1>` at full integrity beside the live index, then swaps
  * the pointer and deletes the old version. The pointer swap is the
  * only non-atomic step (create temp + delete + rename — HDFS rename
  * refuses to overwrite); it is safe here because foreachBatch
  * SERIALIZES the only reader with the only writer: the pointer is
  * re-read at the next batch, never concurrently with the swap. A
  * multi-reader deployment (other jobs loading the index while ingest
  * runs) should front the root with its catalog's pointer mechanism
  * (a Hive table location swap, an Iceberg snapshot) instead.
  *
  * Redelivery walkthrough (the contract the pieces add up to): a
  * failed-and-replayed batch re-runs the ingest step, whose verdicts
  * and survivors replay IDENTICALLY and whose delta appends nothing
  * (the TextIndex/MediaIndex ingestStep contracts); the corpus append
  * OVERWRITES its own `batch_id=<id>` partition rather than
  * duplicating; a replayed compaction rewrites the same `v<N>`
  * deterministically. Every interleaving of partial failure therefore
  * converges to the same corpus and the same index. Retractions
  * ([[TextIndexArtifacts.retract]] on the CURRENT version path) are
  * honored immediately — the per-batch index reads go through `load`,
  * which filters tombstones — and are applied physically at the next
  * compaction. */
object IngestSinks {

  /** batchId-idempotent corpus append: each batch writes (overwrites)
    * its own `batch_id=<id>` partition directory, so redelivery
    * REPLACES rather than duplicates. Read the corpus back with
    * `spark.read.parquet(corpusPath)` — partition discovery surfaces
    * `batch_id` as a column (lineage for free). */
  def appendCorpusIdempotent(df: DataFrame, corpusPath: String,
                             batchId: Long): Unit =
    df.write.mode("overwrite").parquet(s"$corpusPath/batch_id=$batchId")

  private def hfs(spark: SparkSession, path: String) = {
    val p = new org.apache.hadoop.fs.Path(path)
    (p.getFileSystem(spark.sessionState.newHadoopConf()), p)
  }

  /** The live index version's full path (`<root>/v<N>` per CURRENT). */
  def currentIndexPath(spark: SparkSession, indexRoot: String): String = {
    val (fs, p) = hfs(spark, s"$indexRoot/CURRENT")
    val in = fs.open(p)
    val v = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
    s"$indexRoot/$v"
  }

  private def setCurrent(spark: SparkSession, indexRoot: String,
                         version: String): Unit = {
    val (fs, tmp) = hfs(spark, s"$indexRoot/CURRENT.tmp")
    val cur = new org.apache.hadoop.fs.Path(s"$indexRoot/CURRENT")
    val out = fs.create(tmp, true)
    try out.write(version.getBytes("UTF-8")) finally out.close()
    fs.delete(cur, false)
    fs.rename(tmp, cur); ()
  }

  /** Initialize a versioned TEXT index root: build `v0` over `corpus`
    * (possibly empty — a cold-start crawl) and point CURRENT at it. */
  def initTextIndex(spark: SparkSession, indexRoot: String,
                    corpus: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 3, numHashes: Int = 128,
                    bands: Int = 32, seed: Long = 42L,
                    threshold: Double = 0.8, maxBucket: Int = 1000): Unit = {
    TextIndexArtifacts.build(s"$indexRoot/v0", corpus, idCol, textCol,
      shingleN, numHashes, bands, seed, threshold, maxBucket)
    setCurrent(spark, indexRoot, "v0")
  }

  /** Initialize a versioned MEDIA index root (the text twin). */
  def initMediaIndex(spark: SparkSession, indexRoot: String,
                     corpus: org.apache.spark.sql.Dataset[graft.multimodal.Multimodal.Media],
                     imageMaxDist: Int = 6, audioMaxDist: Int = 3,
                     videoMaxDist: Int = 3, videoMinOverlapBp: Int = 6000,
                     maxBucket: Int = 1024): Unit = {
    MediaIndexArtifacts.build(s"$indexRoot/v0", corpus, imageMaxDist,
      audioMaxDist, videoMaxDist, videoMinOverlapBp, maxBucket)
    setCurrent(spark, indexRoot, "v0")
  }

  /** The per-batch TEXT index reader — pass as the pipelines'
    * `textIndex` function. Goes through [[TextIndexArtifacts.load]]
    * so tombstones are filtered and the version pointer is re-read
    * every batch (appends AND compactions become visible). */
  def textIndex(spark: SparkSession,
                indexRoot: String): () => (DataFrame, DataFrame) = () => {
    val idx = TextIndexArtifacts.load(spark,
      currentIndexPath(spark, indexRoot))
    (idx.bands, idx.sets)
  }

  /** The per-batch MEDIA index reader (the text twin). */
  def mediaIndex(spark: SparkSession, indexRoot: String): () => DataFrame =
    () => MediaIndexArtifacts.load(spark,
      currentIndexPath(spark, indexRoot)).index

  /** The documented TEXT sink
    * ([[StreamingIngestPipeline.runWithTextIndexGate]]'s shape):
    * idempotent corpus append, delta append to the current version,
    * and — every `compactEvery` DATA batches (0 = never) — compaction
    * to `v<batchId+1>` with the pointer swap and old-version cleanup.
    *
    * Empty batches are SKIPPED outright: Structured Streaming fires
    * NO-DATA batches to advance watermarks (the upstream pipeline has
    * a watermarked dedup stage), and a sink keyed on raw batchId
    * would litter the corpus with empty partitions and compact an
    * unchanged index on idle ticks. An empty survivor frame implies
    * an empty delta (survivors ⊆ batch), so skipping loses nothing.
    * The compaction cadence therefore counts data batches in the
    * sink closure — after a restart the count restarts too, shifting
    * WHEN a compaction runs by at most `compactEvery` batches, which
    * is harmless: compaction is layout + tombstone application and
    * never changes verdicts. */
  def textSink(spark: SparkSession, corpusPath: String, indexRoot: String,
               compactEvery: Int = 0)
      : (DataFrame, (DataFrame, DataFrame), Long) => Unit = {
    val dataBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    (batch, delta, id) =>
      if (!batch.isEmpty) {
        appendCorpusIdempotent(batch, corpusPath, id)
        val cur = currentIndexPath(spark, indexRoot)
        TextIndexArtifacts.append(cur, delta)
        if (compactEvery > 0 &&
            dataBatches.incrementAndGet() % compactEvery == 0) {
          val next = s"v${id + 1}"
          TextIndexArtifacts.compact(spark, cur, s"$indexRoot/$next")
          setCurrent(spark, indexRoot, next)
          val (fs, old) = hfs(spark, cur)
          fs.delete(old, true); ()
        }
      }
  }

  /** The documented ARCHIVE sink
    * ([[StreamingIngestPipeline.runArchiveIngest]]'s shape): the
    * [[textSink]] and [[mediaSink]] disciplines applied to the two
    * legs of one routed batch — doc survivors + text-index delta to
    * the text root, media survivors + media-index delta to the media
    * root, each leg skipping when its side of the batch is empty.
    * Wire the pipeline's index functions to the same roots
    * ([[textIndex]]/[[mediaIndex]]) and the continuous-crawl loop is
    * closed: archives in, both corpora and both indexes growing, all
    * four appends redelivery-safe. */
  def archiveSink(spark: SparkSession, docCorpusPath: String,
                  mediaCorpusPath: String, textRoot: String,
                  mediaRoot: String, compactEvery: Int = 0)
      : StreamingIngestPipeline.ArchiveIngestBatch => Unit = {
    val tSink = textSink(spark, docCorpusPath, textRoot, compactEvery)
    val mSink = mediaSink(spark, mediaCorpusPath, mediaRoot, compactEvery)
    b => {
      tSink(b.docs, b.textDelta, b.batchId)
      mSink(b.media, b.mediaDelta, b.batchId)
    }
  }

  /** The documented MEDIA sink
    * ([[StreamingIngestPipeline.runMediaIngestIndexed]]'s shape; the
    * [[textSink]] empty-batch and cadence rules). */
  def mediaSink(spark: SparkSession, corpusPath: String, indexRoot: String,
                compactEvery: Int = 0): (DataFrame, DataFrame, Long) => Unit = {
    val dataBatches = new java.util.concurrent.atomic.AtomicLong(0L)
    (batch, delta, id) =>
      if (!batch.isEmpty) {
        appendCorpusIdempotent(batch, corpusPath, id)
        val cur = currentIndexPath(spark, indexRoot)
        MediaIndexArtifacts.append(cur, delta)
        if (compactEvery > 0 &&
            dataBatches.incrementAndGet() % compactEvery == 0) {
          val next = s"v${id + 1}"
          MediaIndexArtifacts.compact(spark, cur, s"$indexRoot/$next")
          setCurrent(spark, indexRoot, next)
          val (fs, old) = hfs(spark, cur)
          fs.delete(old, true); ()
        }
      }
  }
}
