package graft.io

import graft.SparkSpec
import graft.operators.{UnigramTokenizer, Vocabulary}
import org.apache.spark.sql.functions._

/** [[TokenizerArtifacts]] — saved artifacts must drive the frozen
  * appliers to BYTE-IDENTICAL encodings vs the in-memory originals,
  * including the <unk> rows for never-seen symbols/words: the whole
  * point of persisting is that a later job encodes exactly what the
  * training job would have. */
class TokenizerArtifactsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = graft.Tables.documents(spark, sfDir)
    .select(col("doc_id"), col("text")).limit(60)
  // a later crawl: known text plus an out-of-alphabet word
  private lazy val crawl = docs
    .union(Seq((9999993L, "the zx data")).toDF("doc_id", "text"))

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("BPE: saved merges+vocab encode byte-identically to in-memory; rank order survives") {
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString + "/tok"
    val mergesDf = Vocabulary.bpeMerges(docs, "text", 10)
    val vocabDf = Vocabulary.bpeVocab(docs, "text", 10)
    TokenizerArtifacts.saveBpe(dir, mergesDf, vocabDf)

    val memMerges = mergesDf.orderBy(col("rank"))
      .collect().map(r => (r.getString(1), r.getString(2))).toSeq
    val loadedMerges = TokenizerArtifacts.loadBpeMerges(spark, dir)
    loadedMerges shouldBe memMerges

    val mem = Vocabulary.bpeEncodeWith(crawl, "doc_id", "text",
      memMerges, vocabDf)
    val loaded = Vocabulary.bpeEncodeWith(crawl, "doc_id", "text",
      loadedMerges, TokenizerArtifacts.loadBpeVocab(spark, dir))
    rowsOf(loaded) shouldBe rowsOf(mem)
    // the out-of-alphabet word still segments, with NULL symbol ids
    loaded.filter(col("doc_id") === 9999993L && col("sub_id").isNull)
      .count() should be > 0L
  }

  test("BpeModel: saved merges+vocab+segments serve the cached frozen apply byte-identically") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("bpem").toString + "/tok"
    val model = Vocabulary.bpeLearnAll(docs, "text", 10)
    TokenizerArtifacts.saveBpeModel(dir, model)
    val loaded = TokenizerArtifacts.loadBpeModel(spark, dir)
    loaded.merges shouldBe model.merges
    // a later crawl with a novel word: the loaded model's cached
    // segments serve known words, the fold path handles "zx", and the
    // whole thing matches the in-memory model row for row
    val crawl = docs.select(col("doc_id"), col("text"))
      .union(Seq((9999994L, "the zx data")).toDF("doc_id", "text"))
    rowsOf(Vocabulary.bpeEncodeWithModel(crawl, "doc_id", "text", loaded)) shouldBe
      rowsOf(Vocabulary.bpeEncodeWithModel(crawl, "doc_id", "text", model))
    // a pruned merge table must not load as a valid tokenizer
    val pruned = spark.read.parquet(s"$dir/merges")
      .filter(col("rank") =!= 3)
    val bad = java.nio.file.Files.createTempDirectory("bpembad").toString + "/tok"
    ParquetSink(s"$bad/merges", coalesceTo = Some(1)).write(pruned)
    ParquetSink(s"$bad/vocab", coalesceTo = Some(1)).write(model.vocab)
    ParquetSink(s"$bad/segments").write(model.segments)
    an[IllegalArgumentException] should be thrownBy
      TokenizerArtifacts.loadBpeModel(spark, bad)
  }

  test("unigram: saved piece table encodes byte-identically; unspellable words keep the <unk> row") {
    val dir = java.nio.file.Files.createTempDirectory("uni").toString + "/tok"
    val vocabDf = UnigramTokenizer.seedVocab(docs, "text",
      vocabSize = 80, maxPieceLen = 4)
    TokenizerArtifacts.saveUnigram(dir, vocabDf)
    val loadedVocab = TokenizerArtifacts.loadUnigram(spark, dir)

    // the artifact round-trips exactly (piece weights and micro
    // log-probs are integers — no representation drift possible)
    rowsOf(loadedVocab) shouldBe rowsOf(vocabDf)

    val mem = UnigramTokenizer.encodeWith(crawl, "doc_id", "text",
      vocabDf, maxPieceLen = 4)
    val loaded = UnigramTokenizer.encodeWith(crawl, "doc_id", "text",
      loadedVocab, maxPieceLen = 4)
    rowsOf(loaded) shouldBe rowsOf(mem)
    loaded.filter(col("piece_id").isNull).count() should be > 0L
  }
}
