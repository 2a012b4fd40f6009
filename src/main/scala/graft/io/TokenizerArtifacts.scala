package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Tokenizer artifact persistence — the missing half of the two frozen
  * lifecycles: [[graft.operators.Vocabulary.bpeEncodeWith]] and
  * [[graft.operators.UnigramTokenizer.encodeWith]] take in-memory
  * artifacts, which forces every job that wants frozen encoding to
  * re-learn the tokenizer in-plan (q153 collects the merge list inside
  * the query). These writers snapshot the learned artifacts to parquet
  * once, and the loaders hand back EXACTLY the applier inputs — so
  * training runs in one job, and every later batch/streaming job
  * encodes under the identical vocabulary with no learning cost.
  *
  * Layout (one directory per tokenizer):
  *   BPE      — `<path>/merges`  (rank, lhs, rhs, pair_count)
  *              `<path>/vocab`   (subword, sub_id)
  *   unigram  — `<path>/pieces`  (piece, weight, lp_micro)
  *
  * Artifacts are MODEL-sized (merge lists ~10⁴ rows, piece tables
  * ≤ vocabSize), so each snapshot coalesces to a single file and the
  * merge-list load is a bounded driver collect — the same O(artifact)
  * round-trip the appliers already broadcast. Byte-identical
  * encodings from saved vs in-memory artifacts are spec-proven
  * (TokenizerArtifactsSpec). */
object TokenizerArtifacts {

  /** Snapshot a learned BPE tokenizer: `merges` =
    * [[graft.operators.Vocabulary.bpeMerges]] output, `vocab` =
    * [[graft.operators.Vocabulary.bpeVocab]] output. */
  def saveBpe(path: String, merges: DataFrame, vocab: DataFrame): Unit = {
    ParquetSink(s"$path/merges", coalesceTo = Some(1)).write(merges)
    ParquetSink(s"$path/vocab", coalesceTo = Some(1)).write(vocab)
  }

  /** Snapshot a full [[graft.operators.Vocabulary.BpeModel]] —
    * [[saveBpe]] plus the learned word→symbols SEGMENTATION table, so
    * a production frozen tokenizer neither re-learns nor re-folds
    * words the training corpus already segmented
    * (`Vocabulary.bpeEncodeWithModel` reads it directly; only novel
    * words pay folds). The segments relation is vocabulary-sized
    * (Heaps' law ≪ corpus — the same class the appliers already
    * broadcast) but can outgrow "one coalesced file" at web scale, so
    * it writes with the source partitioning and loads LAZY (no driver
    * collect). */
  def saveBpeModel(path: String,
                   model: graft.operators.Vocabulary.BpeModel): Unit = {
    val spark = model.vocab.sparkSession
    import spark.implicits._
    ParquetSink(s"$path/merges", coalesceTo = Some(1)).write(
      model.merges.toDF("rank", "lhs", "rhs", "pair_count"))
    ParquetSink(s"$path/vocab", coalesceTo = Some(1)).write(model.vocab)
    ParquetSink(s"$path/segments").write(model.segments)
  }

  def loadBpeModel(spark: SparkSession,
                   path: String): graft.operators.Vocabulary.BpeModel = {
    val merges = spark.read.parquet(s"$path/merges")
      .orderBy(col("rank")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    require(merges.map(_._1) == (1 to merges.size),
      s"loaded merge ranks must be contiguous 1..n, got ${merges.map(_._1)}")
    graft.operators.Vocabulary.BpeModel(merges,
      spark.read.parquet(s"$path/vocab")
        .select(col("subword"), col("sub_id")),
      spark.read.parquet(s"$path/segments")
        .select(col("word"), col("syms")))
  }

  /** The ordered merge list, ready for `bpeEncodeWith` /
    * `bpeSegmentsWith`. Rank order IS the algorithm — merges must
    * fold in learning order — so the load re-sorts explicitly rather
    * than trusting file layout. */
  def loadBpeMerges(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(s"$path/merges")
      .orderBy(col("rank"))
      .select(col("lhs"), col("rhs"))
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** The (subword, sub_id) alphabet relation for `bpeEncodeWith`. */
  def loadBpeVocab(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/vocab").select(col("subword"), col("sub_id"))

  /** Snapshot a unigram-LM piece table:
    * [[graft.operators.UnigramTokenizer.seedVocab]] /
    * `emReweight` output (piece, weight, lp_micro). */
  def saveUnigram(path: String, vocab: DataFrame): Unit =
    ParquetSink(s"$path/pieces", coalesceTo = Some(1)).write(vocab)

  /** The piece table for `encodeWith` / `coverage`. */
  def loadUnigram(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/pieces")
      .select(col("piece"), col("weight"), col("lp_micro"))
}
