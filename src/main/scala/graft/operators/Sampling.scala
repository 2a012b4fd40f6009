package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dataset sampling and splitting for training pipelines.
  *
  * [[hashSplit]] beats `randomSplit` for corpus work: membership is a
  * pure function of the row's ID, so splits are stable across runs,
  * cluster sizes, and re-partitioning — re-ingesting a grown corpus
  * keeps every old document in its old split (no eval contamination).
  * `randomSplit` re-draws membership whenever partitioning changes.
  *
  * [[stratified]] is `sampleBy`-shaped but hash-deterministic for the
  * same reason. All operators are narrow (no shuffle).
  */
object Sampling {

  /** Assign each row to a named split by hashing its id: buckets are
    * ten-thousandths of the hash space, weights are normalized.
    * Returns the frame with a `split` column. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Double)], seed: Long = 42L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0))
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .sliding(2).toSeq.zip(splits).map { case (Seq(lo, hi), (name, _)) =>
        (name, (lo * 10000).toLong, (hi * 10000).toLong)
      }
    val bucket = pmod(xxhash64(col(idCol), lit(seed)), lit(10000L))
    val splitCol = bounds.tail.foldLeft(
      when(bucket < bounds.head._3, bounds.head._1)) {
      case (acc, (name, _, hi)) => acc.when(bucket < hi, name)
    }.otherwise(bounds.last._1) // hash == upper edge rounding guard
    df.withColumn("split", splitCol)
  }

  /** Leakage-free split: assign whole NEAR-DUP CLUSTERS to splits, so
    * no split ever holds a near-duplicate of another split's document
    * — the failure [[hashSplit]] cannot prevent (two near-identical
    * docs have unrelated ids, ~20% of pairs straddle a 80/10/10 row
    * split; an eval set contaminated by train near-dups overstates
    * every benchmark it feeds). `pairs` is any near-dup pair relation
    * (`id_a`, `id_b` — minhashPairs, winnowing matches, semantic
    * dedup…); docs in no pair form singleton clusters. The bucket is
    * the PORTABLE md5 hash of the cluster label (not xxhash64): the
    * split of a cluster is reproducible by any engine, which is what
    * makes the assignment auditable downstream.
    *
    * Output: input columns + (cluster — the min doc id of the
    * cluster, split: string). Same-cluster rows get the same split BY
    * CONSTRUCTION (the bucket is a function of the cluster alone).
    *
    * 100 TB design: connected components is the bounded iterative
    * min-label propagation ([[Dedup.connectedComponents]]); the
    * label relation joined back is node-sized; the split decision is
    * a narrow expression. Nothing here scales with pair count beyond
    * the CC rounds themselves.
    */
  def clusterSafeSplit(docs: DataFrame, idCol: String, pairs: DataFrame,
                       splits: Seq[(String, Double)],
                       seed: Long = 42L): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0))
    val total = splits.map(_._2).sum
    val bounds = splits.scanLeft(0.0) { case (acc, (_, w)) => acc + w / total }
      .sliding(2).toSeq.zip(splits).map { case (Seq(lo, hi), (name, _)) =>
        (name, (lo * 10000).toLong, (hi * 10000).toLong)
      }
    val clustered = Dedup.connectedComponents(pairs)
      .withColumnRenamed("doc", idCol)
    val bucket = pmod(Dedup.portableTokenHash(
      concat(lit(s"split${seed}_"), col("cluster").cast("string"))),
      lit(10000L))
    val splitCol = bounds.tail.foldLeft(
      when(bucket < bounds.head._3, bounds.head._1)) {
      case (acc, (name, _, hi)) => acc.when(bucket < hi, name)
    }.otherwise(bounds.last._1)
    docs
      .join(clustered, Seq(idCol), "left")
      .withColumn("cluster", coalesce(col("cluster"), col(idCol)))
      .withColumn("split", splitCol)
  }

  /** The ONE definition of the deterministic shuffle key shared by
    * [[deterministicShuffle]], [[curriculumOrder]], and
    * [[tokenBudgetSelect]]: adds `__ord` (md5 of seed_id — the global
    * random order) and `__b` (first 3 hex chars as an int — a 4096-way
    * bucket that is a PREFIX of `__ord`, so (bucket, ord) order ≡ ord
    * order). CurationOpsSpec asserts the operators' orders agree;
    * this helper is what makes the agreement structural. */
  private def withShuffleKey(df: DataFrame, idCol: String,
                             seed: Long): DataFrame =
    df.withColumn("__ord",
        md5(concat_ws("_", lit(seed.toString), col(idCol).cast("string"))))
      .withColumn("__b", conv(substring(col("__ord"), 1, 3), 16, 10).cast("int"))

  /** Deterministic global shuffle for training-order randomization:
    * every row gets an exact position 1..n in the order of
    * `(md5(seed || '_' || id), id)` — a pure function of the row, so
    * the epoch order is reproducible across runs, engines, cluster
    * sizes, and repartitioning (randomSplit/orderBy(rand()) are none
    * of these).
    *
    * Positions are assigned by TWO-PHASE ranking, never a global
    * window: rows are bucketed by the first 3 hex chars of the order
    * key (4096 buckets; the bucket is a PREFIX of the sort key, so
    * (bucket, key) order ≡ key order), ranked within their bucket, and
    * offset by the cumulative counts of the buckets before them. The
    * per-bucket ranking is a 4096-way parallel window; the offsets are
    * a 4096-row aggregate — broadcast back, with its own (tiny) window
    * run on one partition, the distributed-zipWithIndex-by-sort-key
    * pattern. A single global row_number() window would drag all
    * 100 TB through ONE task.
    *
    * `idCol` must be UNIQUE (it is the row's identity): rows sharing
    * an id share a sort key, so their positions within that block are
    * arbitrary — determinism is only as strong as the key. (Enforcing
    * uniqueness here would cost a full extra shuffle; dedup first if
    * in doubt.) NULL ids all hash identically and are likewise only
    * block-deterministic. */
  def deterministicShuffle(df: DataFrame, idCol: String,
                           seed: Long = 42L): DataFrame = {
    val keyed = withShuffleKey(df, idCol, seed)
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__ord"), col(idCol))
    val ranked = keyed.withColumn("__rk", row_number().over(wB))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("__b")).agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    ranked.join(broadcast(offsets), "__b")
      .withColumn("pos", col("__off") + col("__rk"))
      .drop("__ord", "__b", "__rk", "__off")
  }

  /** Curriculum ordering: a deterministic global training order that is
    * BIN-MAJOR (e.g. quality deciles ascending, so the highest-quality
    * data lands at the end of the epoch — the standard annealing-phase
    * layout) and uniformly shuffled WITHIN each bin (no accidental
    * correlation between intra-bin position and any attribute). Output:
    * input columns + `pos` (1-based global position).
    *
    * Same two-phase machinery as [[deterministicShuffle]], with the
    * bucket extended to (bin, hash-prefix): per-(bin, prefix) windows
    * rank in parallel, and the offset relation — #bins × 4096 rows,
    * still tiny — is broadcast back. (bin, prefix) is a PREFIX of the
    * full sort key (bin, md5, id), so block order ≡ global order; no
    * one-task global window at any scale. `binCol` must be of an
    * ordered type (int bin index, zero-padded label); rows with NULL
    * bin sort first (Spark/SQL NULLS FIRST ascending default). */
  def curriculumOrder(df: DataFrame, idCol: String, binCol: String,
                      seed: Long = 42L): DataFrame = {
    val keyed = withShuffleKey(df, idCol, seed)
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col(binCol), col("__b")).orderBy(col("__ord"), col(idCol))
    val ranked = keyed.withColumn("__rk", row_number().over(wB))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col(binCol).asc_nulls_first, col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col(binCol), col("__b"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off", coalesce(sum(col("__c")).over(wOff), lit(0L)))
      .select(col(binCol).as("__obin"), col("__b").as("__ob"), col("__off"))
    // null-safe bin match: a NULL bin is a legitimate (first) bin and
    // must not be silently dropped by a plain equi-join
    ranked.join(broadcast(offsets),
        col(binCol) <=> col("__obin") && col("__b") === col("__ob"))
      .withColumn("pos", col("__off") + col("__rk"))
      .drop("__ord", "__b", "__rk", "__off", "__obin", "__ob")
  }

  /** Token-budget corpus cut: take an unbiased, deterministic prefix of
    * the corpus whose total `nTokensCol` stays within `budget` — "give
    * me 10 B tokens of this corpus" without length bias (sampling ROWS
    * uniformly would over-represent short docs in token mass; taking
    * docs in md5-shuffled order and cutting on the running token sum
    * keeps every doc's inclusion probability independent of its
    * content). The running sum is monotone, so the result is a clean
    * prefix: every selected doc's cumulative total ≤ budget.
    *
    * Same two-phase machinery as [[deterministicShuffle]] (the bucket
    * is a prefix of the md5 sort key): per-bucket token prefix sums in
    * a 4096-way parallel window, bucket offsets as a tiny broadcast
    * relation — never a one-task global window. Output: input columns
    * + `cum_tokens` (the running total INCLUDING the row).
    * `nTokensCol` must be ≥ 0 (a negative count would break the
    * monotonicity the prefix cut relies on); NULL counts are treated
    * as 0 by the window sum. */
  def tokenBudgetSelect(df: DataFrame, idCol: String, nTokensCol: String,
                        budget: Long, seed: Long = 42L): DataFrame = {
    val keyed = withShuffleKey(df, idCol, seed)
    val wB = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__b")).orderBy(col("__ord"), col(idCol))
    val wOff = org.apache.spark.sql.expressions.Window
      .orderBy(col("__b"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("__b"))
      .agg(sum(col(nTokensCol)).as("__t"))
      .withColumn("__off", coalesce(sum(col("__t")).over(wOff), lit(0L)))
      .select(col("__b"), col("__off"))
    keyed
      .withColumn("__cum_in", sum(col(nTokensCol)).over(wB))
      .join(broadcast(offsets), "__b")
      .withColumn("cum_tokens", col("__off") + col("__cum_in"))
      .filter(col("cum_tokens") <= budget)
      .drop("__ord", "__b", "__cum_in", "__off")
  }

  /** Temperature-scaled mixture resampling (α = ½): re-weight a corpus
    * so each group (source/domain/language) contributes in proportion
    * to √n_g instead of n_g — the standard data-mixture flattening
    * (GPT-3/multilingual style: big domains damped, small ones
    * boosted) — then keep a deterministic hash sample hitting an
    * expected `budget` total rows.
    *
    * Per-group keep rate (in basis points of the hash space):
    * `clamp(1, 10000, (budget · w_g · 10000) div (Σw · n_g))` with
    * `w_g = floor(√n_g)`. Every step is INTEGER arithmetic on exact
    * inputs — floor of a correctly-rounded IEEE sqrt of an integer is
    * exact in any engine, integer sums are order-free — so the rates
    * (and hence membership) are reproducible bit-for-bit by any SQL
    * engine; a float `pow(n, α)` for general α would instead expose
    * last-ulp library differences at the floor boundary, which is why
    * α is fixed at ½. The lower clamp means a non-empty group is
    * DAMPED, never silently eliminated: without it, any group whose
    * ideal rate floors below one ten-thousandth would contribute zero
    * rows. Membership = portable md5 bucket of the id (salted,
    * independent of [[hashSplit]]/[[stratified]]).
    *
    * The rates are computed ENTIRELY IN-PLAN: one count shuffle over
    * the corpus builds the per-group count relation, a single-row
    * aggregate over it yields Σw, and the per-group rate is exact
    * DECIMAL(38,0) arithmetic: the numerator `budget·w·10⁴ ≤
    * 2⁶³·2³²·10⁴ < 10³³` and the denominator `Σw·n ≤ n_total² < 10³⁸`
    * for any corpus under ~10¹⁹ rows, so under ANSI (Spark 4 default)
    * neither side can throw at the stated design point; the oracle's
    * HUGEINT does the same math.
    * Nothing is collected to the driver, so the operator holds up
    * when the group key is high-cardinality (web domains: 10⁷–10⁸
    * groups) where a collect-based rate table would OOM the driver;
    * for the usual handful of sources AQE broadcasts the tiny rate
    * relation at runtime.
    *
    * Rows with a NULL group form a group like any other — counted,
    * weighted, damped — via the null-safe join; dropping them
    * silently would both lose data and (worse) skew every other
    * group's rate, since their count would inflate Σw. Rates cap at
    * 10000 (no upsampling — replication is a separate, explicit
    * step). Returns the kept rows plus their group's `rate_bp`. */
  def temperatureMixture(df: DataFrame, idCol: String, groupCol: String,
                         budget: Long): DataFrame = {
    require(budget > 0, "budget must be positive")
    val D = "decimal(38,0)"
    val counts = df.groupBy(col(groupCol).as("__g"))
      .agg(count(lit(1)).as("__n"))
      // floor of a correctly-rounded IEEE sqrt of an integer is exact
      .withColumn("__w", floor(sqrt(col("__n"))).cast("long"))
    val totalW = counts.agg(sum(col("__w")).as("__tw"))
    val rates = counts.crossJoin(broadcast(totalW))
      .withColumn("__num",
        col("__w").cast(D) * lit(budget).cast(D) * lit(10000L).cast(D))
      .withColumn("__den", col("__tw").cast(D) * col("__n").cast(D))
      // clamp BEFORE dividing: an un-clamped quotient (one tiny group)
      // can exceed Long and `div`'s BIGINT result would overflow. The
      // clamp test `num ≥ den·10⁴` is evaluated with the 10⁴ cancelled
      // from BOTH sides (w·budget ≥ tw·n) so neither operand outgrows
      // the factors already present: w·budget < 10²⁹ and tw·n ≤
      // n_total² < 10³⁸ for any corpus under ~10¹⁹ rows — the den-side
      // bound the naive `den·10⁴` form would have burned 4 digits of
      .withColumn("rate_bp",
        when(col("__w").cast(D) * lit(budget).cast(D) >= col("__den"),
            lit(10000L))
          .otherwise(greatest(lit(1L), expr("__num div __den"))))
      .select(col("__g"), col("rate_bp"))
    val bucket = pmod(Dedup.portableTokenHash(
      concat(lit("mix_"), col(idCol).cast("string"))), lit(10000L))
    df.join(rates, col(groupCol) <=> col("__g"))
      .filter(bucket < col("rate_bp"))
      .drop("__g")
  }

  /** Epoch replication — the UPSAMPLING half of mixture design that
    * [[temperatureMixture]] deliberately excludes (its rates cap at
    * 1×): each group's documents are repeated `epochs(group)` times
    * ("Wikipedia 3 epochs, web 1"), groups mapped to 0 are dropped,
    * unmapped groups take `defaultEpochs`. Every copy carries its
    * `epoch` number (1-based) and a deterministic global training
    * position `pos` over the REPLICATED stream, shuffled on the
    * composite (id, epoch) identity so the copies of one document
    * scatter across the epoch instead of clumping.
    *
    * 100 TB design: the replication itself is narrow — a CASE lookup
    * (the epoch map is code-sized, not data-sized) and a
    * `sequence`-explode whose fan-out is the small epoch count;
    * position assignment reuses [[deterministicShuffle]]'s two-phase
    * ranking (4096-way parallel windows + a broadcast offset relation),
    * so no global one-task window at any scale. Rows with a NULL group
    * take `defaultEpochs` (the CASE falls through), matching
    * [[temperatureMixture]]'s keep-NULL-groups stance. */
  def epochReplicate(df: DataFrame, idCol: String, groupCol: String,
                     epochs: Map[String, Int], defaultEpochs: Int = 1,
                     seed: Long = 42L): DataFrame = {
    require(epochs.values.forall(_ >= 0) && defaultEpochs >= 0,
      "epoch counts must be non-negative")
    // stable CASE order (sorted keys): the plan, not just the result,
    // is reproducible
    val e = epochs.toSeq.sortBy(_._1).foldLeft(lit(defaultEpochs)) {
      case (acc, (g, n)) => when(col(groupCol) === g, lit(n)).otherwise(acc)
    }
    val replicated = df
      .withColumn("__e", e)
      // sequence(1, 0) would generate a DESCENDING [1, 0] — zero-epoch
      // groups need the explicit empty branch
      .withColumn("epoch", explode(when(col("__e") >= 1,
        sequence(lit(1), col("__e"))).otherwise(array().cast("array<int>"))))
      .drop("__e")
      .withColumn("__rid",
        concat_ws("#", col(idCol).cast("string"), col("epoch").cast("string")))
    deterministicShuffle(replicated, "__rid", seed).drop("__rid")
  }

  /** Deterministic stratified sample: keeps ~`fraction(stratum)` of the
    * rows in each stratum, membership decided by the id hash. */
  def stratified(df: DataFrame, idCol: String, stratumCol: String,
                 fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    // operator-distinct salt: with the SAME hash as hashSplit, composing
    // the two is fully correlated (a 10% tail split then stratified(0.5)
    // keeps zero rows instead of half) — the salt makes them independent
    val bucket = pmod(xxhash64(lit("stratified"), col(idCol), lit(seed)), lit(10000L))
    val keep = fractions.foldLeft(lit(false)) { case (acc, (stratum, f)) =>
      acc || (col(stratumCol) === stratum && bucket < (f * 10000).toLong)
    }
    df.filter(keep)
  }

  /** Efraimidis–Spirakis "A-ES" weighted sampling WITHOUT replacement:
    * keep the k rows with the largest key uᵢ^(1/wᵢ) (uᵢ uniform in
    * (0,1)) — each row's inclusion probability tracks its weight, and
    * no row repeats. Deterministic: uᵢ is a hash of the row id + seed,
    * not an RNG draw, so the sample is a pure function of (corpus,
    * seed) — stable across runs, cluster sizes and re-partitioning,
    * the same property [[hashSplit]] gives unweighted splits.
    * (Reference behavior: the sampling stage of the reference's corpus
    * pipeline; see SURVEY §2 sampling row.)
    *
    * The ordering is computed in log space as floor(10⁹ · ln(u)/w) —
    * the monotone image of u^(1/w) for w > 0 — quantized to integer
    * "nano-log" units like the catalog's other cross-engine float
    * orderings (FIXTURES §C micro-log trick): both engines floor the
    * same IEEE-double expression, and the id tie-break keeps the total
    * order identical even when two keys quantize equal. Rows with a
    * NULL id (no hash → no draw) or NULL/non-positive weight are
    * dropped (w = 0 means "never sample"; negative weights are
    * meaningless in A-ES).
    *
    * `uniform` maps (id column, seed) to u ∈ (0,1): the default
    * [[xxhashUniform]] is the cheap production path; [[md5Uniform]] is
    * the engine-portable variant any SQL engine replays byte-for-byte
    * (q117's oracle regenerates it in DuckDB — q61's portable-hash
    * precedent).
    *
    * Weight scale: A-ES ordering is invariant under rescaling all
    * weights by a constant (ln(u)/(c·w) preserves the ln(u)/w order),
    * so weights carry no unit — but the QUANTIZED key must fit a
    * BIGINT: |ln u| ≤ 34 here, so weights below ~4e-9 overflow
    * 10⁹·ln(u)/w past Long range (Spark saturates, a SQL oracle
    * replay hard-errors). Rescale fractional weights so the minimum
    * is ≥ ~1e-6 — free by the invariance above.
    *
    * 100 TB design: one narrow projection (hash + ln per row) into a
    * TakeOrderedAndProject top-k — per-partition size-k heaps, one
    * driver merge of partitions·k rows, no shuffle of the corpus. k
    * must be driver-small, which a sample is by definition; for
    * billion-row samples take the key column and cut by a quantile
    * instead of limit(). Output: surviving input rows + `es_key`. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     k: Int, seed: Long = 42L,
                     uniform: (Column, Long) => Column = xxhashUniform)
      : DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    TopK.global(esKeyed(df, idCol, weightCol, seed, uniform), k,
      col("es_key").desc, col(idCol))
  }

  /** Per-group A-ES: the k highest-keyed rows of EVERY group — balanced
    * weighted subsampling (per-source eval slices, per-language probes)
    * where [[weightedSample]]'s single global heap would let one huge
    * group crowd out the rest. Same keys, same determinism; groups
    * smaller than k keep all their rows.
    *
    * Scale shape: one shuffle on the group key; the rank ≤ k filter is
    * recognized by Spark's WindowGroupLimit rule, which pushes a
    * per-partition top-k BEFORE the shuffle (map-side partial heap,
    * the same trick TakeOrderedAndProject plays globally) — asserted
    * in the q120 plan audit. */
  def weightedSamplePerGroup(df: DataFrame, idCol: String,
                             weightCol: String, groupCol: String,
                             kPerGroup: Int, seed: Long = 42L,
                             uniform: (Column, Long) => Column = xxhashUniform)
      : DataFrame = {
    require(kPerGroup > 0, s"per-group sample size must be positive, got $kPerGroup")
    TopK.perGroup(esKeyed(df, idCol, weightCol, seed, uniform),
      Seq(groupCol), kPerGroup, col("es_key").desc, col(idCol))
  }

  /** Shared A-ES keying: drop rows that cannot draw (NULL id — no
    * hash, no u — or unusable weight), attach the nano-log key
    * (scaladoc at [[weightedSample]]). */
  private def esKeyed(df: DataFrame, idCol: String, weightCol: String,
                      seed: Long, uniform: (Column, Long) => Column)
      : DataFrame =
    df.filter(col(idCol).isNotNull &&
        col(weightCol).isNotNull && col(weightCol) > 0)
      .withColumn("es_key",
        floor(log(uniform(col(idCol), seed)) /
          col(weightCol).cast("double") * lit(1e9)))

  /** u ∈ (0,1) from xxhash64(id, seed): low 48 bits, bucket-centered
    * so u is never exactly 0 or 1 (ln(0) = -Inf would poison the key). */
  def xxhashUniform(id: Column, seed: Long): Column =
    (pmod(xxhash64(id, lit(seed)), lit(1L << 48)).cast("double") + 0.5) /
      lit((1L << 48).toDouble)

  /** Engine-portable u ∈ (0,1): first 12 md5 hex digits (48 bits) of
    * "id:seed", bucket-centered. Any engine with md5 replays it —
    * DuckDB via CAST('0x' || hex AS BIGINT) (q117's oracle). */
  def md5Uniform(id: Column, seed: Long): Column =
    (conv(substring(md5(concat(id.cast("string"), lit(":" + seed))), 1, 12),
        16, 10).cast("long").cast("double") + 0.5) /
      lit(281474976710656.0) // 16^12
}
