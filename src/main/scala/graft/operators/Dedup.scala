package graft.operators

import graft.functions.TextFns
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication for training-data pipelines: exact,
  * MinHash+LSH, SimHash, and exact n-gram Jaccard.
  *
  * Scale notes (the design constraint is ~100 TB of documents):
  *  - Exact dedup is one hash shuffle on the fingerprint. No window
  *    over the whole table, no global sort.
  *  - MinHash signatures are a NARROW per-doc computation (no explode,
  *    no shuffle); LSH banding turns O(n²) pair generation into small
  *    shuffles on (band, bandHash) where only same-bucket docs ever
  *    meet, and candidates are re-checked with exact Jaccard so emitted
  *    pairs are exact — LSH only bounds recall, never precision.
  *  - Bucket-size cap: a degenerate bucket (e.g. empty docs) would
  *    produce a quadratic blow-up inside one task; bucket sizes are
  *    counted BEFORE any bucket is materialized and buckets outside
  *    2..maxBucket are dropped — the standard guard in web-scale dedup.
  *  - Shuffle keys are 64-bit hashes (xxhash64 in-plan, FNV-1a inside
  *    the signature kernel); the multiply-mod scheme keeps operands
  *    < 2⁶² so ANSI-mode Long arithmetic can never overflow.
  *  - Cache lifecycle: the pair operators persist ONE multi-consumer
  *    intermediate — the per-doc shingle sets — which Spark can only
  *    release AFTER the returned plan is consumed. Long-lived sessions
  *    should `spark.catalog.clearCache()` once results are
  *    materialized (Bench/Verify do this between queries). LSH buckets
  *    are NOT cached: since the bounded-collect rewrite they have a
  *    single consumer.
  */
object Dedup {

  /** Mersenne prime 2³¹−1: modulus for the universal-hash family. */
  private val P = 2147483647L

  /** Deterministic hash-family coefficients: (aᵢ, bᵢ) derived from a
    * fixed seed via a splitmix-style scramble — reproducible across
    * runs and cluster sizes. */
  private def coeffs(numHashes: Int, seed: Long): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z ^ (z >>> 31)
    }
    (0 until numHashes).map { _ =>
      (math.floorMod(next(), P - 1) + 1, math.floorMod(next(), P))
    }
  }

  /** Deterministic 64-bit SURROGATE ID for string-keyed corpora — the
    * documented answer to every "map string keys to a surrogate id
    * first" fail-fast in this family ([[minhashCandidates]],
    * [[TextIndex]], the bounded-collect bucket aggregate): real crawls
    * key by URL, and the LSH/index operators need integral ids so
    * shuffles move 8-byte keys and bucket buffers stay primitive.
    * `xxhash64(key)` is deterministic across runs and cluster sizes
    * (re-crawls of the same key get the same id — the id IS the key's
    * identity), narrow (no shuffle), and well-spread.
    *
    * Collision note (the 64-bit birthday bound): expected colliding
    * PAIRS ≈ n²/2⁶⁵ — about 0.005 at 10⁹ keys and ~2.7 at 10¹⁰, and a
    * collision merely merges two docs' dedup identities (one spurious
    * drop), never corrupts structure. Corpora past ~10¹⁰ distinct keys
    * or zero-tolerance pipelines should mint with
    * [[withUniqueSurrogateId]] instead and persist the mapping. */
  def withSurrogateId(df: DataFrame, keyCol: String,
                      idCol: String = "doc_id"): DataFrame =
    df.withColumn(idCol, xxhash64(col(keyCol)))

  /** [[withSurrogateId]]'s GUARANTEED-unique variant: sort by the key
    * and zip with the row index — ids are 0..n−1, collision-free, and
    * deterministic as long as `keyCol` values are distinct (ties get
    * arbitrary-but-valid distinct ids). Costs one global sort + an
    * extra pass (zipWithIndex's partition-size count), so the hash
    * form is the default; this is the zero-tolerance path. The
    * mapping is RUN-SCOPED — persist (id, key) if later runs must
    * agree. */
  def withUniqueSurrogateId(df: DataFrame, keyCol: String,
                            idCol: String = "doc_id"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.sort(col(keyCol))
    val schema = sorted.schema.add(idCol,
      org.apache.spark.sql.types.LongType, nullable = false)
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i)
      }, schema)
  }

  /** Exact dedup on a normalized-text fingerprint: keeps the row with
    * the smallest `idCol` per distinct content. One shuffle; the
    * min-by runs as partial+final aggregate (map-side combine).
    *
    * NULL text has UNKNOWN content, so each such doc is its own
    * singleton group (fingerprint NULL would otherwise be a regular
    * group key and silently merge every extraction failure into one
    * "duplicate" cluster). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("__fp", coalesce(TextFns.fingerprint(col(textCol)),
        concat(lit("__null__"), col(idCol).cast("string"))))
      .groupBy(col("__fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("group_size"))
      .drop("__fp")

  /** The KEEPER-ROW view of [[exact]] over a PRECOMPUTED fingerprint
    * column: returns the input rows whose `idCol` is the smallest in
    * their `fpCol` group, all other columns carried through. One
    * batch-bounded hash shuffle (groupBy-min with map-side combine +
    * a semi join on the (fp, id) pair). The fingerprint is
    * caller-supplied because ingest pipelines must fingerprint BEFORE
    * redaction mutates the text (the raw-text fingerprint rule —
    * [[graft.pipelines.StreamingIngestPipeline.run]]).
    *
    * NULL fingerprints follow the [[exact]] rule: unknown content is
    * its own singleton group (the key is coalesced with an id-salted
    * sentinel), so extraction failures are never merged into one
    * giant "duplicate" cluster — and never silently dropped by the
    * semi join's null-key-never-matches behavior. */
  def exactKeepSmallest(df: DataFrame, idCol: String,
                        fpCol: String): DataFrame = {
    val keyed = df.withColumn("__ek",
      coalesce(col(fpCol).cast("string"),
        concat(lit("__null__"), col(idCol).cast("string"))))
    keyed
      .join(keyed.groupBy(col("__ek")).agg(min(col(idCol)).as(idCol)),
        Seq("__ek", idCol), "left_semi")
      .drop("__ek")
  }

  /** Exact n-gram Jaccard near-dup pairs: explode word n-gram shingle
    * sets, self-join on shingle, count intersections, filter by
    * |A∩B| / (|A|+|B|−|A∩B|) ≥ threshold. Exact but O(pairs sharing a
    * shingle) — the oracle/verifier for the sketch methods; at full
    * scale run MinHash first and this only on candidates. */
  /** Per-doc DISTINCT word-shingle SET, 64-bit-hashed (FNV-1a), as one
    * `array<long>` column — the shared kernel of every Jaccard-flavored
    * operator here and in [[Decontaminate]]. One typed UDF does
    * tokenize→n-gram→hash→dedupe in a single primitive pass (the HOF
    * chain split→transform→array_join→array_distinct ran interpreted
    * lambdas per shingle: 0.7s of the sf0.1 jaccard was tokenization).
    * Hashing at birth means downstream self-joins shuffle 8-byte keys
    * instead of ~n-word strings; 64-bit collisions are negligible at
    * corpus scale — the same fidelity trade MinHash makes. Tokenization
    * matches [[TextFns.wordShingles]] (n-gram, whole-text fallback for
    * short docs); NULL text → NULL set (the doc joins into no pair).
    * Returned PERSISTED (MEMORY_AND_DISK) when `cache` is true (the
    * default — pair operators feed it to 2-3 consumers: sizes,
    * self-join, exact re-check); single-consumer callers pass
    * cache=false. The input is also fanned to all cores first
    * (single-file inputs arrive as ONE split). */
  private[operators] def shingleSets(docs: DataFrame, idCol: String,
      textCol: String, n: Int, outIdName: String,
      cache: Boolean = true): DataFrame = {
    val shUdf = udf { text: String =>
      if (text == null) null
      else {
        // hand-rolled tokenizer over the regex-\s charset (space, \t,
        // \n, \u000B, \f, \r — exactly Java/PCRE \s, so oracle parity
        // with string_split_regex('\s+') is preserved): ~2x the
        // regex split's speed (measured 37->19 ms/MB single-thread),
        // one substring per token, no Pattern machinery
        def isWs(c: Char): Boolean =
          c == ' ' || c == '\t' || c == '\n' || c == '\u000B' ||
            c == '\f' || c == '\r'
        val toks = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        val len = text.length
        while (i < len) {
          while (i < len && isWs(text.charAt(i))) i += 1
          val start = i
          while (i < len && !isWs(text.charAt(i))) i += 1
          if (i > start) toks += text.substring(start, i)
        }
        // FNV-1a is incremental, so each shingle hash streams the
        // window's tokens with ' ' separators — BITWISE identical to
        // fnv1a(tokens.mkString(" ")) but with zero per-shingle
        // String/Seq allocation (sliding+mkString built and discarded
        // a ~n-word string per shingle: the dominant kernel
        // allocation). The whole-text fallback for short docs is the
        // same routine over all tokens; an empty token list hashes to
        // the FNV offset basis = fnv1a("").
        def hashJoined(from: Int, count: Int): Long = {
          var h = 0xcbf29ce484222325L
          var k = from
          val end = from + count
          while (k < end) {
            val t = toks(k)
            var j = 0
            while (j < t.length) { h ^= t.charAt(j); h *= 0x100000001b3L; j += 1 }
            if (k < end - 1) { h ^= ' '.toInt; h *= 0x100000001b3L }
            k += 1
          }
          h
        }
        val seen = new java.util.HashSet[java.lang.Long]()
        val out = scala.collection.mutable.ArrayBuilder.make[Long]
        val m = toks.length
        if (m >= n) {
          var s = 0
          while (s + n <= m) {
            val h = hashJoined(s, n)
            if (seen.add(h)) out += h
            s += 1
          }
        } else {
          out += hashJoined(0, m)
        }
        out.result()
      }
    }
    val sets = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as(outIdName), shUdf(col(textCol)).as("shs"))
    // cache=false for single-consumer callers (standalone signature
    // export): persisting a once-read relation is pure overhead and the
    // entry would linger until the session's next clearCache
    if (cache) sets.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    else sets
  }

  /** Exploded (doc, shingle-hash) view of [[shingleSets]] — the join
    * shape. Narrow on top of the persisted sets, so deriving both this
    * and the per-doc sizes costs one tokenization pass total. */
  private[operators] def hashedShingles(docs: DataFrame, idCol: String,
      textCol: String, n: Int, outIdName: String): DataFrame =
    shingleSets(docs, idCol, textCol, n, outIdName)
      .select(col(outIdName), explode(col("shs")).as("sh"))

  /** Exact n-gram Jaccard similarity over all co-shingle pairs.
    *
    * `maxDf` is the HOT-SHINGLE GUARD: a shingle shared by d documents
    * contributes d·(d-1)/2 join rows, so one boilerplate 3-gram in 10⁶
    * docs would push 10¹² rows through a single join key. Shingles with
    * document frequency above `maxDf` are excluded from the similarity
    * space — both from the intersection join AND from the per-doc set
    * sizes, so `jaccard` remains an EXACT set similarity (of the
    * df-filtered shingle sets; near-universal shingles carry ~zero
    * Jaccard information, the same reason IDF downweights them). The
    * default mirrors [[minhashCandidates]]' `maxBucket`. DedupSpec pins
    * the differential: on any corpus whose max shingle df ≤ maxDf the
    * output is bit-identical to the uncapped operator. */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxDf: Int = 1000): DataFrame = {
    require(maxDf >= 2, s"maxDf must allow co-occurrence (>= 2), got $maxDf")
    val sets = shingleSets(docs, idCol, textCol, n, "doc")
    // |shingle set| is a NARROW projection of the persisted sets — the
    // previous exploded groupBy(doc).count() was a full extra shuffle
    val rawSizes = sets.select(col("doc"), size(col("shs")).as("sz"))
    val allShingles = sets.select(col("doc"), explode(col("shs")).as("sh"))
    // df census: one aggregate over the exploded shingles (cheap — 8-byte
    // keys, map-side combine). `hot` is the boilerplate set: tiny by
    // construction, so AQE broadcasts both the anti- and semi-joins.
    val hot = allShingles.groupBy(col("sh")).agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // ONE bounded driver round-trip (a boolean over the tiny persisted
    // hot relation — the census reads the already-persisted shingle
    // sets): on the common no-hot-shingle corpus it short-circuits the
    // anti/semi/outer correction joins below, whose empty-side stages
    // would otherwise still schedule a full cached-scan pass each. On
    // the hot corpus the persisted census is reused by both joins.
    val noHot = hot.isEmpty
    val shingles =
      if (noHot) { hot.unpersist(); allShingles }
      else allShingles.join(hot, Seq("sh"), "left_anti")
    // sizes over the SAME df-filtered space, without a second full
    // groupBy(doc) shuffle: only docs that CONTAIN a hot shingle (a
    // small relation when hot is small) shuffle for the correction
    val sizes =
      if (noHot) rawSizes
      else {
        val hotPerDoc = allShingles.join(hot, Seq("sh"), "left_semi")
          .groupBy(col("doc")).agg(count(lit(1)).as("__nhot"))
        rawSizes.join(hotPerDoc, Seq("doc"), "left_outer")
          .select(col("doc"),
            (col("sz") - coalesce(col("__nhot"), lit(0L))).cast("int").as("sz"))
      }
    // Co-shingle pairs via self-join on the hashed shingle (AQE picks
    // broadcast when the bucketed side is small; sort-merge at scale).
    // (The collect_list + in-array i<j expansion variant — the LSH
    // candidate pattern — measured 60% SLOWER here: at this fan-out the
    // interpreted HOF lambdas lose to the codegen'd join.)
    val inter = shingles.as("a")
      .join(shingles.as("b"), col("a.sh") === col("b.sh")
        && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("id_a"), col("b.doc").as("id_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "id_a").withColumnRenamed("sz", "sz_a"), "id_a")
      .join(sizes.withColumnRenamed("doc", "id_b").withColumnRenamed("sz", "sz_b"), "id_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("jaccard"), 6).as("jaccard"))
  }

  /** FNV-1a 64-bit over UTF-16 code units — fixed algorithm so shingle
    * hashes are reproducible across JVMs/Spark versions. This is the
    * REFERENCE form; the shingle kernel streams the same hash
    * incrementally over (token, ' ') sequences without materializing
    * the joined string (see `hashJoined` in [[shingleSets]]) — the
    * differential specs pin the two equal. */
  private[operators] def fnv1a(s: String): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < s.length) { h ^= s.charAt(i); h *= 0x100000001b3L; i += 1 }
    h
  }

  /** MinHash signature per doc as ONE `array<long>` column of length
    * `numHashes`, computed by a typed UDF doing the whole
    * tokenize→shingle→hash→per-coefficient-min in primitive JVM loops.
    *
    * Why a UDF here, against the functions-not-UDFs default: the
    * expression formulations are pathological at k=128 — k min-agg
    * measures shuffle |docs|·|shingles| rows (measured 6.8s at sf0.1),
    * and k separate `array_min(transform(...))` projections generate
    * compile-bound wide codegen (~10s of janino per plan shape). One
    * scalar UDF is shuffle-free, compiles instantly, and the per-row
    * cost is a tight k·|shingles| integer loop. Tokenization matches
    * TextFns.wordShingles (n-gram with whole-text fallback).
    */
  def minhashSignatures(docs: DataFrame, idCol: String, textCol: String,
                        shingleN: Int, numHashes: Int,
                        seed: Long = 42L): DataFrame =
    minhashSignaturesFromSets(
      shingleSets(docs, idCol, textCol, shingleN, "doc", cache = false),
      numHashes, seed)

  /** Signature kernel over pre-hashed shingle sets ([[shingleSets]]) —
    * lets the MinHash pipeline share ONE tokenization pass with the
    * exact-Jaccard verifier instead of re-splitting the text. The
    * per-coefficient mins are identical to hashing the strings
    * directly: h = floorMod(fnv1a(shingle), P) either way, and MinHash
    * is idempotent on duplicate h (a mod-P collision between distinct
    * raw hashes changes nothing). */
  private[operators] def minhashSignaturesFromSets(sets: DataFrame,
      numHashes: Int, seed: Long = 42L): DataFrame = {
    val cs = coeffs(numHashes, seed).toArray
    val as = cs.map(_._1); val bs = cs.map(_._2)
    val sigUdf = udf { shs: Array[Long] =>
      if (shs == null) null
      else {
        val sig = Array.fill(numHashes)(Long.MaxValue)
        var j = 0
        while (j < shs.length) {
          val h = math.floorMod(shs(j), P)
          var i = 0
          while (i < numHashes) {
            val v = math.floorMod(as(i) * h + bs(i), P)
            if (v < sig(i)) sig(i) = v
            i += 1
          }
          j += 1
        }
        sig
      }
    }
    sets.select(col(sets.columns.head).as("doc"), sigUdf(col("shs")).as("sig"))
  }

  /** MinHash-LSH candidate pairs. The signature array is split into
    * `bands` slices; docs colliding on a whole band (xxhash64 of the
    * slice) become candidates. Deduplicated (id_a < id_b), bucket size
    * capped at `maxBucket`. Expects (doc: bigint, sig: array<long>)
    * from [[minhashSignatures]] — integral ids are a requirement of
    * the bounded-collect bucket aggregate (string-keyed corpora should
    * join through a surrogate id, which they want anyway so shuffles
    * move 8-byte keys). */
  /** LSH banding: (doc, sig: array<long>) → (doc, band, sig) bucket
    * rows, one per band, the slice xxhash64'd. NULL signatures (NULL
    * text) are dropped — xxhash64 over a NULL slice degenerates to the
    * seed, so every such doc would share one bucket per band and
    * generate candidate pairs that downstream verification only then
    * discards. Shared by within-corpus candidates
    * ([[minhashCandidates]]) and cross-corpus decontamination
    * ([[Decontaminate.nearDupLeaksLsh]]). */
  private[operators] def bandBuckets(signatures: DataFrame,
      bands: Int): DataFrame = {
    val rpb = expr(s"size(sig) div $bands") // rows per band, integer
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64(slice(col("sig"), lit(1) + lit(b) * rpb, rpb)).as("sig"))
        .as(s"band_$b")
    }
    signatures
      .filter(col("sig").isNotNull)
      .select(col("doc"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.sig").as("sig"))
  }

  def minhashCandidates(signatures: DataFrame, bands: Int,
                        maxBucket: Int = 1000): DataFrame = {
    // fail fast on non-integral ids: the bounded-collect bucket
    // aggregate casts to long, which under ANSI would die deep in the
    // bucket shuffle (or, ANSI off, silently null out every candidate)
    val docType = signatures.schema("doc").dataType
    require(docType == org.apache.spark.sql.types.LongType
        || docType == org.apache.spark.sql.types.IntegerType,
      s"minhashCandidates needs an integral doc id, got " +
        s"${docType.catalogString}; mint one with Dedup.withSurrogateId " +
        "(deterministic xxhash64) or withUniqueSurrogateId (collision-free)")
    val buckets = bandBuckets(signatures, bands)
    // Pair generation in ONE bucket shuffle: bounded_collect carries an
    // EXACT bucket count plus at most maxBucket member ids — the
    // degenerate-bucket guard (empty docs, boilerplate) lives INSIDE
    // the aggregate buffer, so a pathological bucket is detected by its
    // count and dropped without ever having been materialized. This
    // replaced a census → semi-join → collect_list two-phase (the
    // standard guard formulation): same semantics, two fewer shuffles,
    // no persisted bucket relation, and a HARD per-group memory bound
    // where collect_list had none. Surviving buckets (2..maxBucket
    // members, ids sorted) expand to i<j pairs inside the array.
    buckets.groupBy(col("band"), col("sig"))
      .agg(BoundedCollectLong.boundedCollect(maxBucket)(col("doc")).as("bc"))
      .filter(col("bc.n") >= 2 && col("bc.n") <= maxBucket)
      .select(col("bc.items").as("docs"))
      .select(explode(flatten(transform(col("docs"), (x, i) =>
        transform(slice(col("docs"), i + lit(2), size(col("docs"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
  }

  /** End-to-end MinHash-LSH near-dup pairs, verified with exact
    * Jaccard so precision is 1.0 (recall bounded by the band curve
    * 1−(1−t^r)^b).
    *
    * Verification is PER CANDIDATE PAIR via array_intersect over hashed
    * shingle sets — O(|candidates| · set size), a narrow join with no
    * shuffle explosion. (Re-running the exact shingle self-join on
    * candidate DOCS would verify all-pairs-among-candidates: quadratic
    * again exactly when LSH found a dense cluster.)
    *
    * Verification scores FULL shingle sets, while [[ngramJaccardPairs]]
    * df-filters its similarity space (`maxDf`) — so the exact/LSH
    * "twins" (and DedupSpec's differential) coincide only on corpora
    * whose max shingle df ≤ the exact operator's maxDf. On hot-shingle
    * corpora this operator scores pairs INCLUDING boilerplate shingles
    * the exact operator excises; that is intentional — per-pair
    * verification touches each candidate once, so hot shingles cost
    * O(set size) here, not the d²/2 join fan-out that forced the cap on
    * the exact side. */
  def minhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
                   threshold: Double = 0.8, seed: Long = 42L,
                   maxBucket: Int = 1000): DataFrame = {
    // ONE shared tokenization pass: the persisted shingle sets feed the
    // signature kernel AND the exact-Jaccard re-check of candidates
    // (previously two independent tokenize→shingle pipelines).
    // `maxBucket` (the minhashCandidates degenerate-bucket guard) is
    // plumbed so ORACLE-CHECKED call sites can disable it: an oracle
    // computing the exact uncapped pair set must see the uncapped
    // operator (the q27-maxDf / q69-maxBucket call-site split).
    val sets = shingleSets(docs, idCol, textCol, shingleN, "doc")
    val cands = minhashCandidates(
      minhashSignaturesFromSets(sets, numHashes, seed), bands, maxBucket)
    verifyJaccard(cands, "id_a", "id_b", sets, sets, threshold)
  }

  /** Exact-Jaccard verification of candidate (aId, bId) pairs against
    * per-doc hashed shingle sets ([[shingleSets]] shape, id column
    * first): array_intersect per PAIR — O(|cands|·|set|), narrow, no
    * shuffle explosion. The ONE implementation behind every LSH
    * operator's verification step (within-corpus [[minhashPairs]],
    * cross-corpus [[Decontaminate.nearDupLeaksLsh]]), so the
    * exact/LSH twins cannot drift apart. */
  private[operators] def verifyJaccard(cands: DataFrame, aId: String,
      bId: String, aSets: DataFrame, bSets: DataFrame,
      threshold: Double): DataFrame =
    cands
      .join(aSets.select(col(aSets.columns.head).as(aId),
        col("shs").as("__sa")), aId)
      .join(bSets.select(col(bSets.columns.head).as(bId),
        col("shs").as("__sb")), bId)
      .withColumn("__inter", size(array_intersect(col("__sa"), col("__sb"))))
      .withColumn("jaccard", col("__inter").cast("double")
        / (size(col("__sa")) + size(col("__sb")) - col("__inter")))
      .filter(col("jaccard") >= threshold)
      .select(col(aId), col(bId), round(col("jaccard"), 6).as("jaccard"))

  /** Connected components over near-dup pairs → (doc, cluster) where
    * cluster = min doc id reachable through the pair graph. The final
    * step of near-dup dedup: pairs alone aren't a result until each
    * cluster elects one canonical survivor.
    *
    * Min-label propagation: every node starts labeled with itself; each
    * round every node takes the min of its own and its neighbors'
    * labels; stop when a round changes nothing. Rounds needed ≈ graph
    * diameter — near-dup clusters are small and dense, so a handful.
    * Each round is one shuffle on the edge list; the driver only sees
    * the converged/changed COUNT (one scalar per round), never data.
    * `maxIters` bounds pathological chain graphs (then the result is a
    * valid refinement: clusters may be split, never wrongly merged).
    */
  def connectedComponents(pairs: DataFrame, maxIters: Int = 20): DataFrame = {
    // undirected edge list, both directions
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .union(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // localCheckpoint each round: iterative self-reference otherwise
    // compounds the logical plan (round N embeds all N-1 prior plans —
    // analysis cost and plan strings grow without bound; lineage
    // truncation is the standard fix for iterative Spark algorithms).
    var labels = edges.select(col("src").as("doc")).distinct()
      .withColumn("label", col("doc"))
      .localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIters) {
      val neighborMin = edges
        .join(labels.withColumnRenamed("doc", "dst")
          .withColumnRenamed("label", "n_label"), "dst")
        .groupBy(col("src").as("doc"))
        .agg(min(col("n_label")).as("n_min"))
      val next = labels.join(neighborMin, Seq("doc"), "left")
        .select(col("doc"),
          least(col("label"), coalesce(col("n_min"), col("label"))).as("label"))
        .localCheckpoint(true)
      val changed = next.join(labels.withColumnRenamed("label", "old"), "doc")
        .filter(col("label") =!= col("old")).count()
      labels = next
      converged = changed == 0
      i += 1
    }
    edges.unpersist()
    labels.withColumnRenamed("label", "cluster")
  }

  /** End-to-end near-dup dedup: MinHash-LSH pairs → connected
    * components → one row per cluster (canonical keep = min doc id,
    * plus the cluster size). Singleton docs (no near-dup) are included
    * with group_size 1. */
  def nearDupGroups(docs: DataFrame, idCol: String, textCol: String,
                    shingleN: Int = 3, numHashes: Int = 128, bands: Int = 32,
                    threshold: Double = 0.8, seed: Long = 42L,
                    maxBucket: Int = 1000): DataFrame = {
    val pairs = minhashPairs(docs, idCol, textCol, shingleN, numHashes,
      bands, threshold, seed, maxBucket)
    val clustered = connectedComponents(pairs)
    val all = docs.select(col(idCol).as("doc"))
      .join(clustered, Seq("doc"), "left")
      .select(col("doc"), coalesce(col("cluster"), col("doc")).as("cluster"))
    all.groupBy(col("cluster"))
      .agg(min(col("doc")).as("keep_id"), count(lit(1)).as("group_size"))
      .drop("cluster")
  }

  /** [[nearDupGroups]] with a KEEP-BEST policy instead of keep-min-id:
    * within each near-dup cluster the surviving document is the one
    * with the highest `scoreCol` (longest copy, best quality score —
    * whatever the pipeline ranks by), ties by smallest id. This is the
    * policy production dedup actually wants: of N crawls of the same
    * page, keep the least-truncated one, not the one with the smallest
    * crawl id. Output: (keep_id, group_size, score) per cluster,
    * singletons included.
    *
    * The argmax is a single hash aggregate over cluster labels — a
    * lexicographic `max(struct(score, −id))` with map-side combine —
    * not a per-cluster window: no sort, no skew sensitivity to one
    * giant cluster. */
  def keepBestInClusters(docs: DataFrame, idCol: String, textCol: String,
                         scoreCol: String, shingleN: Int = 3,
                         numHashes: Int = 128, bands: Int = 32,
                         threshold: Double = 0.8, seed: Long = 42L,
                         maxBucket: Int = 1000): DataFrame = {
    val pairs = minhashPairs(docs, idCol, textCol, shingleN, numHashes,
      bands, threshold, seed, maxBucket)
    val clustered = connectedComponents(pairs)
    docs.select(col(idCol).as("doc"), col(scoreCol).as("__score"))
      .join(clustered, Seq("doc"), "left")
      .select(col("doc"), coalesce(col("cluster"), col("doc")).as("cluster"),
        col("__score"))
      .groupBy(col("cluster"))
      .agg(
        count(lit(1)).as("group_size"),
        max(struct(col("__score").as("s"), (-col("doc")).as("nid"))).as("m"))
      .select((-col("m.nid")).as("keep_id"), col("group_size"),
        col("m.s").as("score"))
  }

  /** Per-document boilerplate fraction: the share of a doc's DISTINCT
    * word n-gram shingles that are "common" — occurring in at least
    * `minDocs` distinct documents. High values flag templated /
    * boilerplate content (navigation chrome, licence headers, form
    * letters) — the corpus-level companion of the within-doc
    * repetition signals (q78), in the spirit of the C4/MassiveText
    * repeated-content filters.
    *
    * Scale shape: shingle document-frequency is ONE groupBy on the
    * 8-byte shingle hash (per-doc sets are distinct at birth, so
    * count(*) IS the doc frequency); the common set joins back to the
    * exploded view as a hash join (the common set is corpus-sized in
    * the worst case — not broadcastable by assumption). Everything
    * derives from ONE persisted [[shingleSets]] pass. NULL-text docs
    * are excluded (no shingles → no signal). */
  def boilerplateFraction(docs: DataFrame, idCol: String, textCol: String,
                          n: Int = 3, minDocs: Int = 5): DataFrame = {
    val sets = shingleSets(docs, idCol, textCol, n, "doc")
    val exploded = sets.select(col("doc"), explode(col("shs")).as("sh"))
    val common = exploded.groupBy(col("sh"))
      .agg(count(lit(1)).as("__df"))
      .filter(col("__df") >= minDocs)
      .select(col("sh"))
    val nCommon = exploded.join(common, "sh")
      .groupBy(col("doc")).agg(count(lit(1)).as("n_common"))
    sets.filter(col("shs").isNotNull)
      .select(col("doc"), size(col("shs")).as("n_shingles"))
      .join(nCommon, Seq("doc"), "left")
      .withColumn("n_common",
        coalesce(col("n_common"), lit(0L)).cast("int"))
      .withColumn("boilerplate_frac", graft.functions.ScalarFns.roundFrac(
        col("n_common").cast("long"), col("n_shingles").cast("long"), 4))
  }

  /** Incremental exact dedup against a (large) historical index via a
    * broadcast Bloom filter: keep the rows of `incoming` whose content
    * fingerprint does NOT already appear in `index`. Result is EXACTLY
    * `incoming LEFT ANTI JOIN index ON fingerprint` — the Bloom filter
    * has no false negatives, and its false positives are re-checked
    * exactly — the filter only changes the PLAN, never the answer.
    *
    * Why this shape at 100 TB: the naive anti join shuffles BOTH the
    * new batch and the whole historical index on the fingerprint. Here
    * the index is scanned (never shuffled) twice — once aggregated into
    * a Bloom filter (`fpp` error at `expectedItems` keys: ~1.2 GB of
    * bits per 10⁹ keys at 1%, broadcastable), once probed by a
    * broadcast semi-join against the tiny set of bloom-POSITIVE
    * fingerprints. Rows failing the bloom test (the overwhelming
    * majority of genuinely-new content) pass through with NO join at
    * all. A production index should store the (narrow, columnar)
    * fingerprints, making both scans cheap column reads.
    *
    * Within-batch duplicates are NOT collapsed (that is [[exact]]'s
    * job); NULL text rows pass through, matching anti-join semantics
    * (NULL keys never match). */
  def bloomDedupe(incoming: DataFrame, index: DataFrame, idCol: String,
                  textCol: String, expectedItems: Long,
                  fpp: Double = 0.01): DataFrame = {
    val idxFp = index
      .select(TextFns.fingerprint(col(textCol)).as("__fp"))
      .filter(col("__fp").isNotNull)
    // driver-side action: ONE scan of the index via treeAggregate with
    // an empty filter as the zero value — only the filter bits travel.
    // (Not stat.bloomFilter: that NPEs on a zero-row input — a null
    // aggregation buffer fed to BloomFilter.readFrom — and an empty
    // index is the legitimate first-ingest case; guarding it with
    // isEmpty would cost an extra action per call.)
    val bloom = idxFp.toDF("__fp").rdd
      .map(_.getString(0))
      .treeAggregate(
        org.apache.spark.util.sketch.BloomFilter.create(expectedItems, fpp))(
        (bf, fp) => { bf.putString(fp); bf },
        (a, b) => { a.mergeInPlace(b); a })
    val bc = incoming.sparkSession.sparkContext.broadcast(bloom)
    val mightUdf = udf { fp: String =>
      fp != null && bc.value.mightContainString(fp)
    }
    // persisted: three consumers (pass-through filter, verify-side
    // filter, and the broadcast candidate-fp build) would otherwise
    // each re-scan the batch and re-run normalize+md5+bloom probe —
    // same multi-consumer rule as shingleSets. Released by the
    // session's next clearCache (Bench/Verify do this per query).
    val tagged = incoming
      .withColumn("__fp", TextFns.fingerprint(col(textCol)))
      .withColumn("__maybe", mightUdf(col("__fp")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // bloom-positive fingerprints, confirmed against the real index by
    // a broadcast semi-join (index side streams, small side broadcasts)
    val confirmed = idxFp
      .join(broadcast(tagged.filter(col("__maybe"))
        .select(col("__fp")).distinct()), "__fp")
      .distinct()
    tagged.filter(!col("__maybe"))
      .unionByName(tagged.filter(col("__maybe"))
        .join(broadcast(confirmed), Seq("__fp"), "left_anti"))
      .drop("__fp", "__maybe")
  }

  /** 64-bit SimHash per document: per-token hash, bit-majority vote
    * weighted by token frequency. Computed with one explode + one
    * groupBy(doc) carrying 64 conditional-sum measures — single
    * shuffle, no UDF.
    *
    * `tokenHash` defaults to xxhash64 (fast, not reproducible outside
    * Spark); pass [[portableTokenHash]] for an md5-derived 60-bit hash
    * any engine can recompute (the top 4 bits then never vote positive
    * and stay 0 in the packed value — harmless for Hamming math). */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                xxhash64(_)): DataFrame = {
    val bitSums = (0 until 64).map { b =>
      sum(when(shiftright(col("__h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
        .otherwise(-1L)).as(s"bit_$b")
    }
    val votes = docs
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .select(col(idCol).as("doc"),
        explode(TextFns.tokens(TextFns.normalize(col(textCol)))).as("tok"))
      .withColumn("__h", tokenHash(col("tok")))
      .groupBy(col("doc"))
      .agg(bitSums.head, bitSums.tail: _*)
    val packed = (0 until 64).map { b =>
      when(col(s"bit_$b") > 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_.bitwiseOR(_))
    votes.select(col("doc"), packed.as("simhash"))
  }

  /** Engine-portable token hash: the low 60 bits of md5, parseable by
    * any SQL engine (`('0x' || substring(md5(tok),1,15))::BIGINT` in
    * DuckDB) — what makes q69's simhash fully oracle-checkable. */
  def portableTokenHash(tok: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(tok.cast("binary")), 1, 15), 16, 10).cast("long")

  /** SimHash near-dup pairs within a Hamming radius. Blocking: split
    * the 64-bit hash into `radius+1` chunks — by pigeonhole any pair
    * within `radius` shares at least one exact chunk, so pairing is
    * on (chunk index, chunk value), never a cross join.
    *
    * `maxBucket` is the DEGENERATE-BLOCK GUARD, same shape as
    * [[minhashCandidates]]: a (chunk, value) block of d docs expands to
    * d·(d−1)/2 pairs, and templated / near-identical corpora
    * concentrate docs onto few chunk values (at 10⁹ docs even the
    * UNIFORM expectation is ~15k docs per 16-bit block). Blocks above
    * `maxBucket` are dropped inside the bounded-collect aggregate —
    * their buffers never hold more than `maxBucket` ids. A pair is lost
    * ONLY if every chunk it shares is oversized; since an oversized
    * block is itself a (transitively) near-duplicate crowd, the
    * downstream clustering treatment of such crowds is better served by
    * [[exact]] / [[minhashPairs]] at a higher threshold than by
    * materializing the quadratic pair list. On corpora where every
    * block is ≤ maxBucket the output is bit-identical to the unguarded
    * join (DedupSpec pins the differential). */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   radius: Int = 3,
                   tokenHash: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
                     xxhash64(_),
                   maxBucket: Int = 1000): DataFrame = {
    // same fail-fast as minhashCandidates: the bounded-collect buffer
    // carries long ids
    val docType = docs.schema(idCol).dataType
    require(docType == org.apache.spark.sql.types.LongType
        || docType == org.apache.spark.sql.types.IntegerType,
      s"simhashPairs needs an integral doc id, got " +
        s"${docType.catalogString}; map string keys to a surrogate id first")
    val chunks = radius + 1
    val bitsPer = 64 / chunks
    // persisted: consumed by the blocking pass AND twice by the
    // Hamming join-back — recomputing the 64-measure simhash aggregate
    // three times would triple the operator's one real shuffle.
    // Released by the session's next clearCache (Bench/Verify do this
    // per query).
    val sh = simhash(docs, idCol, textCol, tokenHash)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val chunkCols = (0 until chunks).map { c =>
      struct(lit(c).as("idx"),
        shiftrightunsigned(col("simhash"), c * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1)).as("v")).as(s"c_$c")
    }
    val blocked = sh
      .select(col("doc"), explode(array(chunkCols: _*)).as("ck"))
      .select(col("ck.idx").as("idx"), col("ck.v").as("v"), col("doc"))
    // ONE block shuffle; the guard lives IN the aggregate buffer (exact
    // count + at most maxBucket ids), mirroring minhashCandidates.
    // Surviving blocks (2..maxBucket ids, sorted) expand to i<j pairs.
    val pairs = blocked.groupBy(col("idx"), col("v"))
      .agg(BoundedCollectLong.boundedCollect(maxBucket)(col("doc")).as("bc"))
      .filter(col("bc.n") >= 2 && col("bc.n") <= maxBucket)
      .select(col("bc.items").as("docs"))
      .select(explode(flatten(transform(col("docs"), (x, i) =>
        transform(slice(col("docs"), i + lit(2), size(col("docs"))),
          y => struct(x.as("id_a"), y.as("id_b")))))).as("p"))
      .select(col("p.id_a"), col("p.id_b"))
      .distinct()
    pairs
      .join(sh.select(col("doc").as("id_a"), col("simhash").as("__ha")), "id_a")
      .join(sh.select(col("doc").as("id_b"), col("simhash").as("__hb")), "id_b")
      // the bounded-collect buffer carries longs; surface the caller's
      // id type unchanged (an IntegerType corpus gets int pairs back)
      .select(col("id_a").cast(docType).as("id_a"),
        col("id_b").cast(docType).as("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).as("hamming"))
      .filter(col("hamming") <= radius)
  }

  /** Cross-doc repeated-span EXCISION (Lee et al., "Deduplicating
    * Training Data Makes Language Models Better", 2021 — the
    * ExactSubstr pass): any word `n`-gram occurring ≥ `minOccurrences`
    * times in the corpus keeps its globally-first occurrence
    * (min (doc, pos)) and is cut everywhere else; overlapping cut
    * windows merge naturally through position-set union. Completes the
    * dedup family: line-level (q103/q111) and whole-shingle-set
    * similarity (q27/q28) REMOVE or PAIR whole docs — this rewrites
    * doc BODIES, the production corpus-build step that strips boiler
    * plate spans while keeping the surrounding prose.
    *
    * Returns (idCol, n_tokens, n_removed, clean) for EVERY input doc
    * (unchanged docs report n_removed = 0), ordered by the caller.
    *
    * Plan shape, deliberately explode-then-aggregate (never a
    * self-join): positional shingle hashes (narrow, ≈1 row per token),
    * a PARTIAL-aggregatable census `groupBy(h).agg(min(struct(id,pos)),
    * count)` — NOT a window: window partitions cannot map-side combine,
    * so a corpus-hot boilerplate shingle (10⁹ occurrences at 100 TB)
    * would serialize its whole position list through one task. The
    * two-level hash aggregate collapses hot keys map-side to a single
    * (first, count) row per partition, and the join back from the
    * tiny census relation (one row per distinct ≥minOccurrences
    * shingle) to the occurrence relation is AQE-skew-splittable. An
    * occurrence is cut iff it is not the census `first` — identical to
    * the old `row_number > 1` test since the rank was only ever
    * compared against 1. Then ONE doc-keyed aggregation of cut
    * positions, and the excision itself runs inside the final
    * projection as an indexed-filter HOF (the q111 trade: per-row
    * cycles over any shuffle of reconstructed text). Shuffle keys are
    * 8-byte hashes; nothing corpus-sized moves twice. The per-doc
    * `array_contains` test is O(|doc|·|cuts|) — microseconds on real
    * docs, and the degenerate all-repeated doc is bounded by |doc|²
    * exactly like the q111 intra-doc rule.
    *
    * The shingle hash is [[portableTokenHash]] (md5-derived) so any
    * engine replays the grouping exactly — the q130 oracle does, and
    * a 64-bit-collision false cut at corpus scale is the same accepted
    * fidelity trade as MinHash banding. Docs shorter than `n` tokens
    * produce no shingles and pass through whole. */
  def exciseRepeatedSpans(docs: DataFrame, idCol: String, textCol: String,
      n: Int, minOccurrences: Int = 2): DataFrame = {
    require(n >= 1, s"shingle width must be >= 1, got $n")
    require(minOccurrences >= 2,
      s"minOccurrences < 2 would excise every span; got $minOccurrences")
    val toks = filter(
      split(coalesce(col(textCol), lit("")), "\\s+"), t => t =!= "")
    val base = docs.select(col(idCol).as("id"), toks.as("w"))
    // positional shingles, 1-based pos to match SQL list indexing
    val occ = base
      .filter(size(col("w")) >= n)
      .select(col("id"), posexplode(transform(
        sequence(lit(1), size(col("w")) - (n - 1)),
        i => portableTokenHash(concat_ws(" ", slice(col("w"), i, lit(n))))))
        .as(Seq("p0", "h")))
      .select(col("id"), (col("p0") + 1).cast("long").as("pos"), col("h"))
    // census as a two-level hash aggregate (map-side partial combines
    // hot shingles down to one (first, count) row per partition — a
    // window over partitionBy(h) could not), kept only for shingles
    // that actually repeat enough to cut, then joined back on h. The
    // hot-key side of that join is the occurrence relation, which AQE
    // can skew-split; the census side is one row per repeated shingle.
    val census = occ
      .groupBy(col("h"))
      .agg(min(struct(col("id"), col("pos"))).as("first"),
        count(lit(1)).as("c"))
      .filter(col("c") >= minOccurrences)
      .select(col("h"), col("first"))
    val covered = occ
      .join(census, Seq("h"))
      .filter(struct(col("id"), col("pos")) =!= col("first"))
      .groupBy(col("id"))
      .agg(collect_list(col("pos")).as("rps"))
      .select(col("id"), array_distinct(flatten(transform(col("rps"),
        p => sequence(p, p + (n - 1))))).as("cps"))
    base.join(covered, Seq("id"), "left")
      .select(col("id").as(idCol),
        size(col("w")).cast("long").as("n_tokens"),
        coalesce(size(col("cps")), lit(0)).cast("long").as("n_removed"),
        concat_ws(" ", filter(col("w"), (t, i) =>
          coalesce(!array_contains(col("cps"), (i + 1).cast("long")),
            lit(true)))).as("clean"))
  }
}
