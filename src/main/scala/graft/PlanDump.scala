package graft

/** Regenerates PLANS.md: executed physical plans for representative
  * queries (run on sf0.001; plan SHAPE is SF-independent).
  * `sbt "runMain graft.PlanDump"` after changing query plans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.build("local[4]", 4, "graft-plandump")
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = "/root/testdata/sf0.001"
    val picks = Seq(
      "q02_filter_project" -> "pushdown + pruning reach the scan",
      "q04_join_inner_revenue" -> "dimension broadcast joins, partial+final agg",
      "q09_topk_global" -> "TakeOrderedAndProject (no global sort)",
      "q14_pivot_counts" -> "pivot = ONE hash aggregation with k measures",
      "q31_knn_bruteforce" -> "broadcast queries over fanned-out corpus + bounded-heap agg",
      "q48_asof_join" -> "as-of join as union + windowed last_value (one shuffle, no inequality join)",
      "q56_sessionize" -> "sessionization = one user-key shuffle, lag window inside partitions",
      "q62_sliding_revenue" -> "RANGE-frame window over the post-aggregation calendar relation",
      "q78_repetition" -> "map-only quality signals: scan -> one narrow UDF -> sort, zero shuffle",
      "q79_ann_quantized" -> "quantized knn: narrow quantization, broadcast queries, native top-k agg",
      "q84_corpus_shuffle" -> "two-phase global ranking: bucket-parallel windows + broadcast offsets (no one-task sort)",
      "q85_ngram_leaks" -> "decontamination: eval grams broadcast, train corpus streams unshuffled",
      "q94_length_trim" -> "Tukey trim: broadcast fence join over the corpus scan, no data shuffle",
      "q99_token_budget" -> "token-budget cut: bucket-parallel prefix sums + broadcast offsets (q84's two-phase shape)",
      "q103_line_dedup" -> "line dedup: map-side min-(id,pos) combine on the line key, winner join-back, per-doc rebuild",
      "q104_bm25_topk" -> "BM25: token stream filtered to the query pre-shuffle, stats/idf broadcast, TakeOrdered top-k",
      "q106_epoch_mix" -> "epoch replication: narrow CASE+sequence explode, then two-phase position ranking",
      "q110_triangle_count" -> "degree-ordered triangles: node-sized degree relation, oriented wedge self-join, semi-join close",
      "q111_intradoc_dedup" -> "intra-doc line dedup: zero shuffles, the whole rule inside the scan projection",
      "q117_weighted_sample" -> "A-ES weighted sample: narrow hash+ln projection into TakeOrderedAndProject, zero shuffles",
      "q118_session_native" -> "native session_window: one user-key shuffle, sessions merged inside partitions",
      "q120_group_sample" -> "per-group sample: map-side WindowGroupLimit heap before the single group-key shuffle",
      "q122_hard_negatives" -> "hard-negative mining: one centroid broadcast, cell-equi-join candidates, label filter below the cosine kernel, heap top-k",
      "q125_dist_drift" -> "distribution drift: map-side histogram collapse, then joins/aggregates over histogram-sized relations only",
      "q129_lang_profile" -> "language ID: narrow n-gram explode, broadcast profile join, partial (doc,lang) agg, tiny argmax agg",
      "q130_repeated_spans" -> "repeated-span excision: partial-agg shingle census (map-side combinable, no window), skew-splittable join-back, doc-keyed cut agg, scan-local excision HOF",
      "q138_pack_split_pieces" -> "split-aware packing: narrow piece explode, one group-key shuffle, streamed sortWithinPartitions+mapPartitions walk (no window, no group materialization)",
      "q134_bigram_lm" -> "bigram LM: pair tf aggregated first, one-row-per-key LM joins (no fan-out), integer dot-product scoring",
      "q135_semantic_decontaminate" -> "semantic decontamination: one centroid broadcast, cell equi-join candidates with boundary parity below the join, never all-pairs",
      "q143_ann_ivf_pq" -> "IVF-PQ: narrow cell assignment + narrow PQ encode, broadcast probed-cells equi-join candidates (never corpus×queries), code-relation scoring into the bounded heap",
      "q145_contamination_frac" -> "per-train-doc contamination: eval grams broadcast-semi-joined under a map-side-combined per-doc count, train corpus streams once",
      "q147_unigram_segments" -> "unigram Viterbi: corpus touched once by the word-count shuffle, piece vocabulary broadcast into the candidate join, DP a single HOF pass per word — no per-position shuffle, no window",
      "q150_perplexity_buckets" -> "CCNet buckets: no per-group ntile window — band-parallel row_number + broadcast (group, band) offsets + ANSI-NTILE arithmetic",
      "q152_unigram_frozen_vocab" -> "frozen-vocab encode: new corpus pays one word-count shuffle; segmentation + id tables broadcast; unk rows via left joins",
      "q154_sft_mask_spans" -> "SFT masks: one conversation-key aggregate (per-entity collect + HOF offset fold), no window, no join",
      "q157_span_corrupt" -> "span corruption: pure narrow projection — tokenize, block transform, two string folds; zero shuffles before the oracle sort",
      "q166_quality_score_fixed" -> "model quality scoring: single narrow hashed-TF explode + map-side-combined (id, bucket) agg, dim-sized weight relation BROADCAST (never a literal), sigmoid last",
      "q168_ann_ivf_pq_two_level" -> "two-level IVF-PQ: only the sqrt(K) super model is a literal; sub-centroids broadcast as a RELATION; same cell-equi-join + code-only ADC tail as q143",
      "q169_unigram_em_train" -> "EM to target: corpus pays ONE word-count shuffle; each round a vocab-broadcast Viterbi over the distinct-word relation + two vocab-sized aggregates",
      "q176_url_blocklist" -> "blocklist gate: all HASH joins — distinct hosts (narrow string agg) explode to suffixes, broadcast semi-join the blocklist, hit hosts broadcast back into the anti join; the corpus never shuffles",
      "q179_psl_domain_report" -> "full-PSL domains: per-HOST partial agg is the corpus's one shuffle; suffix/rule equi joins and the host->domain map join run on host-sized relations; rules broadcast as data",
      "q180_warc_extract" -> "WARC round-trip: one aggregate shuffle assembles archives, the record scanner is a narrow mapPartitions pass, extraction fuses — no join anywhere",
      "q181_index_drift_alarm" -> "drift alarm: two narrow literal-model norm passes reduced to single-row aggregates — per-append-batch cheap by construction",
      "q182_ann_opq_rotated" -> "OPQ rotated PQ: the rotation joins as a ONE-ROW broadcast relation (no dim-squared plan literal — the r10 fix); the ADC tail is q142's unchanged",
      "q184_ann_opq_residual_two_level" -> "composed OPQ-residual-two-level SERVING: the corpus encodes once into the stored (c_id, cell, codes) relation, queries rotate through the broadcast row and search OVER the codes via cell equi-joins — no K-sized and no dim-sized literal anywhere in the plan",
      "q187_url_canonical_dedup" -> "canonical-URL dedup: the canonical key is a narrow expression; keeper election is ONE partial-combined min-agg on the key plus a semi join back — the exact-dedup cost class, no window, no nested loop",
      "q191_script_mix" -> "script composition: the per-character explode (the heaviest narrow text pass) reduces map-side into per-group conditional-sum partials before the only shuffle — corpus-sized rows never cross the wire",
      "q195_image_phash_neardup" -> "perceptual near-dup: image decode + hash is one narrow mapPartitions pass (payload bytes never shuffle — only the 8-byte hash moves), 4x16-bit band explode into a census-capped bucket equi-join, exact bit_count recheck, min-struct keeper election — the q28 banded-LSH shape on images",
      "q198_image_dual_hash_neardup" -> "dual-hash near-dup: ONE decode pass emits both 8-byte hashes, 8 bands (4 per hash) through the shared census-capped bucket join, confirmation on the SUMMED bit_count — same cost class as q195 with twice the candidacy surface and none of its degenerate-band blindness",
      "q199_media_doc_gate_perceptual" -> "perceptual media gate: md5 fingerprints and perceptual hashes both computed in narrow passes over the payload IN PLACE (payload bytes never shuffle); keeper election, hash semi-join, banded near-dup, originals anti-join, and owner-doc distinct all run on fingerprint/hash-sized relations",
      "q200_video_neardup" -> "video near-dup: the container walk + per-frame decode + aHash is one narrow mapPartitions pass; frame-level banded census-capped bucket join, per-(video,video) distinct-matched-frame count, division-free basis-point overlap filter, min-struct keeper election — q28 banding lifted to frame sets",
      "q202_audio_neardup" -> "audio near-dup: RIFF parse + envelope hash is one narrow mapPartitions pass (payload bytes never shuffle — only the 8-byte envelope hash moves); the tail is literally the shared banded near-dup core",
      "q203_media_doc_gate_unified" -> "unified multimodal gate: ONE byte-fingerprint shuffle, three narrow per-kind decode passes over disjoint kind partitions (payloads stay in place), keepers restrict HASH relations only, the three dup sets union id-sized into one anti-join election — the SCALE.md cost-class claim, in the plan",
      "q204_media_incremental_dedup" -> "incremental media dedup: the BATCH index broadcasts (censused band relations under BroadcastExchange), the HISTORY index streams map-side into every BroadcastHashJoin — no shuffle ever touches history rows; keeper election runs on matched-pair (batch-bounded) relations only",
      "q206_text_incremental_dedup" -> "incremental TEXT near-dup: the q204 shape for documents — batch band rows broadcast (bounded-collect capped), the history band index streams map-side through the census and candidate BroadcastHashJoins, the history SET index streams through the verification join; the one history-derived exchange is the batch-key-restricted census (batch-sized by construction); exact-Jaccard re-check and keeper election run on batch-bounded candidate relations",
      "q207_warc_media_extract" -> "WARC media leg: one aggregate shuffle assembles the archives (fixture), the record scanner + byte-level envelope strip + magic sniff are ONE narrow mapPartitions-and-projection pass — media payloads route by body bytes and never shuffle",
      "q209_warc_routed_split" -> "routed crawl split: ONE scanner pass feeds BOTH legs — scan, content-length record split, byte-level envelope strip, magic sniff, and doc/media routing fuse into a single narrow mapPartitions chain; no join glues legs back together, payloads never shuffle, and the archive inflates exactly once (the two-leg composition inflates it twice — the cost the shared splitter halves)",
      "q212_archive_ingest_cycle" -> "the FULL archiveIngestStep batch body, media gate ON: one pinned routed relation feeds the media leg (hash build, intra election, history judge) and the doc leg (extraction, quality gate, exact dedup — ONE batch-bounded shuffle, ownership evidence equi-join — batch-bounded by construction, gallery anti-join, then the text judge off an eagerly-pinned survivor frame so the judge's ~3 tokenization passes replay neither extraction nor the dedup shuffle); both histories stream map-side (the q204/q206 contracts), deltas join back to URLs against the pinned routed relation",
      "q217_semantic_occupancy_alarm" -> "occupancy drift alarm: the batch assignment pins once (centroids broadcast, bounded-heap top-nProbe aggregate — no window sort), the history census is batch-cell-restricted and map-side-combined (only (cell, count) partials shuffle — history id/vec rows never do), and the report is a crossJoin of two ONE-ROW aggregates with integer basis-point division")
    val out = new StringBuilder
    out ++= "# PLANS — executed physical plans of representative queries\n\n"
    out ++= "Generated by `graft.PlanDump` on sf0.001 (plan shape is\n"
    out ++= "SF-independent); properties are enforced by PlanAuditSpec.\n"
    picks.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // finalize AQE
      out ++= s"\n## $name — $why\n\n```\n"
      out ++= df.queryExecution.executedPlan.toString.take(4000)
      out ++= "\n```\n"
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PLANS.md"), out.toString)
    println(s"[plandump] wrote PLANS.md (${out.length} chars)")
    spark.stop()
  }
}
