#!/bin/bash
# Round-16 bench-series anchor: isolated alternating A/B between HEAD
# (/root/repo) and the r14 bench commit c3314a5 (worktree at
# /tmp/graft_r14) on THREE of BENCH_r15's x1.3-1.4 movers in three
# different untouched families — q203 (media doc gate), q64 (as-of
# broadcast), q27 (ngram jaccard). The trace_q153.sh protocol:
# ALTERNATING invocations so host-load drift lands on both sides
# equally; each invocation times the queries alone with RUNS=3
# (min-of-3 excludes first-run warmup). 4 samples per side.
set -u
Q="q203_media_doc_gate_unified,q64_asof_broadcast,q27_ngram_jaccard"
for i in 1 2 3 4; do
  for side in /root/repo /tmp/graft_r14; do
    line=$(cd "$side" && SPARK_GRAFT_BENCH_ONLY=$Q SPARK_GRAFT_BENCH_RUNS=3 \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"')
    q203=$(echo "$line" | sed 's/.*q203_media_doc_gate_unified":\([0-9.]*\).*/\1/')
    q64=$(echo "$line" | sed 's/.*q64_asof_broadcast":\([0-9.]*\).*/\1/')
    q27=$(echo "$line" | sed 's/.*q27_ngram_jaccard":\([0-9.]*\).*/\1/')
    echo "sample=$i side=$side q203=$q203 q64=$q64 q27=$q27"
  done
done
