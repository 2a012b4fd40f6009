#!/bin/bash
# q153 drift trace: isolated A/B between HEAD (/root/repo) and the r13
# bench commit 53866d4 (worktree at /tmp/graft_r13), ALTERNATING
# invocations so host-load drift lands on both sides equally (the
# trace_q193.sh protocol). Each invocation times q153 alone with
# RUNS=3 (min-of-3 excludes first-run warmup, leaving the steady BPE
# learn+apply path — the quantity the +14% question is about).
# 4 samples per side.
set -u
for i in 1 2 3 4; do
  for side in /root/repo /tmp/graft_r13; do
    v=$(cd "$side" && SPARK_GRAFT_BENCH_ONLY=q153 SPARK_GRAFT_BENCH_RUNS=3 \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' |
      sed 's/.*q153_bpe_frozen_vocab":\([0-9.]*\).*/\1/')
    echo "sample=$i side=$side q153=$v"
  done
done
