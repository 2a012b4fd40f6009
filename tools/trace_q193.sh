#!/bin/bash
# q193 drift trace: isolated A/B between HEAD (/root/repo) and the r12
# bench commit 83d1e10 (worktree at /tmp/graft_r12), ALTERNATING
# invocations so host-load drift lands on both sides equally. Each
# invocation times q193 alone with RUNS=3 (min-of-3 excludes the
# first-run frozen-model train, leaving the serve path — the quantity
# the drift question is about). 4 samples per side.
set -u
for i in 1 2 3 4; do
  for side in /root/repo /tmp/graft_r12; do
    v=$(cd "$side" && SPARK_GRAFT_BENCH_ONLY=q193 SPARK_GRAFT_BENCH_RUNS=3 \
      SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
      sbt -batch "runMain graft.Bench" 2>/dev/null | grep '"metric"' |
      sed 's/.*q193_ann_opq_frozen_serve":\([0-9.]*\).*/\1/')
    echo "sample=$i side=$side q193=$v"
  done
done
