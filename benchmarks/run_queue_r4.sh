#!/bin/bash
# Round-4 TPU measurement queue: the round-3 pending table in BASELINE.md.
# Probe-gated between steps (one wedged compile must not take out the
# rest); the Mosaic-riskiest packed-sublane A/B runs LAST. Each step under
# `timeout` so a hang is bounded.
set -u
cd /root/repo
OUT=/tmp/queue_r4
mkdir -p $OUT

probe() {
  timeout 120 python -c "import jax; jax.numpy.zeros(1).block_until_ready(); print('TPU OK')" >/dev/null 2>&1
}

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  if ! probe; then echo "SKIP $name (probe failed)" | tee -a $OUT/log; return 1; fi
  echo "=== $name: $* (timeout ${tmo}s) $(date -u +%H:%M:%S)" | tee -a $OUT/log
  timeout "$tmo" python "$@" > "$OUT/$name.out" 2>&1
  local rc=$?
  echo "=== $name rc=$rc $(date -u +%H:%M:%S)" | tee -a $OUT/log
  tail -5 "$OUT/$name.out" >> $OUT/log
  return 0
}

run fused_train_nsf      2400 benchmarks/bench_fused_train.py
run fused_train_nsf_bf16 1800 benchmarks/bench_fused_train.py --matmul-precision bfloat16 --batch 512 2048
run fused_train_maf      1800 benchmarks/bench_fused_train.py --family maf --batch 512 2048
run fused_train_mademog  1800 benchmarks/bench_fused_train.py --family mademog --batch 512 2048
run fused_nsf_cond       1200 benchmarks/bench_fused_nsf.py --context 8
run fused_maf_cond       1200 benchmarks/bench_fused_maf.py --context 8
run fused_mademog        1200 benchmarks/bench_fused_mademog.py
run glow_layout_rq       1800 benchmarks/bench_glow_layout.py --coupling rq
run glow_layout_affine   1800 benchmarks/bench_glow_layout.py --coupling affine
run fused_nsf_packed     1200 benchmarks/bench_fused_nsf.py --packed
echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a $OUT/log
