#!/bin/bash
# Round-5 queue, part b: the steps the 09:35-10:30 tunnel wedge ate, the
# fixed profiler, and the remaining VERDICT items (1 roofline, 3, 4, 6).
set -u
cd /root/repo
OUT=/tmp/queue_r5
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

run hw_numerics      1800 benchmarks/hw_numerics.py
run verify_user      1800 /tmp/verify_r5.py
run serve_unpacked2  1200 benchmarks/bench_fused_nsf.py --packed off
run serve_roll2      1200 benchmarks/bench_fused_nsf.py --packed roll
run prof_maf_fix     1800 benchmarks/profile_fused_train.py --family maf --batch 2048
run prof_mademog_fix 1800 benchmarks/profile_fused_train.py --family mademog --batch 2048
run train_wide384    2400 benchmarks/bench_fused_train.py --hidden 384 --batch 1024 4096 8192
run train_wide512    2400 benchmarks/bench_fused_train.py --hidden 512 --batch 8192
run vpu_roofline     1800 benchmarks/vpu_roofline.py
run bench_headline   1800 bench.py
run convergence      2400 benchmarks/convergence_largebatch.py

echo "QUEUE B DONE $(date -u +%H:%M:%S)" | tee -a $OUT/log
