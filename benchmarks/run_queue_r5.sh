#!/bin/bash
# Round-5 TPU measurement queue (VERDICT items 1, 3, 4 + ADVICE 1):
#   - megakernel third attack: unpacked vs packed-roll A/B, serving+training
#   - fused MAF decomposition at its worst measured point (batch 2048)
#   - wide-operating-point fused-vs-XLA (hidden 512) for the MFU ceiling
# Waits for the tunnel to recover first (same outage mode as rounds 3/4),
# probe-gated between steps, everything under `timeout`.
set -u
cd /root/repo
OUT=/tmp/queue_r5
mkdir -p $OUT

probe() {
  timeout 120 python -c "import jax; jax.numpy.zeros(1).block_until_ready(); print('TPU OK')" >/dev/null 2>&1
}

echo "waiting for TPU recovery $(date -u +%H:%M:%S)" | tee -a $OUT/log
until probe; do
  echo "probe failed $(date -u +%H:%M:%S)" >> $OUT/log
  sleep 180
done
echo "TPU UP $(date -u +%H:%M:%S)" | tee -a $OUT/log

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

# --- item 1: serving A/B, unpacked vs roll (same session, back to back) ---
run serve_unpacked   1200 benchmarks/bench_fused_nsf.py --packed off
run serve_roll       1200 benchmarks/bench_fused_nsf.py --packed roll

# --- item 1 decisive: the one-kernel fused trainer with the roll stage ---
run train_unpacked   1800 benchmarks/bench_fused_train.py --batch 512 1024 2048 --packed off
run train_roll       1800 benchmarks/bench_fused_train.py --batch 512 1024 2048 --packed roll

# --- item 3: name the fused-AR training overhead ---
run prof_maf_2048    1800 benchmarks/profile_fused_train.py --family maf --batch 2048
run prof_mademog_2048 1800 benchmarks/profile_fused_train.py --family mademog --batch 2048

# --- item 4: wide operating point (hidden 512) ---
run train_wide       2400 benchmarks/bench_fused_train.py --hidden 512 --batch 1024 4096 8192

echo "QUEUE DONE $(date -u +%H:%M:%S)" | tee -a $OUT/log
