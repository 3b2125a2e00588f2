#!/usr/bin/env bash
# Round-5 on-chip measurement queue (VERDICT r4 #1, #2, #3, #5, #7).
# The r04 queue plus the int8 knock-out ablation and the EPIC-5000-scale
# end-to-end eval sweep. One chip -> strictly serial. Each step logs to
# logs/r05/<name>.log and appends "rc=<code>"; the summary is honest about
# what ran. Ordered so the results that unblock further round-5 work
# (ablation attribution, train-step decomposition) land first.
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r05
SUM=logs/r05/summary.log
: > "$SUM"

run() {
  local name="$1"; shift
  local tmo="$1"; shift
  local log="logs/r05/${name}.log"
  echo "== ${name}: $*" | tee -a "$SUM"
  local t0=$SECONDS
  timeout "$tmo" "$@" > "$log" 2>&1
  local rc=$?
  echo "rc=${rc}" >> "$log"
  echo "   rc=${rc} ($((SECONDS - t0))s)" | tee -a "$SUM"
}

run int8_ablation     2700 python scripts/vith_int8_ablation.py --batch 256 --iters 30
run train_decompose   1800 python scripts/train_decompose.py --batch 32 --iters 10
run bench_vith_train      1500 python bench.py --model hamer_vith --train --batch_size 32
run bench_wild_train      1500 python bench.py --model hands_light --train --batch_size 64
run bench_hon_infer       1500 python bench.py --model handoccnet_light --batch_size 64
run bench_hon_train       1500 python bench.py --model handoccnet_light --train --batch_size 64
run bench_arctic_infer    1500 python bench.py --model arctic_sf_light --batch_size 64
run bench_arctic_train    1500 python bench.py --model arctic_sf_light --train --batch_size 64
run export_onchip     1500 python scripts/export_onchip_check.py --bs 256 --int8_static --fast_gelu
run epic5000_sweep    2400 python scripts/epic5000_sweep.py --n 5000 --bs 128
run epic5000_packed   2400 python scripts/epic5000_sweep.py --n 5000 --bs 128 --packed
run trained_accuracy  3000 python scripts/vith_trained_accuracy.py --steps 300 --bs 16
echo "QUEUE DONE" | tee -a "$SUM"
