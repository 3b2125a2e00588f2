#!/usr/bin/env bash
# Round-5 queue fix-ups: the four steps that failed in run_r05_queue.sh,
# re-run with their fixes (handoccnet method alias, cached packed shards,
# a longer export budget, lr 5e-5 for the trained-accuracy ladder).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r05
SUM=logs/r05/summary.log

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

run bench_hon_infer   1500 python bench.py --model handoccnet_light --batch_size 64
run bench_hon_train   1500 python bench.py --model handoccnet_light --train --batch_size 64
run epic5000_packed   2400 python scripts/epic5000_sweep.py --n 5000 --bs 128 --packed
run trained_accuracy  3600 python scripts/vith_trained_accuracy.py --steps 1500 --bs 16
run export_onchip     3600 python scripts/export_onchip_check.py --bs 256 --int8_static --fast_gelu
echo "FIXUPS DONE" | tee -a "$SUM"
