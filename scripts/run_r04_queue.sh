#!/usr/bin/env bash
# Round-4 on-chip measurement queue (VERDICT r3 #2, #4, #5, #6).
# One chip -> strictly serial. Each step logs to logs/r04/<name>.log and
# appends "rc=<code>" so the summary is honest about what ran (ADVICE r3).
set -u
cd "$(dirname "$0")/.."
mkdir -p logs/r04
SUM=logs/r04/summary.log
: > "$SUM"

run() {
  local name="$1"; shift
  local log="logs/r04/${name}.log"
  echo "== ${name}: $*" | tee -a "$SUM"
  local t0=$SECONDS
  timeout 1500 "$@" > "$log" 2>&1
  local rc=$?
  echo "rc=${rc}" >> "$log"
  echo "   rc=${rc} ($((SECONDS - t0))s)" | tee -a "$SUM"
}

run trained_accuracy  python scripts/vith_trained_accuracy.py --steps 300 --bs 16
run train_decompose   python scripts/train_decompose.py --batch 32 --iters 10
run bench_vith_train      python bench.py --model hamer_vith --train --batch_size 32
run bench_wild_train      python bench.py --model hands_light --train --batch_size 64
run bench_hon_infer       python bench.py --model handoccnet --batch_size 64
run bench_hon_train       python bench.py --model handoccnet --train --batch_size 64
run bench_arctic_infer    python bench.py --model arctic_sf_light --batch_size 64
run bench_arctic_train    python bench.py --model arctic_sf_light --train --batch_size 64
run export_onchip     python scripts/export_onchip_check.py --bs 256 --int8_static --fast_gelu
echo "QUEUE DONE" | tee -a "$SUM"
