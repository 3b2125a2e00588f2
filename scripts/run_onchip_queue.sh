#!/bin/bash
# Run the on-chip measurement queue (TODO.md "Pending on-chip
# measurements") in order, each bounded, logging to logs/onchip_queue/.
# Usage: bash scripts/run_onchip_queue.sh   (from the repo root, TPU attached)
set -u
cd "$(dirname "$0")/.."
OUT=logs/onchip_queue
mkdir -p "$OUT"

run() {
    name=$1; shift
    echo "=== $name: $*" | tee -a "$OUT/summary.log"
    timeout 1800 "$@" > "$OUT/$name.log" 2>&1
    rc=$?
    echo "=== $name rc=$rc" | tee -a "$OUT/summary.log"
    tail -n 25 "$OUT/$name.log"
}

timeout 240 python -c "import jax; print(jax.devices())" || {
    echo "TPU not reachable; aborting"; exit 1; }

run int8_fastgelu_accuracy python scripts/vith_int8_accuracy.py --fast_gelu
run conv_int8_probe        python scripts/conv_int8_probe.py
run wildhands_int8_bench   python bench.py --model hands_light --int8
run tile_autotune          python scripts/vith_tile_autotune.py
run numerics_check         python scripts/chip_numerics_check.py
run headline               python bench.py
