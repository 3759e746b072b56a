#!/bin/bash
# One-shot TPU measurement sequence (run after compute-path edits, ONCE —
# each compute-path change invalidates .jax_cache + .jax_aot, so batch all
# edits first; see PERFORMANCE.md).
#
# Usage: PYTHONPATH=/root/repo:/root/.axon_site bash scripts/tpu_measure_all.sh
# Writes logs under /tmp/tpu_measure/. NEVER run two TPU jobs concurrently.
set -u
cd "$(dirname "$0")/.."
OUT=${TPU_MEASURE_OUT:-/tmp/tpu_measure}
mkdir -p "$OUT"
export PYTHONPATH=${PYTHONPATH:-/root/repo:/root/.axon_site}

echo "[1/5] attention block-size probe" | tee "$OUT/status"
timeout 2400 python scripts/probe_attention.py > "$OUT/probe_attention.log" 2>&1

echo "[2/5] U-Net per-step microbench (in-scan)" | tee -a "$OUT/status"
timeout 3600 python scripts/microbench_scan.py > "$OUT/microbench.log" 2>&1

echo "[3/5] full bench (warmup recompile expected after compute-path edits)" \
  | tee -a "$OUT/status"
timeout 5400 python bench.py > "$OUT/bench.log" 2>&1

echo "[4/5] fresh-process warm-start (AOT store + prefetch cold cliff)" \
  | tee -a "$OUT/status"
DIFFHANDLES_AOT_DEBUG=1 timeout 3600 python bench.py --skip-warmup --batched 0 \
  > "$OUT/bench_cold.log" 2>&1

echo "[5/5] done" | tee -a "$OUT/status"
grep -h '"metric"' "$OUT"/bench*.log || true
