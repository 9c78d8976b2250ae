#!/bin/bash
# Round-3 on-chip backlog in dependency order. Every entry point takes the
# TPU flock (utils/tpu_lock.py), so a stray concurrent process serializes
# instead of corrupting timings. Logs to benchmarks/results/logs/.
#   bash benchmarks/tpu_backlog.sh [stop_after]
# stop_after: spot | refresh | sd | tests | bench (default: run everything)
#
# Tunnel flakiness: ~every 3rd TPU process can hang at startup with no error,
# so every step runs under `timeout` and is retried once (the compile cache
# makes the retry cheap). A step that times out twice aborts the backlog.
set -e
cd "$(dirname "$0")/.."
LOGD=benchmarks/results/logs
mkdir -p "$LOGD"
STOP=${1:-bench}

step() { echo "=== [$(date +%H:%M:%S)] $1" >&2; }

retry_run() {
  local t=$1; shift
  if timeout "$t" "$@"; then return 0; fi
  local rc=$?
  if [ "$rc" -ne 124 ] && [ "$rc" -ne 143 ] && [ "$rc" -ne 137 ]; then
    return "$rc" # real failure, not a hang — don't mask it
  fi
  echo "--- step hung (rc=$rc) — retrying once: $*" >&2
  sleep 20
  timeout "$t" "$@"
}

retry_run_out() {
  local t=$1 out=$2; shift 2
  if timeout "$t" "$@" > "$out"; then return 0; fi
  local rc=$?
  if [ "$rc" -ne 124 ] && [ "$rc" -ne 143 ] && [ "$rc" -ne 137 ]; then
    return "$rc"
  fi
  echo "--- step hung (rc=$rc) — retrying once: $*" >&2
  sleep 20
  timeout "$t" "$@" > "$out"
}

# 1. Numerics gate + headline rates for every resident route (median-of-5
#    timing; the round-2 204-TFLOPS outlier was a single-shot min).
step "spot_resident"
retry_run 2400 python benchmarks/spot_resident.py 2>&1 \
  | tee "$LOGD/spot_resident.log"

step "spot_segments"
retry_run 1800 python benchmarks/spot_segments.py 2>&1 \
  | tee "$LOGD/spot_segments.log"
[ "$STOP" = spot ] && exit 0

# 2. Roofline + every attention sweep, one session (refresh_results.sh
#    measures the roofline first; every "ours" row carries mfu + spread).
step "refresh_results"
retry_run 9000 bash benchmarks/refresh_results.sh 2>&1 \
  | tee "$LOGD/refresh_results.log"
[ "$STOP" = refresh ] && exit 0

# 3. Decode, SD sample/train/train-LoRA, LM sweeps.
step "decode + diffusion + lm"
retry_run_out 2400 benchmarks/results/decode.jsonl.tmp \
  python benchmarks/bench_decode.py \
  && mv benchmarks/results/decode.jsonl.tmp benchmarks/results/decode.jsonl
retry_run_out 3600 benchmarks/results/sd_sample_its.jsonl.tmp \
  python benchmarks/bench_diffusion.py --mode sample \
  && mv benchmarks/results/sd_sample_its.jsonl.tmp \
        benchmarks/results/sd_sample_its.jsonl
retry_run_out 3600 benchmarks/results/sd_train_its.jsonl.tmp \
  python benchmarks/bench_diffusion.py --mode train \
  && mv benchmarks/results/sd_train_its.jsonl.tmp \
        benchmarks/results/sd_train_its.jsonl
# the reference's actual training row is SDXL *LoRA* (README.md:134-154)
retry_run_out 3600 benchmarks/results/sd_train_lora_its.jsonl.tmp \
  python benchmarks/bench_diffusion.py --mode train_lora \
  && mv benchmarks/results/sd_train_lora_its.jsonl.tmp \
        benchmarks/results/sd_train_lora_its.jsonl
retry_run_out 2400 benchmarks/results/lm_train_tokens.jsonl.tmp \
  python benchmarks/bench_lm.py \
  && mv benchmarks/results/lm_train_tokens.jsonl.tmp \
        benchmarks/results/lm_train_tokens.jsonl
[ "$STOP" = sd ] && exit 0

# 4. Real-chip test suite (compiled Mosaic kernels; catches what interpret
#    mode cannot).
step "tpu test suite"
retry_run 5400 env FLASHATTN_TPU_TEST_BACKEND=tpu python -m pytest \
  tests/test_flash_fwd.py tests/test_flash_bwd.py tests/test_window.py \
  tests/test_layouts_sdpa.py tests/test_quant_gemm.py \
  tests/test_reference.py tests/test_native.py -q \
  2>&1 | tee "$LOGD/tpu_pytest.log"
[ "$STOP" = tests ] && exit 0

# 4a. In-kernel RDMA ring: 1-chip Mosaic compile + numerics gate.
step "ring kernel spot"
retry_run 1800 python benchmarks/spot_ring_kernel.py 2>&1 \
  | tee "$LOGD/spot_ring_kernel.log"

# 4b. Device traces: fused fwd/bwd kernels + the degenerate 1-chip ring.
step "trace capture"
retry_run 1800 python benchmarks/capture_trace.py --causal \
  --out benchmarks/results/traces/kernel 2>&1 | tee "$LOGD/trace_kernel.log"
retry_run 1800 python benchmarks/capture_trace.py --ring \
  --out benchmarks/results/traces/ring 2>&1 | tee "$LOGD/trace_ring.log"

# 5. Headline bench line (what the driver records).
step "bench.py"
retry_run 2400 python bench.py 2>&1 | tee "$LOGD/bench.log"
echo "backlog done — refresh README/BASELINE/NOTES tables from the logs" >&2
