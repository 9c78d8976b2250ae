#!/bin/bash
# Round-2 on-chip backlog (NOTES.md "TPU backlog") in dependency order.
# One TPU process at a time; every step logs to benchmarks/results/logs/.
# Run from the repo root after the chip answers:
#   bash benchmarks/tpu_backlog.sh [stop_after]
# stop_after: spot | refresh | bign | tests | bench (default: run everything)
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

# retry_run <timeout_s> <cmd...> — run under timeout, retry once on hang/kill.
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

# retry_run_out <timeout_s> <outfile> <cmd...> — like retry_run, but stdout
# goes to <outfile>, truncated per attempt so a hung first attempt's partial
# jsonl lines never prefix the retry's output.
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

# 1. Numerics gate + headline rates for every resident route Mosaic compiles.
#    If fwd+bwd causal regresses vs the flat kernel (~111), bisect with
#    FLASHATTN_TPU_RB_MAXN=0 before refreshing sweeps.
step "spot_resident"
retry_run 2400 python benchmarks/spot_resident.py 2>&1 \
  | tee "$LOGD/spot_resident.log"

# 1b. Packed-sequence (segment_ids) Mosaic compile + numerics gate.
step "spot_segments"
retry_run 1800 python benchmarks/spot_segments.py 2>&1 \
  | tee "$LOGD/spot_segments.log"
[ "$STOP" = spot ] && exit 0

# 2. Refresh every committed sweep (committed causal jsonl still hold
#    flat-grid-era numbers). refresh_results.sh runs many python processes;
#    retry the whole script is wasteful, so each is retried here per-sweep
#    by rerunning the script — its `run` writes to .tmp then mv, so a rerun
#    only redoes what didn't land. Give it two chances.
step "refresh_results"
retry_run 7200 bash benchmarks/refresh_results.sh 2>&1 \
  | tee "$LOGD/refresh_results.log"
[ "$STOP" = refresh ] && exit 0

# 2b. Decode + SD end-to-end sweeps (their committed jsonl predate the
#     resident kernels and the 1e-30 grad-keepalive fix).
step "decode + diffusion"
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
retry_run_out 2400 benchmarks/results/lm_train_tokens.jsonl.tmp \
  python benchmarks/bench_lm.py \
  && mv benchmarks/results/lm_train_tokens.jsonl.tmp \
        benchmarks/results/lm_train_tokens.jsonl

# 3. Big-N resident ceilings: does bounded lookahead fix the N=8192 spill?
step "big-N resident spot"
# env(1) scopes the ceilings to this step: `VAR=x shell_function` would
# leak them into the later steps in bash.
retry_run 2400 env FLASHATTN_TPU_RC_MAXN=8192 FLASHATTN_TPU_RB_MAXN=8192 \
  python benchmarks/spot_resident.py --big-n 2>&1 | tee "$LOGD/spot_bign.log"
[ "$STOP" = bign ] && exit 0

# 4. Real-chip test suite (compiled Mosaic kernels; catches what interpret
#    mode cannot).
step "tpu test suite"
retry_run 5400 env FLASHATTN_TPU_TEST_BACKEND=tpu python -m pytest \
  tests/test_flash_fwd.py tests/test_flash_bwd.py tests/test_window.py \
  tests/test_layouts_sdpa.py tests/test_quant_gemm.py \
  tests/test_reference.py tests/test_native.py -q \
  2>&1 | tee "$LOGD/tpu_pytest.log"
[ "$STOP" = tests ] && exit 0

# 4a. In-kernel RDMA ring: 1-chip Mosaic compile + numerics gate (cross-
#     device RDMA itself is interpret-validated; tests/test_ring_kernel.py).
step "ring kernel spot"
retry_run 1800 python benchmarks/spot_ring_kernel.py 2>&1 \
  | tee "$LOGD/spot_ring_kernel.log"

# 4b. Device traces: fused fwd/bwd kernels + the degenerate 1-chip ring
#     step (the ring-overlap schedule artifact — VERDICT r1 item 4).
step "trace capture"
retry_run 1200 python benchmarks/capture_trace.py --causal \
  --out benchmarks/results/traces/kernel 2>&1 | tee "$LOGD/trace_kernel.log"
retry_run 1200 python benchmarks/capture_trace.py --ring \
  --out benchmarks/results/traces/ring 2>&1 | tee "$LOGD/trace_ring.log"

# 5. Headline bench line (what the driver records).
step "bench.py"
retry_run 2400 python bench.py 2>&1 | tee "$LOGD/bench.log"
echo "backlog done — refresh README/BASELINE/NOTES tables from the logs" >&2
