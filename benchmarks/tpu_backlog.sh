#!/bin/bash
# Round-2 on-chip backlog (NOTES.md "TPU backlog") in dependency order.
# One TPU process at a time; every step logs to benchmarks/results/logs/.
# Run from the repo root after the chip answers:
#   bash benchmarks/tpu_backlog.sh [stop_after]
# stop_after: spot | refresh | bign | tests | bench (default: run everything)
set -e
cd "$(dirname "$0")/.."
LOGD=benchmarks/results/logs
mkdir -p "$LOGD"
STOP=${1:-bench}

step() { echo "=== [$(date +%H:%M:%S)] $1" >&2; }

# 1. Numerics gate + headline rates for every resident route Mosaic compiles.
#    If fwd+bwd causal regresses vs the flat kernel (~111), bisect with
#    FLASHATTN_TPU_RB_MAXN=0 before refreshing sweeps.
step "spot_resident"
python benchmarks/spot_resident.py 2>&1 | tee "$LOGD/spot_resident.log"
[ "$STOP" = spot ] && exit 0

# 2. Refresh every committed sweep (committed causal jsonl still hold
#    flat-grid-era numbers).
step "refresh_results"
bash benchmarks/refresh_results.sh 2>&1 | tee "$LOGD/refresh_results.log"
[ "$STOP" = refresh ] && exit 0

# 2b. Decode + SD end-to-end sweeps (their committed jsonl predate the
#     resident kernels and the 1e-30 grad-keepalive fix).
step "decode + diffusion"
python benchmarks/bench_decode.py > benchmarks/results/decode.jsonl.tmp \
  && mv benchmarks/results/decode.jsonl.tmp benchmarks/results/decode.jsonl
python benchmarks/bench_diffusion.py --mode sample \
  > benchmarks/results/sd_sample_its.jsonl.tmp \
  && mv benchmarks/results/sd_sample_its.jsonl.tmp \
        benchmarks/results/sd_sample_its.jsonl
python benchmarks/bench_diffusion.py --mode train \
  > benchmarks/results/sd_train_its.jsonl.tmp \
  && mv benchmarks/results/sd_train_its.jsonl.tmp \
        benchmarks/results/sd_train_its.jsonl
python benchmarks/bench_lm.py > benchmarks/results/lm_train_tokens.jsonl.tmp \
  && mv benchmarks/results/lm_train_tokens.jsonl.tmp \
        benchmarks/results/lm_train_tokens.jsonl

# 3. Big-N resident ceilings: does bounded lookahead fix the N=8192 spill?
step "big-N resident spot"
FLASHATTN_TPU_RC_MAXN=8192 FLASHATTN_TPU_RB_MAXN=8192 \
  python benchmarks/spot_resident.py --big-n 2>&1 | tee "$LOGD/spot_bign.log"
[ "$STOP" = bign ] && exit 0

# 4. Real-chip test suite (compiled Mosaic kernels; catches what interpret
#    mode cannot).
step "tpu test suite"
FLASHATTN_TPU_TEST_BACKEND=tpu python -m pytest \
  tests/test_flash_fwd.py tests/test_flash_bwd.py tests/test_window.py \
  tests/test_layouts_sdpa.py tests/test_quant_gemm.py \
  tests/test_reference.py tests/test_native.py -q \
  2>&1 | tee "$LOGD/tpu_pytest.log"
[ "$STOP" = tests ] && exit 0

# 5. Headline bench line (what the driver records).
step "bench.py"
python bench.py 2>&1 | tee "$LOGD/bench.log"
echo "backlog done — refresh README/BASELINE/NOTES tables from the logs" >&2
