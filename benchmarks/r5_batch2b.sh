#!/bin/bash
# r5 batch 2b: remaining jaxfa refreshes with PRE-SEEDED tuned blocks
# (per-point causal autotune wedged in a pathological vendor-kernel
# compile; causal entries are seeded from the fwd-tuned blocks), then
# win32k + ours anchors.
cd "$(dirname "$0")/.."
set -x
export FLASHATTN_TPU_TUNE_JAXFA=0
L=benchmarks/results/logs
timeout 7200 python benchmarks/bench_attention.py --mode fwd --causal --impls jaxfa > $L/r5_jaxfa_fwd_causal.log 2>&1
python benchmarks/merge_jaxfa_rows.py $L/r5_jaxfa_fwd_causal.log benchmarks/results/attn_fwd_causal_bf16.jsonl
timeout 7200 python benchmarks/bench_attention.py --mode fwd_bwd --impls jaxfa > $L/r5_jaxfa_fwdbwd.log 2>&1
python benchmarks/merge_jaxfa_rows.py $L/r5_jaxfa_fwdbwd.log benchmarks/results/attn_fwd_bwd_bf16.jsonl
timeout 7200 python benchmarks/bench_attention.py --mode fwd_bwd --causal --impls jaxfa > $L/r5_jaxfa_fwdbwd_causal.log 2>&1
python benchmarks/merge_jaxfa_rows.py $L/r5_jaxfa_fwdbwd_causal.log benchmarks/results/attn_fwd_bwd_causal_bf16.jsonl
timeout 5400 python benchmarks/spot_tune.py win32k > $L/r5_win32k.log 2>&1
SPOT_SHAPES='[[4096,64],[4096,128]]' timeout 1800 python benchmarks/spot_unaligned.py > $L/r5_ours_anchor.log 2>&1
echo BATCH2B DONE
