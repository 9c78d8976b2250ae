#!/bin/bash
# r5 TPU batch 2: refresh the four headline sweeps with the TUNED vendor
# arm (fair-baseline restatement, VERDICT r4 missing #1) + win32k matrix.
cd "$(dirname "$0")/.."
set -x
timeout 10800 python benchmarks/bench_attention.py --mode fwd \
  > benchmarks/results/logs/r5_fwd_sweep.log 2>&1
grep -h '^{' benchmarks/results/logs/r5_fwd_sweep.log | grep -v jaxfa_tune > benchmarks/results/attn_fwd_bf16.jsonl
timeout 10800 python benchmarks/bench_attention.py --mode fwd --causal \
  > benchmarks/results/logs/r5_fwd_causal_sweep.log 2>&1
grep -h '^{' benchmarks/results/logs/r5_fwd_causal_sweep.log | grep -v jaxfa_tune > benchmarks/results/attn_fwd_causal_bf16.jsonl
timeout 10800 python benchmarks/bench_attention.py --mode fwd_bwd \
  > benchmarks/results/logs/r5_fwdbwd_sweep.log 2>&1
grep -h '^{' benchmarks/results/logs/r5_fwdbwd_sweep.log | grep -v jaxfa_tune > benchmarks/results/attn_fwd_bwd_bf16.jsonl
timeout 10800 python benchmarks/bench_attention.py --mode fwd_bwd --causal \
  > benchmarks/results/logs/r5_fwdbwd_causal_sweep.log 2>&1
grep -h '^{' benchmarks/results/logs/r5_fwdbwd_causal_sweep.log | grep -v jaxfa_tune > benchmarks/results/attn_fwd_bwd_causal_bf16.jsonl
timeout 5400 python benchmarks/spot_tune.py win32k > benchmarks/results/logs/r5_win32k.log 2>&1
echo BATCH2 DONE
