#!/bin/bash
# r5 TPU batch 1: unaligned sweep refresh + ceiling probes + tuning matrices.
cd "$(dirname "$0")/.."
set -x
timeout 5400 python benchmarks/bench_attention.py --unaligned --impls ours,jaxfa \
  > benchmarks/results/logs/r5_unaligned_sweep.log 2>&1
cp benchmarks/results/logs/r5_unaligned_sweep.log /tmp/
grep -h '^{' benchmarks/results/logs/r5_unaligned_sweep.log | grep -v jaxfa_tune > benchmarks/results/attn_fwd_unaligned_bf16.jsonl
timeout 3600 python benchmarks/spot_tune.py d64ceil > benchmarks/results/logs/r5_d64ceil.log 2>&1
timeout 3600 python benchmarks/spot_tune.py d160c > benchmarks/results/logs/r5_d160c.log 2>&1
timeout 2400 python benchmarks/spot_lowd.py > benchmarks/results/logs/r5_lowd.log 2>&1
timeout 2400 python benchmarks/spot_fp16_accuracy.py > benchmarks/results/logs/r5_fp16acc.log 2>&1
echo BATCH1 DONE
