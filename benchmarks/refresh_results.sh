#!/bin/bash
# Refresh every committed sweep in benchmarks/results/ on the real chip.
# One TPU process at a time — runs are strictly sequential. ~40-60 min cold,
# much less with a warm .jax_cache. Run from the repo root:
#   bash benchmarks/refresh_results.sh [results_dir]
#
# Each sweep runs under `timeout` with one retry (the tunnel can hang a
# process at startup with no error). RESUME=1 skips sweeps whose output is
# newer than the marker left by a previous (aborted) invocation.
set -e
cd "$(dirname "$0")/.."
OUT=${1:-benchmarks/results}
B=benchmarks/bench_attention.py
STAMP="$OUT/.refresh_started"
if [ "${RESUME:-0}" != 1 ] || [ ! -e "$STAMP" ]; then
  touch "$STAMP"
fi

run() { # run <outfile> <args...>
  local f=$1; shift
  if [ "${RESUME:-0}" = 1 ] && [ "$OUT/$f" -nt "$STAMP" ]; then
    echo "=== $f : already refreshed, skipping" >&2
    return 0
  fi
  echo "=== $f : $*" >&2
  local rc=0
  timeout 2400 python "$B" "$@" > "$OUT/$f.tmp" || rc=$?
  if [ "$rc" -ne 0 ]; then
    if [ "$rc" -ne 124 ] && [ "$rc" -ne 143 ] && [ "$rc" -ne 137 ]; then
      return "$rc"
    fi
    echo "--- $f hung (rc=$rc) — retrying once" >&2
    sleep 20
    timeout 2400 python "$B" "$@" > "$OUT/$f.tmp"
  fi
  mv "$OUT/$f.tmp" "$OUT/$f"
}

# Roofline FIRST, same session as the sweeps it anchors (reference measures
# its roofline live every run, GPU_peak_perf_test.py:41-61).
echo "=== roofline" >&2
timeout 1200 python benchmarks/bench_roofline.py --append || \
  { sleep 20; timeout 1200 python benchmarks/bench_roofline.py --append; }

# Stalest first: the causal/window/bwd sweeps predate the resident kernels;
# the noncausal fwd numbers changed least since round 1.
run attn_fwd_causal_bf16.jsonl        --mode fwd --causal
run attn_fwd_bwd_causal_bf16.jsonl    --mode fwd_bwd --causal
run attn_fwd_bwd_bf16.jsonl           --mode fwd_bwd
run attn_fwd_window2048_bf16.jsonl    --mode fwd     --window 2048
run attn_fwd_bwd_window2048_bf16.jsonl --mode fwd_bwd --window 2048
run attn_fwd_bf16.jsonl               --mode fwd
run attn_fwd_bnhd_bf16.jsonl          --mode fwd --layout BNHD
run attn_fwd_unaligned_bf16.jsonl     --mode fwd --unaligned --impls ours,jaxfa
run attn_fwd_fp16.jsonl               --mode fwd --dtype float16 --quick --impls ours,xla
run attn_fwd_f32.jsonl                --mode fwd --dtype float32 --quick --impls ours,xla
python benchmarks/plot_results.py
rm -f "$STAMP"
echo "done: $OUT" >&2
