"""Headline benchmark — prints ONE JSON line for the driver.

Metric: fused attention forward TFLOP/s at the reference's kernel-bench shape
class (B=1, H=24, N=4096 — bench_with_sdpa.py:52, 112) with D=128, bf16,
non-causal. ``vs_baseline`` is the speedup over exact-softmax XLA attention
(the reference's own primary comparison: its kernel vs the SDPA math backend,
bench_with_sdpa.py:5-7, 66-69).

FLOPs model: fwd = 2 · (2·B·H·N²·D), the reference's accounting
(bench_with_sdpa.py:35-41).

Robustness contract (round-3 postmortem: the driver's run waited 1684 s on
the TPU flock and was killed with no number recorded): this script must
ALWAYS print its JSON line in bounded time. The lock wait is bounded
(proceed-with-warning on timeout — a possibly-contended number beats no
number); the XLA baseline arm is skipped when the elapsed-time budget runs
low, falling back to the committed same-shape baseline measurement in
``benchmarks/results/bench_baseline.json``.
"""

import json
import os
import sys
import time

_T0 = time.monotonic()
# Total wall budget. The driver kills long benches; everything after lock
# acquisition fits comfortably in ~2 min warm-cache, ~4 min cold.
BUDGET = float(os.environ.get("FLASHATTN_TPU_BENCH_BUDGET", "480"))

import jax
import jax.numpy as jnp

from flashattn_tpu.utils.platform import (
    enable_compilation_cache,
    join_transfer_warmup,
    start_transfer_warmup,
)
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock

# Bounded wait, proceed on timeout: this artifact must exist even if a stray
# sweep wedged the lock (that is exactly what erased BENCH_r03).
acquire_tpu_lock(timeout=min(300.0, BUDGET * 0.5), on_timeout="proceed")
enable_compilation_cache()
# The first device→host readback of a process can stall for minutes on the
# tunneled backend (r4's BENCH gate spent 630 s INSIDE one float(); measured
# here: the same fetch takes 4 s or 620 s depending on remote tunnel state).
# Start it now in a background thread so the stall elapses concurrently with
# the gate's compiles; join before the first timing fetch.
start_transfer_warmup()

BASELINE_CACHE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)),
    "benchmarks", "results", "bench_baseline.json")


def _remaining() -> float:
    return BUDGET - (time.monotonic() - _T0)


def _progress(msg: str) -> None:
    """Stage marker on stderr (the driver parses stdout only). The axon
    tunnel can hang a process at any stage with no error; these markers make
    a killed run diagnosable from its log tail."""
    print(f"[bench {time.monotonic() - _T0:6.1f}s] {msg}",
          file=sys.stderr, flush=True)


def main():
    from flashattn_tpu import flash_attention
    from flashattn_tpu.ops.oracle import attention_reference
    from flashattn_tpu.utils.testing import make_qkv
    from flashattn_tpu.utils.timing import attention_flops, time_chained

    _progress("imports done")
    B, H, N, D = 1, 24, 4096, 128
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=jnp.bfloat16)
    flops = attention_flops(B, H, N, N, D, causal=False, mode="fwd")

    # Numerics gate: the bench IS an on-chip integration test (the
    # reference prints max diff before TFLOPS, bench_with_sdpa.py:140-141).
    # Gate on a 2-head N=1024 slice: the f32 oracle at the full bench shape
    # measured 237 s of cold remote compile (r4 diag) — at this slice it is
    # seconds, and the kernel program under test is byte-identical modulo
    # shape.
    o = flash_attention(q[:, :2, :1024], k[:, :2, :1024], v[:, :2, :1024])
    w = attention_reference(*(x[:, :2, :1024].astype(jnp.float32)
                              for x in (q, k, v)))
    d = jnp.max(jnp.abs(o.astype(jnp.float32) - w))
    _progress("numerics gate computed; joining transfer warmup")
    # All compiles are done — absorb whatever remains of the first-readback
    # stall here (concurrent since process start), then every fetch below
    # (this maxdiff, the timing arms' readbacks) runs at normal speed.
    join_transfer_warmup()
    maxdiff = float(d)
    _progress(f"numerics gate done (maxdiff={maxdiff:.2e})")
    if maxdiff > 2e-2:
        raise SystemExit(f"BENCH NUMERICS GATE FAILED: maxdiff={maxdiff}")

    t_ours = time_chained(lambda qq, k, v: flash_attention(qq, k, v), q,
                          consts=(k, v), iters=32, warmup_iters=8, repeats=3)
    _progress(f"ours arm done ({t_ours*1e3:.3f} ms/iter)")

    # XLA exact-softmax arm: measure live when the budget allows, else use
    # the committed same-shape baseline (it is a property of XLA + the chip,
    # not of our kernel — staleness risk is low and flagged in the output).
    t_xla, baseline_src = None, "measured"
    if _remaining() > 120.0:
        try:
            t_xla = time_chained(
                lambda qq, k, v: attention_reference(qq, k, v).astype(
                    qq.dtype), q,
                consts=(k, v), iters=16, warmup_iters=4, repeats=3)
            try:
                with open(BASELINE_CACHE, "w") as f:
                    json.dump({"shape": [B, H, N, D], "dtype": "bfloat16",
                               "t_xla_s": t_xla}, f)
            except OSError:
                pass
        except Exception as e:
            print(f"[bench] XLA arm failed ({e!r}); using cached baseline",
                  file=sys.stderr, flush=True)
    _progress(f"xla arm: {baseline_src}")
    if t_xla is None:
        baseline_src = "cached"
        try:
            with open(BASELINE_CACHE) as f:
                cached = json.load(f)
            assert cached["shape"] == [B, H, N, D]
            t_xla = float(cached["t_xla_s"])
        except Exception:
            t_xla = None

    tflops = flops / t_ours / 1e12
    out = {
        "metric": "fused_attn_fwd_bf16_B1H24N4096D128_tflops",
        "value": round(tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(t_xla / t_ours, 3) if t_xla else None,
    }
    if baseline_src != "measured":
        out["baseline_src"] = baseline_src
    print(json.dumps(out))


if __name__ == "__main__":
    main()
