"""On-chip spot check for the resident band kernels (fwd + fused bwd).

Validates numerics (vs the exact-softmax oracle) and measures the headline
causal/window rates at the kernel-bench shape class, printing one JSON line
per point. Run after kernel changes, before refreshing the committed sweeps.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys

import jax
import jax.numpy as jnp

from flashattn_tpu.utils.platform import enable_compilation_cache

from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock

acquire_tpu_lock(on_timeout="abort")  # serialize; yield if the chip is busy
enable_compilation_cache()

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.utils.testing import BWD_TOL, FWD_TOL, grad_gate, make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained


def check(tag, kw, B=1, H=8, N=1024, D=64, dtype=jnp.bfloat16, Nk=None):
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype,
                       Nk=Nk or N)
    o = flash_attention(q, k, v, **kw)
    w = attention_reference(*(x.astype(jnp.float32) for x in (q, k, v)), **kw)
    md = float(jnp.max(jnp.abs(o.astype(jnp.float32) - w)))
    g = jax.grad(lambda q, k, v: (
        flash_attention(q, k, v, **kw).astype(jnp.float32) ** 2).sum(),
        (0, 1, 2))(q, k, v)
    gw = jax.grad(lambda q, k, v: (
        attention_reference(q, k, v, **kw) ** 2).sum(), (0, 1, 2))(
        *(x.astype(jnp.float32) for x in (q, k, v)))
    # Per-element |a−e| ≤ atol + rtol·|e| — the (o²).sum() loss makes grads
    # O(10), covered by the rtol term, with no whole-tensor OR-escape.
    gok, why, gmd, gmr = grad_gate(g, gw, BWD_TOL[jnp.dtype(dtype)])
    ok = gok and md < FWD_TOL[jnp.dtype(dtype)].atol
    print(json.dumps({"check": tag, "N": N, "D": D, "maxdiff": round(md, 6),
                      "grad_maxdiff": round(gmd, 6),
                      "grad_maxrel": round(gmr, 6), "ok": ok}), flush=True)
    if not ok:
        sys.exit(f"NUMERICS FAILED: {tag}: {why or 'fwd maxdiff'}")


def timing(tag, kw, mode, B=1, H=24, N=4096, D=128, dtype=jnp.bfloat16):
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype)
    if mode == "fwd":
        step = lambda qq, k, v: flash_attention(qq, k, v, **kw)
    else:
        def step(qq, k, v):
            dq, dk, dv = jax.grad(
                lambda x, kk, vv: flash_attention(x, kk, vv, **kw)
                .astype(jnp.float32).sum(), argnums=(0, 1, 2))(qq, k, v)
            # 1e-30, not 0.0: XLA may fold 0.0*x and DCE the backward.
            return qq + 1e-30 * dq + (1e-30 * (dk.astype(jnp.float32).sum()
                                               + dv.astype(jnp.float32).sum())
                                      ).astype(qq.dtype)
    t = time_chained(step, q, consts=(k, v), iters=16,
                     warmup_iters=4, repeats=5)
    fl = attention_flops(B, H, N, N, D, causal=kw.get("causal", False),
                         mode=mode, window=kw.get("window"))
    print(json.dumps({"timing": tag, "mode": mode, "N": N, "D": D,
                      "ms": round(t * 1e3, 4),
                      "tflops": round(fl / t / 1e12, 2)}), flush=True)


if __name__ == "__main__":
    # Numerics first (small shapes, fast): every resident route.
    check("causal", dict(causal=True))
    check("causal-tail", dict(causal=True), N=1000)
    check("causal-cross", dict(causal=True), N=1024, Nk=900)
    check("causal+win", dict(causal=True, window=(256, 0)))
    check("win-only", dict(causal=False, window=(128, 64)))
    check("causal-D64-aug", dict(causal=True), D=96)
    # Pads to 3072: resident fwd takes the divisor kv tile (sub_k=1536).
    check("causal-divisor", dict(causal=True), N=2560, H=2)
    if "--numerics-only" in sys.argv:
        sys.exit(0)
    if "--big-n" in sys.argv:
        # Raised-ceiling probe (FLASHATTN_TPU_RC_MAXN/RB_MAXN=8192): does the
        # bounded-lookahead issue schedule hold past 4096 on chip? Compare
        # against the flat-grid numbers in the refreshed sweeps. N=5120
        # exercises the divisor tile (sub_k=1280, 10 chains of 640 rows);
        # H=1 keeps the O(N²) oracle inside the chip's memory.
        check("causal-5k", dict(causal=True), N=5120, H=1)
        check("causal-8k", dict(causal=True), N=8192, H=1)
        for N in (5120, 6144, 8192):
            timing("causal-bign", dict(causal=True), "fwd", N=N)
            timing("causal-bign", dict(causal=True), "fwd_bwd", N=N)
        sys.exit(0)
    # Headline rates.
    timing("causal", dict(causal=True), "fwd")
    timing("causal", dict(causal=True), "fwd_bwd")
    timing("noncausal", {}, "fwd")
    timing("noncausal", {}, "fwd_bwd")
    timing("win2048", dict(causal=True, window=(2047, 0)), "fwd")
    timing("win2048", dict(causal=True, window=(2047, 0)), "fwd_bwd")
    timing("causal-D64", dict(causal=True), "fwd", D=64)
