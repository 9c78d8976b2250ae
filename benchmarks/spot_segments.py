"""On-chip spot check for packed-sequence (segment_ids) attention.

The CPU suite runs these paths in Pallas interpret mode only; this script is
the Mosaic-compile + numerics gate on the real chip (fwd maxdiff and grad
maxdiff vs the exact-softmax oracle), plus the headline rate of the
segment-masked causal forward (runs on the flat/dense grid — segment
boundaries are runtime data, so the resident route is excluded by design).
Prints one JSON line per point; non-zero exit on any numerics failure.
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


def packed_ids(key, B, N, n_segs=4):
    bounds = jax.random.bernoulli(key, n_segs / N, (B, N))
    return jnp.cumsum(bounds.astype(jnp.int32), axis=1)


def check(tag, *, causal, B=1, H=8, Hkv=None, N=1024, D=64,
          dtype=jnp.bfloat16):
    q, _, _ = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype)
    _, k, v = make_qkv(jax.random.PRNGKey(1), B, Hkv or H, N, D, dtype=dtype)
    seg = packed_ids(jax.random.PRNGKey(2), B, N)
    kw = dict(causal=causal)
    o = flash_attention(q, k, v, segment_ids=seg, **kw)
    w = attention_reference(*(x.astype(jnp.float32) for x in (q, k, v)),
                            segment_ids=(seg, seg), **kw)
    md = float(jnp.max(jnp.abs(o.astype(jnp.float32) - w)))
    g = jax.grad(lambda q, k, v: (
        flash_attention(q, k, v, segment_ids=seg, **kw)
        .astype(jnp.float32) ** 2).sum(), (0, 1, 2))(q, k, v)
    gw = jax.grad(lambda q, k, v: (
        attention_reference(q, k, v, segment_ids=(seg, seg), **kw) ** 2
    ).sum(), (0, 1, 2))(*(x.astype(jnp.float32) for x in (q, k, v)))
    gok, why, gmd, gmr = grad_gate(g, gw, BWD_TOL[jnp.dtype(dtype)])
    ok = gok and md < FWD_TOL[jnp.dtype(dtype)].atol
    print(json.dumps({"check": tag, "N": N, "D": D, "maxdiff": round(md, 6),
                      "grad_maxdiff": round(gmd, 6),
                      "grad_maxrel": round(gmr, 6), "ok": ok}), flush=True)
    if not ok:
        sys.exit(f"NUMERICS FAILED: {tag}: {why or 'fwd maxdiff'}")


def timing(tag, *, causal, B=1, H=24, N=4096, D=128, dtype=jnp.bfloat16):
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype)
    seg = packed_ids(jax.random.PRNGKey(2), B, N)

    def step(qq, k, v, seg):
        return flash_attention(qq, k, v, causal=causal, segment_ids=seg)

    t = time_chained(step, q, consts=(k, v, seg), iters=16,
                     warmup_iters=4, repeats=3)
    fl = attention_flops(B, H, N, N, D, causal=causal, mode="fwd")
    print(json.dumps({"timing": tag, "N": N, "D": D,
                      "ms": round(t * 1e3, 4),
                      "tflops": round(fl / t / 1e12, 2)}), flush=True)


def check_softcap(tag, *, causal, B=1, H=8, N=1024, D=64,
                  dtype=jnp.bfloat16, cap=8.0):
    # Exercise the tanh nonlinearity via a SMALL cap at near-unit inputs
    # (tanh argument reaches ±1.5), not via large inputs: ×3-scaled q/k
    # push the bf16 gradient error past BWD_TOL *regardless of softcap*
    # (measured: no-cap ×3 gives grad_maxrel 0.86, softcap actually bounds
    # it to 0.17 — both over the 0.08 gate calibrated for unit scale).
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype)
    q = (1.5 * q).astype(dtype)
    k = (1.5 * k).astype(dtype)
    kw = dict(causal=causal, logit_softcap=cap)
    o = flash_attention(q, k, v, **kw)
    w = attention_reference(*(x.astype(jnp.float32) for x in (q, k, v)),
                            **kw)
    md = float(jnp.max(jnp.abs(o.astype(jnp.float32) - w)))
    g = jax.grad(lambda q, k, v: (
        flash_attention(q, k, v, **kw).astype(jnp.float32) ** 2).sum(),
        (0, 1, 2))(q, k, v)
    gw = jax.grad(lambda q, k, v: (
        attention_reference(q, k, v, **kw) ** 2).sum(), (0, 1, 2))(
        *(x.astype(jnp.float32) for x in (q, k, v)))
    gok, why, gmd, gmr = grad_gate(g, gw, BWD_TOL[jnp.dtype(dtype)])
    ok = gok and md < FWD_TOL[jnp.dtype(dtype)].atol
    print(json.dumps({"check": tag, "N": N, "D": D, "maxdiff": round(md, 6),
                      "grad_maxdiff": round(gmd, 6),
                      "grad_maxrel": round(gmr, 6), "ok": ok}), flush=True)
    if not ok:
        sys.exit(f"NUMERICS FAILED: {tag}: {why or 'fwd maxdiff'}")


if __name__ == "__main__":
    check("seg", causal=False)
    check("seg-causal", causal=True)
    check("seg-causal-gqa", causal=True, H=8, Hkv=2)
    check("seg-unaligned", causal=True, N=1537, H=4)
    check("seg-f32", causal=True, dtype=jnp.float32)
    check_softcap("softcap-causal-resident", causal=True)
    check_softcap("softcap-noncausal", causal=False)
    timing("seg_fwd", causal=False)
    timing("seg_causal_fwd", causal=True)
