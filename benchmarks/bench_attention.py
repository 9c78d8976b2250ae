"""Attention benchmark sweeps — parity with the reference's bench harnesses.

Mirrors bench_with_sdpa*.py (SURVEY.md §2.2): seqlen sweeps fwd and fwd+bwd,
head-dim scan at N=4096, causal and BNHD variants, with the reference's FLOPs
model (bench_with_sdpa.py:35-41). Baselines filling the SDPA/Triton/CK roles:

  * ``xla``  — exact softmax(QKᵀ)V in plain XLA (the "SDPA math backend"),
  * ``jaxfa`` — jax.experimental.pallas.ops.tpu.flash_attention (the vendor
    fused-attention baseline, i.e. the reference's Triton/CK role),
  * ``ours`` — flashattn_tpu.flash_attention.

Each result prints as one JSON line. Run:
  python benchmarks/bench_attention.py [--quick] [--causal] [--mode fwd|fwd_bwd]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from flashattn_tpu.utils.platform import enable_compilation_cache

from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock

acquire_tpu_lock(on_timeout="abort")  # serialize; yield if the chip is busy
enable_compilation_cache()

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.ops.reference import flash_attention_reference
from flashattn_tpu.utils import platform
from flashattn_tpu.utils.testing import FWD_TOL, make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained_stats

# Shapes above this score-matrix size switch the in-bench oracle from the
# unfused exact softmax (materializes [N, Nk] f32 per head) to the
# O(N)-memory tiled golden model (ops/reference.py) — every row gets a
# non-null maxdiff gate regardless of N.
_ORACLE_MAX_SCORES = 8192 * 8192


def bench_maxdiff(fn, q, k, v, causal, layout, window=None, dtype=None):
    """Forward max-abs diff vs the exact-softmax oracle on (a head-slice
    of) the same inputs — every bench point doubles as an on-chip
    integration test, the reference's practice (bench_with_sdpa.py:140-141;
    SURVEY.md §4.4)."""
    nq_ax = 2 if layout == "BHND" else 1
    big = q.shape[nq_ax] * k.shape[nq_ax] > _ORACLE_MAX_SCORES
    h_ax = 1 if layout == "BHND" else 2
    sl = [slice(None)] * 4
    # 2 heads catch systematic bugs; 1 head for golden-model big-N shapes.
    sl[h_ax] = slice(0, 1 if big else min(2, q.shape[h_ax]))
    qs, ks, vs = q[tuple(sl)], k[tuple(sl)], v[tuple(sl)]
    o = fn(qs, ks, vs, causal, layout)
    if layout == "BNHD":
        qs, ks, vs, o = (x.swapaxes(1, 2) for x in (qs, ks, vs, o))
    qf, kf, vf = (x.astype(jnp.float32) for x in (qs, ks, vs))
    if big:
        w = flash_attention_reference(qf, kf, vf, causal=causal,
                                      window=window,
                                      block_q=512, block_k=1024)
    else:
        w = attention_reference(qf, kf, vf, causal=causal, window=window)
    return float(jnp.max(jnp.abs(o.astype(jnp.float32) - w)))


def peak_memory_bytes(step, *args):
    """Compiled peak memory (temps + args + outputs) — the reference's
    per-point VRAM column (bench_with_sdpa.py:34)."""
    try:
        ma = jax.jit(step).lower(*args).compile().memory_analysis()
        return int(ma.temp_size_in_bytes + ma.argument_size_in_bytes +
                   ma.output_size_in_bytes)
    except Exception:
        return None


def xla_sdpa(q, k, v, causal, layout="BHND"):
    if layout == "BNHD":  # pays the rearrange, like SDPA in the BNHD benches
        q, k, v = (x.swapaxes(1, 2) for x in (q, k, v))
        return attention_reference(q, k, v, causal=causal).swapaxes(1, 2)
    return attention_reference(q, k, v, causal=causal)


# ── vendor-baseline tuning ──────────────────────────────────────────────────
# The reference's third-party arms are TUNED: its Triton kernel ships an
# autotune config space (triton_fused_attention.py:83-97, AMD waves_per_eu
# :453-456) and CK is a prebuilt optimized binary. The vendor Pallas flash
# attention defaults to 128-blocks (BlockSizes.get_default — "TODO: select
# better parameters"), which posts ~9.5 TF at D=64 — an unfair strawman
# (VERDICT r4 missing #1). We autotune its block sizes over a small config
# space per shape class and persist the winners; every jaxfa row reports its
# best config.

_JAXFA_TUNE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "results", "jaxfa_tuned.json")
_JAXFA_CANDS = [128, 256, 512, 1024]  # square block_q = block_k candidates
_jaxfa_tuned: dict | None = None


def _jaxfa_tuned_cache() -> dict:
    global _jaxfa_tuned
    if _jaxfa_tuned is None:
        try:
            with open(_JAXFA_TUNE_FILE) as f:
                _jaxfa_tuned = json.load(f)
        except Exception:
            _jaxfa_tuned = {}
    return _jaxfa_tuned


def _jaxfa_blocks(N, D, bs):
    from jax.experimental.pallas.ops.tpu.flash_attention import BlockSizes

    bq = bk = min(bs, N)
    return BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq)


def tune_jaxfa(B, H, N, D, *, causal, mode, dtype=jnp.bfloat16):
    """One-time autotune of the vendor arm's BlockSizes for a shape
    (persisted in results/jaxfa_tuned.json; the Triton-autotune role)."""
    key = f"N{N}_D{D}_c{int(causal)}_{mode}"
    cache = _jaxfa_tuned_cache()
    if key in cache:
        return
    from flashattn_tpu.utils.timing import time_chained_stats

    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype)
    best, best_t = None, None
    for bs in _JAXFA_CANDS:
        if bs > N:
            continue
        try:
            fn = functools.partial(_jaxfa_with_blocks, bs=bs)
            if mode == "fwd":
                step = lambda qq, kk, vv: fn(qq, kk, vv, causal, "BHND")
            else:
                def step(qq, kk, vv):
                    dq, dk, dv = jax.grad(
                        lambda x, k2, v2: fn(x, k2, v2, causal, "BHND")
                        .astype(jnp.float32).sum(), argnums=(0, 1, 2)
                    )(qq, kk, vv)
                    return qq + 1e-30 * dq + (
                        1e-30 * (dk.astype(jnp.float32).sum()
                                 + dv.astype(jnp.float32).sum())
                    ).astype(qq.dtype)
            t = time_chained_stats(step, q, consts=(k, v), iters=8,
                                   warmup_iters=2, repeats=3)["per_iter"]
        except Exception as e:  # config doesn't compile/fit — skip
            print(json.dumps({"jaxfa_tune": key, "bs": bs,
                              "error": type(e).__name__}), flush=True)
            continue
        print(json.dumps({"jaxfa_tune": key, "bs": bs,
                          "per_iter_ms": round(t * 1e3, 4)}), flush=True)
        if best_t is None or t < best_t:
            best, best_t = bs, t
    if best is not None:
        cache[key] = {"block": best, "per_iter_s": best_t}
        try:
            with open(_JAXFA_TUNE_FILE, "w") as f:
                json.dump(cache, f, indent=1, sort_keys=True)
        except OSError:
            pass


def _jaxfa_with_blocks(q, k, v, causal, layout="BHND", bs=None):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention as jfa,
    )

    sm = q.shape[-1] ** -0.5  # jfa defaults sm_scale=1.0, oracle uses D^-0.5
    if layout == "BNHD":
        q, k, v = (x.swapaxes(1, 2) for x in (q, k, v))
        o = _jaxfa_with_blocks(q, k, v, causal, "BHND", bs=bs)
        return o.swapaxes(1, 2)
    blocks = _jaxfa_blocks(q.shape[2], q.shape[3], bs) if bs else None
    return jfa(q, k, v, causal=causal, sm_scale=sm, block_sizes=blocks)


def jax_pallas_fa(q, k, v, causal, layout="BHND"):
    """Vendor arm at its TUNED block sizes (falls back to its defaults when
    no tuned entry exists for the shape)."""
    nax = 2 if layout == "BHND" else 1
    N, D = q.shape[nax], q.shape[3]
    cache = _jaxfa_tuned_cache()
    # mode-specific entries share the fwd kernel config; prefer fwd_bwd's
    # tuned block when timing fwd_bwd (bench_one tunes per mode first).
    bs = None
    for key in (f"N{N}_D{D}_c{int(causal)}_{_JAXFA_MODE[0]}",
                f"N{N}_D{D}_c{int(causal)}_fwd",
                f"N{N}_D{D}_c{int(causal)}_fwd_bwd"):
        if key in cache:
            bs = cache[key]["block"]
            break
    return _jaxfa_with_blocks(q, k, v, causal, layout, bs=bs)


_JAXFA_MODE = ["fwd"]  # set by bench_one so jax_pallas_fa picks the right key


def ours(q, k, v, causal, layout="BHND", window=None):
    return flash_attention(q, k, v, causal=causal, layout=layout,
                           window=window)


IMPLS = {"xla": xla_sdpa, "jaxfa": jax_pallas_fa, "ours": ours}

_SESSION_ROOFLINE = []  # measured once per process; [] = not yet, [None] = off-TPU


def session_roofline_tflops():
    """Same-session MXU peak (big chained XLA matmul, bf16) — the
    denominator for every ``mfu`` field. Measured live every sweep so
    %-of-roofline claims are anchored to THIS session's chip + tunnel
    (the reference measures its roofline at runtime every run,
    GPU_peak_perf_test.py:41-61)."""
    if not _SESSION_ROOFLINE:
        if platform.on_tpu():
            from flashattn_tpu.ops.roofline import (
                measure_xla_matmul_peak_tflops,
            )

            _SESSION_ROOFLINE.append(
                round(measure_xla_matmul_peak_tflops(), 1))
        else:
            _SESSION_ROOFLINE.append(None)
    return _SESSION_ROOFLINE[0]


def bench_one(impl_name, B, H, N, D, *, causal, mode, dtype=jnp.bfloat16,
              iters=32, layout="BHND", window=None):
    fn = IMPLS[impl_name]
    kw = {"window": window} if window is not None else {}
    if impl_name == "jaxfa":
        _JAXFA_MODE[0] = mode
        if os.environ.get("FLASHATTN_TPU_TUNE_JAXFA", "1") == "1":
            try:
                tune_jaxfa(B, H, N, D, causal=causal, mode=mode, dtype=dtype)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"jaxfa_tune_error": type(e).__name__}),
                      flush=True)
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype)
    if layout == "BNHD":  # arrays physically stored [B, N, H, D]
        q, k, v = (x.swapaxes(1, 2) for x in (q, k, v))
    if mode == "fwd":
        step = lambda qq, k, v: fn(qq, k, v, causal, layout, **kw)
    else:
        def step(qq, k, v):
            # grads w.r.t. ALL of q,k,v — grad over q alone lets XLA
            # dead-code-eliminate the dK/dV kernel entirely.
            dq, dk, dv = jax.grad(
                lambda x, kk, vv: fn(x, kk, vv, causal, layout, **kw)
                .astype(jnp.float32).sum(),
                argnums=(0, 1, 2),
            )(qq, k, v)
            # 1e-30, not 0.0: XLA may fold 0.0*x and DCE the backward.
            return qq + 1e-30 * dq + (1e-30 * (dk.astype(jnp.float32).sum()
                                               + dv.astype(jnp.float32).sum())
                                      ).astype(qq.dtype)

    try:
        stats = time_chained_stats(step, q, consts=(k, v), iters=iters,
                                   warmup_iters=max(2, iters // 4), repeats=5)
        t = stats["per_iter"]
        fwd_only = lambda qq, kk, vv, c, lo: fn(qq, kk, vv, c, lo, **kw)
        maxdiff = bench_maxdiff(fwd_only, q, k, v, causal, layout,
                                window=window)
        mem = peak_memory_bytes(step, q, k, v)
    except Exception as e:  # noqa: BLE001 — record failures, keep sweeping
        print(json.dumps({"impl": impl_name, "B": B, "H": H, "N": N, "D": D,
                          "causal": causal, "mode": mode,
                          "error": type(e).__name__}), flush=True)
        return None
    flops = attention_flops(B, H, N, N, D, causal=causal, mode=mode,
                            window=window)
    tflops = flops / t / 1e12
    roofline = session_roofline_tflops()
    rec = {
        "impl": impl_name, "B": B, "H": H, "N": N, "D": D,
        "causal": causal, "mode": mode, "dtype": str(jnp.dtype(dtype)),
        "layout": layout,
        "ms": round(t * 1e3, 4), "tflops": round(tflops, 2),
        # dispersion of the 5 differenced timing samples, (max−min)/median —
        # a point whose spread exceeds the claimed improvement is noise
        "spread_pct": round(stats["spread"] * 100, 1),
        "maxdiff": round(maxdiff, 6) if maxdiff is not None else None,
        "peak_mem_mb": round(mem / 2**20, 1) if mem else None,
    }
    if roofline is not None:
        rec["roofline_tflops"] = roofline
        if impl_name == "ours":
            rec["mfu"] = round(tflops / roofline, 3)
    if window is not None:
        rec["window"] = list(window)
    if impl_name == "jaxfa":
        # same fallback chain as jax_pallas_fa: a fwd_bwd row without its own
        # tuned entry runs at the fwd-tuned block, not the vendor default
        ent = None
        for key in (f"N{N}_D{D}_c{int(causal)}_{mode}",
                    f"N{N}_D{D}_c{int(causal)}_fwd",
                    f"N{N}_D{D}_c{int(causal)}_fwd_bwd"):
            ent = _jaxfa_tuned_cache().get(key)
            if ent:
                break
        rec["tuned_block"] = ent["block"] if ent else "default"
    print(json.dumps(rec), flush=True)
    if roofline is not None and tflops > roofline:
        # a row above the same-session roofline is a measurement bug, not
        # a fast kernel (round-2 postmortem: 216 TFLOP/s > 190 roofline)
        print(json.dumps({"warning": "row exceeds same-session roofline",
                          "impl": impl_name, "N": N, "D": D,
                          "tflops": round(tflops, 2),
                          "roofline": roofline}), flush=True)
    tol = FWD_TOL.get(jnp.dtype(dtype))
    if (impl_name == "ours" and maxdiff is not None and tol is not None
            and maxdiff > tol.atol):
        # baselines' maxdiff is recorded but informational; OUR kernel's is
        # a hard on-chip correctness gate (reference practice,
        # bench_with_sdpa.py:140-141)
        raise SystemExit(
            f"BENCH NUMERICS GATE FAILED: {impl_name} {rec} "
            f"maxdiff {maxdiff} > {tol.atol}")
    return rec


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--causal", action="store_true")
    ap.add_argument("--mode", default="fwd", choices=["fwd", "fwd_bwd"])
    ap.add_argument("--impls", default="ours,jaxfa,xla")
    ap.add_argument("--layout", default="BHND", choices=["BHND", "BNHD"])
    ap.add_argument("--unaligned", action="store_true",
                    help="non-tile-aligned seqlens (the reference's "
                         "unaligned-N graphs, README.md:72-102)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["bfloat16", "float32", "float16"])
    ap.add_argument("--window", type=int, default=None,
                    help="left sliding-window size (ours only; causal-style)")
    args = ap.parse_args()

    impls = args.impls.split(",")
    dtype = jnp.dtype(args.dtype)
    B, H = 1, 24
    if args.quick:
        n_sweep, d_sweep = [1024, 4096], [64, 128]
    else:
        # reference sweeps: fwd N=512..7168, fwd+bwd N=512..5120
        # (bench_with_sdpa.py:112, 201); D scan at N=4096 (:259-260)
        n_sweep = [512, 1024, 2048, 3072, 4096, 5120]
        if args.mode == "fwd":
            # reference tops out at 7168; 8192 extends the long-context story
            n_sweep += [6144, 7168, 8192]
            if args.causal:
                # macro-resident tier (row-slab launches past the resident
                # ceiling — the committed long-N story, r4)
                n_sweep += [12288, 16384]
        elif args.causal:
            n_sweep += [8192]  # the LLM-training long-context shape
        # low end 16..48: the SD1.5 cross-attention head class the
        # reference's D-scan explicitly covers (bench_with_sdpa.py:259-283
        # scans 16..240 step 16)
        d_sweep = [16, 32, 48, 64, 80, 128, 160, 256]
    if args.unaligned:
        # precision_test.py-class shapes: N 1 off a tile, odd D
        n_sweep = [n + 1 for n in n_sweep]
        d_sweep = [d - 17 for d in d_sweep if d > 32]

    window = (args.window - 1, 0) if args.window else None
    if window is not None:
        # long-context SWA sweep: cost should scale with the window, not N²
        for N in (4096, 8192, 16384, 32768):
            bench_one("ours", B, H, N, 128, causal=args.causal,
                      mode=args.mode, layout=args.layout, dtype=dtype,
                      window=window)
        return
    for N in n_sweep:
        for impl in impls:
            if impl == "xla" and N > 4096:
                continue  # N² materialization gets slow/huge; matches role
            bench_one(impl, B, H, N, 64, causal=args.causal, mode=args.mode,
                      layout=args.layout, dtype=dtype)
    for D in d_sweep:
        for impl in impls:
            bench_one(impl, B, H, 4096, D, causal=args.causal, mode=args.mode,
                      layout=args.layout, dtype=dtype)
    if args.causal and not args.unaligned and dtype == jnp.bfloat16:
        # Macro-resident flagship rows: the long-context LLM shape class is
        # D=128 (the N sweep above is D=64 for reference parity,
        # bench_with_sdpa.py:52). r3's best long-N numbers lived only in
        # uncommitted spot logs — these rows put them in the committed
        # record.
        longn = ((8192, 12288, 16384) if args.mode == "fwd"
                 else (8192, 16384))
        for N in longn:
            bench_one("ours", B, H, N, 128, causal=True, mode=args.mode,
                      layout=args.layout, dtype=dtype)


if __name__ == "__main__":
    main()
