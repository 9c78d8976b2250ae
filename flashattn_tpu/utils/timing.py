"""Benchmark harness: robust device timing + FLOPs accounting.

Role parity: the reference's per-bench ``count_time`` decorator (10 warmup +
100 timed rounds around ``torch.cuda.synchronize``, TFLOPS from an explicit
FLOPs model — bench_with_sdpa.py:14-49, 35-41). On this TPU stack a naive
sync-per-call measurement is wrong twice over: dispatch is async with a
~30 ms host↔device round-trip (the axon relay), and ``block_until_ready`` can
return before execution completes. So we:

  1. chain ``n`` iterations *inside one jit* with a data dependency
     (output feeds the next input), forcing sequential device execution;
  2. fetch a scalar from the final output (a real device→host readback);
  3. measure two chain lengths and difference them, cancelling the fixed
     per-fetch overhead.

Summary statistics go through the native C++ helper when available
(csrc/planner.cpp fa_bench_stats), mirroring the reference's native timing
role.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else 0.5 * (s[n // 2 - 1] + s[n // 2])


def time_chained_stats(
    step: Callable,
    carry0,
    *,
    consts=(),
    iters: int = 64,
    warmup_iters: int = 8,
    repeats: int = 5,
) -> dict:
    """Per-iteration timing statistics of ``carry = step(carry, *consts)``.

    ``step`` must map a pytree to a like-shaped pytree (data dependency =
    forced sequential execution). Fixed dispatch/readback overhead is
    cancelled by differencing a short and a long chain.

    The reported figure is the MEDIAN of ``repeats`` independent differenced
    samples — min-of-differences is biased fast under relay noise (a
    transient stall in the *short* chain deflates the difference and
    inflates TFLOP/s; a 216 TFLOP/s row above the measured 190 roofline was
    traced to exactly this). Returns
    ``{"per_iter": median_s, "spread": (p_hi−p_lo)/median, "samples": [...]}``
    so every consumer can record dispersion next to the point estimate.

    ``consts``: loop-invariant pytrees (weights, KV) passed as real jit
    arguments. Do NOT close over large device arrays in ``step`` — closure
    constants are embedded into the serialized program, and on tunneled
    remote-TPU backends uploading them again per compile can take longer
    than the benchmark itself.
    """

    def chain(carry, n, *consts):
        return jax.lax.fori_loop(0, n, lambda i, c: step(c, *consts), carry)

    chain_j = jax.jit(chain, static_argnums=1)

    def fetch(n):
        out = chain_j(carry0, n, *consts)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(leaf.astype(jnp.float32)))

    def measure(n_short, n_long):
        fetch(n_short)
        fetch(n_long)  # compile + warm both chain lengths
        samples = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            fetch(n_short)
            t_short = time.perf_counter() - t0
            t0 = time.perf_counter()
            fetch(n_long)
            t_long = time.perf_counter() - t0
            samples.append((t_long - t_short) / (n_long - n_short))
        return samples

    samples = measure(warmup_iters, iters)
    # Small workloads can measure at relay-noise level (the differenced time
    # is ~0); escalate the chain length until the signal dominates. 50 ms
    # minimum differenced span: 30 ms chains through the tunnel still swung
    # ±15% between sessions (r3: the same fwd+bwd config measured 125, 133
    # and 151 TFLOP/s on 29 ms chains; 130 ms chains pinned it at 132-134
    # with 2-6% spread).
    n_short, n_long = warmup_iters, iters
    while _median(samples) * (n_long - n_short) < 50e-3 and n_long < 4096:
        n_short, n_long = n_long, n_long * 4
        samples = measure(n_short, n_long)
    med = max(_median(samples), 1e-9)
    lo, hi = min(samples), max(samples)
    return {
        "per_iter": med,
        "spread": (hi - max(lo, 0.0)) / med,
        "samples": [round(s, 9) for s in samples],
    }


def time_chained(
    step: Callable,
    carry0,
    *,
    consts=(),
    iters: int = 64,
    warmup_iters: int = 8,
    repeats: int = 5,
) -> float:
    """Median seconds/iteration — see :func:`time_chained_stats`."""
    return time_chained_stats(
        step, carry0, consts=consts, iters=iters,
        warmup_iters=warmup_iters, repeats=repeats,
    )["per_iter"]


def attention_flops(
    b: int, h: int, nq: int, nk: int, d: int, *, causal: bool, mode: str,
    window: tuple[int, int] | None = None,
) -> float:
    """Reference FLOPs model (bench_with_sdpa.py:35-41, 129-133):
    ``fpm = 2·B·H·Nq·Nk·D``; fwd = 2·fpm; bwd = 5·fpm; fwd+bwd = 7·fpm;
    ×0.5 when causal.

    ``window=(left, right)``: band-area accounting — ``Nq·Nk`` is replaced by
    the exact number of live (i, j) pairs of the band (row i attends to
    ``i−left ≤ j ≤ i+right``, ANDed with causal, clipped to ``[0, Nk)``).
    Same idea as the reference's causal halving, done exactly: a windowed
    kernel does band-area work, so quoting full-N² "TFLOP/s" would exceed
    the roofline at large N."""
    if window is not None:
        import numpy as np

        left, right = window
        i = np.arange(nq, dtype=np.int64)
        lo = i - left if left >= 0 else np.zeros_like(i)
        hi = i + right if right >= 0 else np.full_like(i, nk - 1)
        if causal:
            hi = np.minimum(hi, i)
        lo = np.clip(lo, 0, nk - 1)
        hi = np.clip(hi, -1, nk - 1)
        area = float(np.maximum(hi - lo + 1, 0).sum())
        fpm = 2.0 * b * h * area * d
        return fpm * {"fwd": 2.0, "bwd": 5.0, "fwd_bwd": 7.0}[mode]
    fpm = 2.0 * b * h * nq * nk * d
    mult = {"fwd": 2.0, "bwd": 5.0, "fwd_bwd": 7.0}[mode]
    f = mult * fpm
    return f * 0.5 if causal else f


def summarize(samples):
    """Mean/std/min/p50/p90 — native C++ path with Python fallback."""
    try:
        from flashattn_tpu.utils import native

        s = native.bench_stats(list(samples))
        if s is not None:
            return s
    except Exception:
        pass
    import numpy as np

    arr = np.asarray(samples, dtype=np.float64)
    return {
        "mean": float(arr.mean()),
        "std": float(arr.std()),
        "min": float(arr.min()),
        "p50": float(np.percentile(arr, 50, method="lower")),
        "p90": float(np.percentile(arr, 90, method="lower")),
    }
