"""MXU peak-FLOPs probe.

Role parity: GPU_peak_perf_test.cu/.py — a register-only WMMA loop measuring
the machine roofline the attention kernels are judged against (SURVEY.md §5).
Here: a Pallas kernel chaining MXU matmuls on VMEM-resident tiles (each
iteration feeds the previous accumulator back into the product so nothing can
be hoisted), timed with the chained-execution harness.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.utils import platform
from flashattn_tpu.utils.timing import time_chained


N_CHAINS = 4  # independent dependency chains — keeps the MXU pipeline full
               # (a single chained dot is latency-bound: 151 vs 191 TFLOP/s
               # measured for a big XLA matmul on v5e)


def _roofline_kernel(a_ref, b_ref, o_ref, *, iters, size):
    def body(i, cs):
        # data dependency through each c: a' = a + tiny*c cannot be hoisted,
        # but the N_CHAINS dots are mutually independent and interleave.
        return tuple(
            jax.lax.dot(
                a_ref[...] + (1e-30 * c).astype(a_ref.dtype), b_ref[...],
                preferred_element_type=jnp.float32,
            )
            for c in cs
        )

    c0 = tuple(
        jnp.zeros((size, size), jnp.float32) for _ in range(N_CHAINS)
    )
    cs = jax.lax.fori_loop(0, iters, body, c0)
    acc = cs[0]
    for c in cs[1:]:
        acc = acc + c
    o_ref[...] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("iters", "size", "interpret"))
def _roofline_call(a, b, *, iters, size, interpret):
    return pl.pallas_call(
        functools.partial(_roofline_kernel, iters=iters, size=size),
        out_shape=jax.ShapeDtypeStruct((size, size), a.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * size * size * size * iters * 4,  # N_CHAINS dots/iter
            bytes_accessed=3 * size * size * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)


def measure_mxu_peak_tflops(
    *, size: int = 512, iters: int = 1024, dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> float:
    """Measured MXU TFLOP/s upper bound on this chip (bf16 by default)."""
    if interpret is None:
        interpret = platform.pallas_interpret_default()
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (size, size), jnp.float32).astype(dtype)
    b = jax.random.normal(key, (size, size), jnp.float32).astype(dtype)

    def step(carry, b):
        out = _roofline_call(carry, b, iters=iters, size=size,
                             interpret=interpret)
        return out.astype(dtype)

    t = time_chained(step, a, consts=(b,), iters=8, warmup_iters=2, repeats=2)
    from flashattn_tpu.ops.roofline import N_CHAINS as _nc
    flops = 2.0 * size ** 3 * iters * _nc
    return flops / t / 1e12


def measure_xla_matmul_peak_tflops(
    *, size: int = 1024, dtype=jnp.bfloat16, repeats: int = 5,
) -> float:
    """MXU peak via a big chained XLA matmul (no Pallas) — the second
    roofline arm. N_CHAINS independent dependency chains keep the MXU
    pipeline full (a single chained dot is latency-bound: 151 vs 191
    TFLOP/s measured on v5e)."""
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (size, size), jnp.float32).astype(dtype)
    b = jax.random.normal(key, (size, size), jnp.float32).astype(dtype)

    def step(c, a, b):
        # c: [N_CHAINS, size, size] f32; a' = a + 1e-30·c defeats hoisting
        # while keeping magnitudes fixed at |a @ b|.
        x = a[None] + (1e-30 * c).astype(a.dtype)
        return jnp.einsum("cij,jk->cik", x, b,
                          preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)

    c0 = jnp.zeros((N_CHAINS, size, size), jnp.float32)
    t = time_chained(step, c0, consts=(a, b), iters=64, warmup_iters=16,
                     repeats=repeats)
    return 2.0 * size ** 3 * N_CHAINS / t / 1e12
