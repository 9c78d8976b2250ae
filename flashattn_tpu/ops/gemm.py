"""Pallas tiled-matmul probe kernels.

Role parity: the reference's ``gemm_test/`` scratchpad (9 standalone GEMM
kernels that informed the attention kernels, SURVEY.md §2.3) maps to
standalone MXU GEMM probes here — a production-shaped tiled matmul with f32
VMEM accumulation, used to calibrate block sizes and as the roofline
cross-check for the attention kernels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.utils import platform


def _matmul_kernel(a_ref, b_ref, o_ref, acc_ref, *, k_tiles):
    @pl.when(pl.program_id(2) == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    acc_ref[...] += jax.lax.dot(
        a_ref[...], b_ref[...], preferred_element_type=jnp.float32
    )

    @pl.when(pl.program_id(2) == k_tiles - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "out_dtype", "interpret"),
)
def matmul(
    a: jax.Array,  # [M, K]
    b: jax.Array,  # [K, N]
    *,
    block_m: int = 512,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """Tiled matmul: grid (M/bm, N/bn, K/bk), K sequential, f32 accumulate."""
    if interpret is None:
        interpret = platform.pallas_interpret_default()
    if out_dtype is None:
        out_dtype = a.dtype
    M, K = a.shape
    K2, N = b.shape
    if K != K2:
        raise ValueError(f"inner dims differ: {a.shape} x {b.shape}")
    bm, bn, bk = min(block_m, M), min(block_n, N), min(block_k, K)
    if M % bm or N % bn or K % bk or bm % 128 or bn % 128 or bk % 128:
        raise ValueError(
            f"probe kernel needs 128-aligned shapes divisible by blocks: "
            f"({M},{K})x({K},{N}) blocks ({bm},{bn},{bk})"
        )
    k_tiles = K // bk

    return pl.pallas_call(
        functools.partial(_matmul_kernel, k_tiles=k_tiles),
        grid=(M // bm, N // bn, k_tiles),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=(M * K + K * N + M * N) * a.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, b)
