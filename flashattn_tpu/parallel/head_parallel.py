"""Head-parallel (tensor-parallel) attention.

The reference treats heads as an embarrassingly-parallel grid axis
(``blockIdx.y``, kernel_fp16.cu:324-325); across chips the same structure
becomes a sharded head dimension with zero communication inside attention
(SURVEY.md §2.5). GQA co-locates each KV head with its query-head group.
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, PartitionSpec as P

from flashattn_tpu.ops.flash import flash_attention


def head_parallel_attention(
    mesh: Mesh,
    *,
    axis: str = "model",
    batch_axis: str | None = "data",
    causal: bool = False,
    scale: float | None = None,
    layout: str = "BHND",
):
    """Returns a jitted ``(q, k, v) -> o`` with heads sharded on ``axis``
    (and optionally batch on ``batch_axis``). Shapes `[B,H,N,D]` global.

    K/V head counts must divide by the axis size (or equal Hq for MHA);
    with GQA, Q-head groups stay co-located with their KV head so attention
    needs no collectives at all.
    """
    h_dim = 1 if layout == "BHND" else 2
    b_spec = batch_axis

    def spec_for(nheads_divisible: bool):
        parts = [b_spec, None, None, None]
        parts[h_dim] = axis if nheads_divisible else None
        return P(*parts)

    qspec = spec_for(True)
    shard_axis_size = mesh.shape[axis]

    def build(q, k, v):
        import jax.numpy as jnp

        hq, hkv = q.shape[h_dim], k.shape[h_dim]
        kv_sharded = hkv % shard_axis_size == 0
        kvspec = spec_for(kv_sharded)
        group = hq // hkv

        def fn(q, k, v):
            if not kv_sharded and group > 1:
                # KV replicated, Q heads sharded: pick each local Q head's KV
                # head explicitly — the local head index no longer encodes the
                # global GQA group (axis_index gives the shard's head offset).
                i = jax.lax.axis_index(axis)
                hq_loc = q.shape[h_dim]
                kvidx = (i * hq_loc + jnp.arange(hq_loc)) // group
                k_loc = jnp.take(k, kvidx, axis=h_dim)
                v_loc = jnp.take(v, kvidx, axis=h_dim)
                return flash_attention(
                    q, k_loc, v_loc, causal=causal, scale=scale, layout=layout
                )
            return flash_attention(
                q, k, v, causal=causal, scale=scale, layout=layout
            )

        mapped = jax.shard_map(
            fn, mesh=mesh,
            in_specs=(qspec, kvspec, kvspec),
            out_specs=qspec,
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )
        return mapped(q, k, v)

    return jax.jit(build)
