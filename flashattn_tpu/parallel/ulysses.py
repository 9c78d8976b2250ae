"""Ulysses-style sequence parallelism: all-to-all (seq ↔ heads) around the
single-device kernel.

Alternative to ring attention when heads ≥ devices (SURVEY.md §2.5): instead
of rotating KV, one all-to-all converts sequence-sharded Q/K/V into
head-sharded full-sequence tensors, the ordinary kernel runs locally with no
further communication, and a second all-to-all restores sequence sharding.
``jax.lax.all_to_all`` is linear, so the whole transform is differentiable
for free — this is the sequence-parallel *training* path of choice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flashattn_tpu.ops.flash import flash_attention


def ulysses_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = False,
    scale: float | None = None,
    bias: jax.Array | None = None,
    window: tuple[int, int] | None = None,
    segment_ids: jax.Array | None = None,
) -> jax.Array:
    """Sequence-parallel attention via all-to-all (call inside ``shard_map``).

    q/k/v: local chunks ``[B, H, N/n, D]`` sharded on ``axis_name``; H must be
    divisible by the axis size. Returns the local output chunk.

    ``segment_ids``: the local ``[B, N/n]`` id chunk (packed sequences). The
    post-all-to-all kernel sees the full sequence, so the ids are all-gathered
    along the axis first — O(N) int32 traffic, a well-defined global contract
    (unlike a bias slice, which is O(N²) and rejected below).
    """
    n = axis_size
    B, H, nq_loc, D = q.shape
    if H % n != 0:
        raise ValueError(f"Ulysses needs n_devices | heads: H={H}, n={n}")
    if bias is not None:
        # A caller inside shard_map holds sequence-LOCAL tensors; a local
        # bias slice would be silently wrong after the seq->head all-to-all
        # (the kernel then sees the full sequence). No well-defined local
        # contract exists, so reject instead of mis-computing.
        raise ValueError(
            "ulysses_attention does not support bias: inputs are sequence-"
            "sharded but the post-all-to-all kernel sees the full sequence; "
            "use ring_attention (windowed/causal masks) or replicated "
            "full-sequence attention with bias instead."
        )
    Hkv = k.shape[1]
    if Hkv != H and Hkv % n != 0:
        k = jnp.repeat(k, H // Hkv, axis=1)
        v = jnp.repeat(v, H // Hkv, axis=1)

    def seq_to_head(x):
        # [B, H, N/n, D] -> [B, H/n, N, D]
        return jax.lax.all_to_all(
            x, axis_name, split_axis=1, concat_axis=2, tiled=True
        )

    def head_to_seq(x):
        return jax.lax.all_to_all(
            x, axis_name, split_axis=2, concat_axis=1, tiled=True
        )

    seg_full = None
    if segment_ids is not None:
        # [B, N/n] -> [B, N] (ids are global values; gather restores the
        # full-sequence view the kernel operates in).
        seg_full = jax.lax.all_gather(
            segment_ids, axis_name, axis=1, tiled=True)

    qg, kg, vg = seq_to_head(q), seq_to_head(k), seq_to_head(v)
    og = flash_attention(
        qg, kg, vg, causal=causal, scale=scale, window=window,
        segment_ids=seg_full,
    )
    return head_to_seq(og)


def ulysses_attention_sharded(
    mesh: Mesh,
    *,
    axis: str = "seq",
    batch_axis: str | None = "data",
    causal: bool = False,
    scale: float | None = None,
    window: tuple[int, int] | None = None,
    with_segment_ids: bool = False,
):
    """Jitted global-shape entry point for Ulysses SP.

    With ``with_segment_ids=True`` the returned callable takes
    ``(q, k, v, segment_ids)`` where ``segment_ids`` is the global ``[B, N]``
    int array (sharded on the seq axis like the tensors)."""
    n = mesh.shape[axis]
    spec = P(batch_axis, None, axis, None)

    if with_segment_ids:
        seg_spec = P(batch_axis, axis)

        def local_seg(q, k, v, seg):
            return ulysses_attention(
                q, k, v, axis_name=axis, axis_size=n, causal=causal,
                scale=scale, window=window, segment_ids=seg,
            )

        mapped = jax.shard_map(
            local_seg, mesh=mesh, in_specs=(spec, spec, spec, seg_spec),
            out_specs=spec,
            check_vma=False,  # pallas_call outputs carry no vma metadata
        )
        return jax.jit(mapped)

    def local(q, k, v):
        return ulysses_attention(
            q, k, v, axis_name=axis, axis_size=n, causal=causal, scale=scale,
            window=window,
        )

    mapped = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,  # pallas_call outputs carry no vma metadata
    )
    return jax.jit(mapped)
