"""Drop-in scaled_dot_product_attention adapter.

Role parity: the reference is consumed as an SDPA replacement inside Stable
Diffusion attention layers (README.md:31-37; FlashAttn.py wraps the kernels in
``torch.autograd.Function`` with the SDPA-ish signature
``(q, k, v, mask, causal, scale, BNHD_fmt)``, FlashAttn.py:45-67). This module
exposes the same contract for JAX models — including a *working* additive
``attn_mask`` (the reference accepts but ignores it, FlashAttn.py:49) and a
boolean mask variant.

Beyond the reference: an ``impl="auto"`` dispatch. Measured on TPU v5e
(benchmarks/results/attn_fwd_bf16.jsonl), exact-softmax XLA attention beats a
fused kernel on small/thin shapes (N ≤ ~1k, or tiny Nk like SD's 77-token
cross-attention) where per-kernel overhead and D-lane padding dominate, while
the fused kernel wins ≥3× beyond that and keeps memory O(N) instead of O(N²).
``auto`` picks per shape; ``"fused"``/``"exact"`` force a path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flashattn_tpu.ops.flash import flash_attention
from flashattn_tpu.ops.oracle import DEFAULT_MASK_VALUE, attention_reference


def _exact_is_faster(nq: int, nk: int) -> bool:
    """Shape rule fitted to the v5e sweep (benchmarks/results/*.jsonl): tiny
    KV (cross-attention) or a small N×N square → exact; everything else →
    fused. 1536 ≈ the measured crossover: exact wall-time grows ~N² past it
    while the fused kernel holds ~140 TFLOP/s (D=128)."""
    return nk <= 128 or (nq <= 1536 and nk <= 1536)


def scaled_dot_product_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    attn_mask: jax.Array | None = None,
    is_causal: bool = False,
    scale: float | None = None,
    *,
    layout: str = "BHND",
    impl: str = "auto",
    interpret: bool | None = None,
) -> jax.Array:
    """torch.nn.functional.scaled_dot_product_attention semantics on Pallas.

    ``attn_mask``: boolean (True = attend) or additive float, broadcastable to
    ``[B, H, Nq, Nk]``; ranks < 4 are left-padded with size-1 dims.
    ``impl``: "auto" (shape-based fused/exact dispatch), "fused", or "exact".
    Note the exact path materializes the full [Nq, Nk] score matrix (O(N·Nk)
    memory, f32) — "auto" only routes there for shapes where that is small;
    force ``impl="fused"`` if O(N) memory matters more than small-shape speed.
    ``interpret`` applies to both paths (exact ignores it semantically but
    accepts it for call-site symmetry).
    """
    bias = None
    if attn_mask is not None:
        mask = attn_mask
        while mask.ndim < 4:
            mask = mask[None]
        if mask.dtype == jnp.bool_:
            bias = jnp.where(mask, 0.0, DEFAULT_MASK_VALUE).astype(jnp.float32)
        else:
            bias = mask

    nq_axis, nk_axis = (2, 2) if layout == "BHND" else (1, 1)
    nq, nk = query.shape[nq_axis], key.shape[nk_axis]
    use_exact = impl == "exact" or (impl == "auto" and _exact_is_faster(nq, nk))

    if use_exact:
        q, k, v = query, key, value
        if layout == "BNHD":
            q, k, v = (x.swapaxes(1, 2) for x in (q, k, v))
        o = attention_reference(q, k, v, bias=bias, causal=is_causal,
                                scale=scale)
        return o.swapaxes(1, 2) if layout == "BNHD" else o

    return flash_attention(
        query, key, value,
        bias=bias, causal=is_causal, scale=scale, layout=layout,
        interpret=interpret,
    )
