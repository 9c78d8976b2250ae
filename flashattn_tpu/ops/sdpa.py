"""Drop-in scaled_dot_product_attention adapter.

Role parity: the reference is consumed as an SDPA replacement inside Stable
Diffusion attention layers (README.md:31-37; FlashAttn.py wraps the kernels in
``torch.autograd.Function`` with the SDPA-ish signature
``(q, k, v, mask, causal, scale, BNHD_fmt)``, FlashAttn.py:45-67). This module
exposes the same contract for JAX models — including a *working* additive
``attn_mask`` (the reference accepts but ignores it, FlashAttn.py:49) and a
boolean mask variant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from flashattn_tpu.ops.flash import flash_attention
from flashattn_tpu.ops.oracle import DEFAULT_MASK_VALUE


def scaled_dot_product_attention(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    attn_mask: jax.Array | None = None,
    is_causal: bool = False,
    scale: float | None = None,
    *,
    layout: str = "BHND",
    interpret: bool | None = None,
) -> jax.Array:
    """torch.nn.functional.scaled_dot_product_attention semantics on Pallas.

    ``attn_mask``: boolean (True = attend) or additive float, broadcastable to
    ``[B, H, Nq, Nk]``; ranks < 4 are left-padded with size-1 dims.
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
    return flash_attention(
        query, key, value,
        bias=bias, causal=is_causal, scale=scale, layout=layout,
        interpret=interpret,
    )
