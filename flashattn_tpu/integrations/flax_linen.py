"""flax.linen drop-in: fused attention as an ``attention_fn``.

``nn.MultiHeadDotProductAttention`` (and every flax model built on it) takes
an ``attention_fn`` with the signature of ``nn.dot_product_attention``;
swapping in :func:`flash_attention_fn` routes the soft(QKᵀ)V core through the
fused Pallas kernels with zero other model changes — the same "minimal
integration" contract the reference offers torch SDPA call sites (reference
README.md:6-15; FlashAttn.py:45-67 mimics the SDPA signature for this reason).

Two levels:

* :func:`flash_attention_fn` — exact signature-compatible replacement.
  Structural masks arrive as materialized ``[..., H, Nq, Nk]`` boolean
  arrays (that is flax's contract), so this path pays O(Nq·Nk) bias memory
  when a mask/bias is present — correct, but not the fast path for causal.
* :func:`make_flash_attention_fn` — binds structural kwargs (``causal``,
  ``window``) that the kernel applies by *tile skipping*, never
  materializing an N² mask. Use instead of ``nn.make_causal_mask``.

Example::

    attn = nn.MultiHeadDotProductAttention(
        num_heads=16,
        attention_fn=make_flash_attention_fn(causal=True),
    )
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import flax.linen as nn

from flashattn_tpu.ops.oracle import DEFAULT_MASK_VALUE
from flashattn_tpu.ops.sdpa import scaled_dot_product_attention


def flash_attention_fn(
    query: jax.Array,
    key: jax.Array,
    value: jax.Array,
    bias: jax.Array | None = None,
    mask: jax.Array | None = None,
    dropout_rng=None,
    dropout_rate: float = 0.0,
    deterministic: bool = False,
    dtype=None,
    *,
    causal: bool = False,
    window: tuple[int, int] | None = None,
    impl: str = "auto",
    interpret: bool | None = None,
) -> jax.Array:
    """``nn.dot_product_attention`` semantics on the fused kernels.

    ``query``/``key``/``value``: ``[batch..., length, heads, head_dim]`` —
    flax's native layout is the kernel's BNHD layout, so no transpose is
    paid. ``mask`` is boolean (True = attend), ``bias`` additive; both
    broadcastable to ``[batch..., heads, Nq, Nk]`` (flax semantics: bias is
    added to the logits, masked-out logits get a large negative).

    Attention dropout is not supported in the fused kernels; a non-zero
    ``dropout_rate`` with ``deterministic=False`` raises rather than
    silently changing training behavior.

    ``causal``/``window`` are keyword-only extensions bound via
    :func:`make_flash_attention_fn`; they reach the kernel as structural
    band parameters (tile skipping, O(N) memory) instead of a mask array.
    """
    if dropout_rate > 0.0 and not deterministic:
        raise NotImplementedError(
            "flash_attention_fn does not implement attention dropout; use "
            "deterministic=True / dropout_rate=0.0 (dropout on activations "
            "outside the attention core is unaffected).")
    if dtype is not None:
        query, key, value = (x.astype(dtype) for x in (query, key, value))

    attn_mask = None
    if mask is not None:
        m = jnp.where(mask, 0.0, DEFAULT_MASK_VALUE).astype(jnp.float32)
        attn_mask = m if bias is None else m + bias.astype(jnp.float32)
    elif bias is not None:
        attn_mask = bias

    # Collapse extra leading batch dims to the kernel's rank-4 [B,N,H,D].
    batch_shape = query.shape[:-3]
    if len(batch_shape) != 1:
        def _flat(x):
            return x.reshape((-1,) + x.shape[len(batch_shape):])
        query, key, value = _flat(query), _flat(key), _flat(value)
        if attn_mask is not None:
            while attn_mask.ndim < len(batch_shape) + 3:
                attn_mask = attn_mask[None]
            attn_mask = jnp.broadcast_to(
                attn_mask, batch_shape + attn_mask.shape[len(batch_shape):])
            attn_mask = _flat(attn_mask)

    kw = {}
    if window is not None:
        kw["window"] = window
    if kw:
        # window is a flash_attention-only parameter: call it directly
        # (the sdpa adapter's exact arm has no window support).
        from flashattn_tpu.ops.flash import flash_attention
        out = flash_attention(query, key, value, bias=attn_mask,
                              causal=causal, layout="BNHD",
                              interpret=interpret, **kw)
    else:
        out = scaled_dot_product_attention(
            query, key, value, attn_mask=attn_mask, is_causal=causal,
            layout="BNHD", impl=impl, interpret=interpret)
    return out.reshape(batch_shape + out.shape[1:])


def make_flash_attention_fn(*, causal: bool = False,
                            window: tuple[int, int] | None = None,
                            impl: str = "auto",
                            interpret: bool | None = None):
    """Bind structural-mask kwargs into an ``attention_fn``.

    The returned function has ``nn.dot_product_attention``'s signature (flax
    introspects and filters kwargs against it), with ``causal``/``window``
    pre-bound so they reach the kernel as band parameters — no N² mask is
    ever built. Don't also pass ``nn.make_causal_mask`` output; that would
    pay the O(N²) bias path for a mask the kernel already applies.
    """
    return functools.partial(flash_attention_fn, causal=causal,
                             window=window, impl=impl, interpret=interpret)


class FlashMultiHeadDotProductAttention(nn.MultiHeadDotProductAttention):
    """``nn.MultiHeadDotProductAttention`` with the fused kernels pre-wired.

    ``causal=True`` replaces the usual materialized ``nn.make_causal_mask``
    with kernel tile skipping. All other flax knobs (projections, dtypes,
    decode cache, ...) are inherited unchanged.
    """

    causal: bool = False
    window: tuple[int, int] | None = None

    def setup(self):
        # attention_fn is a pytree-static dataclass field on the parent;
        # object.__setattr__ because flax Modules are frozen post-init.
        object.__setattr__(
            self, "attention_fn",
            make_flash_attention_fn(causal=self.causal, window=self.window))
        super().setup()
