"""Logit soft-capping (Gemma-2-style) vs the exact-softmax oracle.

Capability beyond the reference: ``s → cap·tanh(s/cap)`` on the scaled
logits before bias/mask/softmax, differentiable through the ``1 − tanh²``
Jacobian. The exp2-domain trick changes under softcap: the host folds only
``scale`` into Q (the tanh must see natural-unit scores) and the kernel
applies ×log2 e after the cap.
"""

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.utils.testing import (
    BWD_TOL,
    FWD_TOL,
    assert_close,
    make_qkv,
)

CAP = 30.0


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        (1, 2, 256, 64, 256),   # aligned; causal hits the resident route
        (2, 3, 150, 64, 170),   # unaligned cross-length (dense/flat grid)
    ],
)
def test_softcap_fwd_matches_oracle(shape, causal):
    B, H, Nq, D, Nk = shape
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, Nq, D, Nk=Nk)
    # Large-ish inputs so tanh actually bends some logits.
    q, k = 3.0 * q, 3.0 * k
    want = attention_reference(q, k, v, causal=causal, logit_softcap=CAP)
    got = flash_attention(q, k, v, causal=causal, logit_softcap=CAP)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])
    # and the cap must actually change the result
    plain = attention_reference(q, k, v, causal=causal)
    assert float(jnp.max(jnp.abs(want - plain))) > 1e-3


def test_softcap_bf16_resident_route():
    B, H, N, D = 1, 4, 1024, 64
    q, k, v = make_qkv(jax.random.PRNGKey(1), B, H, N, D,
                       dtype=jnp.bfloat16)
    # scale in bf16 FIRST so both arms see bit-identical inputs
    q, k = (3.0 * q).astype(jnp.bfloat16), (3.0 * k).astype(jnp.bfloat16)
    want = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), causal=True, logit_softcap=CAP)
    got = flash_attention(q, k, v, causal=True, logit_softcap=CAP)
    assert_close(got.astype(jnp.float32), want, FWD_TOL[jnp.bfloat16.dtype])


@pytest.mark.parametrize("causal", [False, True])
def test_softcap_grads_match_oracle(causal):
    B, H, N, D = 1, 2, 192, 64
    q, k, v = make_qkv(jax.random.PRNGKey(2), B, H, N, D)
    q, k = 3.0 * q, 3.0 * k

    def loss_fused(q, k, v):
        o = flash_attention(q, k, v, causal=causal, logit_softcap=CAP)
        return jnp.sum(o * jnp.cos(o))

    def loss_oracle(q, k, v):
        o = attention_reference(q, k, v, causal=causal, logit_softcap=CAP)
        return jnp.sum(o * jnp.cos(o))

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    tol = BWD_TOL[jnp.float32.dtype]
    for g, w in zip(got, want):
        assert_close(g, w, tol)


def test_softcap_with_bias_segments_window():
    """Composition: cap → bias-after-cap → segment/window masks, fwd + all
    grads including dbias."""
    B, H, N, D = 1, 2, 256, 64
    q, k, v = make_qkv(jax.random.PRNGKey(3), B, H, N, D)
    q, k = 3.0 * q, 3.0 * k
    bias = 0.5 * jax.random.normal(jax.random.PRNGKey(4), (1, H, N, N),
                                   jnp.float32)
    seg = jnp.cumsum(
        jax.random.bernoulli(jax.random.PRNGKey(5), 4 / N, (B, N))
        .astype(jnp.int32), axis=1)
    kw_f = dict(causal=True, window=(96, -1), logit_softcap=CAP,
                segment_ids=seg)
    kw_o = dict(causal=True, window=(96, -1), logit_softcap=CAP,
                segment_ids=(seg, seg))

    def loss_fused(q, k, v, bias):
        return jnp.sum(flash_attention(q, k, v, bias=bias, **kw_f) ** 2)

    def loss_oracle(q, k, v, bias):
        return jnp.sum(attention_reference(q, k, v, bias=bias, **kw_o) ** 2)

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, v, bias)
    tol = BWD_TOL[jnp.float32.dtype]
    for g, w in zip(got, want):
        assert_close(g, w, tol)
