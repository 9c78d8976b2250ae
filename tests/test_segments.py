"""Packed-sequence (segment_ids) attention vs the exact-softmax oracle.

Capability beyond the reference (its ``mask`` arg is dead, FlashAttn.py:49):
varlen training batches packed into one sequence, masked inside the fused
kernels with O(N) integer id arrays instead of an O(N²) bias. The golden test
is packing-equivalence: attention over a packed pair of sequences must equal
the two sequences attended separately.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flashattn_tpu import flash_attention, flash_attention_with_lse
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.utils.testing import (
    BWD_TOL,
    FWD_TOL,
    assert_close,
    make_qkv,
)


def _packed_ids(key, B, N, max_segs=4):
    """Contiguous segment ids per batch row, e.g. [0,0,0,1,1,2,2,2,...]."""
    bounds = jax.random.bernoulli(key, max_segs / N, (B, N))
    return jnp.cumsum(bounds.astype(jnp.int32), axis=1)


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        (1, 2, 256, 64, 256),   # aligned
        (2, 3, 300, 64, 300),   # unaligned N (padding sentinels in play)
    ],
)
def test_segments_fwd_matches_oracle(shape, causal):
    B, H, Nq, D, Nk = shape
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, Nq, D, Nk=Nk)
    seg = _packed_ids(jax.random.PRNGKey(1), B, Nq)
    want = attention_reference(q, k, v, causal=causal,
                               segment_ids=(seg, seg))
    got = flash_attention(q, k, v, causal=causal, segment_ids=seg)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


@pytest.mark.slow
def test_segments_cross_attention_tuple():
    B, H, Nq, D, Nk = 2, 2, 130, 64, 200
    q, k, v = make_qkv(jax.random.PRNGKey(2), B, H, Nq, D, Nk=Nk)
    seg_q = _packed_ids(jax.random.PRNGKey(3), B, Nq)
    seg_kv = _packed_ids(jax.random.PRNGKey(4), B, Nk)
    want = attention_reference(q, k, v, segment_ids=(seg_q, seg_kv))
    got = flash_attention(q, k, v, segment_ids=(seg_q, seg_kv))
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_segments_gqa_bf16():
    B, Hq, Hkv, N, D = 1, 4, 2, 256, 64
    q, _, _ = make_qkv(jax.random.PRNGKey(5), B, Hq, N, D,
                       dtype=jnp.bfloat16)
    _, k, v = make_qkv(jax.random.PRNGKey(6), B, Hkv, N, D,
                       dtype=jnp.bfloat16)
    seg = _packed_ids(jax.random.PRNGKey(7), B, N)
    want = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True, segment_ids=(seg, seg))
    got = flash_attention(q, k, v, causal=True, segment_ids=seg)
    assert_close(got.astype(jnp.float32), want, FWD_TOL[jnp.bfloat16.dtype])


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.slow
def test_segments_grads_match_oracle(causal):
    B, H, N, D = 1, 2, 192, 64
    q, k, v = make_qkv(jax.random.PRNGKey(8), B, H, N, D)
    seg = _packed_ids(jax.random.PRNGKey(9), B, N)

    def loss_fused(q, k, v):
        o = flash_attention(q, k, v, causal=causal, segment_ids=seg)
        return jnp.sum(o * jnp.cos(o))

    def loss_oracle(q, k, v):
        o = attention_reference(q, k, v, causal=causal,
                                segment_ids=(seg, seg))
        return jnp.sum(o * jnp.cos(o))

    got = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2))(q, k, v)
    tol = BWD_TOL[jnp.float32.dtype]
    for g, w in zip(got, want):
        assert_close(g, w, tol)


def test_packing_equivalence():
    """Golden test: two sequences packed into one call == separate calls."""
    B, H, D = 1, 2, 64
    n1, n2 = 100, 156
    q, k, v = make_qkv(jax.random.PRNGKey(10), B, H, n1 + n2, D)
    seg = jnp.concatenate(
        [jnp.zeros((B, n1), jnp.int32), jnp.ones((B, n2), jnp.int32)], axis=1)
    packed = flash_attention(q, k, v, causal=True, segment_ids=seg)
    sep1 = flash_attention(q[:, :, :n1], k[:, :, :n1], v[:, :, :n1],
                           causal=True,
                           scale=float(D) ** -0.5)
    sep2 = flash_attention(q[:, :, n1:], k[:, :, n1:], v[:, :, n1:],
                           causal=True,
                           scale=float(D) ** -0.5)
    want = jnp.concatenate([sep1, sep2], axis=2)
    assert_close(packed, want, FWD_TOL[jnp.float32.dtype])


@pytest.mark.slow
def test_dead_rows_zero_output_and_grads():
    """q rows whose segment matches no kv token: zeros out, zero grads in."""
    B, H, N, D = 1, 2, 128, 64
    q, k, v = make_qkv(jax.random.PRNGKey(11), B, H, N, D)
    # q rows [64:] belong to segment 7 which no kv token carries.
    seg_q = jnp.concatenate(
        [jnp.zeros((B, 64), jnp.int32), jnp.full((B, N - 64), 7, jnp.int32)],
        axis=1)
    seg_kv = jnp.zeros((B, N), jnp.int32)

    def loss(q, k, v):
        o = flash_attention(q, k, v, segment_ids=(seg_q, seg_kv))
        return jnp.sum(o), o

    (_, o), grads = jax.value_and_grad(loss, argnums=(0, 1, 2),
                                       has_aux=True)(q, k, v)
    np.testing.assert_array_equal(np.asarray(o[:, :, 64:]), 0.0)
    np.testing.assert_array_equal(np.asarray(grads[0][:, :, 64:]), 0.0)
    # dK/dV must receive nothing from dead rows: compare against the oracle.
    want = jax.grad(
        lambda q, k, v: jnp.sum(attention_reference(
            q, k, v, segment_ids=(seg_q, seg_kv))),
        argnums=(1, 2))(q, k, v)
    tol = BWD_TOL[jnp.float32.dtype]
    assert_close(grads[1], want[0], tol)
    assert_close(grads[2], want[1], tol)


def test_segments_with_bias_and_dbias():
    """segments × bias: both optional VMEM operands threaded together
    (spec-ordering in fwd + both bwd kernels), including the bias gradient —
    dbias must be zero at segment-masked pairs."""
    B, H, N, D = 1, 2, 192, 64
    q, k, v = make_qkv(jax.random.PRNGKey(20), B, H, N, D)
    bias = 0.5 * jax.random.normal(jax.random.PRNGKey(21), (1, H, N, N),
                                   jnp.float32)
    seg = _packed_ids(jax.random.PRNGKey(22), B, N)

    def loss_fused(q, k, v, bias):
        o = flash_attention(q, k, v, bias=bias, segment_ids=seg)
        return jnp.sum(o * jnp.sin(o))

    def loss_oracle(q, k, v, bias):
        o = attention_reference(q, k, v, bias=bias, segment_ids=(seg, seg))
        return jnp.sum(o * jnp.sin(o))

    got = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    want = jax.grad(loss_oracle, argnums=(0, 1, 2, 3))(q, k, v, bias)
    tol = BWD_TOL[jnp.float32.dtype]
    for g, w in zip(got, want):
        assert_close(g, w, tol)


def test_segments_with_window():
    B, H, N, D = 1, 2, 256, 64
    q, k, v = make_qkv(jax.random.PRNGKey(12), B, H, N, D)
    seg = _packed_ids(jax.random.PRNGKey(13), B, N)
    want = attention_reference(q, k, v, causal=True, window=(64, -1),
                               segment_ids=(seg, seg))
    got = flash_attention(q, k, v, causal=True, window=(64, -1),
                          segment_ids=seg)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_segments_with_lse_and_validation():
    B, H, N, D = 1, 2, 128, 64
    q, k, v = make_qkv(jax.random.PRNGKey(14), B, H, N, D)
    seg = _packed_ids(jax.random.PRNGKey(15), B, N)
    o, lse = flash_attention_with_lse(q, k, v, segment_ids=seg)
    want = attention_reference(q, k, v, segment_ids=(seg, seg))
    assert_close(o, want, FWD_TOL[jnp.float32.dtype])
    assert lse.shape == (B, H, N)

    with pytest.raises(ValueError, match="integers"):
        flash_attention(q, k, v, segment_ids=seg.astype(jnp.float32))
    with pytest.raises(ValueError, match="shapes"):
        flash_attention(q, k, v, segment_ids=seg[:, :64])
    qc = q[:, :, :100]
    with pytest.raises(ValueError, match="Nq == Nk"):
        flash_attention(qc, k, v, segment_ids=seg)
