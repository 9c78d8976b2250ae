"""Sliding-window (local) attention: fwd + grads vs the exact oracle,
composition with causal, tile-skipping correctness across tile boundaries."""

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.utils.testing import make_qkv

CASES = [
    # (N, window, causal) — windows chosen to land inside/astride tiles
    (512, (127, 0), False),
    (512, (64, 64), False),
    (777, (200, -1), True),     # causal + left window (Mistral-style SWA)
    (300, (-1, 50), False),     # right-only window
    (1024, (33, 12), False),
]


@pytest.mark.parametrize("n,window,causal", CASES)
def test_window_fwd_matches_oracle(n, window, causal):
    q, k, v = make_qkv(jax.random.PRNGKey(0), 1, 2, n, 64)
    got = flash_attention(q, k, v, window=window, causal=causal)
    want = attention_reference(q, k, v, window=window, causal=causal)
    assert float(jnp.max(jnp.abs(got - want))) < 2e-5


def test_window_grads_match_oracle():
    n, window = 512, (100, 30)
    q, k, v = make_qkv(jax.random.PRNGKey(1), 1, 2, n, 64)

    def loss_fused(q, k, v):
        return (flash_attention(q, k, v, window=window) ** 2).sum()

    def loss_oracle(q, k, v):
        return (attention_reference(q, k, v, window=window)
                .astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss_fused, (0, 1, 2))(q, k, v)
    gw = jax.grad(loss_oracle, (0, 1, 2))(q, k, v)
    for a, b in zip(g, gw):
        assert float(jnp.max(jnp.abs(a - b))) < 5e-4


def test_window_equals_causal_when_right_zero():
    """window=(-1, 0) must equal causal=True exactly (same tiles, same mask)."""
    q, k, v = make_qkv(jax.random.PRNGKey(2), 1, 2, 384, 64)
    a = flash_attention(q, k, v, window=(-1, 0))
    b = flash_attention(q, k, v, causal=True)
    assert float(jnp.max(jnp.abs(a - b))) == 0.0


def test_window_with_offsets():
    """Sequence-parallel caller: window masks use absolute positions."""
    q, k, v = make_qkv(jax.random.PRNGKey(3), 1, 2, 256, 64)
    got = flash_attention(q, k, v, window=(80, 0), q_offset=256,
                          kv_offset=128)
    want = attention_reference(q, k, v, window=(80, 0), q_offset=256,
                               kv_offset=128)
    assert float(jnp.max(jnp.abs(got - want))) < 2e-5


def test_window_bounded_grid_path():
    """Small blocks force the bounded-KV grid (kv_w < tk): numerics must
    match the oracle exactly across edge tiles."""
    from flashattn_tpu import BlockSizes

    bs = BlockSizes(block_q=128, block_k=128, block_q_dkv=128,
                    block_k_dkv=128, block_q_dq=128, block_k_dq=128)
    q, k, v = make_qkv(jax.random.PRNGKey(4), 1, 2, 1024, 64)
    for window, causal in (((100, 0), False), ((250, -1), True),
                           ((64, 32), False)):
        got = flash_attention(q, k, v, window=window, causal=causal,
                              block_sizes=bs)
        want = attention_reference(q, k, v, window=window, causal=causal)
        assert float(jnp.max(jnp.abs(got - want))) < 2e-5, (window, causal)


def test_window_bounded_grid_grads():
    """Bounded bwd grids (small blocks, kv_w < tk): grads must match the
    oracle, including tiles clamped at the sequence edges."""
    from flashattn_tpu import BlockSizes

    bs = BlockSizes(block_q=128, block_k=128, block_q_dkv=128,
                    block_k_dkv=128, block_q_dq=128, block_k_dq=128)
    q, k, v = make_qkv(jax.random.PRNGKey(5), 1, 2, 1024, 64)
    for window, causal in (((100, 0), False), ((250, -1), True)):
        g = jax.grad(lambda q, k, v: (flash_attention(
            q, k, v, window=window, causal=causal, block_sizes=bs) ** 2).sum(),
            (0, 1, 2))(q, k, v)
        gw = jax.grad(lambda q, k, v: (attention_reference(
            q, k, v, window=window, causal=causal)
            .astype(jnp.float32) ** 2).sum(), (0, 1, 2))(q, k, v)
        for a, b in zip(g, gw):
            assert float(jnp.max(jnp.abs(a - b))) < 5e-4, (window, causal)
