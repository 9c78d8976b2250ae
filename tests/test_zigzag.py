"""Zigzag (causally load-balanced) ring attention vs the oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.parallel.zigzag import (
    zigzag_order,
    zigzag_ring_attention,
    zigzag_ring_attention_sharded,
    zigzag_shard,
    zigzag_unshard,
)
from flashattn_tpu.utils.testing import BWD_TOL, FWD_TOL, assert_close, make_qkv


def _mesh(n):
    if jax.device_count() < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.array(jax.devices()[:n]), axis_names=("seq",))


def test_zigzag_order_roundtrip():
    x = jnp.arange(4 * 16 * 3.0).reshape(1, 1, 4 * 16, 3)
    z = zigzag_shard(x, 4)
    # device 0's shard = chunks (0, 7) of 8 chunks
    c = 8
    np.testing.assert_array_equal(np.asarray(z[0, 0, :c]),
                                  np.asarray(x[0, 0, :c]))
    np.testing.assert_array_equal(np.asarray(z[0, 0, c:2 * c]),
                                  np.asarray(x[0, 0, 7 * c:8 * c]))
    np.testing.assert_array_equal(np.asarray(zigzag_unshard(z, 4)),
                                  np.asarray(x))
    with pytest.raises(ValueError, match="divisible"):
        zigzag_order(100, 4)


def test_zigzag_matches_oracle():
    mesh = _mesh(4)
    q, k, v = make_qkv(jax.random.PRNGKey(0), 1, 2, 4 * 256, 64)
    fn = zigzag_ring_attention_sharded(
        mesh, axis="seq", batch_axis=None, head_axis=None)
    got = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_zigzag_gqa_bf16():
    mesh = _mesh(4)
    q, k, v = make_qkv(jax.random.PRNGKey(1), 1, 4, 4 * 256, 64, Hkv=2,
                       dtype=jnp.bfloat16)
    fn = zigzag_ring_attention_sharded(
        mesh, axis="seq", batch_axis=None, head_axis=None)
    got = fn(q, k, v)
    kr = jnp.repeat(k, 2, axis=1)
    vr = jnp.repeat(v, 2, axis=1)
    want = attention_reference(q, kr, vr, causal=True)
    assert_close(got, want, FWD_TOL[jnp.bfloat16.dtype])


@pytest.mark.slow
def test_zigzag_grads():
    mesh = _mesh(4)
    n = 4
    q, k, v = make_qkv(jax.random.PRNGKey(2), 1, 2, n * 256, 64)

    def loss_zz(q, k, v):
        o = zigzag_ring_attention(
            q, k, v, axis_name="seq", axis_size=n)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, causal=True)
        return jnp.sum(o * o)

    spec = P(None, None, "seq", None)
    sharded = jax.jit(jax.shard_map(
        jax.grad(loss_zz, argnums=(0, 1, 2)), mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=(spec, spec, spec),
        check_vma=False,
    ))
    qz, kz, vz = (zigzag_shard(x, n) for x in (q, k, v))
    grads = [zigzag_unshard(g, n) for g in sharded(qz, kz, vz)]
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(grads, want):
        assert_close(g, w, BWD_TOL[jnp.float32.dtype])


def test_zigzag_rejects_odd_local():
    with pytest.raises(ValueError, match="even"):
        zigzag_ring_attention(
            jnp.zeros((1, 1, 127, 64)), jnp.zeros((1, 1, 127, 64)),
            jnp.zeros((1, 1, 127, 64)), axis_name="seq", axis_size=2)
