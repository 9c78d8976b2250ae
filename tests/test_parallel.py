"""Distribution layer vs single-device oracle, on an 8-device virtual mesh.

The reference has no multi-device story; the CPU-emulated mesh is this
build's "fake backend" (SURVEY.md §4). Every sharded path must be numerically
identical (up to dtype round-off) to the unsharded kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.parallel import (
    head_parallel_attention,
    make_mesh,
    ring_attention_sharded,
    ulysses_attention,
)
from flashattn_tpu.parallel.ulysses import ulysses_attention_sharded
from flashattn_tpu.utils.testing import BWD_TOL, FWD_TOL, assert_close, make_qkv


def _need8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 devices")


def test_make_mesh():
    _need8()
    mesh = make_mesh(data=2, model=2, seq=2)
    assert mesh.shape == {"data": 2, "model": 2, "seq": 2}
    with pytest.raises(ValueError):
        make_mesh(data=4, model=4, seq=4)


def test_head_parallel_matches_oracle():
    _need8()
    mesh = make_mesh(data=2, model=4)
    q, k, v = make_qkv(jax.random.PRNGKey(0), 2, 8, 256, 64)
    fn = head_parallel_attention(mesh, causal=True)
    got = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_head_parallel_gqa_replicated_kv():
    _need8()
    mesh = make_mesh(model=4)
    # Hkv=2 does not divide the 4-way axis -> KV replicated, Q sharded
    q, k, v = make_qkv(jax.random.PRNGKey(1), 1, 8, 128, 64, Hkv=2)
    fn = head_parallel_attention(mesh, batch_axis=None)
    got = fn(q, k, v)
    want = attention_reference(q, k, v)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_matches_oracle(causal):
    _need8()
    mesh = make_mesh(seq=4)
    q, k, v = make_qkv(jax.random.PRNGKey(2), 1, 2, 512, 64)
    fn = ring_attention_sharded(mesh, causal=causal, batch_axis=None,
                                head_axis=None)
    got = fn(q, k, v)
    want = attention_reference(q, k, v, causal=causal)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_ring_attention_2d_heads_x_seq():
    _need8()
    mesh = make_mesh(model=2, seq=4)
    q, k, v = make_qkv(jax.random.PRNGKey(3), 1, 4, 512, 64)
    fn = ring_attention_sharded(mesh, causal=True, batch_axis=None)
    got = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


@pytest.mark.parametrize("causal", [False, True])
def test_ring_attention_grads(causal):
    _need8()
    mesh = make_mesh(seq=4)
    q, k, v = make_qkv(jax.random.PRNGKey(4), 1, 2, 256, 64)
    fn = ring_attention_sharded(mesh, causal=causal, batch_axis=None,
                                head_axis=None)
    got = jax.grad(lambda *a: (fn(*a) ** 2).sum(), (0, 1, 2))(q, k, v)
    want = jax.grad(
        lambda *a: (attention_reference(*a, causal=causal) ** 2).sum(),
        (0, 1, 2),
    )(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        assert_close(a, b, BWD_TOL[jnp.float32.dtype], name)


@pytest.mark.slow
@pytest.mark.parametrize("causal", [False, True])
def test_ring_segment_ids(causal):
    """Packed sequences under ring SP: kv id chunks rotate alongside K/V;
    dead partials merge as no-ops through the LSE rule. A segment straddling
    a shard boundary exercises the cross-chunk matching."""
    _need8()
    mesh = make_mesh(seq=4)
    B, H, N, D = 1, 2, 512, 64
    q, k, v = make_qkv(jax.random.PRNGKey(17), B, H, N, D)
    seg = jnp.cumsum(
        jax.random.bernoulli(jax.random.PRNGKey(18), 6 / N, (B, N))
        .astype(jnp.int32), axis=1)
    fn = ring_attention_sharded(mesh, causal=causal, batch_axis=None,
                                head_axis=None, with_segment_ids=True)
    got = fn(q, k, v, seg)
    want = attention_reference(q, k, v, causal=causal,
                               segment_ids=(seg, seg))
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])
    gg = jax.grad(lambda q, k, v: (fn(q, k, v, seg) ** 2).sum(),
                  (0, 1, 2))(q, k, v)
    gw = jax.grad(
        lambda q, k, v: (attention_reference(
            q, k, v, causal=causal, segment_ids=(seg, seg)) ** 2).sum(),
        (0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gg, gw):
        assert_close(a, b, BWD_TOL[jnp.float32.dtype], name)


@pytest.mark.slow
def test_ring_attention_gqa_rotates_hkv():
    """GQA ring: KV rotate at Hkv heads (ICI traffic Hkv/Hq of naive —
    VERDICT r1 weak #6); numerics must still match the GQA oracle, fwd and
    grads."""
    _need8()
    mesh = make_mesh(seq=4)
    q, k, v = make_qkv(jax.random.PRNGKey(7), 1, 4, 256, 64, Hkv=2)
    fn = ring_attention_sharded(mesh, causal=True, batch_axis=None,
                                head_axis=None)
    got = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])
    g = jax.grad(lambda *a: (fn(*a) ** 2).sum(), (0, 1, 2))(q, k, v)
    w = jax.grad(
        lambda *a: (attention_reference(*a, causal=True) ** 2).sum(),
        (0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), g, w):
        assert a.shape == b.shape, name  # dk/dv reduced back to Hkv
        assert_close(a, b, BWD_TOL[jnp.float32.dtype], name)


def test_ulysses_rejects_bias():
    """Sequence-sharded callers cannot express a correct local bias across
    the seq<->head all-to-all; the API must reject instead of mis-compute."""
    q, k, v = make_qkv(jax.random.PRNGKey(8), 1, 4, 64, 32)
    bias = jnp.zeros((1, 1, 64, 64), jnp.float32)
    with pytest.raises(ValueError, match="bias"):
        ulysses_attention(q, k, v, axis_name="seq", axis_size=1, bias=bias)


def test_ulysses_matches_oracle():
    _need8()
    mesh = make_mesh(seq=4)
    q, k, v = make_qkv(jax.random.PRNGKey(5), 1, 8, 512, 64)
    fn = ulysses_attention_sharded(mesh, causal=True, batch_axis=None)
    got = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_ulysses_grads():
    _need8()
    mesh = make_mesh(seq=4)
    q, k, v = make_qkv(jax.random.PRNGKey(6), 1, 4, 256, 64)
    fn = ulysses_attention_sharded(mesh, causal=True, batch_axis=None)
    got = jax.grad(lambda *a: (fn(*a) ** 2).sum(), (0, 1, 2))(q, k, v)
    want = jax.grad(
        lambda *a: (attention_reference(*a, causal=True) ** 2).sum(),
        (0, 1, 2),
    )(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), got, want):
        assert_close(a, b, BWD_TOL[jnp.float32.dtype], name)


@pytest.mark.slow
def test_ulysses_segment_ids():
    """Packed sequences under Ulysses SP: local id chunks are all-gathered
    into the global [B, N] view the post-all-to-all kernel operates in."""
    _need8()
    mesh = make_mesh(seq=4)
    B, H, N, D = 1, 8, 512, 64
    q, k, v = make_qkv(jax.random.PRNGKey(15), B, H, N, D)
    seg = jnp.cumsum(
        jax.random.bernoulli(jax.random.PRNGKey(16), 6 / N, (B, N))
        .astype(jnp.int32), axis=1)
    fn = ulysses_attention_sharded(mesh, causal=True, batch_axis=None,
                                   with_segment_ids=True)
    got = fn(q, k, v, seg)
    want = attention_reference(q, k, v, causal=True,
                               segment_ids=(seg, seg))
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])
    gg = jax.grad(lambda q, k, v: (fn(q, k, v, seg) ** 2).sum(),
                  (0, 1, 2))(q, k, v)
    gw = jax.grad(
        lambda q, k, v: (attention_reference(
            q, k, v, causal=True, segment_ids=(seg, seg)) ** 2).sum(),
        (0, 1, 2))(q, k, v)
    for name, a, b in zip(("dq", "dk", "dv"), gg, gw):
        assert_close(a, b, BWD_TOL[jnp.float32.dtype], name)


def test_ulysses_rejects_bad_heads():
    _need8()
    mesh = make_mesh(seq=4)
    q, k, v = make_qkv(jax.random.PRNGKey(7), 1, 3, 256, 64)  # 3 heads, 4 dev
    fn = ulysses_attention_sharded(mesh, batch_axis=None)
    with pytest.raises(ValueError):
        fn(q, k, v)


def test_ulysses_window():
    """Sliding-window SP: window semantics are global after the seq->head
    all-to-all, so the parameter passes straight through to the kernel."""
    _need8()
    mesh = make_mesh(seq=4)
    q, k, v = make_qkv(jax.random.PRNGKey(31), 1, 8, 512, 64)
    fn = ulysses_attention_sharded(
        mesh, causal=True, window=(128, 0), batch_axis=None)
    got = fn(q, k, v)
    want = attention_reference(q, k, v, causal=True, window=(128, 0))
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])
