"""In-kernel RDMA ring attention vs the oracle, on the 8-device virtual mesh.

These tests interpret the Pallas kernel with the Mosaic-TPU interpreter
(``pltpu.InterpretParams``), which models the cross-device RDMA/semaphore
schedule — including its race detector. This is the repo's "race detection"
practice (SURVEY.md §5): the reference has no sanitizer at all (its backward
dQ accumulation races in the wild, kernel_fp16.cu:736); here the RDMA ring's
handshake is machine-checked before it ever runs on hardware.

The interpreter runs each virtual device in a blocking host callback, so
multi-device runs need the io_callback inline patch (see
platform.patch_io_callback_inline) to not starve the host's thread pool.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.parallel.ring_kernel import (
    ring_attention_kernel,
    ring_attention_kernel_sharded,
)
from flashattn_tpu.utils import platform
from flashattn_tpu.utils.testing import BWD_TOL, FWD_TOL, assert_close, make_qkv


def _mesh(n):
    if jax.default_backend() != "cpu":
        pytest.skip("interpret-mode test (CPU virtual mesh only)")
    if jax.device_count() < n:
        pytest.skip(f"needs {n} devices")
    platform.patch_io_callback_inline()
    return Mesh(np.array(jax.devices()[:n]), axis_names=("seq",))


@pytest.mark.parametrize("causal", [False, True])
def test_ring_kernel_matches_oracle(causal):
    mesh = _mesh(4)
    q, k, v = make_qkv(jax.random.PRNGKey(0), 1, 2, 4 * 128, 128)
    fn = ring_attention_kernel_sharded(
        mesh, axis="seq", batch_axis=None, head_axis=None, causal=causal,
        interpret_params=pltpu.InterpretParams(detect_races=True))
    got = fn(q, k, v)
    want = attention_reference(q, k, v, causal=causal)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


@pytest.mark.parametrize("causal,window", [(True, (160, -1)),
                                           (False, (160, 160))])
def test_ring_kernel_window(causal, window):
    """Sliding-window band masking in GLOBAL positions across ring chunks
    (supported() widened in r4); race detector stays on."""
    mesh = _mesh(4)
    q, k, v = make_qkv(jax.random.PRNGKey(1), 1, 2, 4 * 128, 128)
    fn = ring_attention_kernel_sharded(
        mesh, axis="seq", batch_axis=None, head_axis=None, causal=causal,
        window=window,
        interpret_params=pltpu.InterpretParams(detect_races=True))
    got = fn(q, k, v)
    want = attention_reference(q, k, v, causal=causal, window=window)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


@pytest.mark.slow
def test_ring_kernel_gqa_bf16_8dev():
    mesh = _mesh(8)
    q, k, v = make_qkv(jax.random.PRNGKey(7), 1, 4, 8 * 128, 128, Hkv=2,
                       dtype=jnp.bfloat16)
    fn = ring_attention_kernel_sharded(
        mesh, axis="seq", batch_axis=None, head_axis=None, causal=True,
        interpret_params=pltpu.InterpretParams(detect_races=True))
    got = fn(q, k, v)
    kr = jnp.repeat(k, 2, axis=1)
    vr = jnp.repeat(v, 2, axis=1)
    want = attention_reference(q, kr, vr, causal=True)
    assert_close(got, want, FWD_TOL[jnp.bfloat16.dtype])


def test_ring_kernel_grads():
    # backward now ALSO runs in-kernel (r5): (dK, dV) f32 accumulators
    # rotate with the KV chunks plus a final owner-return hop
    mesh = _mesh(2)
    q, k, v = make_qkv(jax.random.PRNGKey(3), 1, 2, 2 * 128, 128)

    def loss_kernel(q, k, v):
        o = ring_attention_kernel(
            q, k, v, axis_name="seq", axis_size=2, causal=True)
        return jnp.sum(o * o)

    def loss_ref(q, k, v):
        o = attention_reference(q, k, v, causal=True)
        return jnp.sum(o * o)

    from jax.sharding import PartitionSpec as P

    spec = P(None, None, "seq", None)
    grads = jax.jit(jax.shard_map(
        jax.grad(loss_kernel, argnums=(0, 1, 2)), mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=(spec, spec, spec),
        check_vma=False,
    ))(q, k, v)
    want = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for g, w in zip(grads, want):
        assert_close(g, w, BWD_TOL[jnp.float32.dtype])


@pytest.mark.parametrize("causal,window,hkv",
                         [(True, None, 2), (False, (160, 160), 2),
                          (True, None, 1)])
def test_ring_kernel_bwd_race_detected(causal, window, hkv):
    """The r5 in-kernel ring BACKWARD under the Mosaic interpreter's
    cross-device race detector at P=4: the (dK, dV) rotation + final
    owner-return hop must be race-free, and grads must match the oracle
    (GQA: dK/dV reduced over the folded q heads inside the kernel)."""
    mesh = _mesh(4)
    n_dev = 4
    H = 2
    q, k, v = make_qkv(jax.random.PRNGKey(5), 1, H, n_dev * 128, 64,
                       Hkv=hkv)
    scale = q.shape[-1] ** -0.5

    from jax.sharding import PartitionSpec as P

    from flashattn_tpu.ops.flash_fwd import LOG2E
    from flashattn_tpu.parallel import ring_kernel as rk

    # reference grads (global)
    kr = jnp.repeat(k, H // hkv, axis=1)
    vr = jnp.repeat(v, H // hkv, axis=1)

    def loss_ref(q, kk, vv):
        o = attention_reference(q, kk, vv, causal=causal, window=window)
        return jnp.sum(o * o)

    gq_ref, gk_ref, gv_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(
        q, kr, vr)
    if hkv != H:
        B, _, N, D = k.shape
        gk_ref = gk_ref.reshape(B, hkv, H // hkv, N, D).sum(axis=2)
        gv_ref = gv_ref.reshape(B, hkv, H // hkv, N, D).sum(axis=2)

    # forward residuals via the ring fwd, then the bwd kernel with the
    # race detector on
    ip = pltpu.InterpretParams(detect_races=True)

    def local_bwd(q, k, v):
        o, lse = rk._ring_kernel_fwd_call(
            (q * (scale * LOG2E)).astype(q.dtype), k, v, "seq", n_dev,
            causal, scale, 128, 128, interpret_params=ip, window=window)
        o = o.astype(q.dtype)
        do = 2.0 * o
        delta = jnp.sum(do * o, axis=-1)
        B, Hq, nq, D = q.shape
        lse2 = jnp.broadcast_to((lse * LOG2E)[..., None],
                                (B, Hq, nq, 128)).astype(jnp.float32)
        drep = jnp.broadcast_to(delta[..., None],
                                (B, Hq, nq, 128)).astype(jnp.float32)
        q2 = (q * (scale * LOG2E)).astype(q.dtype)
        dq, dk, dv = rk._ring_kernel_bwd_call(
            q2, k, v, do, lse2, drep, "seq", n_dev, causal, scale,
            128, 128, interpret_params=ip, window=window)
        return dq * scale, dk, dv

    qspec = P(None, None, "seq", None)
    dq, dk, dv = jax.jit(jax.shard_map(
        local_bwd, mesh=mesh, in_specs=(qspec, qspec, qspec),
        out_specs=(qspec, qspec, qspec), check_vma=False))(q, k, v)
    tol = BWD_TOL[jnp.float32.dtype]
    assert_close(dq, gq_ref, tol)
    assert_close(dk, gk_ref, tol)
    assert_close(dv, gv_ref, tol)


def test_ring_kernel_rejects_unaligned():
    with pytest.raises(ValueError, match="128-aligned"):
        ring_attention_kernel(
            jnp.zeros((1, 1, 100, 64)), jnp.zeros((1, 1, 100, 64)),
            jnp.zeros((1, 1, 100, 64)), axis_name="seq", axis_size=2)
