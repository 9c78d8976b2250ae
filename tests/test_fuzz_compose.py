"""Randomized feature-composition fuzz vs the exact-softmax oracle.

Every flash_attention feature axis (causal, window, bias, GQA, segments,
softcap, dtype, unaligned shapes, cross-length) is sampled jointly from a
seeded RNG — combinations no hand-written test enumerates. Each case checks
the forward and, on a subset, all gradients. Failures print the full config
for exact reproduction.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.utils.testing import (
    BWD_TOL,
    FWD_TOL,
    assert_close,
    make_qkv,
)


def _sample_case(rng):
    B = int(rng.integers(1, 3))
    Hkv = int(rng.integers(1, 3))
    Hq = Hkv * int(rng.choice([1, 2, 3]))
    D = int(rng.choice([32, 64, 80]))
    Nq = int(rng.integers(17, 400))
    Nk = Nq if rng.random() < 0.6 else int(rng.integers(17, 400))
    causal = bool(rng.random() < 0.5) and Nq == Nk
    window = None
    if rng.random() < 0.3:
        wl = int(rng.integers(0, Nq)) if rng.random() < 0.8 else -1
        wr = (-1 if causal
              else (int(rng.integers(0, 64)) if rng.random() < 0.5 else -1))
        if wl >= 0 or wr >= 0:
            window = (wl, wr)
    seg = None
    if rng.random() < 0.4 and Nq == Nk:
        n_seg = int(rng.integers(1, 5))
        bounds = np.sort(rng.choice(Nq, size=n_seg - 1, replace=False)) \
            if n_seg > 1 else np.array([], np.int64)
        ids = np.zeros((B, Nq), np.int32)
        for b in bounds:
            ids[:, b:] += 1
        seg = jnp.asarray(ids)
    bias_shape = None
    if rng.random() < 0.3:
        bias_shape = (1 if rng.random() < 0.5 else B,
                      1 if rng.random() < 0.5 else Hq, Nq, Nk)
    softcap = float(rng.choice([15.0, 50.0])) if rng.random() < 0.3 else None
    dtype = jnp.float32 if rng.random() < 0.6 else jnp.bfloat16
    # ring-style absolute offsets (compile-time ints here): shift the
    # causal/window masks; sampled so some (q_off, kv_off) pairs put whole
    # row ranges above/below the band (dead rows / dead tiles).
    q_off = kv_off = 0
    if (causal or window is not None) and seg is None and rng.random() < 0.4:
        q_off = int(rng.integers(0, 3)) * 128
        kv_off = int(rng.integers(0, 3)) * 128
    layout = "BNHD" if rng.random() < 0.25 else "BHND"
    if rng.random() < 0.1:
        Nq = int(rng.integers(1, 17))  # decode-class tiny Q
        causal = False
        seg = None
        bias_shape = None  # was sampled at the old Nq
        q_off = kv_off = 0
    return dict(B=B, Hq=Hq, Hkv=Hkv, D=D, Nq=Nq, Nk=Nk, causal=causal,
                window=window, seg=seg, bias_shape=bias_shape,
                softcap=softcap, dtype=dtype, q_off=q_off, kv_off=kv_off,
                layout=layout)


@pytest.mark.parametrize("seed", range(24))
def test_fuzz_composition(seed):
    rng = np.random.default_rng(1000 + seed)
    c = _sample_case(rng)
    desc = {k: (v.shape if hasattr(v, "shape") else v)
            for k, v in c.items()}
    key = jax.random.PRNGKey(seed)
    q, _, _ = make_qkv(key, c["B"], c["Hq"], c["Nq"], c["D"],
                       dtype=c["dtype"])
    _, k, v = make_qkv(jax.random.fold_in(key, 1), c["B"], c["Hkv"],
                       c["Nk"], c["D"], Nk=c["Nk"], dtype=c["dtype"])
    bias = None
    if c["bias_shape"] is not None:
        bias = 0.5 * jax.random.normal(jax.random.fold_in(key, 2),
                                       c["bias_shape"], jnp.float32)
    kw = dict(causal=c["causal"], window=c["window"],
              logit_softcap=c["softcap"])
    f32 = (q.astype(jnp.float32), k.astype(jnp.float32),
           v.astype(jnp.float32))
    want = attention_reference(
        *f32, bias=bias,
        segment_ids=None if c["seg"] is None else (c["seg"], c["seg"]),
        q_offset=c["q_off"], kv_offset=c["kv_off"], **kw)

    def to_layout(x):
        return x.swapaxes(1, 2) if c["layout"] == "BNHD" else x

    got = flash_attention(
        to_layout(q), to_layout(k), to_layout(v), bias=bias,
        segment_ids=c["seg"], layout=c["layout"],
        q_offset=c["q_off"], kv_offset=c["kv_off"], **kw)
    got = to_layout(got)  # swapaxes is its own inverse
    assert_close(got.astype(jnp.float32), want,
                 FWD_TOL[jnp.dtype(c["dtype"])], str(desc))

    if seed % 3 == 0 and c["dtype"] == jnp.float32:
        def loss_f(q, k, v):
            return jnp.sum(flash_attention(
                q, k, v, bias=bias, segment_ids=c["seg"],
                q_offset=c["q_off"], kv_offset=c["kv_off"], **kw) ** 2)

        def loss_o(q, k, v):
            return jnp.sum(attention_reference(
                q, k, v, bias=bias,
                segment_ids=None if c["seg"] is None
                else (c["seg"], c["seg"]),
                q_offset=c["q_off"], kv_offset=c["kv_off"], **kw) ** 2)

        g = jax.grad(loss_f, (0, 1, 2))(q, k, v)
        w = jax.grad(loss_o, (0, 1, 2))(*f32)
        for name, a, b in zip(("dq", "dk", "dv"), g, w):
            assert_close(a, b, BWD_TOL[jnp.float32.dtype],
                         f"{name} {desc}")
