"""Golden model (tiled jnp FA-2) vs exact-softmax oracle.

Mirrors pure_torch_ver.py's self-test (:159-215) with pinned tolerances
instead of printed diffs, plus the adversarial shapes from precision_test.py.
"""

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu.ops.oracle import (
    attention_reference,
    attention_reference_with_lse,
)
from flashattn_tpu.ops.reference import (
    flash_attention_reference,
    flash_attention_reference_bwd,
)
from flashattn_tpu.utils.testing import FWD_TOL, BWD_TOL, assert_close, make_qkv


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        # (B, H, Nq, D, Nk) — aligned and deliberately nasty (reference
        # precision_test.py:34-38 uses B3 H7 N1537 D111 Nkv1234)
        (1, 2, 256, 64, 256),
        (2, 3, 200, 48, 130),
        (1, 1, 65, 111, 33),
    ],
)
def test_golden_matches_oracle(shape, causal):
    B, H, Nq, D, Nk = shape
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, Nq, D, Nk=Nk)
    want = attention_reference(q, k, v, causal=causal)
    got = flash_attention_reference(q, k, v, causal=causal, block_q=64, block_k=64)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_golden_lse_matches_oracle():
    q, k, v = make_qkv(jax.random.PRNGKey(1), 1, 2, 130, 64, Nk=190)
    _, lse_want = attention_reference_with_lse(q, k, v)
    o, lse = flash_attention_reference(q, k, v, block_q=64, block_k=64,
                                       return_lse=True)
    assert_close(lse, lse_want, FWD_TOL[jnp.float32.dtype], "lse")


def test_golden_with_bias():
    q, k, v = make_qkv(jax.random.PRNGKey(2), 2, 2, 96, 32, Nk=80)
    bias = jax.random.normal(jax.random.PRNGKey(3), (2, 2, 96, 80))
    want = attention_reference(q, k, v, bias=bias)
    got = flash_attention_reference(q, k, v, bias=bias, block_q=32, block_k=32)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


@pytest.mark.parametrize("causal", [False, True])
def test_golden_bwd_matches_autodiff_oracle(causal):
    q, k, v = make_qkv(jax.random.PRNGKey(4), 1, 2, 96, 32, Nk=96)

    def loss(q, k, v):
        return (attention_reference(q, k, v, causal=causal) ** 2).sum()

    dq_w, dk_w, dv_w = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    o, lse = attention_reference_with_lse(q, k, v, causal=causal)
    do = 2.0 * o
    dq, dk, dv = flash_attention_reference_bwd(
        q, k, v, o, lse, do, causal=causal
    )
    assert_close(dq, dq_w, BWD_TOL[jnp.float32.dtype], "dq")
    assert_close(dk, dk_w, BWD_TOL[jnp.float32.dtype], "dk")
    assert_close(dv, dv_w, BWD_TOL[jnp.float32.dtype], "dv")
