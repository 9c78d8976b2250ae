"""Pallas forward kernel vs exact-softmax oracle (interpret mode on CPU).

Covers the reference's precision-test matrix (SURVEY.md §4): adversarial
unaligned shapes (precision_test.py:34-38), Nkv ≠ N, D not a multiple of the
tile, causal, bias, GQA, dtype dispatch, and the LSE residual.
"""

import jax
import jax.numpy as jnp
import pytest

from flashattn_tpu import flash_attention, flash_attention_with_lse
from flashattn_tpu.ops.flash import BlockSizes
from flashattn_tpu.ops.oracle import (
    attention_reference,
    attention_reference_with_lse,
)
from flashattn_tpu.utils.testing import FWD_TOL, assert_close, make_qkv


@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize(
    "shape",
    [
        (1, 2, 256, 64, 256),   # aligned
        (2, 3, 150, 64, 170),   # unaligned N, Nkv > Nq
        (1, 2, 257, 72, 129),   # everything unaligned
    ],
)
def test_fwd_matches_oracle_f32(shape, causal):
    B, H, Nq, D, Nk = shape
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, Nq, D, Nk=Nk)
    want = attention_reference(q, k, v, causal=causal)
    got = flash_attention(q, k, v, causal=causal)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float16])
def test_fwd_dtypes(dtype):
    q, k, v = make_qkv(jax.random.PRNGKey(1), 1, 3, 192, 64, dtype=dtype)
    want = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got = flash_attention(q, k, v)
    assert got.dtype == dtype
    assert_close(got.astype(jnp.float32), want, FWD_TOL[jnp.dtype(dtype)])


def test_fwd_fp16_compute_dtype_f32():
    """The fp16 accuracy contract (VERDICT r4 weak #7): fp16 inputs default
    to bf16 compute (host.cpp:41-44 policy; no fp16 MXU on TPU), but
    ``compute_dtype=float32`` must recover f32-class accuracy — the opt-in
    that replaces the reference's native fp16 kernel's extra mantissa bits
    (kernel_fp16.cu keeps 10 bits; bf16 has 7)."""
    q, k, v = make_qkv(jax.random.PRNGKey(4), 1, 3, 192, 64,
                       dtype=jnp.float16)
    want = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got_bf16 = flash_attention(q, k, v)
    got_f32 = flash_attention(q, k, v, compute_dtype=jnp.float32)
    assert got_f32.dtype == jnp.float16
    err_bf16 = float(jnp.max(jnp.abs(got_bf16.astype(jnp.float32) - want)))
    err_f32 = float(jnp.max(jnp.abs(got_f32.astype(jnp.float32) - want)))
    # f32 compute must beat the default bf16 path and land within fp16
    # round-off of the oracle (fp16 payload: ~5e-4-class on O(1) outputs).
    assert err_f32 < err_bf16
    assert err_f32 < 2e-3, (err_f32, err_bf16)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, compute_dtype=jnp.float16)


@pytest.mark.slow
def test_fwd_adversarial_reference_shape():
    """The reference's nastiest shape: B3 H7 N1537 D111 Nkv1234 bf16
    (precision_test.py:34-38) — exercises all padding + tail-mask paths."""
    q, k, v = make_qkv(
        jax.random.PRNGKey(2), 3, 7, 1537, 111, Nk=1234, dtype=jnp.bfloat16
    )
    want = attention_reference(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32)
    )
    got = flash_attention(q, k, v)
    assert_close(got.astype(jnp.float32), want, FWD_TOL[jnp.bfloat16.dtype])


def test_fwd_bias_broadcast():
    q, k, v = make_qkv(jax.random.PRNGKey(3), 2, 4, 100, 32, Nk=90)
    for bshape in [(2, 4, 100, 90), (1, 4, 100, 90), (2, 1, 100, 90), (1, 1, 100, 90)]:
        bias = jax.random.normal(jax.random.PRNGKey(4), bshape) * 0.5
        want = attention_reference(q, k, v, bias=bias)
        got = flash_attention(q, k, v, bias=bias)
        assert_close(got, want, FWD_TOL[jnp.float32.dtype], f"bias{bshape}")


def test_fwd_gqa():
    q, k, v = make_qkv(jax.random.PRNGKey(5), 2, 8, 128, 64, Hkv=2)
    want = attention_reference(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_fwd_lse():
    q, k, v = make_qkv(jax.random.PRNGKey(6), 1, 2, 130, 64, Nk=200)
    _, lse_want = attention_reference_with_lse(q, k, v)
    o, lse = flash_attention_with_lse(q, k, v)
    assert lse.shape == (1, 2, 130)
    assert_close(lse, lse_want, FWD_TOL[jnp.float32.dtype], "lse")


def test_fwd_offsets_shift_causal_mask():
    """q_offset/kv_offset emulate a chunk of a longer sequence (the ring-
    attention contract): computing rows [64:128) against the full KV must
    match slicing the full causal result."""
    q, k, v = make_qkv(jax.random.PRNGKey(7), 1, 2, 128, 64)
    full = attention_reference(q, k, v, causal=True)
    got = flash_attention(q[:, :, 64:], k, v, causal=True, q_offset=64)
    assert_close(got, full[:, :, 64:], FWD_TOL[jnp.float32.dtype])


def test_fwd_custom_blocks_and_scale():
    q, k, v = make_qkv(jax.random.PRNGKey(8), 1, 2, 300, 64, Nk=300)
    want = attention_reference(q, k, v, scale=0.1)
    got = flash_attention(
        q, k, v, scale=0.1,
        block_sizes=BlockSizes(128, 128, 128, 128, 128, 128),
    )
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_fwd_nq1_decode_shape():
    """Single-query decode step (LLM inference path)."""
    q, k, v = make_qkv(jax.random.PRNGKey(9), 2, 4, 1, 64, Nk=333)
    want = attention_reference(q, k, v)
    got = flash_attention(q, k, v)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


def test_validation_errors():
    q, k, v = make_qkv(jax.random.PRNGKey(10), 1, 2, 64, 32)
    with pytest.raises(ValueError):
        flash_attention(q[0], k, v)  # rank 3
    with pytest.raises(ValueError):
        flash_attention(q, k[:, :, :, :16], v[:, :, :, :16])  # D mismatch
    with pytest.raises(ValueError):
        flash_attention(q, k, v, layout="NHBD")
    with pytest.raises(ValueError):
        flash_attention(
            q, k, v, bias=jnp.zeros((1, 2, 64, 32))  # Nk mismatch
        )

def test_fwd_resident_causal_matches_flat_and_oracle():
    """The VMEM-resident causal path (square causal, zero offsets, no
    bias/window/quant) must agree with both the oracle and the flat-grid
    kernel. A zero bias changes nothing numerically but fails the resident
    gate, forcing the flat grid — the two routes must coincide."""
    from flashattn_tpu.ops import flash_fwd as ff

    B, H, N, D = 1, 2, 512, 64
    q, k, v = make_qkv(jax.random.PRNGKey(11), B, H, N, D)
    assert ff._use_resident_causal(
        causal=True, window=None, need_tail_mask=False, bias=None,
        k_scale=None, v_scale=None, static_offsets=(0, 0),
        Nqp=N, Nkp=N, D=D,
        sub_q=ff._rc_geometry(N)[0], sub_k=ff._rc_geometry(N)[1])
    want = attention_reference(q, k, v, causal=True)
    resident = flash_attention(q, k, v, causal=True)
    flat = flash_attention(
        q, k, v, causal=True, bias=jnp.zeros((1, 1, N, N), q.dtype))
    assert_close(resident, want, FWD_TOL[jnp.float32.dtype], "resident")
    assert_close(resident, flat, FWD_TOL[jnp.float32.dtype], "resident-vs-flat")


def test_fwd_resident_causal_gqa_lse():
    """Resident path with GQA head mapping and the LSE residual (the bwd
    contract): both must match the oracle."""
    q, k, v = make_qkv(jax.random.PRNGKey(12), 1, 4, 256, 64, Hkv=2)
    _, lse_want = attention_reference_with_lse(q, k, v, causal=True)
    o, lse = flash_attention_with_lse(q, k, v, causal=True)
    want = attention_reference(q, k, v, causal=True)
    assert_close(o, want, FWD_TOL[jnp.float32.dtype])
    assert_close(lse, lse_want, FWD_TOL[jnp.float32.dtype], "lse")


def test_fwd_resident_gate_rejects_nonsquare_and_offsets():
    """Rectangular KV, tail masks, windows, offsets, or quant scales must
    fall back to the flat grid (gate soundness, not perf)."""
    from flashattn_tpu.ops import flash_fwd as ff

    base = dict(causal=True, window=None, need_tail_mask=False, bias=None,
                k_scale=None, v_scale=None, static_offsets=(0, 0),
                Nqp=512, Nkp=512, D=64, sub_q=512, sub_k=512)
    assert ff._use_resident_causal(**base)
    # A padded KV tail no longer defeats the gate: kv_valid_len is static,
    # so the boundary mask folds into the trace-time tile table. Same for
    # sliding windows (any static band).
    assert ff._use_resident_causal(**{**base, "need_tail_mask": True})
    assert ff._use_resident_causal(**{**base, "window": (128, 0)})
    assert ff._use_resident_causal(
        **{**base, "causal": False, "window": (128, 128)})
    for bad in (
        dict(Nkp=1024),                      # rectangular
        dict(static_offsets=(64, 0)),        # ring-chunk offsets
        dict(static_offsets=None),           # traced offsets
        dict(k_scale=object()),              # quantized KV
        dict(causal=False),                  # no masking at all
        dict(causal=False, window=(-1, -1)),  # unbounded "window"
    ):
        assert not ff._use_resident_causal(**{**base, **bad}), bad


def test_fwd_resident_causal_padded_tail():
    """Unaligned-N causal self-attention routes through the resident kernel
    with a static boundary-tile column mask; Nkv < Nq (both padding to the
    same Nkp) exercises valid Q rows attending across the KV boundary."""
    from flashattn_tpu.ops import flash_fwd as ff

    assert ff._use_resident_causal(
        causal=True, window=None, need_tail_mask=True, bias=None,
        k_scale=None, v_scale=None, static_offsets=(0, 0),
        Nqp=512, Nkp=512, D=64, sub_q=512, sub_k=512)
    # Self-attention, N not a block multiple (pads 500 -> 512).
    q, k, v = make_qkv(jax.random.PRNGKey(21), 1, 2, 500, 64)
    want = attention_reference(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype], "tail-self")
    # Cross-length causal: Nkv=300 < Nq=500, same padded length.
    q2, k2, v2 = make_qkv(jax.random.PRNGKey(22), 1, 2, 500, 64, Nk=300)
    want2 = attention_reference(q2, k2, v2, causal=True)
    got2 = flash_attention(q2, k2, v2, causal=True)
    assert_close(got2, want2, FWD_TOL[jnp.float32.dtype], "tail-cross")

@pytest.mark.slow
def test_fwd_resident_geometry_divisor_tiles():
    """N=2560 is not a multiple of the preferred 2048-wide kv tile;
    _rc_geometry falls back to the largest lane-aligned divisor (1280)
    instead of dropping to the flat grid. Routing + oracle numerics."""
    from flashattn_tpu.ops import flash_fwd as ff

    assert ff._rc_geometry(2560) == (256, 1280)
    assert ff._rc_geometry(3072) == (256, 1536)
    assert ff._rc_geometry(4096) == (256, 2048)
    assert ff._rc_geometry(6144) == (512, 2048)  # 24 chains regressed (r3)
    assert ff._use_resident_causal(
        causal=True, window=None, need_tail_mask=False, bias=None,
        k_scale=None, v_scale=None, static_offsets=(0, 0),
        Nqp=2560, Nkp=2560, D=64, sub_q=512, sub_k=1280)
    q, k, v = make_qkv(jax.random.PRNGKey(31), 1, 1, 2560, 64)
    want = attention_reference(q, k, v, causal=True)
    got = flash_attention(q, k, v, causal=True)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype], "resident-2560")


@pytest.mark.slow
def test_fwd_resident_chain_granular_padding():
    """Resident-eligible unaligned shapes pad to 512-row chains, not the
    flat-grid block: N=2561 used to pad (3072, 4096) with 1024/2048 blocks
    (unequal → flat grid); now both sides pad to 3072 and run resident."""
    from unittest import mock

    from flashattn_tpu.ops import flash_fwd as ff

    calls = []
    orig = ff._fwd_causal_resident_kernel

    def spy(*a, **k):
        calls.append((k["n"], k["sub_q"], k["sub_k"]))
        return orig(*a, **k)

    q, k, v = make_qkv(jax.random.PRNGKey(33), 1, 1, 2561, 64)
    with mock.patch.object(
            ff, "_fwd_causal_resident_kernel",
            mock.Mock(side_effect=spy, __name__="rc")):
        got = flash_attention(q, k, v, causal=True)
    assert calls, "resident not routed at N=2561"
    n_pad = calls[0][0]
    assert n_pad == 3072 and calls[0][1:] == ff._rc_geometry(n_pad), calls
    want = attention_reference(q, k, v, causal=True)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype], "chain-pad-2561")


def test_fwd_flat_tri_diagonal_blocks():
    """Flat-grid causal with square blocks exercises tri_block (statically
    narrowed diagonal dots). Bias defeats the resident gate, so this routes
    to the flat grid; 512-square blocks give kv_splits=1, q_splits=2, which
    satisfies the tri_edge gate. Must match the oracle bias path."""
    N = 1024
    q, k, v = make_qkv(jax.random.PRNGKey(13), 1, 2, N, 64)
    bias = jax.random.normal(jax.random.PRNGKey(14), (1, 1, N, N)) * 0.5
    want = attention_reference(q, k, v, causal=True, bias=bias)
    got = flash_attention(
        q, k, v, causal=True, bias=bias,
        block_sizes=BlockSizes(512, 512, 512, 512, 512, 512),
    )
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])


class TestCausalDecomposition:
    """Hierarchical causal forward (flash._fwd_causal_decomposed): for N past
    the resident-kernel ceiling, the band splits into diag halves + an
    unmasked rectangle merged through the LSE algebra. Tests shrink the
    ceiling so the route triggers at interpreter-friendly sizes."""

    def _force(self, monkeypatch, maxn):
        from flashattn_tpu.ops import flash_fwd

        monkeypatch.setattr(flash_fwd, "_RESIDENT_CAUSAL_MAX_N", maxn)

    def test_eligibility_gate(self, monkeypatch):
        from flashattn_tpu.ops import flash

        self._force(monkeypatch, 512)
        base = dict(causal=True, window=None, bias=None, seg=None,
                    static_offsets=(0, 0), nqp=1024, nkp=1024,
                    kv_valid_len=1024, D=64)
        assert flash._can_decompose_causal(**base)
        # recursion: halves themselves decomposable
        assert flash._can_decompose_causal(
            **{**base, "nqp": 2048, "nkp": 2048, "kv_valid_len": 2048})
        assert not flash._can_decompose_causal(**{**base, "causal": False})
        assert not flash._can_decompose_causal(
            **{**base, "window": (128, 0)})
        assert not flash._can_decompose_causal(
            **{**base, "static_offsets": None})
        assert not flash._can_decompose_causal(
            **{**base, "static_offsets": (0, 7)})
        # kv tail must leave the bottom K half intact
        assert not flash._can_decompose_causal(
            **{**base, "kv_valid_len": 512})
        # below the ceiling the resident kernel serves directly
        assert not flash._can_decompose_causal(
            **{**base, "nqp": 512, "nkp": 512, "kv_valid_len": 512})

    def test_matches_oracle_with_lse(self, monkeypatch):
        self._force(monkeypatch, 512)
        q, k, v = make_qkv(jax.random.PRNGKey(3), 1, 2, 1024, 64)
        want, lse_want = attention_reference_with_lse(q, k, v, causal=True)
        got, lse = flash_attention_with_lse(q, k, v, causal=True)
        assert_close(got, want, FWD_TOL[jnp.float32.dtype])
        assert_close(lse, lse_want, FWD_TOL[jnp.float32.dtype], "lse")

    @pytest.mark.slow
    def test_unaligned_tail_and_grads(self, monkeypatch):
        from flashattn_tpu.utils.testing import BWD_TOL, grad_gate

        self._force(monkeypatch, 512)
        # N=900 pads to 1024; the KV tail mask lands in the top diag half.
        q, k, v = make_qkv(jax.random.PRNGKey(4), 1, 2, 900, 64)
        want = attention_reference(q, k, v, causal=True)
        got = flash_attention(q, k, v, causal=True)
        assert_close(got, want, FWD_TOL[jnp.float32.dtype])

        def loss(fn):
            return lambda a, b, c: (
                fn(a, b, c, causal=True).astype(jnp.float32) ** 2).sum()

        grads = jax.grad(loss(flash_attention), (0, 1, 2))(q, k, v)
        grads_want = jax.grad(loss(attention_reference), (0, 1, 2))(q, k, v)
        ok, why, _, _ = grad_gate(grads, grads_want,
                                  BWD_TOL[jnp.float32.dtype])
        assert ok, why


class TestMacroResident:
    """Macro-resident causal forward (flash_fwd.fwd_causal_macro_padded):
    for N past the resident ceiling, one resident-kernel launch per macro
    row slab with a static row offset and a visible-KV-prefix block — every
    row computed exactly once (no LSE merge). Tests shrink the ceiling and
    the slab height so the route triggers at interpreter-friendly sizes."""

    def _force(self, monkeypatch, maxn, macro):
        from flashattn_tpu.ops import flash_fwd

        monkeypatch.setattr(flash_fwd, "_RESIDENT_CAUSAL_MAX_N", maxn)
        monkeypatch.setattr(flash_fwd, "_MACRO_ROWS_ENV", str(macro))

    def test_eligibility_gate(self, monkeypatch):
        from flashattn_tpu.ops import flash_fwd

        self._force(monkeypatch, 512, 512)
        base = dict(causal=True, window=None, need_tail_mask=False,
                    bias=None, k_scale=None, v_scale=None,
                    static_offsets=(0, 0), Nqp=2048, Nkp=2048)
        assert flash_fwd.use_macro_resident(**base)
        # noncausal without a window has no band: not macro-eligible
        assert not flash_fwd.use_macro_resident(**{**base, "causal": False})
        # windowed bands ARE macro-eligible since r4 (causal or not)
        assert flash_fwd.use_macro_resident(**{**base, "window": (128, 0)})
        assert flash_fwd.use_macro_resident(
            **{**base, "causal": False, "window": (128, 128)})
        assert not flash_fwd.use_macro_resident(
            **{**base, "causal": False, "window": (-1, -1)})
        assert not flash_fwd.use_macro_resident(
            **{**base, "static_offsets": (0, 7)})
        assert not flash_fwd.use_macro_resident(**{**base, "Nkp": 1024})
        # below the ceiling the whole-sequence resident kernel serves
        assert not flash_fwd.use_macro_resident(
            **{**base, "Nqp": 512, "Nkp": 512})
        # one slab would be the resident kernel past its ceiling
        monkeypatch.setattr(flash_fwd, "_MACRO_ROWS_ENV", "2048")
        assert not flash_fwd.use_macro_resident(**base)

    def test_matches_oracle_with_lse(self, monkeypatch):
        self._force(monkeypatch, 256, 256)
        q, k, v = make_qkv(jax.random.PRNGKey(5), 1, 2, 1024, 64)
        want, lse_want = attention_reference_with_lse(q, k, v, causal=True)
        got, lse = flash_attention_with_lse(q, k, v, causal=True)
        assert_close(got, want, FWD_TOL[jnp.float32.dtype])
        assert_close(lse, lse_want, FWD_TOL[jnp.float32.dtype], "lse")

    def test_unaligned_tail_gqa_and_grads(self, monkeypatch):
        from flashattn_tpu.utils.testing import BWD_TOL, grad_gate

        self._force(monkeypatch, 256, 256)
        # N=900 pads to 1024; the KV tail mask lands in the last slab, and
        # GQA exercises the kv head-ratio index map per slab.
        q, k, v = make_qkv(jax.random.PRNGKey(6), 1, 4, 900, 64)
        k, v = k[:, :2], v[:, :2]
        ke, ve = (jnp.repeat(x, 2, axis=1) for x in (k, v))
        want = attention_reference(q, ke, ve, causal=True)
        got = flash_attention(q, k, v, causal=True)
        assert_close(got, want, FWD_TOL[jnp.float32.dtype])

        def loss(fn):
            def f(a, b, c):
                return (fn(a, b, c, causal=True).astype(jnp.float32) ** 2
                        ).sum()
            return f

        grads = jax.grad(loss(flash_attention), (0, 1, 2))(q, k, v)
        gw = jax.grad(loss(attention_reference), (0, 1, 2))(q, ke, ve)
        grads_want = (gw[0],
                      gw[1].reshape(1, 2, 2, 900, 64).sum(axis=2),
                      gw[2].reshape(1, 2, 2, 900, 64).sum(axis=2))
        ok, why, _, _ = grad_gate(grads, grads_want,
                                  BWD_TOL[jnp.float32.dtype])
        assert ok, why


def test_gqa_decode_fold_matches_oracle():
    """Tiny-Nq non-causal GQA routes through the head-fold (rep q-heads
    become Q-tile rows so the cache is read once); numerics must match the
    per-head oracle exactly, including the grad path (pure reshapes)."""
    q, k, v = make_qkv(jax.random.PRNGKey(30), 2, 8, 2, 64, Nk=384, Hkv=2)
    want = attention_reference(q, k, v)
    got = flash_attention(q, k, v)
    assert_close(got, want, FWD_TOL[jnp.float32.dtype])
    g = jax.grad(lambda k: (flash_attention(q, k, v) ** 2).sum())(k)
    gw = jax.grad(lambda k: (attention_reference(q, k, v) ** 2).sum())(k)
    assert_close(g, gw, FWD_TOL[jnp.float32.dtype], "dk")
    # causal / window / bias / big-Nq keep the unfolded route (soundness)
    got_c = flash_attention(q, k, v, causal=True, q_offset=382)
    want_c = attention_reference(q, k, v, causal=True, q_offset=382)
    assert_close(got_c, want_c, FWD_TOL[jnp.float32.dtype], "causal")
    # head-broadcast bias (decode's cache-slot mask) IS fold-safe —
    # row-dependent variant exercises the head-major row tiling
    for bshape in ((1, 1, 1, 384), (2, 1, 2, 384)):
        bias = jnp.where(
            jax.random.uniform(jax.random.PRNGKey(31), bshape) > 0.3,
            0.0, -1e9).astype(jnp.float32)
        got_b = flash_attention(q, k, v, bias=bias)
        want_b = attention_reference(q, k, v, bias=bias)
        assert_close(got_b, want_b, FWD_TOL[jnp.float32.dtype],
                     f"bias{bshape}")
