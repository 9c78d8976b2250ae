"""Public fused-attention API: dispatch, padding, layouts, autograd.

This is the TPU-native analogue of the reference's host stack:

  * tile-size policy — FlashAttn.py:56-67 (Br=64/Bc=128, D>384 → Br=32) →
    :class:`BlockSizes` + :func:`choose_block_sizes` (native planner in
    csrc/planner.cpp, Python fallback here);
  * padding/slicing — forward_fp16's pad prologue / slice epilogue
    (kernel_fp16.cu:761-796, 865-875) → :func:`_pad_qkv` / output slicing,
    done under jit so XLA fuses pads into the surrounding graph;
  * dtype dispatch — host.cpp:30-45 (fp16 | bf16 | cast→bf16) →
    :func:`_dispatch_dtype` (bf16 | f32 native; fp16 and others cast to bf16,
    matching host.cpp:41-44's cast-to-bf16 fallback);
  * autograd — FlashAttn.py:45-92's ``torch.autograd.Function`` →
    ``jax.custom_vjp`` saving (q, k, v, bias, O, L) residuals;
  * layouts — the reference's ``permute_NH`` stride swap
    (kernel_fp16.cu:327-335) → layout-aware transposition at trace time
    ("BHND" and "BNHD" both accepted; see also models/ which keep BNHD).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp

from flashattn_tpu.ops import flash_bwd, flash_fwd

NUM_LANES = 128
NUM_SUBLANES = flash_fwd.NUM_SUBLANES


@dataclasses.dataclass(frozen=True)
class BlockSizes:
    """Kernel tile sizes (the Br/Bc policy surface, FlashAttn.py:56-67)."""

    block_q: int = 256
    block_k: int = 256
    block_q_dkv: int = 128
    block_k_dkv: int = 256
    block_q_dq: int = 256
    block_k_dq: int = 128

    def __post_init__(self):
        for f in dataclasses.fields(self):
            val = getattr(self, f.name)
            if f.name.startswith("block_q"):
                # Q-tile size is a *sublane* dimension (of the Q tile and the
                # scores tile): 16-alignment suffices (bf16 min sublane tile),
                # which lets decode (Nq=1) run 16-row tiles instead of 128.
                if val % 16 != 0:
                    raise ValueError(f"{f.name}={val} must be a multiple of 16")
            elif val % NUM_LANES != 0:
                raise ValueError(f"{f.name}={val} must be a multiple of {NUM_LANES}")


def choose_block_sizes(nq: int, nk: int, d: int, dtype,
                       has_bias: bool = False,
                       causal: bool = False) -> BlockSizes:
    """Default tile policy (Python mirror of the native planner).

    Rationale: block_q/block_k ≥ 256 keeps the MXU pipeline deep; shrink for
    short sequences so tiny inputs do not pad to 2× their size; cap the
    scores-tile VMEM when D is large (the reference's D>384 → Br=32 rule,
    FlashAttn.py:66-67, translated to VMEM terms) or when a bias adds an
    f32 (block_q, block_k) tile to the working set. Causal runs use square
    (1024, 1024) tiles — the flat-grid diagonal block is then exactly
    half-masked with no fully-dead sub-tile.
    """
    try:
        from flashattn_tpu.utils import native

        plan = native.plan(nq, nk, d, jnp.dtype(dtype).itemsize, has_bias,
                           causal)
        if plan is not None:
            return BlockSizes(*plan)
    except Exception:
        pass
    return _python_block_policy(nq, nk, d, jnp.dtype(dtype).itemsize, has_bias,
                                causal)


def _python_block_policy(nq: int, nk: int, d: int, itemsize: int,
                         has_bias: bool = False,
                         causal: bool = False) -> BlockSizes:
    """Tuned on TPU v5e (benchmarks/sweep_blocks*.py, 2026-08): fwd
    (1024,1024) ≈ 94% of the measured matmul roofline at D=128; bwd best at
    dkv(1024,512) + dq(512,1024). Large D (>256) shrinks tiles to respect the
    ~16 MB scoped-VMEM limit ((2048,2048) OOMs at 20.6 MB). Decode shapes
    (nq ≤ 32, e.g. Nq=1 against a KV cache) take a 16-row Q tile: the scores
    tile is a sublane dimension, so tiny Q tiles are legal and skip ~8× of
    wasted MXU/VPU work vs padding Nq to 128."""

    def fit(n, pref):
        return max(NUM_LANES, min(pref, _round_up(n, NUM_LANES)))

    # A bias adds an f32 (block_q, block_k) tile per pipeline stage; a
    # (1024, 1024) pair overflows the ~16 MB scoped-VMEM budget, so cap the
    # Q-tile rows at 512 (measured ≤5% fwd cost, flash.py block sweep).
    small = d > 256 or has_bias
    # Thin-matmul shapes (D ≤ 64, noncausal, no bias): both matmuls run at
    # the ~129 TFLOP/s thin ceiling, so the per-grid-step pipeline floor is
    # a bigger fraction of each block — wider tiles amortize it
    # (86.6 → 92.2 TFLOP/s at N=4096 D=64, spot_tune d64 matrix, r3).
    thin = d <= 64 and not causal and not has_bias and nq > 32
    bq_pref = 2048 if thin else (512 if small else 1024)
    while (bq_pref >= 2048
           and _round_up(nq, bq_pref // 2) < _round_up(nq, bq_pref)):
        bq_pref //= 2
    block_q = fit(nq, bq_pref)
    if nq <= 32:
        block_q = max(16, _round_up(nq, 16))
    # 2048-wide blocks run as 2×1024 sub-tiles inside the kernels (MXU/VPU
    # overlap, see flash_fwd kv_splits / flash_bwd q_splits): fwd +16%,
    # fwd+bwd +10% measured on v5e at D=128. Causal prefers square 1024
    # tiles: the flat-grid diagonal block is then exactly half-masked with
    # no fully-dead sub-tile. Off-multiple Nk (e.g. 3072, 5120) drops to
    # 1024-wide blocks when that shrinks the padded tail (a 33% pad at
    # N=3072 measured 62 vs 85 TFLOP/s).
    bk_pref = 512 if d > 256 else (1024 if causal else (
        4096 if thin else 2048))
    while (bk_pref >= 2048
           and _round_up(nk, bk_pref // 2) < _round_up(nk, bk_pref)):
        bk_pref //= 2
    return BlockSizes(
        block_q=block_q,
        block_k=fit(nk, bk_pref),
        block_q_dkv=fit(nq, _pad_aware(nq, 256 if d > 256
                                       else (512 if has_bias else 2048))),
        block_k_dkv=fit(nk, 256 if d > 256 else (512 if has_bias else 1024)),
        block_q_dq=fit(nq, 256 if d > 256 else (512 if has_bias else 1024)),
        block_k_dq=fit(nk, _pad_aware(nk, 256 if d > 256
                                      else (512 if has_bias else 2048))),
    )


def _pad_aware(n: int, pref: int) -> int:
    """Drop a 2048 preference to 1024 when that halves the padded tail."""
    if pref == 2048 and _round_up(n, 1024) < _round_up(n, 2048):
        return 1024
    return pref


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_head_dim(d: int) -> int:
    """Lane padding for the head dimension: 64-multiples, not 128.

    Mosaic handles 64- and 192-lane operands natively; measured on v5e this
    is +11% at D=64 and +7% at D=160 over rounding to 128 (less wasted MXU
    contraction and fewer pad copies)."""
    return _round_up(d, 64)


def explain_plan(q_shape, k_shape, dtype=jnp.bfloat16, causal=False) -> dict:
    """Human-readable launch plan for an attention call — the diagnostic role
    of the reference's failure printfs (shapes/grid/LDS on error,
    kernel_fp16.cu:854-863), exposed proactively: block sizes, padded shapes,
    grid, VMEM estimate and FLOPs, plus which planner produced it.
    """
    B, Hq, Nq, D = q_shape
    Nk = k_shape[2]
    itemsize = jnp.dtype(_dispatch_dtype(dtype)).itemsize
    info = {"B": B, "H": Hq, "Nq": Nq, "Nk": Nk, "D": D, "causal": causal}
    try:
        from flashattn_tpu.utils import native

        full = native.full_plan(Nq, Nk, D, itemsize, causal)
    except Exception:
        full = None
    if full is not None:
        info.update(full)
        info["planner"] = "native"
    else:
        bs = _python_block_policy(Nq, Nk, D, itemsize)
        info.update(dataclasses.asdict(bs))
        info["nq_padded"] = _round_up(Nq, bs.block_q)
        info["nk_padded"] = _round_up(Nk, bs.block_k)
        info["d_padded"] = _pad_head_dim(D)
        info["planner"] = "python"
    # Forward-route prediction (default call: no bias/quant, offsets 0).
    from flashattn_tpu.ops import flash_fwd as _ff

    if _can_decompose_unaligned(
            causal=causal, window=None, bias=None, seg=None, Nq=Nq, Nk=Nk,
            bq=info.get("block_q", 128), bk=info.get("block_k", 128),
            kv_valid_len=Nk, D=D):
        info["fwd_route"] = "unaligned-decomposed"
        info["main_region"] = [Nq // _UNALIGNED_UNIT * _UNALIGNED_UNIT,
                               Nk // _UNALIGNED_UNIT * _UNALIGNED_UNIT]
        return info
    nqp = info.get("nq_padded", _round_up(Nq, info.get("block_q", 128)))
    nkp = info.get("nk_padded", _round_up(Nk, info.get("block_k", 128)))
    # Mirror _flash_core_fwd_impl's chain-granular padding refinement.
    nr = _round_up(max(Nq, Nk), _ff._RC_CHAIN_PAD)
    if (nr < max(nqp, nkp)
            and nr == _round_up(max(min(Nq, Nk), 1), _ff._RC_CHAIN_PAD)):
        sq, sk = _ff._rc_geometry(nr)
        if _ff._use_resident_causal(
                causal=causal, window=None, need_tail_mask=Nk != nr,
                bias=None, k_scale=None, v_scale=None, static_offsets=(0, 0),
                Nqp=nr, Nkp=nr, D=D, sub_q=sq, sub_k=sk):
            nqp = nkp = nr
            info["nq_padded"] = info["nk_padded"] = nr
    sub_q, sub_k = _ff._rc_geometry(nqp)
    if _ff._use_resident_causal(
            causal=causal, window=None, need_tail_mask=Nk != nkp,
            bias=None, k_scale=None, v_scale=None, static_offsets=(0, 0),
            Nqp=nqp, Nkp=nkp, D=D, sub_q=sub_q, sub_k=sub_k):
        info["fwd_route"] = "resident"
        info["resident_chains"] = nqp // sub_q
    elif causal:
        info["fwd_route"] = "flat-grid"
    else:
        info["fwd_route"] = "dense-grid"
    return info


def _dispatch_dtype(dtype, compute_dtype=None) -> jnp.dtype:
    """Kernel compute dtype per input dtype (host.cpp:30-45 policy).

    TPU has no fp16 MXU path, so fp16 inputs default to bf16 compute —
    mirroring host.cpp:41-44's cast-to-bf16 *fallback*, but note the
    reference's PRIMARY dtype is fp16 with a native kernel
    (kernel_fp16.cu): bf16 keeps 3 fewer mantissa bits than the fp16
    payload. ``compute_dtype=jnp.float32`` opts fp16 (or bf16) inputs into
    full-f32 kernels — measured fwd maxdiff 8.9e-4 (bf16 compute) vs
    2.1e-4 (f32 compute) vs the f32 oracle on fp16 inputs at B1 H8 N1024
    D64 (benchmarks/results/fp16_accuracy.jsonl) at ~55% of the bf16
    rate. The accuracy contract is documented in README ("dtype policy").
    """
    if compute_dtype is not None:
        cd = jnp.dtype(compute_dtype)
        if cd not in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)):
            raise ValueError(
                f"compute_dtype must be bfloat16 or float32, got {cd}")
        return cd
    dtype = jnp.dtype(dtype)
    if dtype in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float32)):
        return dtype
    # fp16 and anything else: MXU is bf16/f32-native; cast like host.cpp:41-44.
    return jnp.dtype(jnp.bfloat16)


def _pad_axis(x, axis, target):
    pad = target - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _to_bhnd(x, layout):
    if x is None:
        return None
    if layout == "BHND":
        return x
    if layout == "BNHD":
        return jnp.swapaxes(x, 1, 2)
    raise ValueError(f"unknown layout {layout!r} (expected 'BHND' or 'BNHD')")


def _from_bhnd(x, layout):
    return x if layout == "BHND" else jnp.swapaxes(x, 1, 2)


# ─────────────────────────── custom_vjp core ────────────────────────────────
# Differentiable in (q, k, v, bias); config is static. Operates in canonical
# [B,H,N,D] on the *original* (unpadded) shapes; padding happens inside so the
# cotangents come back at original shapes automatically. seg_q/seg_kv are
# integer packed-sequence ids ([B,Nq]/[B,Nk] or None) — regular (non-diff-
# type) args whose cotangent is float0, like ``offsets``.


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14)
)
def _flash_core(q, k, v, bias, offsets, seg_q, seg_kv, scale, causal, blocks,
                kv_valid_len, interpret, window, static_offsets, softcap):
    o, _ = _flash_core_fwd_impl(
        q, k, v, bias, offsets, scale, causal, blocks, kv_valid_len, interpret,
        return_lse=False, window=window, static_offsets=static_offsets,
        seg_q=seg_q, seg_kv=seg_kv, softcap=softcap,
    )
    return o


def _seg_tiles(seg_q, seg_kv, nqp, nkp, block_q, block_k):
    """Pad packed-sequence ids to the launch geometry and build the three
    kernel inputs: q ids lane-replicated ``[B, nqp, NUM_LANES]``, kv ids
    sublane-replicated ``[B, NUM_SUBLANES, nkp]`` (the Mosaic-friendly int32
    tilings), and the per-block run/full flags (see
    :func:`_seg_block_flags`). Padding uses distinct sentinels (-1 / -2) so
    padded rows/cols never match anything (ids are documented >= 0)."""
    B, Nq = seg_q.shape
    Nk = seg_kv.shape[1]
    sq = jnp.pad(seg_q.astype(jnp.int32), ((0, 0), (0, nqp - Nq)),
                 constant_values=-1)
    skv = jnp.pad(seg_kv.astype(jnp.int32), ((0, 0), (0, nkp - Nk)),
                  constant_values=-2)
    sq_rep = jax.lax.broadcast_in_dim(sq, (B, nqp, NUM_LANES), (0, 1))
    skv_rep = jax.lax.broadcast_in_dim(skv, (B, NUM_SUBLANES, nkp), (0, 2))
    return sq_rep, skv_rep, _seg_block_flags(sq, skv, block_q, block_k)


def _seg_block_flags(seg_q_pad, seg_kv_pad, block_q, block_k):
    """Per-(q_tile, kv_tile) segment classification, [B, 2, Tq, Tk] int32.

    ``[b, 0]`` = run: the id *ranges* of the two tiles intersect — a shared
    value must lie in both ranges, so disjoint ranges prove no pair matches
    (conservative for arbitrary ids, exact for sorted/packed ids).
    ``[b, 1]`` = full: both tiles constant and equal — every pair matches.
    The kernels fold these into their block dispatch: cross-document blocks
    are skipped outright and intra-document blocks keep the fast unmasked
    path, so packed attention costs the sum of per-document areas. Padding
    sentinels (-1 q / -2 kv) make padding blocks classify as dead for free.
    """
    B, nqp = seg_q_pad.shape
    nkp = seg_kv_pad.shape[1]
    qt = seg_q_pad.reshape(B, nqp // block_q, block_q)
    kt = seg_kv_pad.reshape(B, nkp // block_k, block_k)
    qmin, qmax = qt.min(axis=2), qt.max(axis=2)       # [B, Tq]
    kmin, kmax = kt.min(axis=2), kt.max(axis=2)       # [B, Tk]
    run = jnp.logical_and(
        qmin[:, :, None] <= kmax[:, None, :],
        kmin[:, None, :] <= qmax[:, :, None])
    full = jnp.logical_and(
        jnp.logical_and((qmin == qmax)[:, :, None],
                        (kmin == kmax)[:, None, :]),
        qmin[:, :, None] == kmin[:, None, :])
    return jnp.stack([run, full], axis=1).astype(jnp.int32)


def _half_blocks(h):
    """Largest power-of-two flat blocks dividing a half-sequence (the
    decomposed rectangle call's noncausal dense grid)."""
    bq = 1024 if h % 1024 == 0 else 512
    bk = 2048 if h % 2048 == 0 else bq
    return min(bq, h), min(bk, h)


def _can_decompose_causal(*, causal, window, bias, seg, static_offsets,
                          nqp, nkp, kv_valid_len, D):
    """Two-level causal decomposition eligibility (see
    :func:`_fwd_causal_decomposed`)."""
    if not (causal and window is None and bias is None and seg is None
            and static_offsets is not None
            and static_offsets[0] == static_offsets[1]
            and nqp == nkp
            and nqp > flash_fwd._RESIDENT_CAUSAL_MAX_N
            and nqp % 1024 == 0
            and kv_valid_len > nqp // 2):
        return False
    h = nqp // 2
    sq, sk = flash_fwd._rc_geometry(h)
    if flash_fwd._use_resident_causal(
            causal=True, window=None, need_tail_mask=False, bias=None,
            k_scale=None, v_scale=None, static_offsets=(0, 0),
            Nqp=h, Nkp=h, D=D, sub_q=sq, sub_k=sk):
        return True
    # Recurse: 16384 → 8192 halves → 4096 residents.
    return _can_decompose_causal(
        causal=True, window=None, bias=None, seg=None,
        static_offsets=(0, 0), nqp=h, nkp=h, kv_valid_len=h, D=D)


def _fwd_causal_decomposed(qp, kp, vp, *, scale, kv_valid_len, interpret,
                           return_lse, softcap):
    """Hierarchical causal forward for N past the resident-kernel ceiling.

    The causal band over padded ``[B, H, N, D]`` splits at N/2 into three
    static sub-problems, each served by its fastest kernel:

      * rows 0..h    × cols 0..h    — causal: resident kernel (or recurse);
      * rows h..N    × cols 0..h    — full rectangle: dense unmasked grid
        (the fastest path in the suite — no masking at all);
      * rows h..N    × cols h..N    — causal: resident kernel (or recurse).

    The two bottom partials merge with the online-softmax algebra on their
    LSEs (the exact rule the ring layer uses, SURVEY.md §5): with
    ``lse = logaddexp(lse_a, lse_b)``, ``O = e^{lse_a−lse}·O_a +
    e^{lse_b−lse}·O_b``. The merge is one elementwise pass over half the
    rows (~2% of the band FLOPs at N=8192) and is exact — no approximation.

    Rationale: the resident kernel cannot compile past N=6144 (Mosaic's
    scoped-VMEM stack for the unrolled band grows O(N²) — see
    flash_fwd._RESIDENT_CAUSAL_MAX_N), and the flat grid pays per-step
    pipeline bubbles that cap causal N=8192 at ~132 TFLOP/s. The
    decomposition runs every FLOP on resident/dense rates instead.
    Role-parity: the reference sweeps causal to N=7168 through one kernel
    (bench_with_sdpa.py:201-224); here long context is a first-class
    routing tier.
    """
    B, Hq, n, Dp = qp.shape
    Hkv = kp.shape[1]
    h = n // 2
    offs = jnp.zeros((2,), jnp.int32)

    def causal_half(qh, kh, vh, kvl, need_lse):
        sq, sk = flash_fwd._rc_geometry(h)
        if flash_fwd._use_resident_causal(
                causal=True, window=None, need_tail_mask=kvl != h, bias=None,
                k_scale=None, v_scale=None, static_offsets=(0, 0),
                Nqp=h, Nkp=h, D=Dp, sub_q=sq, sub_k=sk):
            bq = bk = flash_fwd._RC_CHAIN_PAD
        else:
            bq, bk = _half_blocks(h)
        if h > flash_fwd._RESIDENT_CAUSAL_MAX_N and _can_decompose_causal(
                causal=True, window=None, bias=None, seg=None,
                static_offsets=(0, 0), nqp=h, nkp=h, kv_valid_len=kvl, D=Dp):
            return _fwd_causal_decomposed(
                qh, kh, vh, scale=scale, kv_valid_len=kvl,
                interpret=interpret, return_lse=need_lse, softcap=softcap)
        return flash_fwd.fwd_padded(
            qh, kh, vh, None, offs, scale=scale, causal=True,
            block_q=bq, block_k=bk, kv_valid_len=kvl, return_lse=need_lse,
            num_heads_q=Hq, interpret=interpret, static_offsets=(0, 0),
            softcap=softcap)

    q1, q2 = qp[:, :, :h], qp[:, :, h:]
    k1, k2 = kp[:, :, :h], kp[:, :, h:]
    v1, v2 = vp[:, :, :h], vp[:, :, h:]

    o1, lse1 = causal_half(q1, k1, v1, h, return_lse)
    bq_r, bk_r = _half_blocks(h)
    oa, lse_a = flash_fwd.fwd_padded(
        q2, k1, v1, None, offs, scale=scale, causal=False,
        block_q=bq_r, block_k=bk_r, kv_valid_len=h, return_lse=True,
        num_heads_q=Hq, interpret=interpret, static_offsets=(0, 0),
        softcap=softcap)
    ob, lse_b = causal_half(q2, k2, v2, max(kv_valid_len - h, 1), True)

    lse2 = jnp.logaddexp(lse_a, lse_b)
    wa = jnp.exp(lse_a - lse2)[..., None]
    wb = jnp.exp(lse_b - lse2)[..., None]
    o2 = (oa.astype(jnp.float32) * wa
          + ob.astype(jnp.float32) * wb).astype(qp.dtype)

    o = jnp.concatenate([o1, o2], axis=2)
    lse = jnp.concatenate([lse1, lse2], axis=2) if return_lse else None
    return o, lse


_UNALIGNED_UNIT = 1024  # main-portion granularity of the unaligned split


def _can_decompose_unaligned(*, causal, window, bias, seg, Nq, Nk, bq, bk,
                             kv_valid_len, D=64):
    """Unaligned-N decomposition eligibility (see
    :func:`_fwd_unaligned_decomposed`). Noncausal unmasked attention only:
    rows are independent and column partials merge exactly on LSEs, so the
    split has no approximation; causal/window shapes take the resident
    chain-granular padding instead."""
    if (causal or window is not None or bias is not None or seg is not None
            or kv_valid_len != Nk):
        return False
    qm = Nq // _UNALIGNED_UNIT * _UNALIGNED_UNIT
    km = Nk // _UNALIGNED_UNIT * _UNALIGNED_UNIT
    if qm < _UNALIGNED_UNIT or km < _UNALIGNED_UNIT:
        return False
    if Nq == qm and Nk == km:
        return False
    # The tail calls cost ~3 µs of pipeline floor per grid step (~0.15 ms
    # at H=24 even with step-minimized tail blocks — r5 spot_call_overhead):
    # below ~0.2 ms of main-call MXU work the floors eat the win and the
    # flat padded launch is faster despite its dead area.
    if Nq * Nk * D < 2 * 10**8:
        return False
    # Only when the flat launch would execute ≥15% dead area (r5 measured:
    # N=4097 D=64 padded to 5120² — 1.56× area, 44 vs 94 TFLOP/s equal-work).
    return _round_up(Nq, bq) * _round_up(Nk, bk) > 1.15 * Nq * Nk


def _fwd_unaligned_decomposed(q, k, v, *, scale, offsets, interpret,
                              return_lse, softcap):
    """Noncausal forward for unaligned N/Nk: split off the block-aligned
    main region instead of padding the whole launch.

    The flat grid pads Nq/Nk up to the block size, so N=4097 executes a
    5120² score area — 1.56× the useful work, all at edge-masked rates (the
    r4 unaligned sweep: 44.4 TFLOP/s vs 94.0 aligned, VERDICT r4 weak #1).
    Here the problem splits at the largest 1024-multiples qm/km into:

      * rows 0..qm × cols 0..km — fully aligned, no masking: the dense
        fast-path grid at wide-tile rates;
      * rows 0..qm × cols km..Nk — the KV tail (< 1024 cols, padded to a
        128-multiple): merged into the main rows with the online-softmax
        LSE algebra (exact, the ring/decomposition merge rule);
      * rows qm..Nq × cols 0..Nk — the row tail (< 1024 rows): rows are
        independent, so the outputs simply concatenate.

    Executed area is ≤ (1 + ~128/N)² of useful instead of up to 1.56×, and
    the main region runs unmasked. Role-parity: unaligned shapes are the
    reference's signature adversarial axis (precision_test.py:34-38, its
    unaligned sweep graphs README.md:72-102) — they must be fast, not just
    correct.
    """
    B, Hq, Nq, D = q.shape
    Nk = k.shape[2]
    qm = Nq // _UNALIGNED_UNIT * _UNALIGNED_UNIT
    km = Nk // _UNALIGNED_UNIT * _UNALIGNED_UNIT
    qt, kt = Nq - qm, Nk - km

    def tail_block(n, cap):
        """Largest 128-multiple block ≤ cap that divides round_up(n, 128):
        each grid step pays a ~3 µs pipeline floor (spot_call_overhead, r5:
        a 4096×128 tail at policy blocks was 48 steps = 0.148 ms for ~0.01
        ms of compute), so tail launches minimize steps, not tile shape."""
        n128 = _round_up(n, 128)
        p = -(-n128 // cap)
        while n128 % (p * 128):
            p += 1
        return n128 // p

    def run(qs, ks, vs, need_lse, tail=False):
        nq_s, nk_s = qs.shape[2], ks.shape[2]
        if tail and nq_s * nk_s <= 4 * 1024 * 1024:
            # Small tails in plain XLA: a kernel launch lane-pads the tail
            # to 128 columns and runs mask+exp over the whole padded tile
            # (r5 trace: 175 µs for a 1-live-column KV tail + ~60 µs of
            # pad/slice glue); an einsum-softmax over the UNPADDED tail
            # fuses into the merge and costs its true O(rows·cols) work.
            # f32 throughout — the tail is exact, only the main call
            # rounds.
            rep = Hq // ks.shape[1]
            ke = jnp.repeat(ks, rep, axis=1) if rep > 1 else ks
            ve = jnp.repeat(vs, rep, axis=1) if rep > 1 else vs
            s = jnp.einsum("bhnd,bhmd->bhnm", qs.astype(jnp.float32),
                           ke.astype(jnp.float32)) * scale
            if softcap is not None:
                s = softcap * jnp.tanh(s / softcap)
            lse_t = jax.scipy.special.logsumexp(s, axis=-1)
            o_t = jnp.einsum("bhnm,bhmd->bhnd",
                             jnp.exp(s - lse_t[..., None]),
                             ve.astype(jnp.float32))
            return o_t.astype(qs.dtype), lse_t
        if tail:
            # Step-minimized tail blocks under an 8 MB f32 score-tile cap.
            bq_t = tail_block(nq_s, 4096)
            bk_t = tail_block(nk_s, max(512, 2 * 1024 * 1024 // bq_t))
            blocks = BlockSizes(block_q=bq_t, block_k=bk_t)
        else:
            blocks = choose_block_sizes(nq_s, nk_s, D, qs.dtype,
                                        False, False)
        return _flash_core_fwd_impl(
            qs, ks, vs, None, offsets, scale, False, blocks, nk_s,
            interpret, return_lse=need_lse, static_offsets=(0, 0),
            softcap=softcap)

    o_mm, lse_mm = run(q[:, :, :qm], k[:, :, :km], v[:, :, :km],
                       return_lse or kt > 0)
    if kt:
        o_mt, lse_mt = run(q[:, :, :qm], k[:, :, km:], v[:, :, km:], True,
                           tail=True)
        lse_m = jnp.logaddexp(lse_mm, lse_mt)
        o_m = (o_mm.astype(jnp.float32) * jnp.exp(lse_mm - lse_m)[..., None]
               + o_mt.astype(jnp.float32)
               * jnp.exp(lse_mt - lse_m)[..., None]).astype(q.dtype)
    else:
        o_m, lse_m = o_mm, lse_mm
    if qt:
        o_t, lse_t = run(q[:, :, qm:], k, v, return_lse, tail=True)
        o = jnp.concatenate([o_m, o_t], axis=2)
        lse = (jnp.concatenate([lse_m, lse_t], axis=2) if return_lse
               else None)
    else:
        o, lse = o_m, (lse_m if return_lse else None)
    return o, lse


def _flash_core_fwd_impl(q, k, v, bias, offsets, scale, causal, blocks,
                         kv_valid_len, interpret, *, return_lse, window=None,
                         static_offsets=None, seg_q=None, seg_kv=None,
                         softcap=None):
    B, Hq, Nq, D = q.shape
    Hkv, Nk = k.shape[1], k.shape[2]
    bq, bk = blocks.block_q, blocks.block_k
    if _can_decompose_unaligned(
            causal=causal, window=window, bias=bias, seg=seg_q,
            Nq=Nq, Nk=Nk, bq=bq, bk=bk, kv_valid_len=kv_valid_len, D=D):
        return _fwd_unaligned_decomposed(
            q, k, v, scale=scale, offsets=offsets, interpret=interpret,
            return_lse=return_lse, softcap=softcap)
    nqp, nkp = _round_up(Nq, bq), _round_up(Nk, bk)
    # Resident-eligible near-square shapes pad at chain granularity (512
    # rows), not the flat-grid block: with 1024/2048 blocks an unaligned
    # N=3073 otherwise pads to 4096 — 33% dead rows on the hot causal path.
    # Blocks drop to 512 alongside so the flat grid stays valid either way.
    nr = _round_up(max(Nq, Nk), flash_fwd._RC_CHAIN_PAD)
    if nr < max(nqp, nkp) and nr == _round_up(
            max(min(Nq, Nk), 1), flash_fwd._RC_CHAIN_PAD):
        sq, sk = flash_fwd._rc_geometry(nr)
        if flash_fwd._use_resident_causal(
                causal=causal, window=window, need_tail_mask=Nk != nr,
                bias=bias, k_scale=None, v_scale=None,
                static_offsets=static_offsets,
                Nqp=nr, Nkp=nr, D=D, sub_q=sq, sub_k=sk, seg=seg_q):
            nqp = nkp = nr
            bq = bk = flash_fwd._RC_CHAIN_PAD
    dp = _pad_head_dim(D)

    qp = _pad_axis(_pad_axis(q, 2, nqp), 3, dp)
    kp = _pad_axis(_pad_axis(k, 2, nkp), 3, dp)
    vp = _pad_axis(_pad_axis(v, 2, nkp), 3, dp)
    bp = None
    if bias is not None:
        bp = _pad_axis(_pad_axis(bias, 2, nqp if bias.shape[2] > 1 else 1), 3, nkp)
        if bp.shape[2] == 1:
            bp = jnp.broadcast_to(bp, (bp.shape[0], bp.shape[1], nqp, nkp))
    if flash_fwd.use_macro_resident(
            causal=causal, window=window, need_tail_mask=Nk != nkp,
            bias=bias, k_scale=None, v_scale=None,
            static_offsets=static_offsets, Nqp=nqp, Nkp=nkp, seg=seg_q):
        o, lse = flash_fwd.fwd_macro_padded(
            qp, kp, vp, scale=scale, kv_valid_len=kv_valid_len,
            return_lse=return_lse, num_heads_q=Hq, interpret=interpret,
            softcap=softcap, causal=causal, window=window)
        o = o[:, :, :Nq, :D]
        return o, (lse[:, :, :Nq] if lse is not None else None)
    if _can_decompose_causal(
            causal=causal, window=window, bias=bias, seg=seg_q,
            static_offsets=static_offsets, nqp=nqp, nkp=nkp,
            kv_valid_len=kv_valid_len, D=dp):
        o, lse = _fwd_causal_decomposed(
            qp, kp, vp, scale=scale, kv_valid_len=kv_valid_len,
            interpret=interpret, return_lse=return_lse, softcap=softcap)
        o = o[:, :, :Nq, :D]
        return o, (lse[:, :, :Nq] if lse is not None else None)

    sq_rep = skv_rep = seg_flags = None
    if seg_q is not None:
        sq_rep, skv_rep, seg_flags = _seg_tiles(seg_q, seg_kv, nqp, nkp,
                                                bq, bk)

    o, lse = flash_fwd.fwd_padded(
        qp, kp, vp, bp, offsets, None, None, sq_rep, skv_rep, seg_flags,
        scale=scale, causal=causal, block_q=bq, block_k=bk,
        kv_valid_len=kv_valid_len, return_lse=return_lse,
        num_heads_q=Hq, interpret=interpret, window=window,
        static_offsets=static_offsets, softcap=softcap,
    )
    o = o[:, :, :Nq, :D]
    lse_out = lse[:, :, :Nq] if lse is not None else None
    return o, lse_out


def _int_zero_cotangent(x):
    """Cotangent for integer leaves (offsets): JAX's symbolic float0 zero."""
    import numpy as np

    return np.zeros(x.shape, dtype=jax.dtypes.float0)


def _flash_core_fwd(q, k, v, bias, offsets, seg_q, seg_kv, scale, causal,
                    blocks, kv_valid_len, interpret, window, static_offsets,
                    softcap):
    o, lse = _flash_core_fwd_impl(
        q, k, v, bias, offsets, scale, causal, blocks, kv_valid_len, interpret,
        return_lse=True, window=window, static_offsets=static_offsets,
        seg_q=seg_q, seg_kv=seg_kv, softcap=softcap,
    )
    return o, (q, k, v, bias, offsets, seg_q, seg_kv, o, lse)


def _bwd_xla_quadrant(q_r, k_c, v_c, do_r, lse_r, delta_r, *, scale):
    """Exact backward of one (row-range × col-range) quadrant in plain XLA
    f32 (the small-tail analogue of the forward's einsum-softmax tails):
    given the GLOBAL row statistics (lse, Δ), each quadrant's (dQ, dK, dV)
    contributions are independent and simply sum across quadrants."""
    qf = q_r.astype(jnp.float32)
    kf = k_c.astype(jnp.float32)
    vf = v_c.astype(jnp.float32)
    dof = do_r.astype(jnp.float32)
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf) * scale
    p = jnp.exp(s - lse_r[..., None])
    dp = jnp.einsum("bhnd,bhmd->bhnm", dof, vf)
    ds = p * (dp - delta_r[..., None]) * scale
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, dof)
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, qf)
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, kf)
    return dq, dk, dv


def _bwd_unaligned_impl(q, ke, ve, do, lse, delta, *, scale, interpret):
    """Quadrant-decomposed noncausal backward for unaligned N/Nk (the bwd
    half of :func:`_fwd_unaligned_decomposed` — the padded flat launch
    would otherwise execute up to 1.56× dead pair area across 5 matmuls).
    ``ke``/``ve`` are GQA-expanded to Hq heads; the caller reduces.

    rows/cols split at the largest 1024-multiples; the main quadrant runs
    the aligned fused kernel, the three tail quadrants (≤ 4M positions
    each, gated by the caller) run :func:`_bwd_xla_quadrant`; per-quadrant
    gradients sum (dQ across column ranges, dK/dV across row ranges).
    """
    from flashattn_tpu.ops import flash_bwd_fused

    B, Hq, Nq, D = q.shape
    Nk = ke.shape[2]
    qm = Nq // _UNALIGNED_UNIT * _UNALIGNED_UNIT
    km = Nk // _UNALIGNED_UNIT * _UNALIGNED_UNIT
    dp_ = _pad_head_dim(D)

    bf = 2048 if D <= 128 else 1024
    bq_f = min(bf, qm)
    bk_f = min(bf, km)
    while bq_f >= 2048 and _round_up(qm, bq_f // 2) < _round_up(qm, bq_f):
        bq_f //= 2
    while bk_f >= 2048 and _round_up(km, bk_f // 2) < _round_up(km, bk_f):
        bk_f //= 2

    q_m, q_t = q[:, :, :qm], q[:, :, qm:]
    k_m, k_t = ke[:, :, :km], ke[:, :, km:]
    v_m, v_t = ve[:, :, :km], ve[:, :, km:]
    do_m, do_t = do[:, :, :qm], do[:, :, qm:]
    lse_m, lse_t = lse[:, :, :qm], lse[:, :, qm:]
    dl_m, dl_t = delta[:, :, :qm], delta[:, :, qm:]

    lse_rep = jnp.broadcast_to(
        _pad_axis(lse_m, 2, _round_up(qm, bq_f))[..., None],
        (B, Hq, _round_up(qm, bq_f), NUM_LANES))
    delta_rep = jnp.broadcast_to(
        _pad_axis(dl_m, 2, _round_up(qm, bq_f))[..., None],
        (B, Hq, _round_up(qm, bq_f), NUM_LANES))
    dq_mm, dk_mm, dv_mm = flash_bwd_fused.bwd_fused_padded(
        _pad_axis(q_m, 3, dp_), _pad_axis(k_m, 3, dp_),
        _pad_axis(v_m, 3, dp_), _pad_axis(do_m, 3, dp_),
        lse_rep, delta_rep,
        scale=scale, causal=False, block_q=bq_f, block_k=bk_f,
        kv_valid_len=km, interpret=interpret, window=None,
        static_offsets=(0, 0))
    dq_main = dq_mm[:, :, :qm, :D].astype(jnp.float32)
    dk_main = dk_mm[:, :, :km, :D].astype(jnp.float32)
    dv_main = dv_mm[:, :, :km, :D].astype(jnp.float32)

    parts_dq_t = []
    if Nk > km:  # main rows × tail cols
        dq_p, dk_p, dv_p = _bwd_xla_quadrant(
            q_m, k_t, v_t, do_m, lse_m, dl_m, scale=scale)
        dq_main = dq_main + dq_p
        dk_tail_mt, dv_tail_mt = dk_p, dv_p
    else:
        dk_tail_mt = dv_tail_mt = None
    if Nq > qm:  # tail rows × main cols (+ tail cols)
        dq_p, dk_p, dv_p = _bwd_xla_quadrant(
            q_t, k_m, v_m, do_t, lse_t, dl_t, scale=scale)
        dk_main = dk_main + dk_p
        dv_main = dv_main + dv_p
        parts_dq_t.append(dq_p)
        if Nk > km:
            dq_p, dk_p, dv_p = _bwd_xla_quadrant(
                q_t, k_t, v_t, do_t, lse_t, dl_t, scale=scale)
            parts_dq_t.append(dq_p)
            dk_tail_mt = dk_tail_mt + dk_p
            dv_tail_mt = dv_tail_mt + dv_p

    dq = dq_main
    if parts_dq_t:
        dq = jnp.concatenate([dq_main, sum(parts_dq_t)], axis=2)
    dk = dk_main
    dv = dv_main
    if dk_tail_mt is not None:
        dk = jnp.concatenate([dk_main, dk_tail_mt], axis=2)
        dv = jnp.concatenate([dv_main, dv_tail_mt], axis=2)
    return dq.astype(q.dtype), dk.astype(ke.dtype), dv.astype(ve.dtype)


def _flash_core_bwd(scale, causal, blocks, kv_valid_len, interpret, window,
                    static_offsets, softcap, residuals, g):
    q, k, v, bias, offsets, seg_q, seg_kv, o, lse = residuals
    B, Hq, Nq, D = q.shape
    Hkv, Nk = k.shape[1], k.shape[2]

    # GQA: expand KV to Hq head-wise for the bwd kernels, reduce after.
    rep = Hq // Hkv
    ke = jnp.repeat(k, rep, axis=1) if rep > 1 else k
    ve = jnp.repeat(v, rep, axis=1) if rep > 1 else v

    do = g.astype(q.dtype)
    # Δ = rowsum(dO ⊙ O): one-shot preprocess (cf. triton _attn_bwd_preprocess,
    # reference triton_fused_attention.py:192-206), fused by XLA.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    # Unaligned noncausal backward: quadrant decomposition (same gate as
    # the forward + a tail-quadrant size cap — see _bwd_unaligned_impl).
    if (bias is None and seg_q is None and softcap is None
            and static_offsets is not None and kv_valid_len == Nk
            and _can_decompose_unaligned(
                causal=causal, window=window, bias=None, seg=None,
                Nq=Nq, Nk=Nk, bq=blocks.block_q_dkv, bk=blocks.block_k_dkv,
                kv_valid_len=Nk, D=D)):
        qm_ = Nq // _UNALIGNED_UNIT * _UNALIGNED_UNIT
        km_ = Nk // _UNALIGNED_UNIT * _UNALIGNED_UNIT
        if (qm_ * (Nk - km_) <= 4 * 1024 * 1024
                and (Nq - qm_) * km_ <= 4 * 1024 * 1024
                # the fused main quadrant's whole-sequence f32 dQ scratch
                and qm_ * _pad_head_dim(D) * 4 <= 32 * 1024 * 1024):
            dq, dk, dv = _bwd_unaligned_impl(
                q, ke, ve, do, lse, delta, scale=scale, interpret=interpret)
            if rep > 1:
                dk = dk.reshape(B, Hkv, rep, Nk, D).sum(axis=2).astype(
                    k.dtype)
                dv = dv.reshape(B, Hkv, rep, Nk, D).sum(axis=2).astype(
                    v.dtype)
            return (dq, dk, dv, None, _int_zero_cotangent(offsets),
                    None, None)

    # Single-pass fused backward (5 matmuls instead of 7 — the reference's
    # one-kernel structure, kernel_fp16.cu:547-740, minus its dQ race):
    # available when offsets are compile-time, no bias gradient is needed,
    # and the whole-sequence f32 dQ accumulator fits VMEM.
    dp_ = _pad_head_dim(D)
    # 2048² fused-bwd blocks with 256-row tri chunks measured best (r3
    # tuning matrices): causal fwd+bwd 151 TF at N=4096 (vs 129 at 1024²),
    # 149 at N=8192; noncausal unchanged (155.5 vs 155.4).
    _bqf_env = os.environ.get("FLASHATTN_TPU_BQF")
    _bkf_env = os.environ.get("FLASHATTN_TPU_BKF")
    # Windowed bands: the tri-chunk narrowing is causal-only, so window
    # edge pairs run fully masked at full width — wide blocks multiply that
    # waste (2048² measured 4.76 ms vs ~2.4 expected at window=2048
    # N=4096); 1024 blocks keep ~⅓ of band pairs mask-free.
    # Fat head dims (D > 128): 2048² blocks thrash VMEM at the padded D —
    # 1024² measured +29% at D=160 (63.2 -> 81.5 TF causal fwd+bwd N=4096)
    # and +27% at D=256 (107.3 -> 136.3), r4 tuning matrices.
    _bf_default = 1024 if (window is not None or D > 128) else 2048
    bq_f = max(128, min(int(_bqf_env) if _bqf_env else _bf_default,
                        _round_up(Nq, 128)))
    bk_f = max(128, min(int(_bkf_env) if _bkf_env else _bf_default,
                        _round_up(Nk, 128)))
    # pad-aware: don't buy wide tiles with a fatter padded tail
    while bq_f >= 2048 and _round_up(Nq, bq_f // 2) < _round_up(Nq, bq_f):
        bq_f //= 2
    while bk_f >= 2048 and _round_up(Nk, bk_f // 2) < _round_up(Nk, bk_f):
        bk_f //= 2
    nqp_f = _round_up(Nq, bq_f)
    use_fused = (
        bias is None and seg_q is None and softcap is None
        and static_offsets is not None
        and nqp_f * dp_ * 4 <= 32 * 1024 * 1024
    )
    if use_fused:
        from flashattn_tpu.ops import flash_bwd_fused

        rep = Hq // Hkv
        ke = jnp.repeat(k, rep, axis=1) if rep > 1 else k
        ve = jnp.repeat(v, rep, axis=1) if rep > 1 else v
        nkp_f = _round_up(Nk, bk_f)
        lse_rep = jnp.broadcast_to(
            _pad_axis(lse, 2, nqp_f)[..., None], (B, Hq, nqp_f, NUM_LANES))
        delta_rep = jnp.broadcast_to(
            _pad_axis(delta, 2, nqp_f)[..., None], (B, Hq, nqp_f, NUM_LANES))
        dq, dk, dv = flash_bwd_fused.bwd_fused_padded(
            _pad_axis(_pad_axis(q, 2, nqp_f), 3, dp_),
            _pad_axis(_pad_axis(ke, 2, nkp_f), 3, dp_),
            _pad_axis(_pad_axis(ve, 2, nkp_f), 3, dp_),
            _pad_axis(_pad_axis(do, 2, nqp_f), 3, dp_),
            lse_rep, delta_rep,
            scale=scale, causal=causal, block_q=bq_f, block_k=bk_f,
            kv_valid_len=kv_valid_len, interpret=interpret, window=window,
            static_offsets=static_offsets,
        )
        dq = dq[:, :, :Nq, :D]
        dk = dk[:, :, :Nk, :D]
        dv = dv[:, :, :Nk, :D]
        if rep > 1:
            dk = dk.reshape(B, Hkv, rep, Nk, D).sum(axis=2).astype(k.dtype)
            dv = dv.reshape(B, Hkv, rep, Nk, D).sum(axis=2).astype(v.dtype)
        return (dq, dk, dv, None, _int_zero_cotangent(offsets),
                None, None)

    bq_dkv, bk_dkv = blocks.block_q_dkv, blocks.block_k_dkv
    bq_dq, bk_dq = blocks.block_q_dq, blocks.block_k_dq
    dp = _pad_head_dim(D)

    def padded(x, bq_, bk_, axis2_is_q=True):
        n = _round_up(Nq if axis2_is_q else Nk, bq_ if axis2_is_q else bk_)
        return _pad_axis(_pad_axis(x, 2, n), 3, dp)

    want_dbias = bias is not None

    # ── dK/dV pass ──
    nqp = _round_up(Nq, bq_dkv)
    nkp = _round_up(Nk, bk_dkv)
    qp = _pad_axis(_pad_axis(q, 2, nqp), 3, dp)
    kp = _pad_axis(_pad_axis(ke, 2, nkp), 3, dp)
    vp = _pad_axis(_pad_axis(ve, 2, nkp), 3, dp)
    dop = _pad_axis(_pad_axis(do, 2, nqp), 3, dp)
    lse_rep = jnp.broadcast_to(
        _pad_axis(lse, 2, nqp)[..., None], (B, Hq, nqp, NUM_LANES)
    )
    delta_rep = jnp.broadcast_to(
        _pad_axis(delta, 2, nqp)[..., None], (B, Hq, nqp, NUM_LANES)
    )
    bp = _pad_bias(bias, nqp, nkp)
    sq_rep = skv_rep = seg_flags = None
    if seg_q is not None:
        sq_rep, skv_rep, seg_flags = _seg_tiles(seg_q, seg_kv, nqp, nkp,
                                                bq_dkv, bk_dkv)
    dk, dv = flash_bwd.dkv_padded(
        qp, kp, vp, dop, lse_rep, delta_rep, bp, offsets,
        sq_rep, skv_rep, seg_flags,
        scale=scale, causal=causal, block_q=bq_dkv, block_k=bk_dkv,
        kv_valid_len=kv_valid_len, interpret=interpret, window=window,
        static_offsets=static_offsets, softcap=softcap,
    )
    dk = dk[:, :, :Nk, :D]
    dv = dv[:, :, :Nk, :D]
    if rep > 1:
        dk = dk.reshape(B, Hkv, rep, Nk, D).sum(axis=2).astype(k.dtype)
        dv = dv.reshape(B, Hkv, rep, Nk, D).sum(axis=2).astype(v.dtype)

    # ── dQ pass ──
    nqp = _round_up(Nq, bq_dq)
    nkp = _round_up(Nk, bk_dq)
    qp = _pad_axis(_pad_axis(q, 2, nqp), 3, dp)
    kp = _pad_axis(_pad_axis(ke, 2, nkp), 3, dp)
    vp = _pad_axis(_pad_axis(ve, 2, nkp), 3, dp)
    dop = _pad_axis(_pad_axis(do, 2, nqp), 3, dp)
    lse_rep = jnp.broadcast_to(
        _pad_axis(lse, 2, nqp)[..., None], (B, Hq, nqp, NUM_LANES)
    )
    delta_rep = jnp.broadcast_to(
        _pad_axis(delta, 2, nqp)[..., None], (B, Hq, nqp, NUM_LANES)
    )
    bp = _pad_bias(bias, nqp, nkp)
    sq_rep = skv_rep = seg_flags = None
    if seg_q is not None:
        sq_rep, skv_rep, seg_flags = _seg_tiles(seg_q, seg_kv, nqp, nkp,
                                                bq_dq, bk_dq)
    dq, dbias_full = flash_bwd.dq_padded(
        qp, kp, vp, dop, lse_rep, delta_rep, bp, offsets,
        sq_rep, skv_rep, seg_flags,
        scale=scale, causal=causal, block_q=bq_dq, block_k=bk_dq,
        kv_valid_len=kv_valid_len, want_dbias=want_dbias, interpret=interpret,
        window=window, static_offsets=static_offsets, softcap=softcap,
    )
    dq = dq[:, :, :Nq, :D]

    dbias = None
    if want_dbias:
        dbias = dbias_full[:, :, :Nq, :Nk]
        # Reduce over broadcast dims back to the bias's own shape.
        if bias.shape[0] == 1:
            dbias = dbias.sum(axis=0, keepdims=True)
        if bias.shape[1] == 1:
            dbias = dbias.sum(axis=1, keepdims=True)
        if bias.shape[2] == 1:
            dbias = dbias.sum(axis=2, keepdims=True)
        dbias = dbias.astype(bias.dtype)

    def _seg_ct(s):
        return None if s is None else _int_zero_cotangent(s)

    return (dq, dk, dv, dbias, _int_zero_cotangent(offsets),
            _seg_ct(seg_q), _seg_ct(seg_kv))


def _pad_bias(bias, nqp, nkp):
    if bias is None:
        return None
    bp = _pad_axis(bias, 3, nkp)
    if bias.shape[2] > 1:
        bp = _pad_axis(bp, 2, nqp)
    else:
        bp = jnp.broadcast_to(bp, (bp.shape[0], bp.shape[1], nqp, nkp))
    return bp


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


# ───────────────────────────── public API ───────────────────────────────────


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: jax.Array | None = None,
    causal: bool = False,
    scale: float | None = None,
    layout: str = "BHND",
    block_sizes: BlockSizes | None = None,
    q_offset: jax.Array | int = 0,
    kv_offset: jax.Array | int = 0,
    window: tuple[int, int] | None = None,
    segment_ids=None,
    logit_softcap: float | None = None,
    compute_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """Fused FlashAttention-2, differentiable, arbitrary shapes.

    Args:
      q/k/v: ``[B, H, N, D]`` (layout="BHND") or ``[B, N, H, D]``
        (layout="BNHD" — the reference's ``BNHD_fmt``/``permute_NH`` path,
        FlashAttn.py:59-61). K/V may have fewer heads (GQA) as long as they
        divide Q's head count. ``Nk`` may differ from ``Nq``.
      bias: additive attention bias (real support — the reference's ``mask``
        arg is dead, FlashAttn.py:49), shape broadcastable to
        ``[B, H, Nq, Nk]`` over batch/head (dims of size 1); differentiable.
      causal: causal masking with whole-tile skipping.
      scale: softmax scale, default ``D ** -0.5`` (FlashAttn.py:63-64).
      q_offset/kv_offset: absolute position offsets of the q/kv chunks (for
        sequence-parallel callers); ints or scalar int32 arrays.
      window: optional sliding window ``(left, right)``: absolute position
        pair (i, j) attends iff ``i - left <= j <= i + right``; -1 disables a
        side (Mistral-style local attention is ``window=(w-1, 0)`` or
        ``causal=True, window=(w-1, -1)``). Whole out-of-window tiles are
        skipped, so cost scales with the window, not N².
      segment_ids: packed-sequence (varlen) masking — pair (i, j) attends iff
        ``seg_q[i] == seg_kv[j]`` (AND-composed with causal/window). Either a
        single ``[B, N]`` int array (self-attention, Nq == Nk) or a tuple
        ``(q_ids [B, Nq], kv_ids [B, Nk])``. Ids must be >= 0 (negatives are
        reserved padding sentinels); a q row whose id matches no kv token
        outputs zeros and receives zero gradients. This is the feature the
        reference lacks entirely (its ``mask`` arg is dead, FlashAttn.py:49):
        train on packed batches without O(N²) bias materialization.
      logit_softcap: Gemma-2-style logit soft-capping: the scaled logits
        pass through ``cap·tanh(s/cap)`` before bias/mask/softmax (and the
        backward chains the ``1 − tanh²`` Jacobian). Differentiable;
        composes with causal/window/segments/bias/GQA.
      compute_dtype: kernel matmul dtype override (``jnp.float32`` or
        ``jnp.bfloat16``). Default None follows the host.cpp:30-45 policy:
        bf16/f32 run natively, fp16 (no fp16 MXU on TPU) casts to bf16 —
        which drops 3 mantissa bits vs the reference's native fp16 kernel.
        Pass ``jnp.float32`` to run fp16 inputs at full f32 accuracy (the
        measured error table is in results/fp16_accuracy.jsonl).
      block_sizes: override the tile policy.
      interpret: force Pallas interpreter mode (None = auto: TPU compiles,
        CPU interprets).
    Returns:
      Attention output, same shape/layout/dtype as ``q``.
    """
    in_dtype = q.dtype
    q = _to_bhnd(q, layout)
    k = _to_bhnd(k, layout)
    v = _to_bhnd(v, layout)
    _validate(q, k, v, bias)

    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    kdt = _dispatch_dtype(in_dtype, compute_dtype)
    q, k, v = q.astype(kdt), k.astype(kdt), v.astype(kdt)

    # GQA decode fold: tiny-Nq queries against a GQA cache would read each
    # KV block rep = Hq/Hkv times (once per q head, grid over Hq). Folding
    # one kv head's rep q-heads into the Q-tile ROWS reads the cache once:
    # [B, Hq, Nq, D] -> [B, Hkv, rep·Nq, D] — head-major rows, exactly the
    # kernel's h // rep GQA mapping, still within the 16/32-row decode tile.
    # Sound only when nothing depends on a row's sequence position:
    # non-causal, no window/segments, no bias (bias has a head dim).
    # Measured r4: Hkv=2 decode at nk=32768 was 94.6 GB/s unique-byte
    # bandwidth unfolded (8 redundant reads); folded reads at full rate.
    # A head-broadcast bias (shape[1] == 1, e.g. decode's not-yet-written
    # cache-slot mask) is fold-safe: every folded row sees the same column
    # bias (rows tiled head-major when the bias is row-dependent).
    rep_fold = q.shape[1] // k.shape[1]
    if (rep_fold > 1 and not causal and window is None
            and (bias is None or bias.shape[1] == 1)
            and segment_ids is None and q.shape[2] * rep_fold <= 32
            and block_sizes is None):
        B_, Hq_, Nq_, D_ = q.shape
        bf = bias
        if bf is not None and bf.shape[2] > 1:
            bf = jnp.tile(bf, (1, 1, rep_fold, 1))
        of = flash_attention(
            q.reshape(B_, k.shape[1], rep_fold * Nq_, D_), k, v, bias=bf,
            scale=scale, logit_softcap=logit_softcap, interpret=interpret)
        return _from_bhnd(
            of.reshape(B_, Hq_, Nq_, D_).astype(in_dtype), layout)

    if block_sizes is None:
        block_sizes = choose_block_sizes(q.shape[2], k.shape[2], q.shape[3],
                                         kdt, bias is not None, bool(causal))
    offsets = jnp.stack(
        [jnp.asarray(q_offset, jnp.int32), jnp.asarray(kv_offset, jnp.int32)]
    )
    static_offsets = (
        (int(q_offset), int(kv_offset))
        if isinstance(q_offset, int) and isinstance(kv_offset, int) else None
    )
    seg_q, seg_kv = _normalize_segment_ids(segment_ids, q, k)
    o = _flash_core(
        q, k, v, bias, offsets, seg_q, seg_kv, float(scale), bool(causal),
        block_sizes, k.shape[2], interpret,
        tuple(int(w) for w in window) if window is not None else None,
        static_offsets,
        float(logit_softcap) if logit_softcap is not None else None,
    )
    return _from_bhnd(o.astype(in_dtype), layout)


def _normalize_segment_ids(segment_ids, q, k):
    """Validate/split the public ``segment_ids`` arg into (q_ids, kv_ids)."""
    if segment_ids is None:
        return None, None
    if isinstance(segment_ids, (tuple, list)):
        seg_q, seg_kv = segment_ids
    else:
        if q.shape[2] != k.shape[2]:
            raise ValueError(
                "a single segment_ids array requires Nq == Nk; pass a "
                f"(q_ids, kv_ids) tuple for Nq={q.shape[2]} Nk={k.shape[2]}")
        seg_q = seg_kv = segment_ids
    if not jnp.issubdtype(seg_q.dtype, jnp.integer):
        raise ValueError(f"segment ids must be integers, got {seg_q.dtype}")
    B, _, Nq, _ = q.shape
    Nk = k.shape[2]
    if seg_q.shape != (B, Nq) or seg_kv.shape != (B, Nk):
        raise ValueError(
            f"segment id shapes {seg_q.shape}/{seg_kv.shape} must be "
            f"({B}, {Nq}) / ({B}, {Nk})")
    return seg_q, seg_kv


def flash_attention_with_lse(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    bias: jax.Array | None = None,
    causal: bool = False,
    scale: float | None = None,
    layout: str = "BHND",
    block_sizes: BlockSizes | None = None,
    q_offset: jax.Array | int = 0,
    kv_offset: jax.Array | int = 0,
    window: tuple[int, int] | None = None,
    segment_ids=None,
    logit_softcap: float | None = None,
    compute_dtype=None,
    interpret: bool | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Forward-only fused attention returning ``(O, L)`` with
    ``L = logsumexp`` per row ``[B, H, Nq]`` — the merge primitive for ring
    attention / sequence-parallel partial combines (SURVEY.md §5).
    """
    in_dtype = q.dtype
    q = _to_bhnd(q, layout)
    k = _to_bhnd(k, layout)
    v = _to_bhnd(v, layout)
    _validate(q, k, v, bias)
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    kdt = _dispatch_dtype(in_dtype, compute_dtype)
    q, k, v = q.astype(kdt), k.astype(kdt), v.astype(kdt)
    if block_sizes is None:
        block_sizes = choose_block_sizes(q.shape[2], k.shape[2], q.shape[3],
                                         kdt, bias is not None, bool(causal))
    offsets = jnp.stack(
        [jnp.asarray(q_offset, jnp.int32), jnp.asarray(kv_offset, jnp.int32)]
    )
    seg_q, seg_kv = _normalize_segment_ids(segment_ids, q, k)
    o, lse = _flash_core_fwd_impl(
        q, k, v, bias, offsets, float(scale), bool(causal), block_sizes,
        k.shape[2], interpret, return_lse=True,
        window=tuple(int(w) for w in window) if window is not None else None,
        static_offsets=(
            (int(q_offset), int(kv_offset))
            if isinstance(q_offset, int) and isinstance(kv_offset, int)
            else None
        ),
        seg_q=seg_q, seg_kv=seg_kv,
        softcap=float(logit_softcap) if logit_softcap is not None else None,
    )
    return _from_bhnd(o.astype(in_dtype), layout), lse


def _validate(q, k, v, bias):
    if q.ndim != 4 or k.ndim != 4 or v.ndim != 4:
        raise ValueError(
            f"q/k/v must be rank-4, got {q.shape}, {k.shape}, {v.shape}"
        )
    B, Hq, Nq, D = q.shape
    if k.shape != v.shape:
        raise ValueError(f"k and v shapes differ: {k.shape} vs {v.shape}")
    if k.shape[0] != B or k.shape[3] != D:
        raise ValueError(f"k {k.shape} incompatible with q {q.shape}")
    if Hq % k.shape[1] != 0:
        raise ValueError(f"GQA requires Hkv | Hq: Hq={Hq}, Hkv={k.shape[1]}")
    if bias is not None:
        if bias.ndim != 4:
            raise ValueError(f"bias must be rank-4, got {bias.shape}")
        Bb, Hb, Nqb, Nkb = bias.shape
        if Bb not in (1, B) or Hb not in (1, Hq):
            raise ValueError(f"bias batch/head {bias.shape} not broadcastable")
        if Nqb not in (1, Nq) or Nkb != k.shape[2]:
            raise ValueError(
                f"bias seq dims {bias.shape} must be (1|{Nq}, {k.shape[2]})"
            )
