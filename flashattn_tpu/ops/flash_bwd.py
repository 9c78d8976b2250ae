"""Pallas TPU FlashAttention-2 backward kernels.

TPU-native redesign of the reference backward (bwd_kernel,
kernel_fp16.cu:547-740) as the standard FA-2 *two-kernel* backward:

  * ``dkv_padded`` — grid over KV tiles, sequential over Q tiles; each program
    owns one (dK, dV) tile accumulated in VMEM scratch. This is the
    reference's single bwd kernel minus its dQ write.
  * ``dq_padded`` — grid over Q tiles, sequential over KV tiles; each program
    owns one dQ tile. Splitting dQ into its own kernel eliminates the
    reference's cross-workgroup non-atomic dQ race (SURVEY.md §6 quirk 2:
    kernel_fp16.cu:736 accumulates dQ from every Tc block).

Both recompute ``S = scale·QKᵀ (+bias)`` from saved residuals ``L`` (log-sum-
exp) and ``Δ = rowsum(dO ⊙ O)``; Δ is computed once on the host side (fixing
quirk 3 — the reference recomputes Di per Tc block, kernel_fp16.cu:605-631)
and both dQ and dK carry the symmetric ``scale`` factor (fixing quirk 1 — the
reference leaves dQ a factor log2(e) large, kernel_fp16.cu:736 vs 737).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.ops.oracle import DEFAULT_MASK_VALUE
from flashattn_tpu.utils import platform

NUM_LANES = 128
NUM_SUBLANES = 8


def _valid_split(n, block, align):
    """Sub-tiling is only legal when the block divides into align-multiple
    sub-tiles (lane/sublane constraints); otherwise run unsplit."""
    return n if (n >= 1 and block % n == 0 and (block // n) % align == 0) \
        else 1


def _tile_should_run(q_tile, kv_tile, block_q, block_k, q_off, kv_off,
                     causal, window):
    """Whole-tile skip predicate (must be conservative: run any tile that
    could contain an unmasked pair). Mirrors the fwd kernel's skip logic."""
    wl, wr = window if window is not None else (-1, -1)
    should_run = True
    if causal or wr >= 0:
        first_kv_pos = kv_tile * block_k + kv_off
        last_q_pos = q_tile * block_q + (block_q - 1) + q_off
        bound = last_q_pos + (wr if (wr >= 0 and not causal) else 0)
        should_run = first_kv_pos <= bound
    if wl >= 0:
        last_kv_pos = kv_tile * block_k + (block_k - 1) + kv_off
        first_q_pos = q_tile * block_q + q_off
        in_window = last_kv_pos >= first_q_pos - wl
        should_run = in_window if isinstance(should_run, bool) \
            else jnp.logical_and(should_run, in_window)
    return should_run


def _recompute_p_ds(
    q, k, v, do, lse, delta, bias_val, *,
    scale, causal, need_tail_mask, kv_valid_len,
    q_tile, kv_tile, block_q, block_k, q_off, kv_off,
    window=None, seg_q=None, seg_kv=None, softcap=None,
):
    """Shared recompute: returns (p, ds, cap_jac) as f32 (block_q, block_k).

    ``cap_jac`` is the logit-softcap Jacobian ``1 − tanh²(s/cap)`` (None
    without softcap): ``ds`` is the gradient w.r.t. the CAPPED logits (what
    dbias needs — bias adds after the cap), and dQ/dK chains need
    ``ds · cap_jac``.

    ``p = exp(S − L)`` is the true normalized probability
    (reference bwd kernel_fp16.cu:690-721); ``ds = p ∘ (dp − Δ)``.

    ``seg_q``/``seg_kv`` (packed-sequence ids, lane-replicated
    ``(block_q, NUM_LANES)`` / ``(1, block_k)``) extend the mask; entries
    masked this way get ``p = exp(mask_value − lse) = 0`` exactly (f32
    underflow), including fully-dead padding rows, whose stored LSE is
    ``≈ LN2·mask_value > mask_value`` — so no dK/dV pollution is possible.
    """
    prec = jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    s *= scale
    cap_jac = None
    if softcap is not None:
        t = jnp.tanh(s * (1.0 / softcap))
        cap_jac = 1.0 - t * t
        s = softcap * t
    if bias_val is not None:
        s += bias_val.astype(jnp.float32)
    wl, wr = window if window is not None else (-1, -1)
    has_window = wl >= 0 or wr >= 0
    has_seg = seg_q is not None
    if causal or need_tail_mask or has_window or has_seg:
        mask = None
        if causal or has_window or need_tail_mask:
            col_pos = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1
            ) + kv_tile * block_k
            if need_tail_mask:
                mask = col_pos < kv_valid_len
        if causal or has_window:
            row_pos = jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0
            ) + q_tile * block_q + q_off
            col_abs = col_pos + kv_off
            if causal:
                cmask = col_abs <= row_pos
                mask = cmask if mask is None else (mask & cmask)
            if wl >= 0:
                wmask = col_abs >= row_pos - wl
                mask = wmask if mask is None else (mask & wmask)
            if wr >= 0:
                wmask = col_abs <= row_pos + wr
                mask = wmask if mask is None else (mask & wmask)
        if has_seg:
            sq = (seg_q if block_k == NUM_LANES
                  else jnp.tile(seg_q, (1, block_k // NUM_LANES)))
            segm = sq == seg_kv
            mask = segm if mask is None else (mask & segm)
        s = jnp.where(mask, s, DEFAULT_MASK_VALUE)
    p = jnp.exp(s - lse[:, :1])
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    ds = p * (dp - delta[:, :1])
    return p, ds, cap_jac


def _dkv_kernel(
    offs_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
    seg_q_ref, seg_kv_ref, seg_flags_ref,
    dk_ref, dv_ref,
    dk_scr, dv_scr,
    *, scale, causal, block_q, block_k, num_q_tiles,
    kv_valid_len, kv_padded_len, window=None,
    bounded_delta=None, num_q_tiles_total=None, static_offs=None,
    q_splits=1, softcap=None,
):
    kv_tile = pl.program_id(2)
    grid_i = pl.program_id(3)

    @pl.when(grid_i == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    if static_offs is not None:
        q_off, kv_off = static_offs
    else:
        q_off = offs_ref[0]
        kv_off = offs_ref[1]
    if bounded_delta is not None:
        q_tile = (kv_tile * block_k + bounded_delta) // block_q + grid_i
        in_range = jnp.logical_and(q_tile >= 0, q_tile < num_q_tiles_total)
    else:
        q_tile = grid_i
        in_range = True
    should_run = _tile_should_run(q_tile, kv_tile, block_q, block_k,
                                  q_off, kv_off, causal, window)
    if bounded_delta is not None:
        should_run = jnp.logical_and(should_run, in_range) \
            if not isinstance(should_run, bool) else in_range
    if seg_flags_ref is not None:
        # Skip cross-document blocks (host-side range-overlap flags; same
        # classification as the fwd kernel). q_tile may be out of range on
        # bounded grids — clamp the index; in_range already gates the run.
        qt = (jnp.clip(q_tile, 0, num_q_tiles_total - 1)
              if bounded_delta is not None else q_tile)
        seg_run = seg_flags_ref[pl.program_id(0), 0, qt, kv_tile] == 1
        should_run = (seg_run if should_run is True
                      else jnp.logical_and(should_run, seg_run))

    @pl.when(should_run)
    def _compute():
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        # Sub-tile the Q rows: sub-tile i+1's recompute dots (MXU) overlap
        # sub-tile i's exp (VPU) — same trick as the fwd kernel's kv_splits.
        sub_q = block_q // q_splits
        for part in range(q_splits):
            rows = slice(part * sub_q, (part + 1) * sub_q)
            q = q_ref[0, 0, rows, :]
            do = do_ref[0, 0, rows, :]
            p, ds, cap_jac = _recompute_p_ds(
                q, k, v, do, lse_ref[0, 0, rows, :], delta_ref[0, 0, rows, :],
                bias_ref[0, 0, rows, :] if bias_ref is not None else None,
                scale=scale, causal=causal,
                need_tail_mask=kv_valid_len != kv_padded_len,
                kv_valid_len=kv_valid_len,
                q_tile=(q_tile * block_q + part * sub_q) // sub_q,
                kv_tile=kv_tile,
                block_q=sub_q, block_k=block_k, q_off=q_off, kv_off=kv_off,
                window=window,
                seg_q=(seg_q_ref[0, rows, :]
                       if seg_q_ref is not None else None),
                seg_kv=(seg_kv_ref[0, :1, :]
                        if seg_kv_ref is not None else None),
                softcap=softcap,
            )
            prec = (jax.lax.Precision.HIGHEST
                    if q.dtype == jnp.float32 else None)
            # dV += Pᵀ · dO   (reference kernel_fp16.cu:724)
            dv_scr[...] += jax.lax.dot_general(
                p.astype(do.dtype), do,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )
            if cap_jac is not None:
                ds = ds * cap_jac  # chain through the logit softcap
            # dK += dSᵀ · Q  (reference kernel_fp16.cu:737; scale at store)
            dk_scr[...] += jax.lax.dot_general(
                ds.astype(q.dtype), q,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

    @pl.when(grid_i == num_q_tiles - 1)
    def _store():
        dk_ref[0, 0] = (dk_scr[...] * scale).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)


def _dq_kernel(
    offs_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, bias_ref,
    seg_q_ref, seg_kv_ref, seg_flags_ref,
    dq_ref, dbias_ref,
    dq_scr,
    *, scale, causal, block_q, block_k, num_kv_tiles,
    kv_valid_len, kv_padded_len, window=None,
    bounded_delta=None, num_kv_tiles_total=None, static_offs=None,
    kv_splits=1, softcap=None,
):
    q_tile = pl.program_id(2)
    grid_j = pl.program_id(3)

    @pl.when(grid_j == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    if static_offs is not None:
        q_off, kv_off = static_offs
    else:
        q_off = offs_ref[0]
        kv_off = offs_ref[1]
    if bounded_delta is not None:
        kv_tile = (q_tile * block_q + bounded_delta) // block_k + grid_j
        in_range = jnp.logical_and(kv_tile >= 0, kv_tile < num_kv_tiles_total)
    else:
        kv_tile = grid_j
        in_range = True
    should_run = _tile_should_run(q_tile, kv_tile, block_q, block_k,
                                  q_off, kv_off, causal, window)
    if bounded_delta is not None:
        should_run = jnp.logical_and(should_run, in_range) \
            if not isinstance(should_run, bool) else in_range
    if seg_flags_ref is not None:
        kt = (jnp.clip(kv_tile, 0, num_kv_tiles_total - 1)
              if bounded_delta is not None else kv_tile)
        seg_run = seg_flags_ref[pl.program_id(0), 0, q_tile, kt] == 1
        should_run = (seg_run if should_run is True
                      else jnp.logical_and(should_run, seg_run))

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        do = do_ref[0, 0]
        sub_k = block_k // kv_splits
        for part in range(kv_splits):
            cols = slice(part * sub_k, (part + 1) * sub_k)
            k = k_ref[0, 0, cols, :]
            _, ds, cap_jac = _recompute_p_ds(
                q, k, v_ref[0, 0, cols, :], do, lse_ref[0, 0],
                delta_ref[0, 0],
                bias_ref[0, 0, :, cols] if bias_ref is not None else None,
                scale=scale, causal=causal,
                need_tail_mask=kv_valid_len != kv_padded_len,
                kv_valid_len=kv_valid_len,
                q_tile=q_tile,
                kv_tile=(kv_tile * block_k + part * sub_k) // sub_k,
                block_q=block_q, block_k=sub_k, q_off=q_off, kv_off=kv_off,
                window=window,
                seg_q=(seg_q_ref[0, :, :]
                       if seg_q_ref is not None else None),
                seg_kv=(seg_kv_ref[0, :1, cols]
                        if seg_kv_ref is not None else None),
                softcap=softcap,
            )
            if dbias_ref is not None:
                # bias adds AFTER the cap: dbias is the capped-logit grad.
                dbias_ref[0, 0, :, cols] = ds.astype(dbias_ref.dtype)
            if cap_jac is not None:
                ds = ds * cap_jac  # chain through the logit softcap
            # dQ += dS · K  (reference kernel_fp16.cu:736 — here with
            # symmetric scale, applied at store)
            dq_scr[...] += jax.lax.dot_general(
                ds.astype(k.dtype), k,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=(jax.lax.Precision.HIGHEST
                           if q.dtype == jnp.float32 else None),
            )

    wl_, wr_ = window if window is not None else (-1, -1)
    if (causal or wl_ >= 0 or wr_ >= 0
            or seg_flags_ref is not None) and dbias_ref is not None:
        # Skipped (out-of-window / cross-document) tiles still own a dbias
        # block: zero it.
        @pl.when(jnp.logical_not(should_run))
        def _zero_dbias():
            dbias_ref[0, 0] = jnp.zeros_like(dbias_ref[0, 0])

    @pl.when(grid_j == num_kv_tiles - 1)
    def _store():
        dq_ref[0, 0] = (dq_scr[...] * scale).astype(dq_ref.dtype)


def _common_specs(B, H, block_q, block_k, D, bias, order, minor_tile_of=None,
                  seg=False):
    """Build in_specs/index fns shared by both bwd kernels.

    ``order`` is "kv_major" (grid (B,H,Tk,Tq)) or "q_major" (grid (B,H,Tq,Tk)).
    ``minor_tile_of(major, minor)``: bounded-window grids remap the minor grid
    index to the true tile index (clamped at the sequence edges).
    ``seg``: append BlockSpecs for packed-sequence segment ids
    (``[B, Nqp, NUM_LANES]`` lane-replicated q ids and
    ``[B, NUM_SUBLANES, Nkp]`` sublane-replicated kv ids).
    """
    if minor_tile_of is None:
        minor_tile_of = lambda major, minor: minor
    if order == "kv_major":
        def qi(b, h, j, i):
            return (b, h, minor_tile_of(j, i), 0)

        def kvi(b, h, j, i):
            return (b, h, j, 0)

        def bi_factory(Bb, Hb):
            return lambda b, h, j, i: (b if Bb > 1 else 0, h if Hb > 1 else 0,
                                       minor_tile_of(j, i), j)

        def sqi(b, h, j, i):
            return (b, minor_tile_of(j, i), 0)

        def skvi(b, h, j, i):
            return (b, 0, j)
    else:
        def qi(b, h, i, j):
            return (b, h, i, 0)

        def kvi(b, h, i, j):
            return (b, h, minor_tile_of(i, j), 0)

        def bi_factory(Bb, Hb):
            return lambda b, h, i, j: (b if Bb > 1 else 0, h if Hb > 1 else 0,
                                       i, minor_tile_of(i, j))

        def sqi(b, h, i, j):
            return (b, i, 0)

        def skvi(b, h, i, j):
            return (b, 0, minor_tile_of(i, j))

    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offsets
        pl.BlockSpec((1, 1, block_q, D), qi, memory_space=pltpu.VMEM),   # q
        pl.BlockSpec((1, 1, block_k, D), kvi, memory_space=pltpu.VMEM),  # k
        pl.BlockSpec((1, 1, block_k, D), kvi, memory_space=pltpu.VMEM),  # v
        pl.BlockSpec((1, 1, block_q, D), qi, memory_space=pltpu.VMEM),   # do
        pl.BlockSpec((1, 1, block_q, NUM_LANES), qi, memory_space=pltpu.VMEM),  # lse
        pl.BlockSpec((1, 1, block_q, NUM_LANES), qi, memory_space=pltpu.VMEM),  # delta
    ]
    if bias is not None:
        specs.append(
            pl.BlockSpec((1, 1, block_q, block_k),
                         bi_factory(bias.shape[0], bias.shape[1]),
                         memory_space=pltpu.VMEM)
        )
    if seg:
        specs.append(
            pl.BlockSpec((1, block_q, NUM_LANES), sqi,
                         memory_space=pltpu.VMEM))
        specs.append(
            pl.BlockSpec((1, NUM_SUBLANES, block_k), skvi,
                         memory_space=pltpu.VMEM))
        # per-block run flags, whole [B, 2, Tq, Tk] array in SMEM
        specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
    return specs, qi, kvi


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_k",
                     "kv_valid_len", "interpret", "window", "static_offsets",
                     "q_splits", "softcap"),
)
def dkv_padded(
    q, k, v, do, lse_rep, delta_rep, bias, offsets,
    seg_q=None, seg_kv=None, seg_flags=None,
    *, scale, causal, block_q, block_k, kv_valid_len, interpret=None,
    window=None, static_offsets=None, q_splits=None, softcap=None,
):
    """dK/dV kernel launch. All seq dims pre-padded; H == Hkv (GQA expanded
    by the wrapper). ``lse_rep``/``delta_rep``: [B,H,Nqp,128] lane-replicated.
    ``seg_q``/``seg_kv``: optional packed-sequence ids, [B,Nqp,128] /
    [B,NUM_SUBLANES,Nkp] (pre-replicated by the wrapper).
    """
    if interpret is None:
        interpret = platform.pallas_interpret_default()
    B, H, Nqp, D = q.shape
    Nkp = k.shape[2]
    tq, tk = Nqp // block_q, Nkp // block_k

    wl, wr = window if window is not None else (-1, -1)
    wr_eff = 0 if causal else wr
    bounded = (static_offsets is not None and wl >= 0
               and (causal or wr >= 0) and bias is None)
    q_w = (block_k + wl + wr_eff - 1) // block_q + 2 if bounded else tq
    if bounded and q_w >= tq:
        bounded = False
        q_w = tq
    if bounded:
        # per KV tile j, q rows in [j·bk − wr_eff + (ko−qo), j·bk+bk−1+wl+…]
        delta = static_offsets[1] - static_offsets[0] - wr_eff

        def q_tile_of(j, i):
            return jnp.clip((j * block_k + delta) // block_q + i, 0, tq - 1)
    else:
        delta = None
        q_tile_of = None
    grid = (B, H, tk, q_w)

    has_seg = seg_q is not None
    specs, qi, kvi = _common_specs(B, H, block_q, block_k, D, bias,
                                   "kv_major", q_tile_of, seg=has_seg)
    args = [offsets.astype(jnp.int32), q, k, v, do, lse_rep, delta_rep]
    if bias is not None:
        args.append(bias)
    if has_seg:
        args.extend([seg_q, seg_kv, seg_flags])
    has_bias = bias is not None

    def entry(offs, qr, kr, vr, dor, lser, deltar, *rest):
        idx = 0
        bias_r = rest[idx] if has_bias else None
        idx += 1 if has_bias else 0
        sq_r = skv_r = sf_r = None
        if has_seg:
            sq_r, skv_r, sf_r = rest[idx:idx + 3]
            idx += 3
        dk_r, dv_r = rest[idx], rest[idx + 1]
        dk_s, dv_s = rest[idx + 2], rest[idx + 3]
        _dkv_kernel(
            offs, qr, kr, vr, dor, lser, deltar, bias_r, sq_r, skv_r, sf_r,
            dk_r, dv_r, dk_s, dv_s,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            num_q_tiles=q_w, kv_valid_len=kv_valid_len, kv_padded_len=Nkp,
            window=window, bounded_delta=delta, num_q_tiles_total=tq,
            static_offs=static_offsets, softcap=softcap,
            q_splits=_valid_split(
                max(1, block_q // 1024) if q_splits is None else q_splits,
                block_q, 16),
        )

    dk, dv = pl.pallas_call(
        entry,
        grid=grid,
        in_specs=specs,
        out_specs=[
            pl.BlockSpec((1, 1, block_k, D), kvi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), kvi, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # default scoped-VMEM budget is 16 MB; v5e has 128 MB of VMEM —
            # raise the cap so (1024,1024) tiles fit alongside bias/dbias
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(8 * B * H * Nqp * Nkp * D * (0.5 if causal else 1.0)),
            bytes_accessed=(q.size + k.size + v.size) * 2 * q.dtype.itemsize,
            transcendentals=B * H * Nqp * Nkp,
        ),
        interpret=interpret,
    )(*args)
    return dk, dv


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_k",
                     "kv_valid_len", "want_dbias", "interpret", "window",
                     "static_offsets", "kv_splits", "softcap"),
)
def dq_padded(
    q, k, v, do, lse_rep, delta_rep, bias, offsets,
    seg_q=None, seg_kv=None, seg_flags=None,
    *, scale, causal, block_q, block_k, kv_valid_len,
    want_dbias=False, interpret=None, window=None, static_offsets=None,
    kv_splits=None, softcap=None,
):
    """dQ kernel launch (grid over Q tiles — no dQ races by construction).

    Optionally emits dS blocks as the full-[B,H,Nqp,Nkp] dbias (real
    attention-bias gradient — a capability the reference lacks entirely, its
    ``mask`` arg being dead, FlashAttn.py:49).
    """
    if interpret is None:
        interpret = platform.pallas_interpret_default()
    B, H, Nqp, D = q.shape
    Nkp = k.shape[2]
    tq, tk = Nqp // block_q, Nkp // block_k

    wl, wr = window if window is not None else (-1, -1)
    wr_eff = 0 if causal else wr
    # bounded grid would leave out-of-window dbias blocks unwritten — keep
    # the full (predicated) grid whenever dbias/bias is involved
    bounded = (static_offsets is not None and wl >= 0
               and (causal or wr >= 0) and bias is None and not want_dbias)
    kv_w = (block_q + wl + wr_eff - 1) // block_k + 2 if bounded else tk
    if bounded and kv_w >= tk:
        bounded = False
        kv_w = tk
    if bounded:
        delta = static_offsets[0] - static_offsets[1] - wl

        def kv_tile_of(i, j):
            return jnp.clip((i * block_q + delta) // block_k + j, 0, tk - 1)
    else:
        delta = None
        kv_tile_of = None
    grid = (B, H, tq, kv_w)

    has_seg = seg_q is not None
    specs, qi, kvi = _common_specs(B, H, block_q, block_k, D, bias,
                                   "q_major", kv_tile_of, seg=has_seg)
    args = [offsets.astype(jnp.int32), q, k, v, do, lse_rep, delta_rep]
    if bias is not None:
        args.append(bias)
    if has_seg:
        args.extend([seg_q, seg_kv, seg_flags])
    has_bias = bias is not None

    out_specs = [pl.BlockSpec((1, 1, block_q, D), qi, memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct(q.shape, q.dtype)]
    if want_dbias:
        out_specs.append(
            pl.BlockSpec((1, 1, block_q, block_k),
                         lambda b, h, i, j: (b, h, i, j),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(
            jax.ShapeDtypeStruct((B, H, Nqp, Nkp), jnp.float32)
        )

    def entry(offs, qr, kr, vr, dor, lser, deltar, *rest):
        idx = 0
        bias_r = rest[idx] if has_bias else None
        idx += 1 if has_bias else 0
        sq_r = skv_r = sf_r = None
        if has_seg:
            sq_r, skv_r, sf_r = rest[idx:idx + 3]
            idx += 3
        dq_r = rest[idx]; idx += 1
        dbias_r = rest[idx] if want_dbias else None
        idx += 1 if want_dbias else 0
        dq_s = rest[idx]
        _dq_kernel(
            offs, qr, kr, vr, dor, lser, deltar, bias_r, sq_r, skv_r, sf_r,
            dq_r, dbias_r, dq_s,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            num_kv_tiles=kv_w, kv_valid_len=kv_valid_len, kv_padded_len=Nkp,
            window=window, bounded_delta=delta, num_kv_tiles_total=tk,
            static_offs=static_offsets, softcap=softcap,
            kv_splits=_valid_split(
                max(1, block_k // 1024) if kv_splits is None else kv_splits,
                block_k, NUM_LANES),
        )

    outs = pl.pallas_call(
        entry,
        grid=grid,
        in_specs=specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # default scoped-VMEM budget is 16 MB; v5e has 128 MB of VMEM —
            # raise the cap so (1024,1024) tiles fit alongside bias/dbias
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=int(6 * B * H * Nqp * Nkp * D * (0.5 if causal else 1.0)),
            bytes_accessed=(q.size * 2 + k.size + v.size) * q.dtype.itemsize,
            transcendentals=B * H * Nqp * Nkp,
        ),
        interpret=interpret,
    )(*args)
    if want_dbias:
        return outs[0], outs[1]
    return outs[0], None
