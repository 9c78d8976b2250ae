"""Pallas TPU FlashAttention-2 forward kernel.

TPU-native redesign of the reference's fused forward (fwd_kernel,
kernel_fp16.cu:306-544): the Br×Bc LDS tiles become VMEM BlockSpecs, WMMA
fragments become MXU `jnp.dot` with f32 accumulation, the running (m, l)
online-softmax state lives in VMEM scratch that persists across the KV grid
dimension, and `L = m + log(l)` (kernel_fp16.cu:541-542, here in natural log)
is emitted as the residual for backward and for cross-device LSE merging
(ring attention).

Differences from the reference, by design (SURVEY.md §6-7):
  * causal/windowed launches with compile-time offsets use a FLAT grid: the
    executed (q_tile, kv_tile) pairs are enumerated at trace time into a
    scalar-prefetch table, so masked-out tiles are never visited at all (the
    reference masks everything, kernel_fp16.cu:396-411; a predicated-off
    Pallas grid step still costs ~3 µs of DMA/pipeline floor on v5e, measured
    round 2 — enumeration beats predication);
  * softmax statistics are always f32 (the reference keeps fp16 LDS tiles);
  * no OOB read-then-mask of the KV tail (quirk 4): inputs are padded and the
    tail is masked with a finite large-negative value in f32;
  * absolute q/kv position offsets may be runtime scalars, so the same kernel
    serves sequence-parallel callers (ring attention) with globally-consistent
    causal masks (those fall back to the dense predicated grid).

Grids: flat ``(B, Hq, P)`` over the pair table, or dense ``(B, Hq, Tq, Tk)``
— batch/head parallel, KV-tile sequential (the online-softmax reduction),
mirroring the reference's ``dim3(b, h, Tr)`` grid with its in-kernel Tc loop
(kernel_fp16.cu:798-806, 381-508).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.ops.oracle import DEFAULT_MASK_VALUE
from flashattn_tpu.utils import platform

NUM_LANES = 128
NUM_SUBLANES = 8
LOG2E = 1.4426950408889634  # log2(e)
LN2 = 0.6931471805599453    # 1/LOG2E

# Flat-pair table rows (int32, shape (6, P)).
TAB_QI, TAB_KV, TAB_FIRST, TAB_LAST, TAB_FULL, TAB_LIVE = range(6)


def _range_predicates(row_first, row_last, col_first_abs, col_last_abs,
                      col_first_local, col_last_local, *,
                      causal, window, need_tail_mask, kv_valid_len, and_fn):
    """(run, full) predicates for a (row-range × column-range) region: does
    any (row, col) pair survive masking / do all pairs survive. Works on
    Python ints (flat-table construction) and traced scalars (dense kernel).
    """
    wl, wr = window if window is not None else (-1, -1)
    run = None
    full = None
    if causal or wr >= 0:
        wr_eff = wr if (wr >= 0 and not causal) else 0
        run = and_fn(run, col_first_abs <= row_last + wr_eff)
        full = and_fn(full, col_last_abs <= row_first + wr_eff)
    if wl >= 0:
        run = and_fn(run, col_last_abs >= row_first - wl)
        full = and_fn(full, col_first_abs >= row_last - wl)
    if need_tail_mask:
        run = and_fn(run, col_first_local < kv_valid_len)
        full = and_fn(full, col_last_local < kv_valid_len)
    return run, full


def build_pair_table(tq, tk, block_q, block_k, *, causal, window,
                     q_off, kv_off, need_tail_mask, kv_valid_len):
    """Enumerate the executed (q_tile, kv_tile) pairs for a static mask
    geometry: q-major, kv ascending; per pair flags first/last (scratch
    init / output store) and full (no masking needed). A q tile whose every
    kv tile is masked out emits one dead sentinel pair so its output block
    is still written (zeros, the all-masked convention)."""
    def and_fn(a, b):
        return b if a is None else (a and b)

    rows = {k: [] for k in range(6)}
    for i in range(tq):
        row_first = i * block_q + q_off
        row_last = row_first + block_q - 1
        js = []
        for j in range(tk):
            cf, cl = j * block_k, j * block_k + block_k - 1
            run, full = _range_predicates(
                row_first, row_last, cf + kv_off, cl + kv_off, cf, cl,
                causal=causal, window=window, need_tail_mask=need_tail_mask,
                kv_valid_len=kv_valid_len, and_fn=and_fn)
            if run is None or run:
                js.append((j, bool(full) if full is not None else True))
        if not js:
            js = [(0, False)]
            live = 0
        else:
            live = 1
        for idx, (j, full) in enumerate(js):
            rows[TAB_QI].append(i)
            rows[TAB_KV].append(j)
            rows[TAB_FIRST].append(1 if idx == 0 else 0)
            rows[TAB_LAST].append(1 if idx == len(js) - 1 else 0)
            rows[TAB_FULL].append(1 if full else 0)
            rows[TAB_LIVE].append(live)
    return np.array([rows[r] for r in range(6)], dtype=np.int32)


def _fwd_kernel(
    # scalar-prefetch (flat mode only)
    tab_ref,   # SMEM (6, P) int32 pair table, or None (dense mode)
    # inputs
    offs_ref,  # SMEM (2,) int32: [q_offset, kv_offset] absolute positions
    q_ref,     # VMEM (1, 1, block_q, D)
    k_ref,     # VMEM (1, 1, block_k, D)
    v_ref,     # VMEM (1, 1, block_k, D)
    bias_ref,  # VMEM (1, 1, block_q, block_k) or None
    k_scale_ref,  # VMEM (1, 1, 1, block_k) f32 per-token K scales, or None
    v_scale_ref,  # VMEM (1, 1, 1, block_k) f32 per-token V scales, or None
    seg_q_ref,   # VMEM (1, block_q, NUM_LANES) int32 lane-replicated, or None
    seg_kv_ref,  # VMEM (1, NUM_SUBLANES, block_k) int32, or None
    seg_flags_ref,  # SMEM (B, 2, Tq, Tk) int32 [run, full] per block, or None
    # outputs
    o_ref,     # VMEM (1, 1, block_q, D)
    lse_ref,   # VMEM (1, 1, block_q, NUM_LANES) or None
    # scratch
    m_scr,     # VMEM (block_q, NUM_LANES) f32
    l_scr,     # VMEM (block_q, NUM_LANES) f32
    acc_scr,   # VMEM (block_q, D + aug_width) f32
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    num_kv_tiles: int,
    kv_valid_len: int,
    kv_padded_len: int,
    mask_value: float,
    window: tuple[int, int] | None = None,
    static_offs: tuple[int, int] | None = None,
    kv_splits: int = 1,
    q_splits: int = 1,
    aug_width: int = 0,
    head_dim: int = 0,
    tri_edge: bool = False,
    softcap: float | None = None,
):
    wl, wr = window if window is not None else (-1, -1)
    need_tail_mask = kv_valid_len != kv_padded_len
    has_window = wl >= 0 or wr >= 0
    has_seg = seg_q_ref is not None
    masking = causal or has_window or need_tail_mask or has_seg

    if static_offs is not None:
        q_off, kv_off = static_offs
    else:
        q_off = offs_ref[0]
        kv_off = offs_ref[1]

    def jnp_and(a, b):
        return b if a is None else jnp.logical_and(a, b)

    if tab_ref is not None:
        p = pl.program_id(2)
        q_tile = tab_ref[TAB_QI, p]
        kv_tile = tab_ref[TAB_KV, p]
        init_pred = tab_ref[TAB_FIRST, p] == 1
        store_pred = tab_ref[TAB_LAST, p] == 1
        blk_full = tab_ref[TAB_FULL, p] == 1
        should_run = tab_ref[TAB_LIVE, p] == 1
    else:
        q_tile = pl.program_id(2)
        grid_j = pl.program_id(3)
        kv_tile = grid_j
        init_pred = grid_j == 0
        store_pred = grid_j == num_kv_tiles - 1
        if masking:
            should_run, blk_full = _range_predicates(
                q_tile * block_q + q_off,
                q_tile * block_q + (block_q - 1) + q_off,
                kv_tile * block_k + kv_off,
                kv_tile * block_k + (block_k - 1) + kv_off,
                kv_tile * block_k,
                kv_tile * block_k + (block_k - 1),
                causal=causal, window=window,
                need_tail_mask=need_tail_mask, kv_valid_len=kv_valid_len,
                and_fn=jnp_and)
            if should_run is None:
                should_run = True
        else:
            should_run, blk_full = True, True

    if has_seg:
        # Host-computed per-block segment classification (SMEM):
        # run = the id RANGES of the q and kv tiles intersect (a shared
        # value must lie in both ranges, so disjoint ranges ⟹ no match —
        # conservative for arbitrary ids, exact for sorted/packed ids);
        # full = both tiles constant and equal (every pair matches).
        # Cross-document blocks are skipped outright, intra-document blocks
        # keep the fast (unmasked) path — packed attention costs the sum of
        # per-document areas, not the full causal area.
        b = pl.program_id(0)
        seg_run = seg_flags_ref[b, 0, q_tile, kv_tile] == 1
        seg_full = seg_flags_ref[b, 1, q_tile, kv_tile] == 1
        should_run = (seg_run if should_run is True
                      else jnp.logical_and(should_run, seg_run))
        blk_full = (seg_full if (blk_full is None or blk_full is True)
                    else jnp.logical_and(blk_full, seg_full))

    @pl.when(init_pred)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        if not aug_width:
            l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    def _compute():
        sub_k = block_k // kv_splits
        sub_q = block_q // q_splits
        # Sub-tile enumeration: (q_part, kv_part) pairs. Distinct q_parts
        # are fully independent online-softmax chains (disjoint m/l/acc
        # rows), so Mosaic can overlap one part's VPU softmax with the next
        # part's MXU dot even when kv_splits == 1 (square causal tiles).
        parts = [(qp, kp) for kp in range(kv_splits)
                 for qp in range(q_splits)]
        # f32 inputs: the MXU demotes f32 dot operands to bf16 by default —
        # request full f32 (bf16x-pass) matmuls so the f32 path is actually
        # f32 (measured: default f32 maxdiff vs oracle was bf16-level 7e-3).
        prec = (jax.lax.Precision.HIGHEST
                if q_ref.dtype == jnp.float32 else None)
        v = v_ref[0, 0]
        mm_dtype = q_ref.dtype if v.dtype in (
            jnp.int8.dtype, jnp.float8_e4m3fn.dtype) else v.dtype
        if aug_width:
            # Ones-augmented V (enabled when the padded head dim is not a
            # multiple of 128): the MXU output is produced in 128-lane
            # chunks, so lanes [D, D+aug) of the PV matmul are free — fill
            # them with ones and P·[V|1] accumulates rowsum(P) (the online-
            # softmax l statistic) at zero cost; the per-part VPU l update
            # (rowsum + fma on (bq,128)) disappears entirely.
            v_full = jnp.concatenate(
                [v, jnp.ones((block_k, aug_width), v.dtype)], axis=1)
        else:
            v_full = v

        def qk_dot(qp, kp):
            # The softmax scale (×log2 e) is folded into Q by the host
            # wrapper — one fused pass instead of a per-step (bq, bk)
            # scaling here (the reference folds the scale the same way,
            # kernel_fp16.cu:827).
            q = q_ref[0, 0, qp * sub_q:(qp + 1) * sub_q, :]
            k = k_ref[0, 0, kp * sub_k:(kp + 1) * sub_k, :]
            if k.dtype in (jnp.int8.dtype, jnp.float8_e4m3fn.dtype):
                k = k.astype(q.dtype)
            return jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            )

        def part_mask(qp, kp):
            """Mask for one sub-tile: scalar-threshold compares on a
            (col − row) delta matrix. NOTE: iotas are deliberately built
            per sub-tile — sharing one delta matrix across sub-tiles
            measured 84 vs 97 TFLOP/s (the long-lived value disrupts
            Mosaic's dot/softmax interleaving)."""
            col_l = jax.lax.broadcasted_iota(
                jnp.int32, (sub_q, sub_k), 1)
            dmat = col_l - jax.lax.broadcasted_iota(
                jnp.int32, (sub_q, sub_k), 0)
            col0 = kv_tile * block_k + kp * sub_k
            row0 = q_tile * block_q + qp * sub_q
            off = col0 + kv_off - (row0 + q_off)
            mask = None
            if causal:
                mask = jnp_and(mask, dmat <= -off)
            if wl >= 0:
                mask = jnp_and(mask, dmat >= -wl - off)
            if wr >= 0 and not causal:
                mask = jnp_and(mask, dmat <= wr - off)
            if need_tail_mask:
                mask = jnp_and(mask, col_l < kv_valid_len - col0)
            if has_seg:
                # Packed-sequence masking: pair (i, j) attends iff
                # seg_q[i] == seg_kv[j]. q ids are lane-replicated
                # (block_q, NUM_LANES) tiles, kv ids sublane-replicated
                # (NUM_SUBLANES, block_k) — the Mosaic-friendly int32
                # tilings; tile-and-compare instead of slice-to-1-lane
                # broadcasts.
                sq = seg_q_ref[0, qp * sub_q:(qp + 1) * sub_q, :]
                if sub_k != NUM_LANES:
                    sq = jnp.tile(sq, (1, sub_k // NUM_LANES))
                skv = seg_kv_ref[0, :1, kp * sub_k:(kp + 1) * sub_k]
                mask = jnp_and(mask, sq == skv)
            return mask

        def update(rows, cols, s, mask):
            if k_scale_ref is not None:
                # Quantized K: per-token dequant folded as a *column*
                # scaling of the scores, s_j·(q·k_j) = q·(s_j k_j) —
                # lane-aligned, so the int8/fp8 payload never round-trips
                # VMEM dequantized.
                s *= k_scale_ref[0, 0, 0, cols][None, :]
            if softcap is not None:
                # Gemma-2-style logit soft-capping. With softcap the host
                # folds NOTHING into Q (a bf16 re-round of scaled Q costs
                # ~2× gradient error); ``scale`` rides inside the tanh
                # argument in f32 — same op count, and the capped logits
                # match the backward recompute exactly. Bias stays after
                # the cap (the HF Gemma-2 convention).
                cap, sc = softcap
                s = (cap * LOG2E) * jnp.tanh(s * (sc / cap))
            if bias_ref is not None:
                s += bias_ref[0, 0, rows, cols].astype(jnp.float32) * LOG2E
            if mask is not None:
                s = jnp.where(mask, s, mask_value)

            m_prev = m_scr[rows]                             # (sub_q, 128)
            m_cur = jnp.max(s, axis=1, keepdims=True)        # (sub_q, 1)
            m_next = jnp.maximum(m_prev, m_cur)              # (sub_q, 128)
            alpha = jnp.exp2(m_prev - m_next)
            if aug_width and mm_dtype == jnp.bfloat16.dtype:
                # bf16 exp2: P is consumed by the MXU in bf16 anyway, and
                # with the ones-augmented V the l statistic accumulates in
                # the f32 MXU accumulator, so no f32 precision is lost
                # where it matters. Halves the dominant VPU op at D=64.
                p = jnp.exp2((s - m_next[:, :1]).astype(jnp.bfloat16))
            else:
                p = jnp.exp2(s - m_next[:, :1])              # (sub_q, sub_k)
            m_scr[rows] = m_next
            if not aug_width:
                l_scr[rows] = alpha * l_scr[rows] + jnp.sum(
                    p, axis=1, keepdims=True)

            acc_scr[rows] *= alpha[:, :1]
            if v_scale_ref is not None:
                # Quantized V: P @ diag(s_v) @ V == (P ∘ s_v[None,:]) @ V.
                p2 = p * v_scale_ref[0, 0, 0, cols][None, :]
            else:
                p2 = p
            acc_scr[rows] += jax.lax.dot(
                p2.astype(mm_dtype), v_full[cols, :].astype(mm_dtype),
                preferred_element_type=jnp.float32, precision=prec,
            )

        def slices(qp, kp):
            return (slice(qp * sub_q, (qp + 1) * sub_q),
                    slice(kp * sub_k, (kp + 1) * sub_k))

        def fast_block():
            # No masks in this block: issue ALL sub-tile QK^T dots up front —
            # each is independent of the other sub-tiles' softmax, so Mosaic
            # overlaps sub-tile i+1's QK^T (MXU) with sub-tile i's softmax
            # (VPU): 141 -> 164 TFLOP/s at D=128 on v5e.
            s_parts = {pt: qk_dot(*pt) for pt in parts}
            for pt in parts:
                update(*slices(*pt), s_parts[pt], mask=None)

        def edge_block():
            # Branch-free edge blocks: pre-issued dots, every sub-tile
            # masked (cheap delta-matrix mask). Per-sub-tile predication
            # was measured WORSE (r2: 90 vs 97 TFLOP/s — branch regions
            # defeat Mosaic's MXU/VPU interleaving more than the skipped
            # work saves).
            s_parts = {pt: qk_dot(*pt) for pt in parts}
            for pt in parts:
                update(*slices(*pt), s_parts[pt], part_mask(*pt))

        def tri_block():
            # Triangular diagonal block (tri_edge launches only: flat causal
            # grid, square blocks, equal static offsets — every non-full
            # live pair then sits exactly ON the diagonal, row0 == col0).
            # Chunk qp's live columns are exactly [0, (qp+1)*sub_q): issue a
            # statically-narrower QK^T + PV pair per chunk instead of the
            # full-width dot-then-mask (at q_splits=4 that is 62.5% of the
            # square block's MXU work; the reference masks the full tile,
            # kernel_fp16.cu:396-411). Shapes are static per chunk — no
            # predication, per the round-2 "branch regions defeat Mosaic
            # interleaving" finding.
            s_parts = {}
            for qp in range(q_splits):
                w = (qp + 1) * sub_q
                qc = q_ref[0, 0, qp * sub_q:(qp + 1) * sub_q, :]
                kc = k_ref[0, 0, :w, :]
                if kc.dtype in (jnp.int8.dtype, jnp.float8_e4m3fn.dtype):
                    kc = kc.astype(qc.dtype)
                s_parts[qp] = jax.lax.dot_general(
                    qc, kc, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=prec)
            for qp in range(q_splits):
                w = (qp + 1) * sub_q
                dmat = (jax.lax.broadcasted_iota(jnp.int32, (sub_q, w), 1)
                        - jax.lax.broadcasted_iota(jnp.int32, (sub_q, w), 0))
                update(slice(qp * sub_q, (qp + 1) * sub_q), slice(0, w),
                       s_parts[qp], dmat <= qp * sub_q)

        if not masking:
            fast_block()
        elif has_seg:
            # blk_full here folds in the host-side seg_full flag, so
            # intra-document interior blocks keep the fast path; boundary
            # blocks take the branch-free masked path (part_mask includes
            # the id compare). tri_block is causal-only and unsound under
            # runtime segment boundaries.
            pl.when(blk_full)(fast_block)
            pl.when(jnp.logical_not(blk_full))(edge_block)
        else:
            pl.when(blk_full)(fast_block)
            pl.when(jnp.logical_not(blk_full))(
                tri_block if tri_edge else edge_block)

    if should_run is True:
        _compute()
    else:
        pl.when(should_run)(_compute)

    @pl.when(store_pred)
    def _store():
        # Dead rows — a q row with NO unmasked kv position (padding segment,
        # window out of reach at Nq > Nk, ring chunk above the diagonal) —
        # see only mask_value scores, so p = exp2(0) = 1 accumulates garbage
        # mean-of-V: zero them at store (the package-wide convention, shared
        # with the oracle). The row is dead iff its running max never rose
        # above the mask level. (The backward needs no analogue: its
        # p = exp(mask_value − LN2·mask_value·…) underflows to exactly 0 for
        # dead rows via the stored LSE.)
        if masking:
            dead = m_scr[:, :1] <= mask_value * 0.5

            def deaden(x):
                return jnp.where(dead, 0.0, x)

            def fix_lse(lse_val):
                # A row whose every block was seg-skipped has m = -inf and
                # would store lse = -inf, which the backward turns into
                # p = exp(mask_value + inf) = inf. Emit the same finite
                # very-negative LSE an all-masked (non-skipped) row
                # produces — the backward then underflows p to exact 0 and
                # the ring merge treats it as -inf through logaddexp.
                return jnp.where(dead, LN2 * mask_value, lse_val)
        else:
            def deaden(x):
                return x

            def fix_lse(lse_val):
                return lse_val
        if aug_width:
            lcol = acc_scr[:, head_dim:]       # lane-replicated rowsum(P)
            l_safe = jnp.where(lcol == 0.0, 1.0, lcol)[:, :1]   # (bq, 1)
            o_ref[0, 0] = deaden(acc_scr[:, :head_dim] * (1.0 / l_safe)
                                 ).astype(o_ref.dtype)
            if lse_ref is not None:
                # m is in log2 units; emit natural-log LSE (the bwd contract)
                lse_ref[0, 0] = fix_lse(
                    m_scr[...] * LN2 + jnp.log(l_safe))
        else:
            l = l_scr[...]
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0] = deaden(acc_scr[...] * (1.0 / l_safe[:, :1])
                                 ).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[0, 0] = fix_lse(
                    m_scr[...] * LN2 + jnp.log(l_safe))


def band_chunk(rf, rl, c0, width, *, causal, wl, wr, kv_valid_len):
    """Trace-time band geometry for one (row-range, col-tile) cell.

    For rows ``[rf, rl]`` and the KV columns ``[c0, c0+width)``, returns
    ``(c0e, w, up, lo, cb)`` — the lane-aligned narrowed column range plus
    the mask offsets the narrowed tile still violates (``up``: dmat <= up
    causal/right edge, ``lo``: dmat >= lo window left edge, ``cb``: local
    padded-KV-tail bound) — or ``None`` if the cell is entirely dead.
    Shared by the resident forward and fused backward kernels.
    """
    c1 = c0 + width - 1
    if c0 >= kv_valid_len:
        return None
    if causal and c0 > rl:
        return None
    if not causal and wr >= 0 and c0 > rl + wr:
        return None
    if wl >= 0 and c1 < rf - wl:
        return None
    lo_cols = 0
    if wl >= 0 and c0 < rf - wl:
        lo_cols = ((rf - wl) - c0) // NUM_LANES * NUM_LANES
    hi_cols = width
    if causal and c1 > rl:
        hi_cols = -((rl + 1 - c0) // -NUM_LANES) * NUM_LANES
    elif wr >= 0 and c1 > rl + wr:
        hi_cols = -((rl + wr + 1 - c0) // -NUM_LANES) * NUM_LANES
    c0e = c0 + lo_cols
    w = hi_cols - lo_cols
    if w <= 0:
        return None
    c1e = c0e + w - 1
    up = None
    if causal and c1e > rf:
        up = rf - c0e
    elif not causal and wr >= 0 and c1e > rf + wr:
        up = rf - c0e + wr
    lo = None
    if wl >= 0 and c0e < rl - wl:
        lo = rf - c0e - wl
    cb = kv_valid_len - c0e if c1e >= kv_valid_len else None
    return (c0e, w, up, lo, cb)


def _fwd_causal_resident_kernel(
    q_ref,     # VMEM (1, 1, N, D) — whole (padded) sequence resident
    k_ref,     # VMEM (1, 1, N, D)
    v_ref,     # VMEM (1, 1, N, D)
    o_ref,     # VMEM (1, 1, N, D)
    lse_ref,   # VMEM (1, 1, N, NUM_LANES) or None
    *,
    n: int,
    sub_q: int,
    sub_k: int,
    head_dim: int,
    aug_width: int,
    mask_value: float,
    kv_valid_len: int,
    causal: bool = True,
    window: tuple[int, int] | None = None,
    lookahead: int | None = None,
    softcap: float | None = None,
    n_rows: int | None = None,
    row_off: int = 0,
    col_off: int = 0,
):
    """Whole-sequence static-band forward (causal / sliding window / local
    window), one grid step per (batch, head).

    With ``n_rows``/``row_off`` the kernel serves one macro row-chunk of a
    longer sequence (the macro-resident launcher below): ``q_ref`` holds
    ``n_rows`` rows whose global positions start at ``row_off``, while
    ``k_ref``/``v_ref`` hold the ``n`` KV rows visible to this chunk,
    starting at global column ``col_off`` (non-zero for windowed macro slabs,
    whose visible band starts left of the slab but far right of column 0).
    The band geometry is computed in global coordinates; k/v indexing and
    outputs are local.

    The flat-grid causal kernel (above) pays a pipeline bubble per q-row
    transition (init + store + un-overlapped DMA): measured ~1.5 µs × Tq rows
    on v5e, which is why causal sat at ~120 TFLOP/s equal-work at N=4096
    while N=8192 (longer rows) reached 136.  Here the entire causal tile
    structure is STATIC: Q/K/V for one head stay resident in VMEM, the
    (q_chunk × kv_tile) pairs are enumerated at trace time (skips below the
    diagonal cost nothing, partial tiles issue statically-narrower dots),
    and the online-softmax state is plain dataflow values per chain — no
    scratch round-trips, no branches, nothing for Mosaic to predicate.
    Role-parity: the reference's whole-row workgroup loop
    (kernel_fp16.cu:381-508) with the mask work deleted at compile time.
    """
    prec = (jax.lax.Precision.HIGHEST
            if q_ref.dtype == jnp.float32 else None)
    mm_dtype = q_ref.dtype
    if n_rows is None:
        n_rows = n
    v = v_ref[0, 0]
    if aug_width:
        v_full = jnp.concatenate(
            [v, jnp.ones((n, aug_width), v.dtype)], axis=1)
    else:
        v_full = v

    n_chains = n_rows // sub_q

    wl, wr = window if window is not None else (-1, -1)

    def chain_tiles(qp):
        """Static (col0, width, up|None, lo|None, col_bound|None) per chain.

        The whole band geometry is compile-time: tiles outside the
        causal/window band or past kv_valid_len are never emitted;
        band-straddling tiles are narrowed to lane-aligned width from both
        ends and carry only the mask offsets they actually violate
        (``up``: dmat <= up for causal / right edge; ``lo``: dmat >= lo for
        the sliding-window left edge; ``col_bound``: padded-KV tail).
        Rows with every tile dead keep (m=-inf, l=0) and the l==0 epilogue
        guard stores zeros (matches the flat grid's dead-tile convention).
        """
        rf = row_off + qp * sub_q
        rl = rf + sub_q - 1
        tiles = []
        for kp in range(n // sub_k):
            c0 = col_off + kp * sub_k   # global column of this kv tile
            if c0 >= kv_valid_len or (causal and c0 > rl) or (
                    not causal and wr >= 0 and c0 > rl + wr):
                break  # past the band's right edge / valid KV
            t = band_chunk(rf, rl, c0, sub_k, causal=causal, wl=wl, wr=wr,
                           kv_valid_len=kv_valid_len)
            if t is not None:
                # store the narrowed column range in LOCAL k_ref coordinates
                c0e, w, up, lo, cb = t
                tiles.append((c0e - col_off, w, up, lo, cb))
        return tiles

    tiles = [chain_tiles(qp) for qp in range(n_chains)]
    max_rounds = max(len(t) for t in tiles)

    # state[qp] = (m, l, acc) values — pure dataflow, no scratch refs.
    state = {}
    for qp in range(n_chains):
        state[qp] = (
            jnp.full((sub_q, NUM_LANES), -jnp.inf, jnp.float32),
            jnp.zeros((sub_q, NUM_LANES), jnp.float32),
            jnp.zeros((sub_q, head_dim + aug_width), jnp.float32),
        )

    def qk_dot(qp, col0, w):
        qc = q_ref[0, 0, qp * sub_q:(qp + 1) * sub_q, :]
        kc = k_ref[0, 0, col0:col0 + w, :]
        return jax.lax.dot_general(
            qc, kc, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    def update(st, s, col0, w, up, lo, cb):
        m_prev, l_prev, acc = st
        if softcap is not None:
            # raw q·k (host folds nothing with softcap — see the flat
            # kernel's note); scale folds into the tanh argument.
            cap, sc = softcap
            s = (cap * LOG2E) * jnp.tanh(s * (sc / cap))
        mask = None
        if up is not None or lo is not None:
            dmat = (jax.lax.broadcasted_iota(jnp.int32, (sub_q, w), 1)
                    - jax.lax.broadcasted_iota(jnp.int32, (sub_q, w), 0))
            if up is not None:
                mask = dmat <= up
            if lo is not None:
                lom = dmat >= lo
                mask = lom if mask is None else mask & lom
        if cb is not None:
            ci = jax.lax.broadcasted_iota(jnp.int32, (sub_q, w), 1)
            cbm = ci < cb
            mask = cbm if mask is None else mask & cbm
        if mask is not None:
            s = jnp.where(mask, s, mask_value)
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_next)
        if aug_width and mm_dtype == jnp.bfloat16.dtype:
            p = jnp.exp2((s - m_next[:, :1]).astype(jnp.bfloat16))
        else:
            p = jnp.exp2(s - m_next[:, :1])
        l_next = (l_prev if aug_width
                  else alpha * l_prev + jnp.sum(p, axis=1, keepdims=True))
        acc = acc * alpha[:, :1] + jax.lax.dot(
            p.astype(mm_dtype), v_full[col0:col0 + w, :].astype(mm_dtype),
            preferred_element_type=jnp.float32, precision=prec)
        return (m_next, l_next, acc)

    # Round-major schedule: within a round every chain's QK^T is issued
    # before any chain's softmax/PV — the independent dots fill the MXU
    # while earlier chains run their VPU softmax (the fast_block pattern).
    # ``lookahead`` bounds how many dots are in flight instead of a full
    # round: at N=8192 a full 16-chain round held 64 MB of f32 score tiles
    # live, which is precisely the register/VMEM spill that killed the
    # round-1 big-N experiment. A sliding window of L issued-but-unconsumed
    # dots keeps the MXU/VPU overlap with O(L) live score memory.
    order = [(r, qp) for r in range(max_rounds)
             for qp in range(n_chains) if r < len(tiles[qp])]
    if lookahead is None:
        for r in range(max_rounds):
            live = [qp for qp in range(n_chains) if r < len(tiles[qp])]
            s_parts = {qp: qk_dot(qp, *tiles[qp][r][:2]) for qp in live}
            for qp in live:
                col0, w, up, lo, cb = tiles[qp][r]
                state[qp] = update(state[qp], s_parts[qp],
                                   col0, w, up, lo, cb)
    else:
        pending = {}
        for idx in range(min(lookahead, len(order))):
            r, qp = order[idx]
            pending[idx] = qk_dot(qp, *tiles[qp][r][:2])
        for idx, (r, qp) in enumerate(order):
            nxt = idx + lookahead
            if nxt < len(order):
                nr, nqp = order[nxt]
                pending[nxt] = qk_dot(nqp, *tiles[nqp][nr][:2])
            col0, w, up, lo, cb = tiles[qp][r]
            state[qp] = update(state[qp], pending.pop(idx),
                               col0, w, up, lo, cb)

    for qp in range(n_chains):
        m, l, acc = state[qp]
        rows = slice(qp * sub_q, (qp + 1) * sub_q)
        # Dead rows (window out of reach / past the valid KV tail within a
        # live chain): running max never rose above the mask level — store
        # zeros and the finite very-negative LSE, the package convention
        # (matches the flat kernel's store and the oracle).
        dead = m[:, :1] <= mask_value * 0.5
        if aug_width:
            lcol = acc[:, head_dim:]
            l_safe = jnp.where(lcol == 0.0, 1.0, lcol)[:, :1]
            o_ref[0, 0, rows, :] = jnp.where(
                dead, 0.0, acc[:, :head_dim] * (1.0 / l_safe)
            ).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[0, 0, rows, :] = jnp.where(
                    dead, LN2 * mask_value, m * LN2 + jnp.log(l_safe))
        else:
            l_safe = jnp.where(l == 0.0, 1.0, l)
            o_ref[0, 0, rows, :] = jnp.where(
                dead, 0.0, acc * (1.0 / l_safe[:, :1])
            ).astype(o_ref.dtype)
            if lse_ref is not None:
                lse_ref[0, 0, rows, :] = jnp.where(
                    dead, LN2 * mask_value, m * LN2 + jnp.log(l_safe))


# Whole-sequence budget for the resident-causal path: Mosaic's stack
# allocation for the fully-unrolled band grows ~O(N²) regardless of the
# bounded lookahead (measured r3: ~110 MB scoped at N=8192 whether the
# pending budget is 8 or 48 MB — the allocator does not free consumed
# score tiles), so N=8192 cannot compile at H>1 (double-buffered seq
# blocks). N=6144 fits (137.6 TF); 8192 uses the flat grid (132.9 TF fwd,
# 149 TF fwd+bwd with the 2048² fused bwd).
_RESIDENT_CAUSAL_MAX_N = int(os.environ.get("FLASHATTN_TPU_RC_MAXN", 6144))
# Chain geometry (r3 tuning matrices, median-of-5, causal N=4096 D=128):
# 256-row chains × 2048-wide kv tiles measured 152.4 TFLOP/s vs 142.4 at
# (512, 2048) and 127 at (1024, 2048); at N=5120 256-row chains give 146.6
# vs 140.7. N=6144 regresses with 24 chains (122 vs 137.6) — 512-row
# chains there. Liveness past 4096 is bounded by the VMEM-budgeted
# lookahead below, not by widening the chains (wider chains quadruple the
# pending f32 score-tile size — the N=8192 scoped-VMEM OOM).
# Both knobs are env-overridable for on-chip tuning sweeps.
_RC_SUB_Q = os.environ.get("FLASHATTN_TPU_RC_SUBQ")
_RC_SUB_K = int(os.environ.get("FLASHATTN_TPU_RC_SUBK", 2048))
# Chain-granular padding unit for resident-eligible unaligned shapes
# (flash.py pads near-square causal shapes to this, not the flat block).
_RC_CHAIN_PAD = int(_RC_SUB_Q) if _RC_SUB_Q else 512
# Scoped-VMEM budget for issued-but-unconsumed f32 score tiles (the
# dominant live term of the bounded-lookahead schedule). The kernel's other
# residents (chain state ~0.75 MB/chain, the f32 LSE block when the
# backward needs residuals, Mosaic's own temporaries) must fit in the rest
# of the 100 MB scoped limit — 32 MB measured 100.11M total at N=8192
# with return_lse (OOM by 108 KB); 24 MB clears it with margin.
_RC_PENDING_BUDGET = int(os.environ.get(
    "FLASHATTN_TPU_RC_PENDING_MB", 24)) * 1024 * 1024


def _rc_geometry(Nqp, D=None):
    # Largest lane-aligned widths <= the defaults that divide the padded
    # sequence — N = 2560/3072/5120/7168 would otherwise fall off the
    # resident route only because 2048 doesn't divide them.
    # 128 < D <= 192 (the lane-padded D=160 class): 128-row chains measured
    # 66.0 vs 59.2 TF at causal N=4096 D=160 (r4 — the fat padded rows make
    # 256-row score tiles VMEM-heavy, and shorter chains interleave better).
    if D is not None and 128 < D <= 192 and not _RC_SUB_Q:
        sub_q_pref = 128
    else:
        sub_q_pref = (int(_RC_SUB_Q) if _RC_SUB_Q
                      else (256 if Nqp <= 5120 else 512))
    sub_q = min(sub_q_pref, Nqp)
    while sub_q > NUM_LANES and (Nqp % sub_q or sub_q % NUM_LANES):
        sub_q -= NUM_LANES
    sub_k = min(_RC_SUB_K, Nqp)
    while sub_k > NUM_LANES and (Nqp % sub_k or sub_k % NUM_LANES):
        sub_k -= NUM_LANES
    return sub_q, sub_k


def _rc_lookahead(Nqp, sub_q, sub_k):
    """Default in-flight dot bound: None (full round-major, measured fastest
    and kept bit-identical) up to 4096 rows; above that, as many pending
    f32 score tiles as the budget allows, floor 2 (below 2 there is no
    MXU/VPU overlap left)."""
    la_env = os.environ.get("FLASHATTN_TPU_RC_LOOKAHEAD")
    if la_env:
        return int(la_env)
    if Nqp <= 4096:
        return None
    return max(2, _RC_PENDING_BUDGET // (sub_q * sub_k * 4))


# Macro-resident path (causal N past _RESIDENT_CAUSAL_MAX_N): row-chunk the
# sequence into static macro slabs, one resident-kernel launch per slab.
# Each launch keeps the slab's visible KV prefix VMEM-resident and unrolls
# the slab's band statically (same kernel as the resident route, with a
# static row offset), so Mosaic's non-recycling score-tile stack is bounded
# by macro·N_visible instead of N² — N=8192+ compiles where the
# whole-sequence resident kernel cannot. Unlike the hierarchical
# decomposition (flash._fwd_causal_decomposed: measured 126 TF at N=8192 —
# merge + slice copies cost ~0.6 ms), every output row is computed exactly
# once: no partial merge, no Q/K/V slice copies (static BlockSpec offsets),
# only one output concatenate.
_MACRO_ROWS_ENV = os.environ.get("FLASHATTN_TPU_MACRO_ROWS")
# Per-slab retained f32 score bound (macro · N_kv · 4B): 32 MB measured
# safe alongside the double-buffered KV prefix blocks.
_MACRO_SCORE_BUDGET = 32 * 1024 * 1024


_MACRO_ALIGN = 256  # slab KV column offsets: sublane-safe for every dtype


def _macro_band_w(m, Nkp, *, causal=True, window=None):
    """Worst-case visible KV width of one macro slab of ``m`` rows."""
    wl, wr = window if window is not None else (-1, -1)
    right = (0 if causal else wr) if (causal or wr >= 0) else None
    if wl < 0 and right is None:
        return Nkp           # no band at all (shouldn't be routed here)
    left = wl if wl >= 0 else None
    w = m
    w += (left + _MACRO_ALIGN) if left is not None else Nkp - m
    w += (right + _MACRO_ALIGN) if right is not None else Nkp - m
    return min(Nkp, w)


def _macro_rows(Nqp, Nkp, *, causal=True, window=None):
    """Largest macro slab height (multiple of 512 dividing Nqp) whose
    retained score tiles fit the budget; 0 if none. For windowed bands the
    retained width is the slab's visible band, not the whole prefix."""
    if _MACRO_ROWS_ENV is not None:
        m = int(_MACRO_ROWS_ENV)
        return m if m and Nqp % m == 0 else 0
    m = 1024
    while m >= 512 and (
            Nqp % m
            or m * _macro_band_w(m, Nkp, causal=causal, window=window) * 4
            > _MACRO_SCORE_BUDGET):
        m -= 512
    return max(m, 0)


def use_macro_resident(*, causal, window, need_tail_mask, bias, k_scale,
                       v_scale, static_offsets, Nqp, Nkp, seg=None):
    del need_tail_mask  # handled by band_chunk's per-call kv bound
    banded = causal or (
        window is not None and (window[0] >= 0 or window[1] >= 0))
    return (
        banded
        and bias is None and k_scale is None and v_scale is None
        and seg is None
        and static_offsets is not None
        and static_offsets[0] == static_offsets[1]
        and Nqp == Nkp and Nqp > _RESIDENT_CAUSAL_MAX_N
        # ≥2 slabs: one slab would be the resident kernel past its ceiling
        and 0 < _macro_rows(Nqp, Nkp, causal=causal, window=window) < Nqp
        and os.environ.get("FLASHATTN_TPU_MACRO", "1") == "1"
    )


def fwd_macro_padded(
    q, k, v, *, scale, kv_valid_len, return_lse, num_heads_q,
    interpret=None, softcap=None, causal=True,
    window: tuple[int, int] | None = None,
):
    """Banded forward past the resident ceiling (causal, causal+window, or
    pure sliding window): one resident-kernel launch per macro row slab,
    each holding only the slab's VISIBLE KV band in VMEM, static band
    geometry per launch.

    Windowed slabs start mid-sequence, so their KV band begins at a column
    offset that is no multiple of the band width — fetched with an
    Element-indexed BlockSpec (per-element static offsets; validated on
    v5e, r4). Under interpret mode (CPU tests) the band is host-sliced
    instead — Element indexing has no interpreter path.

    Role-parity: the reference sweeps causal to N=7168 through one kernel
    (bench_with_sdpa.py:201-224); here long context is a routing tier that
    keeps every slab on resident-kernel rates, and windowed cost scales
    with the band area in wall-clock, not just FLOPs.
    """
    if interpret is None:
        interpret = platform.pallas_interpret_default()
    if softcap is not None:
        softcap = (softcap, scale)
    else:
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    B, Hq, Nqp, D = q.shape
    _, Hkv, Nkp, _ = k.shape
    q_hd_ratio = Hq // Hkv
    aug_width = (128 - D % 128) if D % 128 != 0 else 0
    macro = _macro_rows(Nqp, Nkp, causal=causal, window=window)
    assert macro > 0 and Nqp == Nkp
    wl, wr = window if window is not None else (-1, -1)
    wr_eff = (0 if causal else wr) if (causal or wr >= 0) else None

    sub_q = 256 if macro % 256 == 0 else NUM_LANES
    o_parts, lse_parts = [], []
    for p in range(Nqp // macro):
        row_off = p * macro
        if wr_eff is not None:
            vis_end = min(Nkp, -((row_off + macro + wr_eff) // -_MACRO_ALIGN)
                          * _MACRO_ALIGN)
        else:
            vis_end = Nkp
        col_off = (max(0, (row_off - wl) // _MACRO_ALIGN * _MACRO_ALIGN)
                   if wl >= 0 else 0)
        band_w = vis_end - col_off
        sub_k = band_w
        while sub_k > NUM_LANES and (band_w % sub_k or sub_k % NUM_LANES
                                     or sub_k > 2048):
            sub_k -= NUM_LANES
        kernel = functools.partial(
            _fwd_causal_resident_kernel,
            n=band_w, sub_q=sub_q, sub_k=sub_k, head_dim=D,
            aug_width=aug_width, mask_value=DEFAULT_MASK_VALUE,
            kv_valid_len=min(kv_valid_len, vis_end), causal=causal,
            window=window, lookahead=None, softcap=softcap,
            n_rows=macro, row_off=row_off, col_off=col_off)
        out_shapes = [jax.ShapeDtypeStruct((B, Hq, macro, D), q.dtype)]
        out_specs = [pl.BlockSpec((1, 1, macro, D), lambda b, h: (b, h, 0, 0),
                                  memory_space=pltpu.VMEM)]
        if return_lse:
            out_shapes.append(
                jax.ShapeDtypeStruct((B, Hq, macro, NUM_LANES), jnp.float32))
            out_specs.append(
                pl.BlockSpec((1, 1, macro, NUM_LANES),
                             lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM))

        def rc_entry(qr, kr, vr, *outs, _kernel=kernel):
            _kernel(qr, kr, vr, outs[0], outs[1] if return_lse else None)

        if causal:
            live_cells = macro * (row_off - col_off) + macro * macro // 2
        else:
            live_cells = macro * band_w
        cost = pl.CostEstimate(
            flops=int(4 * D * live_cells * B * Hq),
            bytes_accessed=int(
                (macro * D * 2 + band_w * D * 2) * B * Hq
                * q.dtype.itemsize),
            transcendentals=int(B * Hq * live_cells),
        )
        if col_off == 0:
            kv_spec = pl.BlockSpec(
                (1, 1, band_w, D), lambda b, h: (b, h // q_hd_ratio, 0, 0),
                memory_space=pltpu.VMEM)
            k_in, v_in = k, v
        elif interpret:
            # Interpreter has no Element indexing: host-slice the band.
            kv_spec = pl.BlockSpec(
                (1, 1, band_w, D), lambda b, h: (b, h // q_hd_ratio, 0, 0),
                memory_space=pltpu.VMEM)
            k_in = jax.lax.slice_in_dim(k, col_off, vis_end, axis=2)
            v_in = jax.lax.slice_in_dim(v, col_off, vis_end, axis=2)
        else:
            from jax._src.pallas import core as pl_core

            kv_spec = pl.BlockSpec(
                (pl_core.Element(1), pl_core.Element(1),
                 pl_core.Element(band_w), pl_core.Element(D)),
                lambda b, h, _c=col_off: (b, h // q_hd_ratio, _c, 0),
                memory_space=pltpu.VMEM)
            k_in, v_in = k, v
        outs = pl.pallas_call(
            rc_entry,
            grid=(B, Hq),
            in_specs=[
                pl.BlockSpec((1, 1, macro, D),
                             lambda b, h, _p=p: (b, h, _p, 0),
                             memory_space=pltpu.VMEM),
                kv_spec,
                kv_spec,
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(q, k_in, v_in)
        o_parts.append(outs[0])
        if return_lse:
            lse_parts.append(outs[1][..., 0])
    o = jnp.concatenate(o_parts, axis=2)
    lse = jnp.concatenate(lse_parts, axis=2) if return_lse else None
    return o, lse


# Backward-compat alias (r3 name; spot scripts / NOTES reference it).
fwd_causal_macro_padded = fwd_macro_padded


def _use_resident_causal(*, causal, window, need_tail_mask, bias, k_scale,
                         v_scale, static_offsets, Nqp, Nkp, D, sub_q, sub_k,
                         seg=None):
    # Any static band qualifies: causal, causal+sliding-window, or pure
    # local window — the band geometry and the padded-KV-tail bound
    # (kv_valid_len is static) are baked into the trace-time tile table.
    # Packed-sequence boundaries are runtime data, so segment calls stay on
    # the flat/dense grids.
    banded = causal or (
        window is not None and (window[0] >= 0 or window[1] >= 0))
    return (
        banded
        and bias is None and k_scale is None and v_scale is None
        and seg is None
        and static_offsets is not None
        and static_offsets[0] == static_offsets[1]
        and Nqp == Nkp and Nqp <= _RESIDENT_CAUSAL_MAX_N
        and Nqp % sub_k == 0 and Nqp % sub_q == 0
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "causal", "block_q", "block_k", "kv_valid_len",
        "return_lse", "interpret", "num_heads_q", "window", "static_offsets",
        "kv_splits", "q_splits", "softcap",
    ),
)
def fwd_padded(
    q: jax.Array,       # [B, Hq, Nq_pad, Dp] — Nq_pad % block_q == 0
    k: jax.Array,       # [B, Hkv, Nk_pad, Dp] — Nk_pad % block_k == 0
    v: jax.Array,       # [B, Hkv, Nk_pad, Dp]
    bias: jax.Array | None,   # [Bb, Hb, Nq_pad, Nk_pad] (Bb∈{1,B}, Hb∈{1,Hq})
    offsets: jax.Array,       # (2,) int32 [q_offset, kv_offset]
    k_scale: jax.Array | None = None,  # [B, Hkv, Nk_pad] f32 (quantized KV)
    v_scale: jax.Array | None = None,  # [B, Hkv, Nk_pad] f32
    seg_q: jax.Array | None = None,   # [B, Nq_pad, NUM_LANES] int32
    seg_kv: jax.Array | None = None,  # [B, NUM_SUBLANES, Nk_pad] int32
    seg_flags: jax.Array | None = None,  # [B, 2, Tq, Tk] int32 run/full
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    kv_valid_len: int,
    return_lse: bool,
    num_heads_q: int,
    interpret: bool | None = None,
    window: tuple[int, int] | None = None,
    static_offsets: tuple[int, int] | None = None,
    kv_splits: int | None = None,
    q_splits: int | None = None,
    softcap: float | None = None,
):
    """Launch the forward kernel on pre-padded, canonical-layout inputs.

    Host-side padding/slicing lives in :mod:`flashattn_tpu.ops.flash` (the
    role of forward_fp16's pad/slice prologue, kernel_fp16.cu:761-796).

    With ``static_offsets`` (compile-time q/kv offsets) and any masking
    (causal / window / padded KV tail), the launch uses the FLAT grid: only
    the (q_tile, kv_tile) pairs that contain unmasked work are enumerated
    (scalar-prefetch table), so cost scales with the unmasked area — for
    sliding windows that means with the window size, not Nk.
    """
    if interpret is None:
        interpret = platform.pallas_interpret_default()
    if kv_splits is None:
        # 1024-wide score sub-tiles measured best on v5e: with ≥2 sub-tiles
        # per block, sub-tile i+1's QK^T (MXU) overlaps sub-tile i's softmax
        # (VPU): 141 -> 164 TFLOP/s at D=128 (+16%). 512-wide sub-tiles were
        # measured WORSE for causal (67 vs 93 TFLOP/s: more predicated
        # regions ≫ the finer skip granularity). Env override for on-chip
        # tuning sweeps (spot_tune.py).
        kv_env = os.environ.get("FLASHATTN_TPU_KV_SPLITS")
        kv_splits = int(kv_env) if kv_env else max(1, block_k // 1024)
    if q_splits is None:
        # Square (1024, 1024) causal tiles have kv_splits == 1; splitting
        # the Q rows instead yields independent online-softmax chains whose
        # MXU dots and VPU softmaxes interleave (causal flat grid: 97 ->
        # 111 TFLOP/s going from q_splits 1 to 4, measured on v5e).
        q_env = os.environ.get("FLASHATTN_TPU_Q_SPLITS")
        q_splits = (int(q_env) if q_env
                    else (max(1, min(4, block_q // 256))
                          if kv_splits == 1 else 1))
    # User-supplied block sizes may not divide evenly into lane/sublane-
    # aligned sub-tiles (e.g. block_k=2176 -> sub_k=1088): fall back to
    # unsplit rather than mis-tile.
    if block_k % kv_splits or (block_k // kv_splits) % NUM_LANES:
        kv_splits = 1
    if block_q % q_splits or (block_q // q_splits) % 16:
        q_splits = 1
    # Fold the softmax scale (in the kernel's log2 domain) into Q: one
    # elementwise pass XLA-fuses into the surrounding graph, instead of a
    # (bq, bk) VPU pass per KV step inside the kernel. With softcap, Q is
    # NOT folded at all: re-rounding scale·Q to bf16 costs ~2× gradient
    # error through the tanh, so the kernel folds ``scale`` into the tanh
    # argument instead (free — it merges into the existing constant) and
    # applies ×log2 e after the cap. The kernels receive (cap, scale).
    if softcap is not None:
        softcap = (softcap, scale)
    else:
        q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    B, Hq, Nqp, D = q.shape
    _, Hkv, Nkp, _ = k.shape
    assert Nqp % block_q == 0 and Nkp % block_k == 0, (Nqp, block_q, Nkp, block_k)
    assert Hq == num_heads_q
    tq, tk = Nqp // block_q, Nkp // block_k
    q_hd_ratio = Hq // Hkv
    # Free-lane rowsum: only when the PV matmul has spare output lanes (the
    # MXU emits 128-lane chunks) and V is a plain float payload (quantized V
    # folds per-token scales into P, which would corrupt the ones-column sum).
    aug_width = (128 - D % 128) if (
        D % 128 != 0 and v_scale is None
        and v.dtype not in (jnp.int8.dtype, jnp.float8_e4m3fn.dtype)
    ) else 0

    need_tail_mask = kv_valid_len != Nkp
    masking = causal or window is not None or need_tail_mask
    flat = masking and static_offsets is not None
    # Triangular-diagonal fast path: sound only when every non-full live
    # pair is exactly diagonal (see tri_block) and the q chunks give
    # lane-aligned widths.
    tri_edge = bool(
        flat and causal and window is None and not need_tail_mask
        and block_q == block_k
        and static_offsets[0] == static_offsets[1]
        and kv_splits == 1 and q_splits >= 2
        and (block_q // q_splits) % NUM_LANES == 0)

    rc_sub_q, rc_sub_k = _rc_geometry(Nqp, D)
    if _use_resident_causal(
            causal=causal, window=window, need_tail_mask=need_tail_mask,
            bias=bias, k_scale=k_scale, v_scale=v_scale,
            static_offsets=static_offsets, Nqp=Nqp, Nkp=Nkp, D=D,
            sub_q=rc_sub_q, sub_k=rc_sub_k, seg=seg_q):
        n = Nqp
        lookahead = _rc_lookahead(Nqp, rc_sub_q, rc_sub_k)
        kernel = functools.partial(
            _fwd_causal_resident_kernel,
            n=n, sub_q=rc_sub_q, sub_k=rc_sub_k, head_dim=D,
            aug_width=aug_width, mask_value=DEFAULT_MASK_VALUE,
            kv_valid_len=kv_valid_len, causal=causal, window=window,
            lookahead=lookahead, softcap=softcap)
        out_shapes = [jax.ShapeDtypeStruct((B, Hq, n, D), q.dtype)]
        out_specs = [pl.BlockSpec((1, 1, n, D), lambda b, h: (b, h, 0, 0),
                                  memory_space=pltpu.VMEM)]
        if return_lse:
            out_shapes.append(
                jax.ShapeDtypeStruct((B, Hq, n, NUM_LANES), jnp.float32))
            out_specs.append(
                pl.BlockSpec((1, 1, n, NUM_LANES), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM))

        def rc_entry(*refs):
            qr, kr, vr = refs[0:3]
            o_r = refs[3]
            lse_r = refs[4] if return_lse else None
            kernel(qr, kr, vr, o_r, lse_r)

        if window is not None:
            band = (max(0, window[0]) + max(0, window[1])
                    + rc_sub_k)  # narrowed tile granularity
            live_cells = n * min(n, band)
        else:
            live_cells = n * n // 2 + n * rc_sub_q // 2
        cost = pl.CostEstimate(
            flops=int(4 * D * live_cells * B * Hq),
            bytes_accessed=(q.size + k.size + v.size + q.size)
            * q.dtype.itemsize,
            transcendentals=int(B * Hq * live_cells),
        )
        outs = pl.pallas_call(
            rc_entry,
            grid=(B, Hq),
            in_specs=[
                pl.BlockSpec((1, 1, n, D), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n, D),
                             lambda b, h: (b, h // q_hd_ratio, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, n, D),
                             lambda b, h: (b, h // q_hd_ratio, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shapes,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(q, k, v)
        o = outs[0]
        lse = outs[1][..., 0] if return_lse else None
        return o, lse
    if flat:
        tab = build_pair_table(
            tq, tk, block_q, block_k, causal=causal, window=window,
            q_off=static_offsets[0], kv_off=static_offsets[1],
            need_tail_mask=need_tail_mask, kv_valid_len=kv_valid_len)
        n_pairs = tab.shape[1]
        n_live = int(tab[TAB_LIVE].sum())
        grid = (B, Hq, n_pairs)

        def q_index(b, h, p, tab_ref):
            return (b, h, tab_ref[TAB_QI, p], 0)

        def kv_index(b, h, p, tab_ref):
            return (b, h // q_hd_ratio, tab_ref[TAB_KV, p], 0)
    else:
        grid = (B, Hq, tq, tk)
        n_live = None

        def q_index(b, h, i, j):
            return (b, h, i, 0)

        def kv_index(b, h, i, j):
            return (b, h // q_hd_ratio, j, 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offsets
        pl.BlockSpec((1, 1, block_q, D), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), kv_index, memory_space=pltpu.VMEM),
    ]
    args = [offsets.astype(jnp.int32), q, k, v]
    if bias is not None:
        Bb, Hb = bias.shape[0], bias.shape[1]
        if flat:
            def bias_index(b, h, p, tab_ref):
                return (b if Bb > 1 else 0, h if Hb > 1 else 0,
                        tab_ref[TAB_QI, p], tab_ref[TAB_KV, p])
        else:
            def bias_index(b, h, i, j):
                return (b if Bb > 1 else 0, h if Hb > 1 else 0, i, j)

        in_specs.append(
            pl.BlockSpec((1, 1, block_q, block_k), bias_index,
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)

    if flat:
        def scale_index(b, h, p, tab_ref):
            return (b, h // q_hd_ratio, 0, tab_ref[TAB_KV, p])
    else:
        def scale_index(b, h, i, j):
            return (b, h // q_hd_ratio, 0, j)

    for sc in (k_scale, v_scale):
        if sc is not None:
            # [B, Hkv, Nk] -> [B, Hkv, 1, Nk]: Mosaic needs the block's last
            # two dims (1, block_k) aligned to (sublane, lane) tiling.
            in_specs.append(
                pl.BlockSpec((1, 1, 1, block_k), scale_index,
                             memory_space=pltpu.VMEM)
            )
            args.append(sc[:, :, None, :])

    if seg_q is not None:
        if flat:
            def segq_index(b, h, p, tab_ref):
                return (b, tab_ref[TAB_QI, p], 0)

            def segkv_index(b, h, p, tab_ref):
                return (b, 0, tab_ref[TAB_KV, p])
        else:
            def segq_index(b, h, i, j):
                return (b, i, 0)

            def segkv_index(b, h, i, j):
                return (b, 0, j)
        in_specs.append(
            pl.BlockSpec((1, block_q, NUM_LANES), segq_index,
                         memory_space=pltpu.VMEM))
        in_specs.append(
            pl.BlockSpec((1, NUM_SUBLANES, block_k), segkv_index,
                         memory_space=pltpu.VMEM))
        # Per-block run/full flags, whole array in SMEM (like offsets):
        # indexed [b, flag, q_tile, kv_tile] inside the kernel.
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.extend([seg_q, seg_kv, seg_flags])

    out_shapes = [jax.ShapeDtypeStruct((B, Hq, Nqp, D), q.dtype)]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, D), q_index, memory_space=pltpu.VMEM)
    ]
    if return_lse:
        out_shapes.append(
            jax.ShapeDtypeStruct((B, Hq, Nqp, NUM_LANES), jnp.float32)
        )
        out_specs.append(
            pl.BlockSpec((1, 1, block_q, NUM_LANES), q_index,
                         memory_space=pltpu.VMEM)
        )

    # Pallas passes refs positionally; wrap to slot optional bias/scale/lse
    # refs by name.
    has_bias = bias is not None
    has_ks = k_scale is not None
    has_vs = v_scale is not None
    has_seg = seg_q is not None

    def kernel_entry(*refs):
        idx = 0
        if flat:
            tab_r = refs[idx]; idx += 1
        else:
            tab_r = None
        offs, qr, kr, vr = refs[idx:idx + 4]
        idx += 4
        bias_r = ks_r = vs_r = sq_r = skv_r = sf_r = None
        if has_bias:
            bias_r = refs[idx]; idx += 1
        if has_ks:
            ks_r = refs[idx]; idx += 1
        if has_vs:
            vs_r = refs[idx]; idx += 1
        if has_seg:
            sq_r, skv_r, sf_r = refs[idx:idx + 3]; idx += 3
        o_r = refs[idx]; idx += 1
        lse_r = refs[idx] if return_lse else None
        idx += 1 if return_lse else 0
        m_scr, l_scr, acc_scr = refs[idx:idx + 3]
        _fwd_kernel(
            tab_r, offs, qr, kr, vr, bias_r, ks_r, vs_r, sq_r, skv_r, sf_r,
            o_r, lse_r,
            m_scr, l_scr, acc_scr,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            num_kv_tiles=tk, kv_valid_len=kv_valid_len, kv_padded_len=Nkp,
            mask_value=DEFAULT_MASK_VALUE, window=window,
            static_offs=static_offsets, kv_splits=kv_splits,
            q_splits=q_splits, aug_width=aug_width, head_dim=D,
            tri_edge=tri_edge, softcap=softcap,
        )

    flops_per_prog = 4 * block_q * block_k * D  # QK^T + PV
    n_progs = (n_live if flat
               else tq * tk * (0.5 if (causal or window) else 1.0))
    cost = pl.CostEstimate(
        flops=int(flops_per_prog * B * Hq * n_progs),
        bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
        transcendentals=int(B * Hq * block_q * block_k * n_progs),
    )

    scratch_shapes = [
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
        pltpu.VMEM((block_q, D + aug_width), jnp.float32),
    ]
    compiler_params = pltpu.CompilerParams(
        dimension_semantics=(("parallel", "parallel", "arbitrary") if flat
                             else ("parallel", "parallel", "parallel",
                                   "arbitrary")),
        # default scoped-VMEM budget is 16 MB; v5e has 128 MB of VMEM —
        # raise the cap so (1024,1024) tiles fit alongside bias/dbias
        vmem_limit_bytes=100 * 1024 * 1024,
    )

    if flat:
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=scratch_shapes,
        )
        outs = pl.pallas_call(
            kernel_entry,
            grid_spec=grid_spec,
            out_shape=out_shapes,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(jnp.asarray(tab), *args)
    else:
        outs = pl.pallas_call(
            kernel_entry,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shapes,
            scratch_shapes=scratch_shapes,
            compiler_params=compiler_params,
            cost_estimate=cost,
            interpret=interpret,
        )(*args)

    o = outs[0]
    lse = outs[1][..., 0] if return_lse else None  # de-replicate lanes
    return o, lse
