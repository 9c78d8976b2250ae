"""Single-pass fused FlashAttention-2 backward (dQ + dK + dV in one kernel).

The reference computes all three gradients in one kernel but races on dQ
(cross-workgroup non-atomic accumulation, kernel_fp16.cu:736 — SURVEY.md §6
quirk 2). On TPU the Pallas grid is *sequential* on the core, so the same
fusion is race-free by construction: a whole-sequence f32 dQ accumulator
lives in VMEM scratch and every (kv_tile, q_tile) step adds into its row
slice. This does the textbook 5-matmul backward (vs 7 for the two-kernel
split in flash_bwd.py): S=QK^T, dP=dO·V^T, dV+=P^T·dO, dK+=dS^T·Q,
dQ+=dS·K — i.e. fwd+bwd = 7·fpm of real MXU work instead of 9·fpm.

Grid: flat ``(B, H, P)`` over a kv-major pair table (same scalar-prefetch
technique as flash_fwd.py): only pairs with unmasked work are visited.
dK/dV accumulate in per-kv-tile scratch (init at the first q-visit, stored
at the last). dQ rows are zeroed at their first kv-visit and written out at
their last; on non-store steps the dQ output BlockSpec points at a dummy
row so the revisited block is not flushed per step.

Requires compile-time offsets and no bias; other callers (ring attention,
dbias) use the two-kernel path in flash_bwd.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flashattn_tpu.ops.flash_fwd import (LN2, LOG2E, _range_predicates,
                                         band_chunk)
from flashattn_tpu.ops.oracle import DEFAULT_MASK_VALUE
from flashattn_tpu.utils import platform

NUM_LANES = 128

# Pair-table rows (int32, shape (8, P)), kv-major enumeration.
(BT_J, BT_I, BT_FIRST_I, BT_LAST_I, BT_FIRST_J, BT_DQIDX, BT_FULL,
 BT_LIVE) = range(8)


def build_bwd_pair_table(tq, tk, block_q, block_k, *, causal, window,
                         q_off, kv_off, need_tail_mask, kv_valid_len):
    """kv-major pair enumeration with per-pair flags:

    * FIRST_I / LAST_I — first/last q-visit of this kv tile (dK/dV scratch
      init / store);
    * FIRST_J — this pair is q tile i's first kv-visit (zero dQ rows);
    * DQIDX — q tile index on i's last kv-visit (store dQ rows), else ``tq``
      (the dummy output row — the block flushed on non-store steps);
    * FULL — no masking needed; LIVE — 0 for dead sentinel pairs (a q tile
      with every kv tile masked still needs its dQ rows zeroed+stored).
    """
    def and_fn(a, b):
        return b if a is None else (a and b)

    js_of_i = {}
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
        js_of_i[i] = js

    rows = {r: [] for r in range(8)}

    def emit(j, i, first_i, last_i, first_j, store_dq, full, live):
        rows[BT_J].append(j)
        rows[BT_I].append(i)
        rows[BT_FIRST_I].append(int(first_i))
        rows[BT_LAST_I].append(int(last_i))
        rows[BT_FIRST_J].append(int(first_j))
        rows[BT_DQIDX].append(i if store_dq else tq)
        rows[BT_FULL].append(int(full))
        rows[BT_LIVE].append(int(live))

    for j in range(tk):
        i_list = [i for i in range(tq)
                  if any(jj == j for jj, _ in js_of_i[i])]
        if not i_list:
            # kv tile entirely masked: its dK/dV blocks still need zeros.
            emit(j, 0, 1, 1, 0, False, False, 0)
            continue
        for pos, i in enumerate(i_list):
            js = [jj for jj, _ in js_of_i[i]]
            full = dict(js_of_i[i])[j]
            emit(j, i,
                 first_i=pos == 0, last_i=pos == len(i_list) - 1,
                 first_j=js[0] == j, store_dq=js[-1] == j,
                 full=full, live=1)
    # dead q tiles (no kv visits at all): zero + store their dQ rows once,
    # appended at the end (piggybacks on the last kv tile's blocks).
    for i in range(tq):
        if not js_of_i[i]:
            emit(tk - 1, i, 0, 0, 1, True, False, 0)
    return np.array([rows[r] for r in range(8)], dtype=np.int32)


def _bwd_fused_kernel(
    tab_ref,     # SMEM (8, P) int32
    q2_ref,      # VMEM (1, 1, block_q, D) — q pre-scaled by scale·log2e
    k_ref,       # VMEM (1, 1, block_k, D)
    v_ref,       # VMEM (1, 1, block_k, D)
    do_ref,      # VMEM (1, 1, block_q, D)
    lse2_ref,    # VMEM (1, 1, block_q, NUM_LANES) — lse·log2e
    delta_ref,   # VMEM (1, 1, block_q, NUM_LANES)
    dq_ref,      # VMEM (1, 1, block_q, D) — dummy-row indexed (see table)
    dk_ref,      # VMEM (1, 1, block_k, D)
    dv_ref,      # VMEM (1, 1, block_k, D)
    dq_acc,      # VMEM (tq·block_q, D) f32 — whole-sequence accumulator
    dk_scr,      # VMEM (block_k, D) f32
    dv_scr,      # VMEM (block_k, D) f32
    *,
    scale: float,
    causal: bool,
    block_q: int,
    block_k: int,
    kv_valid_len: int,
    kv_padded_len: int,
    window: tuple[int, int] | None,
    static_offs: tuple[int, int],
    mask_value: float,
    tri_edge: bool = False,
    tri_sub: int = 256,
):
    wl, wr = window if window is not None else (-1, -1)
    need_tail_mask = kv_valid_len != kv_padded_len
    masking = causal or wl >= 0 or wr >= 0 or need_tail_mask
    q_off, kv_off = static_offs

    p_id = pl.program_id(2)
    j = tab_ref[BT_J, p_id]
    i = tab_ref[BT_I, p_id]
    first_i = tab_ref[BT_FIRST_I, p_id] == 1
    last_i = tab_ref[BT_LAST_I, p_id] == 1
    first_j = tab_ref[BT_FIRST_J, p_id] == 1
    blk_full = tab_ref[BT_FULL, p_id] == 1
    live = tab_ref[BT_LIVE, p_id] == 1
    tq_total = dq_acc.shape[0] // block_q
    dq_store = tab_ref[BT_DQIDX, p_id] < tq_total

    rows = pl.ds(pl.multiple_of(i * block_q, block_q), block_q)

    @pl.when(first_i)
    def _init_kv():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    @pl.when(first_j)
    def _init_dq_rows():
        dq_acc[rows, :] = jnp.zeros((block_q, dq_acc.shape[1]), jnp.float32)

    def _compute(masked):
        prec = (jax.lax.Precision.HIGHEST
                if q2_ref.dtype == jnp.float32 else None)
        q2 = q2_ref[0, 0]
        do = do_ref[0, 0]
        mmd = do.dtype
        # KV-column sub-tiles: part kp+1's two leading dots (S, dP) are
        # issued before part kp's VPU softmax/dS chain — the forward's
        # fast_block MXU/VPU overlap pattern (141→164 TFLOP/s there).
        # dV/dK rows are disjoint per part; dQ accumulates across parts.
        kvs = _BWD_KV_SPLITS
        if block_k % kvs or (block_k // kvs) % NUM_LANES:
            kvs = 1
        sub = block_k // kvs

        def lead(kp):
            cols = slice(kp * sub, (kp + 1) * sub)
            kc = k_ref[0, 0, cols, :]
            vc = v_ref[0, 0, cols, :]
            s2 = jax.lax.dot_general(
                q2, kc, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            dp = jax.lax.dot_general(
                do, vc, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            return s2, dp

        leads = [lead(kp) for kp in range(kvs)]
        for kp in range(kvs):
            s2, dp = leads[kp]
            cols = slice(kp * sub, (kp + 1) * sub)
            if masked:
                col_l = jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, sub), 1)
                dmat = col_l - jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, sub), 0)
                off = (j * block_k + kp * sub + kv_off
                       - (i * block_q + q_off))
                mask = None

                def _and(a, b):
                    return b if a is None else jnp.logical_and(a, b)

                if causal:
                    mask = _and(mask, dmat <= -off)
                if wl >= 0:
                    mask = _and(mask, dmat >= -wl - off)
                if wr >= 0 and not causal:
                    mask = _and(mask, dmat <= wr - off)
                if need_tail_mask:
                    mask = _and(mask,
                                col_l < kv_valid_len - j * block_k - kp * sub)
                s2 = jnp.where(mask, s2, mask_value)
            # p = exp(S·scale − lse) computed in the exp2 domain (scale·log2e
            # folded into q2 / lse2 by the host wrapper).
            if _BWD_NOVPU:
                p = s2 * 1e-4  # timing probe: no exp2, keep the dataflow
            else:
                p = jnp.exp2(s2 - lse2_ref[0, 0, :, :1])
            # dV += P^T · dO   (reference kernel_fp16.cu:724)
            dv_scr[cols, :] += jax.lax.dot_general(
                p.astype(mmd), do, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            if _BWD_NOVPU:
                ds = (dp * 1e-4).astype(mmd)
            else:
                ds = (p * (dp - delta_ref[0, 0, :, :1])).astype(mmd)
            # dK += dS^T · Q  — q2 carries scale·log2e, so ×ln2 at store
            # gives the symmetric ·scale (fixes reference quirk 1,
            # kernel_fp16.cu:737)
            dk_scr[cols, :] += jax.lax.dot_general(
                ds, q2, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            # dQ += dS · K  (race-free: sequential grid, one accumulator)
            dq_acc[rows, :] += jax.lax.dot_general(
                ds, k_ref[0, 0, cols, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

    def _compute_tri():
        # Diagonal pair under the tri_edge gate (flat causal grid, square
        # tiles, equal offsets → every non-full live pair has row0 == col0).
        # Recursive triangle decomposition: diag(n) → diag(n/2) +
        # full(n/2 × n/2) + diag(n/2), base diag = masked tri_sub² tile.
        # Most of the area lands in LARGE unmasked square blocks (one
        # bq/2², two bq/4², …) that run the same 5-dot group as a full
        # pair — fat MXU shapes, no iota/select — and total issued work is
        # (n/tri)·tri²/2·3... = n²/2 + (n/tri)·tri²/2, i.e. 53.1% of the
        # square at bq=2048/tri=256 (vs 56.3% for 256-row prefix strips,
        # whose 256-row trailing dots ran at ~123 vs 153 TFLOP/s).
        # Block leads (S, dP) are pre-issued _TRI_LOOKAHEAD blocks ahead so
        # the next block's MXU dots overlap this block's VPU softmax/dS.
        prec = (jax.lax.Precision.HIGHEST
                if q2_ref.dtype == jnp.float32 else None)
        k = k_ref[0, 0]

        blocks = []   # (r0, c0, sz, masked) local to the pair

        def rec(r0, c0, sz):
            if sz <= tri_sub:
                blocks.append((r0, c0, sz, True))
            else:
                h = sz // 2
                rec(r0, c0, h)
                blocks.append((r0 + h, c0, h, False))
                rec(r0 + h, c0 + h, h)

        rec(0, 0, block_q)

        def lead(bl):
            r0, c0, sz, _ = bl
            s2 = jax.lax.dot_general(
                q2_ref[0, 0, r0:r0 + sz, :], k[c0:c0 + sz],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            dp = jax.lax.dot_general(
                do_ref[0, 0, r0:r0 + sz, :], v_ref[0, 0, c0:c0 + sz, :],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            return s2, dp

        la = _TRI_LOOKAHEAD
        pending = {b: lead(blocks[b]) for b in range(min(la, len(blocks)))}
        for b, bl in enumerate(blocks):
            if b + la < len(blocks):
                pending[b + la] = lead(blocks[b + la])
            s2, dp = pending.pop(b)
            r0, c0, sz, msk = bl
            rsl = slice(r0, r0 + sz)
            doc = do_ref[0, 0, rsl, :]
            mmd = doc.dtype
            if msk:  # base tile sits on the diagonal (r0 == c0)
                dmat = (jax.lax.broadcasted_iota(jnp.int32, (sz, sz), 1)
                        - jax.lax.broadcasted_iota(jnp.int32, (sz, sz), 0))
                s2 = jnp.where(dmat <= 0, s2, mask_value)
            if _BWD_NOVPU:
                p = s2 * 1e-4
                ds = (dp * 1e-4).astype(mmd)
            else:
                p = jnp.exp2(s2 - lse2_ref[0, 0, rsl, :1])
                ds = (p * (dp - delta_ref[0, 0, rsl, :1])).astype(mmd)
            dv_scr[c0:c0 + sz, :] += jax.lax.dot_general(
                p.astype(mmd), doc,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            dk_scr[c0:c0 + sz, :] += jax.lax.dot_general(
                ds, q2_ref[0, 0, rsl, :],
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            dq_acc[pl.ds(pl.multiple_of(i * block_q, block_q) + r0,
                         sz), :] += jax.lax.dot_general(
                ds, k[c0:c0 + sz, :],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)

    if masking:
        pl.when(jnp.logical_and(live, blk_full))(lambda: _compute(False))
        pl.when(jnp.logical_and(live, jnp.logical_not(blk_full)))(
            _compute_tri if tri_edge else (lambda: _compute(True)))
    else:
        _compute(False)

    @pl.when(last_i)
    def _store_kv():
        dk_ref[0, 0] = (dk_scr[...] * LN2).astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_scr[...].astype(dv_ref.dtype)

    @pl.when(dq_store)
    def _store_dq():
        dq_ref[0, 0] = (dq_acc[rows, :] * scale).astype(dq_ref.dtype)


def _bwd_causal_resident_kernel(
    q2_ref,     # VMEM (1, 1, N, D) — q pre-scaled by scale·log2e
    k_ref,      # VMEM (1, 1, N, D)
    v_ref,      # VMEM (1, 1, N, D)
    do_ref,     # VMEM (1, 1, N, D)
    lse2_ref,   # VMEM (1, 1, N, NUM_LANES) — lse·log2e
    delta_ref,  # VMEM (1, 1, N, NUM_LANES)
    dq_ref,     # VMEM (1, 1, N, D)
    dk_ref,     # VMEM (1, 1, N, D)
    dv_ref,     # VMEM (1, 1, N, D)
    *,
    n: int,
    sub: int,
    tri_sub: int,
    head_dim: int,
    kv_valid_len: int,
    mask_value: float,
    scale: float,
    causal: bool = True,
    window: tuple[int, int] | None = None,
    n_rows: int | None = None,
    row_off: int = 0,
    col_off: int = 0,
):
    """Whole-sequence static-band fused backward, one grid step per
    (batch, head).

    With ``n_rows``/``row_off``/``col_off`` the kernel serves one KV macro
    slab of a longer windowed sequence (the macro launcher below): the
    q-side refs hold ``n_rows`` rows starting at global row ``row_off``;
    ``k_ref``/``v_ref``/``dk_ref``/``dv_ref`` hold ``n`` KV rows starting at
    global column ``col_off``. dK/dV are COMPLETE for the slab's columns
    (the row range covers every row whose band reaches them); dQ is the
    PARTIAL contribution of these columns, summed across slabs by the
    launcher. Band geometry is global; indexing local.

    Same rationale as the forward's resident kernel (flash_fwd.py): the flat
    grid pays a per-step pipeline bubble; here the entire causal pair
    structure is static (skips below the diagonal cost nothing, diagonal
    pairs issue statically-narrowed dots), the padded-KV-tail bound is baked
    into the trace-time pair list, and every accumulator (whole-tile f32
    dQ/dK/dV) is plain dataflow — no scratch round-trips, no predication.
    Pairs are software-pipelined: the next pair's two leading dots (S=Q·K^T,
    dP=dO·V^T) are issued before the current pair's VPU softmax and three
    trailing dots, keeping the MXU busy through the elementwise work.
    Role-parity: the reference's single-kernel backward loop
    (kernel_fp16.cu:644-739) without its dQ race (quirk 2).
    """
    prec = (jax.lax.Precision.HIGHEST
            if q2_ref.dtype == jnp.float32 else None)
    mmd = q2_ref.dtype
    if n_rows is None:
        n_rows = n
    tkv = n // sub        # kv tiles (local)
    tqr = n_rows // sub   # q-row tiles (local)
    wl, wr = window if window is not None else (-1, -1)

    def dot(a, b, dims):
        return jax.lax.dot_general(
            a, b, dimension_numbers=(dims, ((), ())),
            preferred_element_type=jnp.float32, precision=prec)

    n_chunks = sub // tri_sub if (sub % tri_sub == 0
                                  and tri_sub % NUM_LANES == 0) else 1
    eff_tri = tri_sub if n_chunks > 1 else sub

    # Static pair list, kv-major (j outer). Each pair carries its chunk
    # list: [(rsl, c0e, w, up, lo, cb)] — band-straddling pairs split their
    # q rows so every chunk's dots narrow to the live lane-aligned columns
    # (band_chunk); full pairs keep one whole-tile chunk. Geometry is
    # computed at GLOBAL coordinates, then column ranges and row slices are
    # rebased to the local refs.
    def to_local(t):
        c0e, w, up, lo, cb = t
        return (c0e - col_off, w, up, lo, cb)

    pairs = []
    for j in range(tkv):
        c0g = col_off + j * sub
        for i in range(tqr):
            rf, rl = row_off + i * sub, row_off + (i + 1) * sub - 1
            whole = band_chunk(rf, rl, c0g, sub, causal=causal,
                               wl=wl, wr=wr, kv_valid_len=kv_valid_len)
            if whole is None:
                continue
            boundary = whole[2] is not None or whole[3] is not None
            if boundary and n_chunks > 1:
                chunks = []
                for qp in range(n_chunks):
                    crf = row_off + i * sub + qp * eff_tri
                    crl = crf + eff_tri - 1
                    t = band_chunk(crf, crl, c0g, sub, causal=causal,
                                   wl=wl, wr=wr, kv_valid_len=kv_valid_len)
                    if t is not None:
                        chunks.append(
                            (slice(crf - row_off, crl + 1 - row_off),)
                            + to_local(t))
            else:
                chunks = [(slice(i * sub, (i + 1) * sub),) + to_local(whole)]
            pairs.append((j, i, chunks))

    def lead(pair):
        """Pre-issued MXU dots for a pair: [(s2, dp, rsl, chunk)] each."""
        j, i, chunks = pair
        out = []
        for ch in chunks:
            rsl, c0e, w = ch[0], ch[1], ch[2]
            q2c = q2_ref[0, 0, rsl, :]
            doc = do_ref[0, 0, rsl, :]
            kc = k_ref[0, 0, c0e:c0e + w, :]
            vc = v_ref[0, 0, c0e:c0e + w, :]
            s2 = dot(q2c, kc, (((1,), (1,))))
            dp = dot(doc, vc, (((1,), (1,))))
            out.append((s2, dp, ch))
        return out

    # Accumulators are lists of 128-row segments: a partial-range update
    # touches only its overlapped segments (pure value rebind, no copy of
    # untouched rows — a concatenate-rebuild would copy the whole tile per
    # update). band_chunk guarantees every row offset/width is lane-aligned.
    def seg_init():
        return [jnp.zeros((NUM_LANES, head_dim), jnp.float32)
                for _ in range(sub // NUM_LANES)]

    def seg_add(segs, r0, contrib):
        rows = contrib.shape[0]
        out = list(segs)
        for s in range(rows // NUM_LANES):
            k = r0 // NUM_LANES + s
            out[k] = out[k] + contrib[s * NUM_LANES:(s + 1) * NUM_LANES]
        return out

    def body(pair, leads, dq_i, dk_j, dv_j):
        j, i, chunks = pair
        for s2, dp, ch in leads:
            rsl, c0e, w, up, lo, cb = ch
            rows = s2.shape[0]
            mask = None
            if up is not None or lo is not None:
                dmat = (jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
                        - jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0))
                if up is not None:
                    mask = dmat <= up
                if lo is not None:
                    lom = dmat >= lo
                    mask = lom if mask is None else mask & lom
            if cb is not None:
                ci_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)
                cbm = ci_iota < cb
                mask = cbm if mask is None else mask & cbm
            if mask is not None:
                s2 = jnp.where(mask, s2, mask_value)
            p = jnp.exp2(s2 - lse2_ref[0, 0, rsl, :1])
            doc = do_ref[0, 0, rsl, :]
            col0 = c0e - j * sub
            # dV += P^T·dO ; dS = P⊙(dP−Δ) ; dK += dS^T·Q ; dQ += dS·K
            dv_j = seg_add(dv_j, col0,
                           dot(p.astype(mmd), doc, ((0,), (0,))))
            ds = (p * (dp - delta_ref[0, 0, rsl, :1])).astype(mmd)
            dk_j = seg_add(dk_j, col0,
                           dot(ds, q2_ref[0, 0, rsl, :], ((0,), (0,))))
            dq_i = seg_add(dq_i, rsl.start - i * sub,
                           dot(ds, k_ref[0, 0, c0e:c0e + w, :],
                               ((1,), (0,))))
        return dq_i, dk_j, dv_j

    def seg_store(ref, tile, segs, mul=None):
        for s, seg in enumerate(segs):
            r0 = tile * sub + s * NUM_LANES
            val = seg if mul is None else seg * mul
            ref[0, 0, r0:r0 + NUM_LANES, :] = val.astype(ref.dtype)

    dq_acc = {i: seg_init() for i in range(tqr)}
    dkv_acc = {}
    # Pairs are kv-major contiguous: store each kv tile's dK/dV right after
    # its last pair so the f32 segments go dead early (dQ row accumulators
    # necessarily stay live to the end).
    last_pair_of_j = {pr[0]: p for p, pr in enumerate(pairs)}
    stored_j = set()

    # Software pipeline: the next LA pairs' lead dots (S, dP) are issued
    # before the current pair's VPU softmax + three trailing dots. LA=1 is
    # the measured default; deeper values trade scoped VMEM (two f32
    # sub×sub tiles per pending pair) for more MXU slack.
    la = max(1, _RB_LOOKAHEAD)
    pending = {p: lead(pairs[p]) for p in range(min(la, len(pairs)))}
    for p, pr in enumerate(pairs):
        nxt = p + la
        if nxt < len(pairs):
            pending[nxt] = lead(pairs[nxt])
        cur = pending.pop(p)
        j, i = pr[0], pr[1]
        if j not in dkv_acc:
            dkv_acc[j] = (seg_init(), seg_init())
        dk_j, dv_j = dkv_acc[j]
        dq_acc[i], dk_j, dv_j = body(pr, cur, dq_acc[i], dk_j, dv_j)
        dkv_acc[j] = (dk_j, dv_j)
        if last_pair_of_j[j] == p:
            seg_store(dk_ref, j, dk_j, LN2)
            seg_store(dv_ref, j, dv_j)
            stored_j.add(j)
            del dkv_acc[j]

    zero_segs = None
    for i in range(tqr):
        seg_store(dq_ref, i, dq_acc[i], scale)
    for j in range(tkv):
        if j not in stored_j:  # kv tile with no live pairs (past the band)
            zero_segs = zero_segs or seg_init()
            seg_store(dk_ref, j, zero_segs)
            seg_store(dv_ref, j, zero_segs)


# Same budget rationale as the forward's resident path: the unrolled
# dataflow accumulators must stay VMEM/register-resident, and the pair
# count grows as (N/sub)². Routing (r3 tuning matrices, fwd+bwd causal
# D=128, median-of-5): the wide-tile flat fused bwd (2048² blocks, 256-row
# tri chunks) wins wherever 2048 tiles fit without pad loss — 151 vs 121
# TFLOP/s at N=4096, 149 at N=8192 where the resident variant cannot even
# compile (O(N²) Mosaic stack). The resident kernel wins 2048-odd padded
# lengths, where the flat path degrades to 1024 blocks (N=5120: 137.4 vs
# ~126) — and small/divisor shapes (2560 → 640-tiles) it serves exactly.
_RESIDENT_BWD_MAX_N = int(os.environ.get("FLASHATTN_TPU_RB_MAXN", 6144))
# Pair tile / diagonal-chunk width / pair-pipelining depth — all
# env-overridable for on-chip tuning sweeps (spot_bwd_tune.py).
_RB_SUB = int(os.environ.get("FLASHATTN_TPU_RB_SUB", 1024))
# Sliding pre-issue depth for the flat diag pairs' chunked dots (see
# _compute_tri) — env-overridable for on-chip tuning.
_TRI_LOOKAHEAD = max(1, int(os.environ.get("FLASHATTN_TPU_TRI_LA", 2)))
# KV-column sub-tiles per full pair in the flat fused bwd (see _compute's
# lead pre-issue) — env-overridable for on-chip tuning.
_BWD_KV_SPLITS = max(1, int(os.environ.get("FLASHATTN_TPU_BWD_KVS", 1)))
_RB_TRI = os.environ.get("FLASHATTN_TPU_RB_TRI")
_RB_LOOKAHEAD = int(os.environ.get("FLASHATTN_TPU_RB_LOOKAHEAD", 1))
# Measurement-only mode: skip the VPU softmax-recompute chain (p = s2,
# dS = dP, no exp2/mask) so the kernel times the PURE 5-dot MXU dataflow at
# the real tiles/grid — the measured bwd ceiling the D=64 accounting divides
# by (VERDICT r4 missing #2). Numerics are garbage by design; never set
# outside spot_tune-style probes.
_BWD_NOVPU = os.environ.get("FLASHATTN_TPU_BWD_NOVPU", "0") == "1"
# Tuning override: route 2048-multiple causal shapes onto the resident bwd
# (normally excluded — the wide-tile flat path measured faster there, r3).
_RB_FORCE = os.environ.get("FLASHATTN_TPU_RB_FORCE", "0") == "1"


def _rb_geometry(Nqp):
    """Largest lane-aligned square pair tile <= _RB_SUB dividing the
    sequence, plus the diagonal chunk width (a lane multiple dividing the
    tile). Mirrors flash_fwd._rc_geometry; with the current fused-bwd
    launch (1024-row bq_f blocks) every padded length already divides, so
    the shrink loop is defensive — it keeps the resident route available
    under any future block policy."""
    sub = min(_RB_SUB, Nqp)
    while sub > NUM_LANES and (Nqp % sub or sub % NUM_LANES):
        sub -= NUM_LANES
    tri_target = int(_RB_TRI) if _RB_TRI else sub // 4
    tri = max(NUM_LANES,
              min(tri_target, sub) // NUM_LANES * NUM_LANES)
    while sub % tri:
        tri -= NUM_LANES
    return sub, tri


def _use_resident_bwd(*, causal, window, static_offsets, Nqp, Nkp, sub):
    banded = causal or (
        window is not None and (window[0] >= 0 or window[1] >= 0))
    return (
        banded
        and static_offsets is not None
        and static_offsets[0] == static_offsets[1]
        and Nqp == Nkp and Nqp <= _RESIDENT_BWD_MAX_N
        # causal: only where the wide-tile flat path pads or under-tiles
        # (routing measurements above). Windowed bands take the resident
        # path everywhere it compiles: band_chunk narrows every straddling
        # pair, while the flat path's window-edge pairs run fully masked at
        # full width (r3: 2048² flat measured 4.76 ms vs ~2.4 expected at
        # window=2048 N=4096).
        and (Nqp % 2048 != 0 or Nqp < 2048 or window is not None
             or _RB_FORCE)
        and Nqp % sub == 0
    )


# ── Windowed KV-slab macro backward ────────────────────────────────────
# Past the resident ceiling a windowed band still has bounded rows-per-
# column, so slab the KV axis: each slab launch holds its macro_c columns
# plus every row whose band reaches them (Element-indexed q-side blocks),
# produces COMPLETE dK/dV for those columns and a PARTIAL dQ summed across
# slabs by the launcher. The causal long-N training shape stays on the
# wide-tile flat path (its rows-per-column is unbounded: slab 0 would see
# every row).

# r4 tuning (window=(2048,-1) causal N=8192 D=128, median-of-5): cols 2048 /
# sub 512 = 105.8 TF vs 98.8 at cols 1024; sub 1024 loses (90.6-100.9 —
# fewer, fatter pairs defeat the la=1 MXU/VPU overlap), cols 4096 is flat
# (105.3) with double the slab row range.
_MACRO_BWD_COLS = int(os.environ.get("FLASHATTN_TPU_MACRO_BWD_COLS", 2048))
_MACRO_BWD_SUB = int(os.environ.get("FLASHATTN_TPU_MACRO_BWD_SUB", 512))


def use_macro_bwd(*, causal, window, static_offsets, Nqp, Nkp):
    if window is None:
        return False
    wl, wr = window
    bounded = wl >= 0 and (causal or wr >= 0)
    return (
        bounded
        and static_offsets is not None
        and static_offsets[0] == static_offsets[1]
        and Nqp == Nkp and Nqp > _RESIDENT_BWD_MAX_N
        and Nqp % _MACRO_BWD_COLS == 0
        and os.environ.get("FLASHATTN_TPU_MACRO_BWD", "1") == "1"
    )


def _bwd_macro_windowed(q2, k, v, do, lse2_rep, delta_rep, *, scale, causal,
                        window, kv_valid_len, interpret):
    """One resident-bwd launch per KV macro slab (see _use_resident_bwd's
    macro note). Inputs are pre-padded and pre-folded (q2 = q·scale·log2e,
    lse2 in the log2 domain) by :func:`bwd_fused_padded`."""
    B, H, Nqp, D = q2.shape
    Nkp = k.shape[2]
    wl, wr = window
    wr_eff = 0 if causal else wr
    macro_c = _MACRO_BWD_COLS
    sub = _MACRO_BWD_SUB
    while sub > NUM_LANES and macro_c % sub:
        sub -= NUM_LANES
    tri = max(NUM_LANES, (sub // 2) // NUM_LANES * NUM_LANES)

    # dQ assembles by SUB-CHUNK SUM, not zeros + scatter-add: the r4 layout
    # (`zeros(Nqp) ; dq_total.at[r_lo:r_hi].add(dq_s)` per slab) paid a
    # full-array zeros write plus a read-modify-write of every slab window
    # (~2 GB of pure accumulator traffic at N=32768 — a measurable part of
    # the 119→100 TF band-area decay, VERDICT r4 weak #4). Slab row ranges
    # are `sub`-aligned by construction, so each global sub-chunk is the
    # sum of at most a few slab slices — one read per written element.
    dq_pieces: dict[int, list] = {}
    dk_parts, dv_parts = [], []
    for s in range(Nkp // macro_c):
        col0 = s * macro_c
        r_lo = max(0, (col0 - wr_eff) // sub * sub)
        r_hi = min(Nqp, -((col0 + macro_c - 1 + wl + 1) // -sub) * sub)
        n_rows = r_hi - r_lo
        if n_rows <= 0 or col0 >= kv_valid_len:
            dk_parts.append(jnp.zeros((B, H, macro_c, D), k.dtype))
            dv_parts.append(jnp.zeros((B, H, macro_c, D), v.dtype))
            continue
        kernel = functools.partial(
            _bwd_causal_resident_kernel,
            n=macro_c, sub=sub, tri_sub=tri, head_dim=D,
            kv_valid_len=kv_valid_len, mask_value=DEFAULT_MASK_VALUE,
            scale=scale, causal=causal, window=window,
            n_rows=n_rows, row_off=r_lo, col_off=col0)
        kv_spec = pl.BlockSpec((1, 1, macro_c, D),
                               lambda b, h, _s=s: (b, h, _s, 0),
                               memory_space=pltpu.VMEM)
        if interpret or r_lo == 0:
            # interpreter has no Element indexing; r_lo == 0 needs none
            def row_spec(width, _r=r_lo):
                return pl.BlockSpec((1, 1, n_rows, width),
                                    lambda b, h: (b, h, 0, 0),
                                    memory_space=pltpu.VMEM)

            def rows_of(x):
                return jax.lax.slice_in_dim(x, r_lo, r_hi, axis=2)
        else:
            from jax._src.pallas import core as pl_core

            def row_spec(width, _r=r_lo):
                return pl.BlockSpec(
                    (pl_core.Element(1), pl_core.Element(1),
                     pl_core.Element(n_rows), pl_core.Element(width)),
                    lambda b, h, _rr=_r: (b, h, _rr, 0),
                    memory_space=pltpu.VMEM)

            def rows_of(x):
                return x
        band_pairs = macro_c // sub * (n_rows // sub)
        cost = pl.CostEstimate(
            flops=int(10 * sub * sub * D * B * H * band_pairs),
            bytes_accessed=int((2 * n_rows * D + 2 * macro_c * D) * B * H
                               * q2.dtype.itemsize),
            transcendentals=int(B * H * sub * sub * band_pairs),
        )
        dq_s, dk_s, dv_s = pl.pallas_call(
            kernel,
            grid=(B, H),
            in_specs=[row_spec(D), kv_spec, kv_spec, row_spec(D),
                      row_spec(NUM_LANES), row_spec(NUM_LANES)],
            out_specs=[
                pl.BlockSpec((1, 1, n_rows, D), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, macro_c, D), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1, macro_c, D), lambda b, h: (b, h, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                # f32 dQ partials: slab contributions are summed on the host
                # side — bf16 partial sums would double the rounding error.
                jax.ShapeDtypeStruct((B, H, n_rows, D), jnp.float32),
                jax.ShapeDtypeStruct((B, H, macro_c, D), k.dtype),
                jax.ShapeDtypeStruct((B, H, macro_c, D), v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(rows_of(q2), k, v, rows_of(do), rows_of(lse2_rep),
          rows_of(delta_rep))
        for ci in range(n_rows // sub):
            dq_pieces.setdefault(r_lo // sub + ci, []).append(
                jax.lax.slice_in_dim(dq_s, ci * sub, (ci + 1) * sub,
                                     axis=2))
        dk_parts.append(dk_s)
        dv_parts.append(dv_s)
    chunks = []
    for t in range(Nqp // sub):
        ps = dq_pieces.get(t)
        if ps is None:
            chunks.append(jnp.zeros((B, H, sub, D), jnp.float32))
        else:
            acc = ps[0]
            for p in ps[1:]:
                acc = acc + p
            chunks.append(acc)
    dq = jnp.concatenate(chunks, axis=2).astype(q2.dtype)
    dk = jnp.concatenate(dk_parts, axis=2)
    dv = jnp.concatenate(dv_parts, axis=2)
    return dq, dk, dv


@functools.partial(
    jax.jit,
    static_argnames=("scale", "causal", "block_q", "block_k",
                     "kv_valid_len", "interpret", "window",
                     "static_offsets"),
)
def bwd_fused_padded(
    q, k, v, do, lse_rep, delta_rep,
    *, scale, causal, block_q, block_k, kv_valid_len,
    interpret=None, window=None, static_offsets=(0, 0),
):
    """Single-pass backward launch on pre-padded inputs (H == Hkv: GQA
    expanded by the wrapper). ``lse_rep``/``delta_rep``: [B,H,Nqp,128]
    lane-replicated, natural-log lse."""
    if interpret is None:
        interpret = platform.pallas_interpret_default()
    B, H, Nqp, D = q.shape
    Nkp = k.shape[2]
    tq, tk = Nqp // block_q, Nkp // block_k

    # Fold scale·log2e into q; lse → log2 domain to match (passed below).
    q2 = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    if use_macro_bwd(causal=causal, window=window,
                     static_offsets=static_offsets, Nqp=Nqp, Nkp=Nkp):
        return _bwd_macro_windowed(
            q2, k, v, do, lse_rep * LOG2E, delta_rep, scale=scale,
            causal=causal, window=window, kv_valid_len=kv_valid_len,
            interpret=interpret)

    rb_sub, rb_tri = _rb_geometry(Nqp)
    if _use_resident_bwd(causal=causal, window=window,
                         static_offsets=static_offsets, Nqp=Nqp, Nkp=Nkp,
                         sub=rb_sub):
        kernel = functools.partial(
            _bwd_causal_resident_kernel,
            n=Nqp, sub=rb_sub, tri_sub=rb_tri,
            head_dim=D, kv_valid_len=kv_valid_len,
            mask_value=DEFAULT_MASK_VALUE, scale=scale,
            causal=causal, window=window)
        seq_spec = pl.BlockSpec((1, 1, Nqp, D), lambda b, h: (b, h, 0, 0),
                                memory_space=pltpu.VMEM)
        lane_spec = pl.BlockSpec((1, 1, Nqp, NUM_LANES),
                                 lambda b, h: (b, h, 0, 0),
                                 memory_space=pltpu.VMEM)
        _wl, _wr = window if window is not None else (-1, -1)
        live_pairs = sum(
            1 for j in range(Nqp // rb_sub)
            for i in range(Nqp // rb_sub)
            if band_chunk(i * rb_sub, (i + 1) * rb_sub - 1,
                          j * rb_sub, rb_sub, causal=causal, wl=_wl,
                          wr=_wr, kv_valid_len=kv_valid_len) is not None)
        cost = pl.CostEstimate(
            flops=int(10 * rb_sub * rb_sub * D * B * H * live_pairs),
            bytes_accessed=(q.size * 3 + k.size * 4) * q.dtype.itemsize,
            transcendentals=int(B * H * rb_sub * rb_sub * live_pairs),
        )
        dq, dk, dv = pl.pallas_call(
            kernel,
            grid=(B, H),
            in_specs=[seq_spec] * 4 + [lane_spec] * 2,
            out_specs=[seq_spec] * 3,
            out_shape=[
                jax.ShapeDtypeStruct((B, H, Nqp, D), q.dtype),
                jax.ShapeDtypeStruct(k.shape, k.dtype),
                jax.ShapeDtypeStruct(v.shape, v.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            cost_estimate=cost,
            interpret=interpret,
        )(q2, k, v, do, lse_rep * LOG2E, delta_rep)
        return dq, dk, dv

    tab = build_bwd_pair_table(
        tq, tk, block_q, block_k, causal=causal, window=window,
        q_off=static_offsets[0], kv_off=static_offsets[1],
        need_tail_mask=kv_valid_len != Nkp, kv_valid_len=kv_valid_len)
    n_pairs = tab.shape[1]

    # Triangular diagonal pairs (see _compute_tri): sound exactly when every
    # non-full live pair is diagonal — same gate as the forward's tri path.
    # 256-row diagonal chunks measured best at every block size (r3 tuning:
    # bq1024 tri256 128.7 vs tri128 122.9 / tri512 121.3; bq2048 tri256
    # 132.0 vs tri512 125.4 — fwd+bwd causal N=4096 D=128).
    # tri256 pinned for D=128 (r3 matrices); at D<=64 the thin-matmul-bound
    # bwd measured marginally better on tri128 (68.4 vs 67.2, r4).
    _trif = os.environ.get("FLASHATTN_TPU_TRIF")
    _tri_default = 128 if D <= 64 else 256
    tri_sub = max(NUM_LANES,
                  min(int(_trif) if _trif else _tri_default, block_q))
    tri_edge = bool(
        causal and window is None and kv_valid_len == Nkp
        and block_q == block_k
        and static_offsets[0] == static_offsets[1]
        and block_q % tri_sub == 0 and tri_sub % NUM_LANES == 0
        and block_q // tri_sub >= 2)

    def qi(b, h, p, tab_ref):
        return (b, h, tab_ref[BT_I, p], 0)

    def kvi(b, h, p, tab_ref):
        return (b, h, tab_ref[BT_J, p], 0)

    def dqi(b, h, p, tab_ref):
        return (b, h, tab_ref[BT_DQIDX, p], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, H, n_pairs),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, D), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), kvi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), kvi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, D), qi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, NUM_LANES), qi,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_q, NUM_LANES), qi,
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, D), dqi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), kvi, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, block_k, D), kvi, memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq * block_q, D), jnp.float32),   # dq accumulator
            pltpu.VMEM((block_k, D), jnp.float32),
            pltpu.VMEM((block_k, D), jnp.float32),
        ],
    )

    def entry(tab_r, q2r, kr, vr, dor, lser, deltar, dq_r, dk_r, dv_r,
              dq_acc, dk_scr, dv_scr):
        _bwd_fused_kernel(
            tab_r, q2r, kr, vr, dor, lser, deltar, dq_r, dk_r, dv_r,
            dq_acc, dk_scr, dv_scr,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            kv_valid_len=kv_valid_len, kv_padded_len=Nkp, window=window,
            static_offs=tuple(int(x) for x in static_offsets),
            mask_value=DEFAULT_MASK_VALUE,
            tri_edge=tri_edge, tri_sub=tri_sub,
        )

    n_live = int(tab[BT_LIVE].sum())
    cost = pl.CostEstimate(
        flops=int(10 * block_q * block_k * D * B * H * n_live),
        bytes_accessed=(q.size * 3 + k.size * 4) * q.dtype.itemsize,
        transcendentals=int(B * H * block_q * block_k * n_live),
    )

    dq, dk, dv = pl.pallas_call(
        entry,
        grid_spec=grid_spec,
        out_shape=[
            # one extra dummy q-tile row: non-store steps flush there
            jax.ShapeDtypeStruct((B, H, (tq + 1) * block_q, D), q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(jnp.asarray(tab), q2, k, v, do, lse_rep * LOG2E, delta_rep)
    return dq[:, :, :Nqp, :], dk, dv
