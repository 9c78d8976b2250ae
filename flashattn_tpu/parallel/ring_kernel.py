"""Kernel-level ring attention: KV rotation by in-kernel remote DMA.

The shard_map ring (ring.py) overlaps the KV ``ppermute`` with compute by
issuing the collective early and relying on XLA's latency-hiding scheduler.
This module goes one level deeper — the TPU-native end state of the
north-star "collectives overlapped with per-tile compute" clause: ONE Pallas
kernel per device runs the whole ring, rotating KV chunks between neighbor
HBM buffers with ``pltpu.make_async_remote_copy`` (ICI RDMA) while the MXU
works on the current chunk. The overlap is structural (DMA in flight across
the entire step's compute), not a scheduler heuristic.

Algebra is the same online-softmax merge the reference stores residuals for
(L = m + log l, kernel_fp16.cu:541-542): each device keeps running
(m, l) rows in VMEM scratch and an *unnormalized* f32 O accumulator in HBM,
merging one chunk-partial per ring step; the final step normalizes and emits
``L`` for the backward.

Synchronization per step (standard double-buffered ring):

  wait(capacity)        # right neighbor's landing slot is free
  rdma.start            # slot[s%2]  ->  right's slot[(s+1)%2]
  compute on slot[s%2]  # all (b, h, q-tile) partials + merges
  rdma.wait_send        # our outgoing copy has left the building
  signal(capacity->left)# slot[s%2] is now reusable at our place
  rdma.wait_recv        # left's chunk has landed in slot[(s+1)%2]

Because the capacity signal is raised *before* ``wait_recv``, two incoming
copies (for consecutive steps, landing in opposite slots) may be in flight
at once. They therefore must NOT share a receive semaphore: a shared
counting semaphore lets ``wait_recv`` for step s be satisfied by step
s+1's arrival while s's chunk is still in flight — a stale-slot read the
first version of this kernel exhibited at P>2. Each landing slot gets its
own recv semaphore (``recv_sems[(s+1) % 2]``); a slot is never reused
until its previous copy was consumed (the capacity handshake guarantees
it), so per-slot semaphores cannot alias.

A neighbor barrier (``pltpu.get_barrier_semaphore``) runs once at step 0 so
no RDMA can race a device that has not entered the kernel yet.

Validated on the virtual CPU mesh via the Mosaic TPU interpreter
(``pltpu.InterpretParams``), including its cross-device race detector —
the "race detection" practice SURVEY.md §5 calls for.

The BACKWARD also runs in-kernel (r5): the rotation additionally carries
the f32 (dK, dV) accumulator pair — the K/V payload still rotates ahead of
the compute (overlapped), while the accumulators, written by each step,
rotate between steps and take ONE extra hop at the end to return to their
owner (see ``_ring_bwd_kernel``). dQ accumulates locally in HBM f32. Set
``FLASHATTN_TPU_RING_BWD_KERNEL=0`` to fall back to the ppermute ring
backward (ring.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

from flashattn_tpu.ops.flash import _dispatch_dtype, _pad_head_dim
from flashattn_tpu.ops.flash_fwd import LN2, LOG2E, NUM_LANES
from flashattn_tpu.ops.oracle import DEFAULT_MASK_VALUE
from flashattn_tpu.utils import platform

# Rows whose chunk-max never rose above this are fully masked: their partial
# carries no probability mass and is dropped at merge time.
_NEG_GUARD = DEFAULT_MASK_VALUE * 0.5


def _ring_fwd_kernel(
    q_hbm,      # ANY [B, Hq, nq, D]   (pre-scaled by scale*log2e)
    k_hbm,      # ANY [B, Hkv, nk, D]
    v_hbm,      # ANY [B, Hkv, nk, D]
    o_hbm,      # ANY [B, Hq, nq, D] f32 out (unnormalized until last step)
    lse_hbm,    # ANY [B, Hq, nq, NUM_LANES] f32 out (natural-log LSE;
                # lane-replicated — HBM slices must be 128-lane aligned)
    kv_slots,   # ANY [2, 2, B, Hkv, nk, D] rotation buffers (slot, k/v) —
                # declared as a (discarded) output: HBM scratch is not
                # allocatable as pallas scratch, but outputs live in HBM
                # and persist across grid steps.
    qt_buf,     # VMEM (bq, D) dtype
    kc,         # VMEM (nk, D) dtype — current K chunk for one (b, hkv)
    vc,         # VMEM (nk, D) dtype
    ot_buf,     # VMEM (bq, D) f32 — O read-modify-write tile
    lse_buf,    # VMEM (bq, NUM_LANES) f32
    m_scr,      # VMEM (bq, W) f32 — running row max, one lane per
                # (b, h, q-tile) [W = B*Hq*nqt rounded up to 128]. A
                # (n_tiles, bq, 1) layout lane-pads 1->128 per entry (16 MB
                # of scoped VMEM at B1 H8 nq4096 — OOMs the real chip);
                # packing tiles along lanes keeps it at bq*W*4 bytes. Reads/
                # writes go through a lane-select mask, never a width-1
                # lane slice.
    l_scr,      # VMEM (bq, W) f32 — running row sum, same packing
    copy_sems,  # DMA (4,)
    send_sem,   # DMA
    recv_sems,  # DMA (2,) — one per landing slot (see module docstring)
    cap_sem,    # REGULAR — capacity handshake
    *,
    axis_name: str,
    n_dev: int,
    causal: bool,
    block_q: int,
    block_k: int,
    window: tuple[int, int] | None = None,
):
    B, Hq, nq, D = q_hbm.shape
    Hkv, nk = k_hbm.shape[1], k_hbm.shape[2]
    rep = Hq // Hkv
    nqt = nq // block_q
    dtype = q_hbm.dtype

    s = pl.program_id(0)
    my = jax.lax.axis_index(axis_name)
    slot = jax.lax.rem(s, 2)
    if n_dev > 1:
        right = jax.lax.rem(my + 1, n_dev)
        left = jax.lax.rem(my + n_dev - 1, n_dev)

    # ---- step 0: stage local KV into slot 0, barrier, open capacity ----
    @pl.when(s == 0)
    def _bootstrap():
        ck = pltpu.make_async_copy(k_hbm, kv_slots.at[0, 0], copy_sems.at[0])
        cv = pltpu.make_async_copy(v_hbm, kv_slots.at[0, 1], copy_sems.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()
        if n_dev > 1:
            barrier = pltpu.get_barrier_semaphore()
            for nbr in (left, right):
                pltpu.semaphore_signal(
                    barrier, inc=1, device_id=nbr,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(barrier, 2)
            # our slot 1 is virgin — left may send its step-0 chunk
            pltpu.semaphore_signal(
                cap_sem, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

    def _rdma():
        # step-s copies land in slot 1-slot everywhere; both sender and
        # receiver derive the same per-slot recv semaphore from s.
        return pltpu.make_async_remote_copy(
            src_ref=kv_slots.at[slot],
            dst_ref=kv_slots.at[1 - slot],
            send_sem=send_sem,
            recv_sem=recv_sems.at[1 - slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    if n_dev > 1:
        # ---- kick step s+1's rotation BEFORE this step's compute ----
        @pl.when(s < n_dev - 1)
        def _send():
            pltpu.semaphore_wait(cap_sem, 1)  # landing slot free at right
            _rdma().start()

    # ---- compute: merge this chunk into every (b, h, q-tile) ----
    src_dev = jax.lax.rem(my - s + n_dev, n_dev)
    kv_off = src_dev * nk
    q_base = my * nq
    is_first = s == 0
    # Whole-chunk band skip (chunk entirely outside the causal/window band
    # for every local row). Step 0 always computes: it doubles as the O/m/l
    # initialization pass (and the step-0 chunk, the diagonal, is live
    # under any band that includes self-attention).
    wl, wr = window if window is not None else (-1, -1)
    run = is_first
    live = None
    if causal or (wr >= 0 and not causal):
        wr_eff = 0 if causal else wr
        live = kv_off <= q_base + nq - 1 + wr_eff
    if wl >= 0:
        left_ok = kv_off + nk - 1 >= q_base - wl
        live = left_ok if live is None else jnp.logical_and(live, left_ok)
    run = (s >= 0) if live is None else jnp.logical_or(is_first, live)

    # Loops over (batch, head, q-tile) are ROLLED (fori_loop with traced
    # indices), not unrolled: the fully-unrolled kernel at H8/nq4096
    # exceeded 15 minutes of remote Mosaic compile (r3 NOTES) — the program
    # was B·Hkv·rep·nqt·(nk/bk) dot groups. Rolled, it is one.
    @pl.when(run)
    def _compute():
        def per_bh(i, carry):
            b = i // Hkv
            hkv = jax.lax.rem(i, Hkv)
            ck = pltpu.make_async_copy(
                kv_slots.at[slot, 0, b, hkv], kc, copy_sems.at[0])
            cv = pltpu.make_async_copy(
                kv_slots.at[slot, 1, b, hkv], vc, copy_sems.at[1])
            ck.start()
            cv.start()
            ck.wait()
            cv.wait()

            def per_tile(t, carry2):
                hr = t // nqt
                qt = jax.lax.rem(t, nqt)
                h = hkv * rep + hr
                _merge_tile(
                    b, h, qt, q_hbm, o_hbm, kc, vc,
                    qt_buf, ot_buf, m_scr, l_scr,
                    copy_sems, q_base, kv_off, is_first,
                    causal=causal, block_q=block_q,
                    block_k=block_k, nqt=nqt, Hq=Hq, nk=nk,
                    dtype=dtype, window=window,
                )
                return carry2

            return jax.lax.fori_loop(0, rep * nqt, per_tile, carry)

        jax.lax.fori_loop(0, B * Hkv, per_bh, 0)

    # ---- last step: normalize every q-tile from the running state ----
    # A separate pass, NOT fused into the chunk merge: under causal skipping
    # the last chunk is above the diagonal for every device but the ring's
    # tail, so a merge-fused epilogue would never run there.
    @pl.when(s == n_dev - 1)
    def _normalize():
        def fin(i, carry):
            b = i // (Hq * nqt)
            h = jax.lax.rem(i // nqt, Hq)
            qt = jax.lax.rem(i, nqt)
            _finalize_tile(
                b, h, qt, o_hbm, lse_hbm, ot_buf, lse_buf,
                m_scr, l_scr, copy_sems,
                block_q=block_q, nqt=nqt, Hq=Hq)
            return carry

        jax.lax.fori_loop(0, B * Hq * nqt, fin, 0)

    if n_dev > 1:
        # ---- close the step: drain send, free our slot, await recv ----
        @pl.when(s < n_dev - 1)
        def _recv():
            rdma = _rdma()
            rdma.wait_send()

            # freeing slot[s%2] enables left's send at step s+1; left's last
            # send is step n_dev-2, so the signal at the end of that step
            # would never be consumed — skip it (semaphores must balance at
            # kernel exit or they poison the next collective launch).
            @pl.when(s < n_dev - 2)
            def _free_slot():
                pltpu.semaphore_signal(
                    cap_sem, inc=1, device_id=left,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)

            rdma.wait_recv()


def _merge_tile(b, h, qt, q_hbm, o_hbm, kc, vc, qt_buf, ot_buf,
                m_scr, l_scr, copy_sems, q_base, kv_off, is_first,
                *, causal, block_q, block_k, nqt, Hq, nk, dtype,
                window=None):
    """One (b, h, q-tile): chunk-local online softmax over the KV tiles in
    VMEM, then a single LSE-style merge into the persistent running state
    (m, l in VMEM scratch; unnormalized O in HBM)."""
    idx = (b * Hq + h) * nqt + qt
    rows = qt * block_q
    wl, wr = window if window is not None else (-1, -1)
    masked = causal or wl >= 0 or wr >= 0

    cq = pltpu.make_async_copy(
        q_hbm.at[b, h, pl.ds(rows, block_q), :], qt_buf, copy_sems.at[2])
    cq.start()
    cq.wait()
    q = qt_buf[...]

    row_ids = (q_base + rows
               + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0))

    # f32 inputs: MXU demotes f32 dot operands to bf16 by default — request
    # full-precision matmuls (same trap as flash_fwd.py, found on-chip r1).
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

    def kv_step(j, st):
        m_c, l_c, acc = st
        k_j = kc[pl.ds(j * block_k, block_k), :]
        sc = jax.lax.dot_general(
            q, k_j, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if masked:
            col_ids = (kv_off + j * block_k
                       + jax.lax.broadcasted_iota(
                           jnp.int32, (block_q, block_k), 1))
            keep = None
            if causal:
                keep = col_ids <= row_ids
            elif wr >= 0:
                keep = col_ids <= row_ids + wr
            if wl >= 0:
                lk = col_ids >= row_ids - wl
                keep = lk if keep is None else jnp.logical_and(keep, lk)
            sc = jnp.where(keep, sc, DEFAULT_MASK_VALUE)
        m_new = jnp.maximum(m_c, jnp.max(sc, axis=-1, keepdims=True))
        p = jnp.exp2(sc - m_new)
        alpha = jnp.exp2(m_c - m_new)
        v_j = vc[pl.ds(j * block_k, block_k), :]
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(dtype), v_j, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        l_c = l_c * alpha + jnp.sum(p, axis=-1, keepdims=True)
        return (m_new, l_c, acc)

    m_c, l_c, acc = jax.lax.fori_loop(
        0, nk // block_k, kv_step,
        (jnp.full((block_q, 1), DEFAULT_MASK_VALUE, jnp.float32),
         jnp.zeros((block_q, 1), jnp.float32),
         jnp.zeros((block_q, q.shape[-1]), jnp.float32)))

    # ---- merge the chunk partial into the running state ----
    o_slice = o_hbm.at[b, h, pl.ds(rows, block_q), :]

    W = m_scr.shape[1]
    sel = jax.lax.broadcasted_iota(jnp.int32, (block_q, W), 1) == idx

    # Initialize BEFORE reading the running state: scratch and the HBM
    # accumulator hold uninitialized memory at step 0 (NaN under the
    # interpreter's uninitialized_memory='nan' — and NaN * 0 = NaN).
    @pl.when(is_first)
    def _init_state():
        m_scr[...] = jnp.where(sel, DEFAULT_MASK_VALUE, m_scr[...])
        l_scr[...] = jnp.where(sel, 0.0, l_scr[...])
        ot_buf[...] = jnp.zeros_like(ot_buf)

    @pl.when(jnp.logical_not(is_first))
    def _read_prev():
        co = pltpu.make_async_copy(o_slice, ot_buf, copy_sems.at[3])
        co.start()
        co.wait()

    m_run = jnp.sum(jnp.where(sel, m_scr[...], 0.0), axis=1,
                    keepdims=True)
    l_run = jnp.sum(jnp.where(sel, l_scr[...], 0.0), axis=1,
                    keepdims=True)
    m_new = jnp.maximum(m_run, m_c)
    # fully-masked partials carry no mass; drop them instead of exp2(0)=1
    a_run = jnp.where(m_run <= _NEG_GUARD, 0.0, jnp.exp2(m_run - m_new))
    a_c = jnp.where(m_c <= _NEG_GUARD, 0.0, jnp.exp2(m_c - m_new))
    l_new = l_run * a_run + l_c * a_c
    o_new = ot_buf[...] * a_run + acc * a_c

    ot_buf[...] = o_new
    m_scr[...] = jnp.where(sel, m_new, m_scr[...])
    l_scr[...] = jnp.where(sel, l_new, l_scr[...])
    co = pltpu.make_async_copy(ot_buf, o_slice, copy_sems.at[3])
    co.start()
    co.wait()


def _finalize_tile(b, h, qt, o_hbm, lse_hbm, ot_buf, lse_buf, m_scr, l_scr,
                   copy_sems, *, block_q, nqt, Hq):
    """Normalize one (b, h, q-tile): O /= l, emit L = m + log l (natural)."""
    idx = (b * Hq + h) * nqt + qt
    rows = qt * block_q
    o_slice = o_hbm.at[b, h, pl.ds(rows, block_q), :]

    co = pltpu.make_async_copy(o_slice, ot_buf, copy_sems.at[3])
    co.start()
    co.wait()
    W = m_scr.shape[1]
    sel = jax.lax.broadcasted_iota(jnp.int32, (block_q, W), 1) == idx
    m_run = jnp.sum(jnp.where(sel, m_scr[...], 0.0), axis=1,
                    keepdims=True)
    l_run = jnp.sum(jnp.where(sel, l_scr[...], 0.0), axis=1,
                    keepdims=True)
    alive = l_run > 0.0
    safe_l = jnp.where(alive, l_run, 1.0)
    ot_buf[...] = jnp.where(alive, ot_buf[...] / safe_l, 0.0)
    lse_buf[...] = jnp.broadcast_to(
        jnp.where(alive, (m_run + jnp.log2(safe_l)) * LN2, -jnp.inf),
        lse_buf.shape)
    co = pltpu.make_async_copy(ot_buf, o_slice, copy_sems.at[3])
    cl = pltpu.make_async_copy(
        lse_buf, lse_hbm.at[b, h, pl.ds(rows, block_q), :],
        copy_sems.at[2])
    co.start()
    cl.start()
    co.wait()
    cl.wait()


def _ring_bwd_kernel(
    q2_hbm,     # ANY [B, Hq, nq, D]   (q pre-scaled by scale*log2e)
    k_hbm,      # ANY [B, Hkv, nk, D]
    v_hbm,      # ANY [B, Hkv, nk, D]
    do_hbm,     # ANY [B, Hq, nq, D]
    lse2_hbm,   # ANY [B, Hq, nq, NUM_LANES] f32 (lse·log2e, lane-replicated)
    delta_hbm,  # ANY [B, Hq, nq, NUM_LANES] f32
    dq_hbm,     # ANY [B, Hq, nq, D] f32 out (accumulated across steps)
    dk_hbm,     # ANY [B, Hkv, nk, D] f32 out
    dv_hbm,     # ANY [B, Hkv, nk, D] f32 out
    kv_slots,   # ANY [2, 2, B, Hkv, nk, D] dtype — rotating K/V
    dkv_slots,  # ANY [2, 2, B, Hkv, nk, D] f32 — rotating dK/dV accumulators
    qt_buf,     # VMEM (bq, D) dtype
    dot_buf,    # VMEM (bq, D) dtype — dO tile
    kc,         # VMEM (nk, D) dtype
    vc,         # VMEM (nk, D) dtype
    dkc,        # VMEM (nk, D) f32
    dvc,        # VMEM (nk, D) f32
    dq_buf,     # VMEM (bq, D) f32
    lse_buf,    # VMEM (bq, NUM_LANES) f32
    dl_buf,     # VMEM (bq, NUM_LANES) f32
    copy_sems,  # DMA (6,)
    send_sems,  # DMA (2,) — kv / dkv outgoing
    recv_kv_sems,   # DMA (2,) — per landing slot
    recv_dkv_sems,  # DMA (2,)
    cap_sem,    # REGULAR
    *,
    axis_name: str,
    n_dev: int,
    causal: bool,
    scale: float,
    block_q: int,
    block_k: int,
    window: tuple[int, int] | None = None,
):
    """Ring-attention backward with in-kernel RDMA rotation (the r4 VERDICT
    stretch: training gets the same structural overlap as the forward).

    Rotation carries FOUR buffers: the K/V chunk (read-only — its RDMA is
    issued BEFORE the step's compute, fully overlapped like the forward)
    and the f32 (dK, dV) accumulator pair, which this step WRITES and can
    therefore only be sent after the step's accumulation — that send sits
    between steps (bounded by 2·B·Hkv·nk·D·4 bytes over ICI). dQ
    accumulates locally in HBM f32 (read-modify-write per q tile, the same
    pattern as the forward's unnormalized O).

    After the last compute step (s = n_dev−1) the accumulator residing
    here belongs to our RIGHT neighbor's chunk (src = my−(n_dev−1) ≡
    my+1), so ONE final dkv hop rightward returns every accumulator to its
    owner, which stores dK = acc·ln2 (q2 carries scale·log2e — the
    symmetric scaling of the fused bwd, reference quirk 1 fixed) and dV.

    Grid is (n_dev + 1,): steps 0..n_dev−1 compute; step n_dev does the
    final hop + store. Capacity accounting (one cap_sem, must balance at
    exit): signals = bootstrap 1 + one per step s < n_dev−1; waits = one
    per send (steps 0..n_dev−2 and the final hop) — both n_dev.
    """
    B, Hq, nq, D = q2_hbm.shape
    Hkv, nk = k_hbm.shape[1], k_hbm.shape[2]
    rep = Hq // Hkv
    nqt = nq // block_q
    dtype = q2_hbm.dtype
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None

    s = pl.program_id(0)
    my = jax.lax.axis_index(axis_name)
    slot = jax.lax.rem(s, 2)
    if n_dev > 1:
        right = jax.lax.rem(my + 1, n_dev)
        left = jax.lax.rem(my + n_dev - 1, n_dev)

    # ---- step 0: stage local KV into slot 0, zero dkv, barrier ----
    @pl.when(s == 0)
    def _bootstrap():
        ck = pltpu.make_async_copy(k_hbm, kv_slots.at[0, 0], copy_sems.at[0])
        cv = pltpu.make_async_copy(v_hbm, kv_slots.at[0, 1], copy_sems.at[1])
        ck.start()
        cv.start()
        ck.wait()
        cv.wait()

        # zero the slot-0 dkv accumulators (VMEM-bounced per (b, hkv))
        def zero_bh(i, carry):
            b = i // Hkv
            hkv = jax.lax.rem(i, Hkv)
            dkc[...] = jnp.zeros_like(dkc)
            for buf in (0, 1):
                cz = pltpu.make_async_copy(
                    dkc, dkv_slots.at[0, buf, b, hkv], copy_sems.at[2])
                cz.start()
                cz.wait()
            return carry

        jax.lax.fori_loop(0, B * Hkv, zero_bh, 0)
        if n_dev > 1:
            barrier = pltpu.get_barrier_semaphore()
            for nbr in (left, right):
                pltpu.semaphore_signal(
                    barrier, inc=1, device_id=nbr,
                    device_id_type=pltpu.DeviceIdType.LOGICAL)
            pltpu.semaphore_wait(barrier, 2)
            pltpu.semaphore_signal(
                cap_sem, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)

    def _kv_rdma():
        return pltpu.make_async_remote_copy(
            src_ref=kv_slots.at[slot],
            dst_ref=kv_slots.at[1 - slot],
            send_sem=send_sems.at[0],
            recv_sem=recv_kv_sems.at[1 - slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    def _dkv_rdma():
        return pltpu.make_async_remote_copy(
            src_ref=dkv_slots.at[slot],
            dst_ref=dkv_slots.at[1 - slot],
            send_sem=send_sems.at[1],
            recv_sem=recv_dkv_sems.at[1 - slot],
            device_id=right,
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )

    compute_step = s < n_dev
    if n_dev > 1:
        # kv chunk is read-only: rotate it DURING this step's compute
        @pl.when(s < n_dev - 1)
        def _send_kv():
            pltpu.semaphore_wait(cap_sem, 1)
            _kv_rdma().start()

    # ---- compute: this chunk's dkv contributions + local dq ----
    src_dev = jax.lax.rem(my - s + n_dev, n_dev)
    kv_off = src_dev * nk
    q_base = my * nq
    is_first = s == 0
    wl, wr = window if window is not None else (-1, -1)
    live = None
    if causal or (wr >= 0 and not causal):
        wr_eff = 0 if causal else wr
        live = kv_off <= q_base + nq - 1 + wr_eff
    if wl >= 0:
        left_ok = kv_off + nk - 1 >= q_base - wl
        live = left_ok if live is None else jnp.logical_and(live, left_ok)
    run = (compute_step if live is None
           else jnp.logical_and(compute_step, live))

    @pl.when(run)
    def _compute():
        def per_bh(i, carry):
            b = i // Hkv
            hkv = jax.lax.rem(i, Hkv)
            ck = pltpu.make_async_copy(
                kv_slots.at[slot, 0, b, hkv], kc, copy_sems.at[0])
            cv = pltpu.make_async_copy(
                kv_slots.at[slot, 1, b, hkv], vc, copy_sems.at[1])
            cdk = pltpu.make_async_copy(
                dkv_slots.at[slot, 0, b, hkv], dkc, copy_sems.at[2])
            cdv = pltpu.make_async_copy(
                dkv_slots.at[slot, 1, b, hkv], dvc, copy_sems.at[3])
            ck.start()
            cv.start()
            cdk.start()
            cdv.start()
            ck.wait()
            cv.wait()
            cdk.wait()
            cdv.wait()

            def per_tile(t, carry2):
                hr = t // nqt
                qt = jax.lax.rem(t, nqt)
                h = hkv * rep + hr
                rows = qt * block_q
                cq = pltpu.make_async_copy(
                    q2_hbm.at[b, h, pl.ds(rows, block_q), :], qt_buf,
                    copy_sems.at[4])
                cdo = pltpu.make_async_copy(
                    do_hbm.at[b, h, pl.ds(rows, block_q), :], dot_buf,
                    copy_sems.at[5])
                cl = pltpu.make_async_copy(
                    lse2_hbm.at[b, h, pl.ds(rows, block_q), :], lse_buf,
                    copy_sems.at[4])
                cdl = pltpu.make_async_copy(
                    delta_hbm.at[b, h, pl.ds(rows, block_q), :], dl_buf,
                    copy_sems.at[5])
                cq.start()
                cdo.start()
                cq.wait()
                cdo.wait()
                cl.start()
                cdl.start()
                cl.wait()
                cdl.wait()
                q2t = qt_buf[...]
                dot = dot_buf[...]
                lse2 = lse_buf[:, :1]
                dlt = dl_buf[:, :1]
                row_ids = (q_base + rows + jax.lax.broadcasted_iota(
                    jnp.int32, (block_q, block_k), 0))

                dq_slice = dq_hbm.at[b, h, pl.ds(rows, block_q), :]

                @pl.when(is_first)
                def _init_dq():
                    dq_buf[...] = jnp.zeros_like(dq_buf)

                @pl.when(jnp.logical_not(is_first))
                def _read_dq():
                    cdq = pltpu.make_async_copy(dq_slice, dq_buf,
                                                copy_sems.at[4])
                    cdq.start()
                    cdq.wait()

                def kv_step(j, dq_acc):
                    cols = pl.ds(j * block_k, block_k)
                    k_j = kc[cols, :]
                    v_j = vc[cols, :]
                    s2 = jax.lax.dot_general(
                        q2t, k_j, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                    masked = causal or wl >= 0 or wr >= 0
                    if masked:
                        col_ids = (kv_off + j * block_k
                                   + jax.lax.broadcasted_iota(
                                       jnp.int32, (block_q, block_k), 1))
                        keep = None
                        if causal:
                            keep = col_ids <= row_ids
                        elif wr >= 0:
                            keep = col_ids <= row_ids + wr
                        if wl >= 0:
                            lk = col_ids >= row_ids - wl
                            keep = (lk if keep is None
                                    else jnp.logical_and(keep, lk))
                        s2 = jnp.where(keep, s2, DEFAULT_MASK_VALUE)
                    # lse2 is in the log2 domain; dead rows (lse == the
                    # finite dead sentinel) underflow p to exact 0.
                    p = jnp.exp2(s2 - lse2)
                    dp = jax.lax.dot_general(
                        dot, v_j, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                    ds = (p * (dp - dlt)).astype(dtype)
                    dvc[cols, :] += jax.lax.dot_general(
                        p.astype(dtype), dot,
                        (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                    dkc[cols, :] += jax.lax.dot_general(
                        ds, q2t, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                    return dq_acc + jax.lax.dot_general(
                        ds, k_j, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)

                dq_new = jax.lax.fori_loop(0, nk // block_k, kv_step,
                                           dq_buf[...])
                dq_buf[...] = dq_new
                cw = pltpu.make_async_copy(dq_buf, dq_slice, copy_sems.at[4])
                cw.start()
                cw.wait()
                return carry2

            jax.lax.fori_loop(0, rep * nqt, per_tile, carry)
            # write the accumulated dkv back into the rotating slot
            wdk = pltpu.make_async_copy(
                dkc, dkv_slots.at[slot, 0, b, hkv], copy_sems.at[2])
            wdv = pltpu.make_async_copy(
                dvc, dkv_slots.at[slot, 1, b, hkv], copy_sems.at[3])
            wdk.start()
            wdv.start()
            wdk.wait()
            wdv.wait()
            return carry

        jax.lax.fori_loop(0, B * Hkv, per_bh, 0)

    # dq tiles for band-dead chunks still need their step-0 zero-init
    if live is not None:
        @pl.when(jnp.logical_and(is_first, jnp.logical_not(live)))
        def _zero_dq():
            def zt(t, carry):
                b = t // (Hq * nqt)
                h = jax.lax.rem(t // nqt, Hq)
                qt = jax.lax.rem(t, nqt)
                dq_buf[...] = jnp.zeros_like(dq_buf)
                cw = pltpu.make_async_copy(
                    dq_buf,
                    dq_hbm.at[b, h, pl.ds(qt * block_q, block_q), :],
                    copy_sems.at[4])
                cw.start()
                cw.wait()
                return carry

            jax.lax.fori_loop(0, B * Hq * nqt, zt, 0)

    if n_dev > 1:
        # ---- close a compute step: rotate dkv AFTER accumulation ----
        @pl.when(s < n_dev - 1)
        def _close_step():
            _dkv_rdma().start()
            kv = _kv_rdma()
            dkv = _dkv_rdma()
            kv.wait_send()
            dkv.wait_send()
            pltpu.semaphore_signal(
                cap_sem, inc=1, device_id=left,
                device_id_type=pltpu.DeviceIdType.LOGICAL)
            kv.wait_recv()
            dkv.wait_recv()

        # ---- final hop: return each accumulator to its chunk's owner ----
        @pl.when(s == n_dev - 1)
        def _final_send():
            pltpu.semaphore_wait(cap_sem, 1)
            rdma = _dkv_rdma()
            rdma.start()
            rdma.wait_send()
            rdma.wait_recv()

    # ---- store: dkv slot[(n_dev) % 2] holds OUR chunk's gradients ----
    @pl.when(s == (n_dev - 1 if n_dev == 1 else n_dev))
    def _store():
        final_slot = (n_dev - 1) % 2 if n_dev == 1 else n_dev % 2

        def st(i, carry):
            b = i // Hkv
            hkv = jax.lax.rem(i, Hkv)
            cdk = pltpu.make_async_copy(
                dkv_slots.at[final_slot, 0, b, hkv], dkc, copy_sems.at[2])
            cdv = pltpu.make_async_copy(
                dkv_slots.at[final_slot, 1, b, hkv], dvc, copy_sems.at[3])
            cdk.start()
            cdv.start()
            cdk.wait()
            cdv.wait()
            dkc[...] = dkc[...] * LN2   # q2 carried scale·log2e
            wdk = pltpu.make_async_copy(
                dkc, dk_hbm.at[b, hkv], copy_sems.at[2])
            wdv = pltpu.make_async_copy(
                dvc, dv_hbm.at[b, hkv], copy_sems.at[3])
            wdk.start()
            wdv.start()
            wdk.wait()
            wdv.wait()
            return carry

        jax.lax.fori_loop(0, B * Hkv, st, 0)


def _ring_kernel_bwd_call(q2, k, v, do, lse2_rep, delta_rep, axis_name,
                          n_dev, causal, scale, block_q, block_k,
                          interpret_params=None, window=None):
    """Launch the ring backward kernel on local chunks (inside shard_map).
    Returns (dq f32, dk f32, dv f32) at local-chunk shapes."""
    B, Hq, nq, D = q2.shape
    Hkv, nk = k.shape[1], k.shape[2]
    dtype = q2.dtype

    kern = functools.partial(
        _ring_bwd_kernel, axis_name=axis_name, n_dev=n_dev, causal=causal,
        scale=scale, block_q=block_q, block_k=block_k, window=window,
    )
    if interpret_params is None:
        interpret = (pltpu.InterpretParams()
                     if platform.pallas_interpret_default() else False)
    else:
        interpret = interpret_params

    dq, dk, dv, _, _ = pl.pallas_call(
        kern,
        grid=(n_dev + 1 if n_dev > 1 else 1,),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, nq, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, nk, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hkv, nk, D), jnp.float32),
            jax.ShapeDtypeStruct((2, 2, B, Hkv, nk, D), dtype),      # kv
            jax.ShapeDtypeStruct((2, 2, B, Hkv, nk, D), jnp.float32),  # dkv
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 6,
        out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                        for _ in range(5)),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), dtype),                # qt_buf
            pltpu.VMEM((block_q, D), dtype),                # dot_buf
            pltpu.VMEM((nk, D), dtype),                     # kc
            pltpu.VMEM((nk, D), dtype),                     # vc
            pltpu.VMEM((nk, D), jnp.float32),               # dkc
            pltpu.VMEM((nk, D), jnp.float32),               # dvc
            pltpu.VMEM((block_q, D), jnp.float32),          # dq_buf
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),  # lse_buf
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),  # dl_buf
            pltpu.SemaphoreType.DMA((6,)),
            pltpu.SemaphoreType.DMA((2,)),   # send kv/dkv
            pltpu.SemaphoreType.DMA((2,)),   # recv kv per slot
            pltpu.SemaphoreType.DMA((2,)),   # recv dkv per slot
            pltpu.SemaphoreType.REGULAR,     # capacity
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            collective_id=2 if n_dev > 1 else None,
        ),
        interpret=interpret,
    )(q2, k, v, do, lse2_rep, delta_rep)
    return dq, dk, dv


def _ring_kernel_fwd_call(q, k, v, axis_name, n_dev, causal, scale,
                          block_q, block_k, interpret_params=None,
                          window=None):
    """Launch the ring kernel on local chunks (inside shard_map).

    Returns (o f32, lse f32 natural-log). q/k/v: [B, H(,kv), n, D_pad],
    n multiples of the block sizes, D lane-padded.
    """
    B, Hq, nq, D = q.shape
    Hkv, nk = k.shape[1], k.shape[2]
    nqt = nq // block_q
    stats_w = -(-(B * Hq * nqt) // 128) * 128  # lane-packed (m, l) width
    dtype = q.dtype

    kern = functools.partial(
        _ring_fwd_kernel, axis_name=axis_name, n_dev=n_dev, causal=causal,
        block_q=block_q, block_k=block_k, window=window,
    )
    if interpret_params is None:
        interpret = (pltpu.InterpretParams()
                     if platform.pallas_interpret_default() else False)
    else:
        interpret = interpret_params

    o, lse, _ = pl.pallas_call(
        kern,
        grid=(n_dev,),
        out_shape=(
            jax.ShapeDtypeStruct((B, Hq, nq, D), jnp.float32),
            jax.ShapeDtypeStruct((B, Hq, nq, NUM_LANES), jnp.float32),
            jax.ShapeDtypeStruct((2, 2, B, Hkv, nk, D), dtype),  # kv_slots
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 3,
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((block_q, D), dtype),              # qt_buf
            pltpu.VMEM((nk, D), dtype),                   # kc
            pltpu.VMEM((nk, D), dtype),                   # vc
            pltpu.VMEM((block_q, D), jnp.float32),        # ot_buf
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),  # lse_buf
            pltpu.VMEM((block_q, stats_w), jnp.float32),  # m_scr
            pltpu.VMEM((block_q, stats_w), jnp.float32),  # l_scr
            pltpu.SemaphoreType.DMA((4,)),   # local copies
            pltpu.SemaphoreType.DMA(()),     # send
            pltpu.SemaphoreType.DMA((2,)),   # recv, one per landing slot
            pltpu.SemaphoreType.REGULAR,     # capacity handshake
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True,
            # collective_id names the barrier semaphore; with one device the
            # barrier block is never emitted and Mosaic rejects a
            # collective_id without a custom barrier (single-chip spot runs).
            collective_id=1 if n_dev > 1 else None,
        ),
        interpret=interpret,
    )(q, k, v)
    return o, lse[..., 0]


def _block_sizes(nq: int, nk: int) -> tuple[int, int]:
    bq = min(512, nq)
    bk = min(512, nk)
    return bq, bk


def supported(nq: int, nk: int, d: int, window) -> bool:
    """Static eligibility of the kernel route for local chunk shapes.
    Sliding windows are supported since r4 (in-kernel band masking + whole-
    chunk band skip)."""
    del window
    bq, bk = _block_sizes(nq, nk)
    return (nq % bq == 0 and nk % bk == 0
            and nq % 128 == 0 and nk % 128 == 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _ring_kernel_core(q, k, v, axis_name, n_dev, causal, scale, window):
    return _ring_kernel_fwd(q, k, v, axis_name, n_dev, causal, scale,
                            window)[0]


def _ring_kernel_fwd(q, k, v, axis_name, n_dev, causal, scale, window):
    B, Hq, nq, D = q.shape
    dp = _pad_head_dim(D)
    bq, bk = _block_sizes(nq, k.shape[2])
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    if dp != D:
        pad = [(0, 0)] * 3 + [(0, dp - D)]
        qs = jnp.pad(qs, pad)
        kp = jnp.pad(k, pad)
        vp = jnp.pad(v, pad)
    else:
        kp, vp = k, v
    o, lse = _ring_kernel_fwd_call(qs, kp, vp, axis_name, n_dev, causal,
                                   scale, bq, bk, window=window)
    o = o[..., :D].astype(q.dtype)
    return o, (q, k, v, o, lse)


def _ring_kernel_bwd(axis_name, n_dev, causal, scale, window, residuals, g):
    q, k, v, o, lse = residuals
    if os.environ.get("FLASHATTN_TPU_RING_BWD_KERNEL", "1") != "1":
        # fallback: the ppermute ring backward (numerically pinned there)
        from flashattn_tpu.parallel import ring as _ring

        outs = _ring._ring_core_bwd(
            axis_name, n_dev, causal, scale, window,
            (q, k, v, None, None, o, lse), g)
        return outs[:3]

    B, Hq, nq, D = q.shape
    dp = _pad_head_dim(D)
    do = g.astype(q.dtype)
    # Δ = rowsum(dO ⊙ O): one-shot preprocess, XLA-fused (the same split as
    # the single-device fused backward; cf. triton _attn_bwd_preprocess).
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    q2 = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    if dp != D:
        pad = [(0, 0)] * 3 + [(0, dp - D)]
        q2 = jnp.pad(q2, pad)
        kp = jnp.pad(k, pad)
        vp = jnp.pad(v, pad)
        dop = jnp.pad(do, pad)
    else:
        kp, vp, dop = k, v, do
    lse2_rep = jnp.broadcast_to((lse * LOG2E)[..., None],
                                (B, Hq, nq, NUM_LANES)).astype(jnp.float32)
    delta_rep = jnp.broadcast_to(delta[..., None],
                                 (B, Hq, nq, NUM_LANES)).astype(jnp.float32)
    bq, bk = _block_sizes(nq, k.shape[2])
    dq, dk, dv = _ring_kernel_bwd_call(
        q2, kp, vp, dop, lse2_rep, delta_rep, axis_name, n_dev, causal,
        scale, bq, bk, window=window)
    dq = (dq[..., :D] * scale).astype(q.dtype)
    dk = dk[..., :D].astype(k.dtype)
    dv = dv[..., :D].astype(v.dtype)
    return dq, dk, dv


_ring_kernel_core.defvjp(_ring_kernel_fwd, _ring_kernel_bwd)


def ring_attention_kernel(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    axis_name: str,
    axis_size: int,
    causal: bool = False,
    scale: float | None = None,
    window: tuple[int, int] | None = None,
) -> jax.Array:
    """In-kernel ring attention on local chunks (call inside ``shard_map``).

    Same contract as :func:`flashattn_tpu.parallel.ring.ring_attention`
    (sequence-sharded q/k/v ``[B, H, N/P, D]``; GQA supported; differentiable
    — backward runs the ppermute ring) but the forward rotates KV via remote
    DMAs issued inside one Pallas kernel, structurally overlapped with the
    per-tile compute. ``window=(left, right)`` masks to a sliding band in
    GLOBAL positions (ring chunks skip bands entirely out of reach).
    """
    if scale is None:
        scale = float(q.shape[-1]) ** -0.5
    kdt = _dispatch_dtype(q.dtype)
    in_dtype = q.dtype
    if not supported(q.shape[2], k.shape[2], q.shape[3], window):
        raise ValueError(
            f"ring kernel route needs 128-aligned local chunks, got "
            f"nq={q.shape[2]} nk={k.shape[2]}; use impl='xla'")
    if q.shape[1] % k.shape[1]:
        raise ValueError(
            f"Hq={q.shape[1]} must be a multiple of Hkv={k.shape[1]}")
    o = _ring_kernel_core(
        q.astype(kdt), k.astype(kdt), v.astype(kdt),
        axis_name, int(axis_size), bool(causal), float(scale),
        None if window is None else (int(window[0]), int(window[1])),
    )
    return o.astype(in_dtype)


def ring_attention_kernel_sharded(
    mesh: Mesh,
    *,
    axis: str = "seq",
    batch_axis: str | None = "data",
    head_axis: str | None = "model",
    causal: bool = False,
    scale: float | None = None,
    interpret_params=None,
    window: tuple[int, int] | None = None,
):
    """Jitted global-shape entry point for the in-kernel ring (the
    ``impl="kernel"`` twin of ``ring.ring_attention_sharded``).

    ``interpret_params``: optional ``pltpu.InterpretParams`` override —
    tests pass ``InterpretParams(detect_races=True)`` to run the Mosaic
    interpreter's cross-device race detector over the RDMA schedule.
    """
    n = mesh.shape[axis]
    spec = P(batch_axis, head_axis, axis, None)

    def local(q, k, v):
        if interpret_params is None:
            return ring_attention_kernel(
                q, k, v, axis_name=axis, axis_size=n, causal=causal,
                scale=scale, window=window)
        # test hook: forward-only launch with explicit interpret params
        if scale is None:
            sc = float(q.shape[-1]) ** -0.5
        else:
            sc = scale
        kdt = _dispatch_dtype(q.dtype)
        bq, bk = _block_sizes(q.shape[2], k.shape[2])
        qs = (q.astype(jnp.float32) * (sc * LOG2E)).astype(kdt)
        o, _ = _ring_kernel_fwd_call(
            qs, k.astype(kdt), v.astype(kdt), axis, n, causal, sc, bq, bk,
            interpret_params=interpret_params, window=window)
        return o.astype(q.dtype)

    mapped = jax.shard_map(
        local, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False,
    )
    return jax.jit(mapped)
