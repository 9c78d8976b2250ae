"""Pallas TPU FlashAttention-2 forward kernel.

TPU-native redesign of the reference's fused forward (fwd_kernel,
kernel_fp16.cu:306-544): the Br×Bc LDS tiles become VMEM BlockSpecs, WMMA
fragments become MXU `jnp.dot` with f32 accumulation, the running (m, l)
online-softmax state lives in VMEM scratch that persists across the KV grid
dimension, and `L = m + log(l)` (kernel_fp16.cu:541-542, here in natural log)
is emitted as the residual for backward and for cross-device LSE merging
(ring attention).

Differences from the reference, by design (SURVEY.md §6-7):
  * causal masking skips whole KV tiles via a predicated region bound by the
    diagonal (the reference masks everything, kernel_fp16.cu:396-411);
  * softmax statistics are always f32 (the reference keeps fp16 LDS tiles);
  * no OOB read-then-mask of the KV tail (quirk 4): inputs are padded and the
    tail is masked with a finite large-negative value in f32;
  * absolute q/kv position offsets are runtime scalars, so the same kernel
    serves sequence-parallel callers (ring attention) with globally-consistent
    causal masks.

Grid: ``(B, Hq, Tq, Tk)`` — batch/head/Q-tile parallel, KV-tile sequential
(the online-softmax reduction), mirroring the reference's ``dim3(b, h, Tr)``
grid with its in-kernel Tc loop (kernel_fp16.cu:798-806, 381-508).
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
LOG2E = 1.4426950408889634  # log2(e)
LN2 = 0.6931471805599453    # 1/LOG2E


def _fwd_kernel(
    # inputs
    offs_ref,  # SMEM (2,) int32: [q_offset, kv_offset] absolute positions
    q_ref,     # VMEM (1, 1, block_q, D)
    k_ref,     # VMEM (1, 1, block_k, D)
    v_ref,     # VMEM (1, 1, block_k, D)
    bias_ref,  # VMEM (1, 1, block_q, block_k) or None
    k_scale_ref,  # VMEM (1, 1, 1, block_k) f32 per-token K scales, or None
    v_scale_ref,  # VMEM (1, 1, 1, block_k) f32 per-token V scales, or None
    # outputs
    o_ref,     # VMEM (1, 1, block_q, D)
    lse_ref,   # VMEM (1, 1, block_q, NUM_LANES) or None
    # scratch
    m_scr,     # VMEM (block_q, NUM_LANES) f32
    l_scr,     # VMEM (block_q, NUM_LANES) f32
    acc_scr,   # VMEM (block_q, D) f32
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
    bounded_delta: int | None = None,
    num_kv_tiles_total: int | None = None,
    static_offs: tuple[int, int] | None = None,
    kv_splits: int = 1,
):
    q_tile = pl.program_id(2)
    grid_j = pl.program_id(3)

    @pl.when(grid_j == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    if static_offs is not None:
        q_off, kv_off = static_offs
    else:
        q_off = offs_ref[0]
        kv_off = offs_ref[1]

    if bounded_delta is not None:
        # Bounded-KV grid (windowed attention, static offsets): grid axis 3
        # spans only the tiles that can intersect the window; the true KV
        # tile index is recovered from the q tile. Out-of-range j (clamped
        # DMA at the sequence edges) is predicated off.
        kv_tile = (q_tile * block_q + bounded_delta) // block_k + grid_j
        in_range = jnp.logical_and(kv_tile >= 0,
                                   kv_tile < num_kv_tiles_total)
    else:
        kv_tile = grid_j
        in_range = True

    wl, wr = window if window is not None else (-1, -1)
    if causal or wr >= 0:
        # Skip tiles strictly above the diagonal (+ right window): the tile's
        # first kv position must not exceed the tile's last q position (+wr).
        first_kv_pos = kv_tile * block_k + kv_off
        last_q_pos = q_tile * block_q + (block_q - 1) + q_off
        bound = last_q_pos + (wr if (wr >= 0 and not causal) else 0)
        should_run = first_kv_pos <= bound
    else:
        should_run = True
    if wl >= 0:
        # Sliding window: skip tiles entirely left of the window.
        last_kv_pos = kv_tile * block_k + (block_k - 1) + kv_off
        first_q_pos = q_tile * block_q + q_off
        in_window = last_kv_pos >= first_q_pos - wl
        should_run = jnp.logical_and(should_run, in_window) \
            if not isinstance(should_run, bool) else in_window
    if bounded_delta is not None:
        should_run = jnp.logical_and(should_run, in_range) \
            if not isinstance(should_run, bool) else in_range

    @pl.when(should_run)
    def _compute():
        q = q_ref[0, 0]
        sub_k = block_k // kv_splits
        # Issue ALL sub-tile QK^T dots up front: each is independent of the
        # other sub-tiles' softmax, so Mosaic can overlap the next sub-tile's
        # MXU dot with the current sub-tile's VPU softmax (kv_splits > 1).
        # The softmax scale (×log2 e) is folded into Q by the host wrapper —
        # one fused pass instead of a per-step (bq, bk) scaling here (the
        # reference folds the scale the same way, kernel_fp16.cu:827).
        # f32 inputs: the MXU demotes f32 dot operands to bf16 by default —
        # request full f32 (bf16x-pass) matmuls so the f32 path is actually
        # f32 (measured: default f32 maxdiff vs oracle was bf16-level 7e-3).
        prec = (jax.lax.Precision.HIGHEST
                if q.dtype == jnp.float32 else None)
        def part_should_run(part):
            # per-sub-tile skip (finer than the whole-block predicate):
            # diagonal-adjacent blocks only compute their in-causal/-window
            # sub-tiles
            col0 = (kv_tile * block_k + part * sub_k) + kv_off
            run = None
            if causal or wr >= 0:
                last_q_pos = q_tile * block_q + (block_q - 1) + q_off
                bound = last_q_pos + (wr if (wr >= 0 and not causal) else 0)
                run = col0 <= bound
            if wl >= 0:
                first_q_pos = q_tile * block_q + q_off
                in_win = col0 + (sub_k - 1) >= first_q_pos - wl
                run = in_win if run is None else jnp.logical_and(run, in_win)
            return run

        s_parts = []
        for part in range(kv_splits):
            k = k_ref[0, 0, part * sub_k:(part + 1) * sub_k, :]
            if k.dtype in (jnp.int8.dtype, jnp.float8_e4m3fn.dtype):
                k = k.astype(q.dtype)
            s_parts.append(jax.lax.dot_general(
                q, k,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec,
            ))

        need_tail_mask = kv_valid_len != kv_padded_len
        has_window = wl >= 0 or wr >= 0
        v = v_ref[0, 0]
        mm_dtype = q_ref.dtype if v.dtype in (
            jnp.int8.dtype, jnp.float8_e4m3fn.dtype) else v.dtype

        for part in range(kv_splits):
            run_part = part_should_run(part) if kv_splits > 1 else None

            def _update_part(part=part):
                s = s_parts[part]
                col0 = kv_tile * block_k + part * sub_k
                if k_scale_ref is not None:
                    # Quantized K: per-token dequant folded as a *column*
                    # scaling of the scores, s_j·(q·k_j) = q·(s_j k_j) —
                    # lane-aligned, so the int8/fp8 payload never round-trips
                    # VMEM dequantized.
                    s *= k_scale_ref[
                        0, 0, 0, part * sub_k:(part + 1) * sub_k][None, :]
                if bias_ref is not None:
                    s += bias_ref[
                        0, 0, :, part * sub_k:(part + 1) * sub_k
                    ].astype(jnp.float32) * LOG2E

                if causal or need_tail_mask or has_window:
                    col_pos = jax.lax.broadcasted_iota(
                        jnp.int32, (block_q, sub_k), 1
                    ) + col0
                    mask = None
                    if need_tail_mask:
                        mask = col_pos < kv_valid_len
                    if causal or has_window:
                        row_pos = jax.lax.broadcasted_iota(
                            jnp.int32, (block_q, sub_k), 0
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
                    s = jnp.where(mask, s, mask_value)

                m_prev = m_scr[...]                              # (bq, 128)
                l_prev = l_scr[...]
                m_cur = jnp.max(s, axis=1, keepdims=True)        # (bq, 1)
                m_next = jnp.maximum(m_prev, m_cur)              # (bq, 128)
                alpha = jnp.exp2(m_prev - m_next)
                p = jnp.exp2(s - m_next[:, :1])                  # (bq, sub_k)
                l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
                m_scr[...] = m_next
                l_scr[...] = l_next

                acc_scr[...] *= alpha[:, :1]
                if v_scale_ref is not None:
                    # Quantized V: P @ diag(s_v) @ V == (P ∘ s_v[None,:]) @ V.
                    p2 = p * v_scale_ref[
                        0, 0, 0, part * sub_k:(part + 1) * sub_k][None, :]
                else:
                    p2 = p
                acc_scr[...] += jax.lax.dot(
                    p2.astype(mm_dtype),
                    v[part * sub_k:(part + 1) * sub_k, :].astype(mm_dtype),
                    preferred_element_type=jnp.float32, precision=prec,
                )

            if run_part is None:
                _update_part()
            else:
                pl.when(run_part)(_update_part)

    @pl.when(grid_j == num_kv_tiles - 1)
    def _store():
        l = l_scr[...]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_scr[...] * (1.0 / l_safe[:, :1])).astype(o_ref.dtype)
        if lse_ref is not None:
            # m is in log2 units; emit natural-log LSE (the bwd contract)
            lse_ref[0, 0] = m_scr[...] * LN2 + jnp.log(l_safe)


@functools.partial(
    jax.jit,
    static_argnames=(
        "scale", "causal", "block_q", "block_k", "kv_valid_len",
        "return_lse", "interpret", "num_heads_q", "window", "static_offsets",
        "kv_splits",
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
):
    """Launch the forward kernel on pre-padded, canonical-layout inputs.

    Host-side padding/slicing lives in :mod:`flashattn_tpu.ops.flash` (the
    role of forward_fp16's pad/slice prologue, kernel_fp16.cu:761-796).

    When ``static_offsets`` (compile-time q/kv offsets) are given AND the
    window bounds both sides (left ≥ 0 and causal or right ≥ 0), the KV grid
    axis is *bounded*: it spans only the tiles a q tile can see, so cost
    scales with the window instead of Nk (no per-skipped-tile program
    overhead).
    """
    if interpret is None:
        interpret = platform.pallas_interpret_default()
    if kv_splits is None:
        # 1024-wide score sub-tiles measured best on v5e: with ≥2 sub-tiles
        # per block, sub-tile i+1's QK^T (MXU) overlaps sub-tile i's softmax
        # (VPU): 141 -> 164 TFLOP/s at D=128 (+16%).
        kv_splits = max(1, block_k // 1024)
    # Fold the softmax scale (in the kernel's log2 domain) into Q: one
    # elementwise pass XLA-fuses into the surrounding graph, instead of a
    # (bq, bk) VPU pass per KV step inside the kernel.
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    B, Hq, Nqp, D = q.shape
    _, Hkv, Nkp, _ = k.shape
    assert Nqp % block_q == 0 and Nkp % block_k == 0, (Nqp, block_q, Nkp, block_k)
    assert Hq == num_heads_q
    tq, tk = Nqp // block_q, Nkp // block_k
    q_hd_ratio = Hq // Hkv

    wl, wr = window if window is not None else (-1, -1)
    bounded = (
        static_offsets is not None and wl >= 0 and (causal or wr >= 0)
    )
    if bounded:
        wr_eff = 0 if causal else wr
        kv_w = (block_q + wl + wr_eff - 1) // block_k + 2
        if kv_w >= tk:
            bounded = False  # window covers (almost) all tiles — no benefit,
            # and a clamped narrower grid would miss coverage at the edges
    if bounded:
        delta = static_offsets[0] - static_offsets[1] - wl
        grid = (B, Hq, tq, kv_w)

        def kv_tile_of(i, j):
            return jnp.clip((i * block_q + delta) // block_k + j, 0, tk - 1)
    else:
        kv_w = tk
        delta = None
        grid = (B, Hq, tq, tk)

        def kv_tile_of(i, j):
            return j

    def q_index(b, h, i, j):
        return (b, h, i, 0)

    def kv_index(b, h, i, j):
        return (b, h // q_hd_ratio, kv_tile_of(i, j), 0)

    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # offsets
        pl.BlockSpec((1, 1, block_q, D), q_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), kv_index, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, block_k, D), kv_index, memory_space=pltpu.VMEM),
    ]
    args = [offsets.astype(jnp.int32), q, k, v]
    if bias is not None:
        Bb, Hb = bias.shape[0], bias.shape[1]

        def bias_index(b, h, i, j):
            return (b if Bb > 1 else 0, h if Hb > 1 else 0, i, kv_tile_of(i, j))

        in_specs.append(
            pl.BlockSpec((1, 1, block_q, block_k), bias_index,
                         memory_space=pltpu.VMEM)
        )
        args.append(bias)

    def scale_index(b, h, i, j):
        return (b, h // q_hd_ratio, 0, kv_tile_of(i, j))

    for sc in (k_scale, v_scale):
        if sc is not None:
            # [B, Hkv, Nk] -> [B, Hkv, 1, Nk]: Mosaic needs the block's last
            # two dims (1, block_k) aligned to (sublane, lane) tiling.
            in_specs.append(
                pl.BlockSpec((1, 1, 1, block_k), scale_index,
                             memory_space=pltpu.VMEM)
            )
            args.append(sc[:, :, None, :])

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

    def kernel_entry(offs, qr, kr, vr, *rest):
        idx = 0
        bias_r = ks_r = vs_r = None
        if has_bias:
            bias_r = rest[idx]; idx += 1
        if has_ks:
            ks_r = rest[idx]; idx += 1
        if has_vs:
            vs_r = rest[idx]; idx += 1
        o_r = rest[idx]; idx += 1
        lse_r = rest[idx] if return_lse else None
        idx += 1 if return_lse else 0
        m_scr, l_scr, acc_scr = rest[idx:idx + 3]
        _fwd_kernel(
            offs, qr, kr, vr, bias_r, ks_r, vs_r, o_r, lse_r,
            m_scr, l_scr, acc_scr,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            num_kv_tiles=kv_w, kv_valid_len=kv_valid_len, kv_padded_len=Nkp,
            mask_value=DEFAULT_MASK_VALUE, window=window,
            bounded_delta=delta, num_kv_tiles_total=tk,
            static_offs=static_offsets, kv_splits=kv_splits,
        )

    flops_per_prog = 4 * block_q * block_k * D  # QK^T + PV
    cost = pl.CostEstimate(
        flops=int(flops_per_prog * B * Hq * tq * kv_w
                  * (0.5 if (causal and not bounded) else 1.0)),
        bytes_accessed=(q.size + k.size + v.size + q.size) * q.dtype.itemsize,
        transcendentals=B * Hq * Nqp * min(Nkp, kv_w * block_k),
    )

    outs = pl.pallas_call(
        kernel_entry,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, NUM_LANES), jnp.float32),
            pltpu.VMEM((block_q, D), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel", "arbitrary"),
            # default scoped-VMEM budget is 16 MB; v5e has 128 MB of VMEM —
            # raise the cap so (1024,1024) tiles fit alongside bias/dbias
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=cost,
        interpret=interpret,
    )(*args)

    o = outs[0]
    lse = outs[1][..., 0] if return_lse else None  # de-replicate lanes
    return o, lse
