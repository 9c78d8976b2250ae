"""On-chip tuning matrix for the resident causal kernels.

Sweeps the env-tunable geometry/pipelining knobs (RC_SUBQ/SUBK/PENDING_MB,
RB_SUB/TRI/LOOKAHEAD, RB_MAXN/RC_MAXN) across configs and prints one JSON
line per point. Each config runs in a SUBPROCESS: the knobs are read at
module import and jit caches key on static args only, so in-process
re-binding would silently reuse stale compiled code.

Role parity: the reference tunes Br/Bc against the device the same way —
measure, pick, hard-code (FlashAttn.py:56-67, brbcCalc.xlsx). This is the
measurement half; winners get folded into the defaults.

Run: python benchmarks/spot_tune.py [matrix ...]   (matrices: bwd4k big n8kcheck d64)
Child: spot_tune.py --child <mode> <B> <H> <N> <D>
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def child(mode, B, H, N, D):
    from flashattn_tpu.utils.platform import enable_compilation_cache
    from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock

    acquire_tpu_lock(on_timeout="abort")
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from flashattn_tpu import flash_attention
    from flashattn_tpu.utils.testing import make_qkv
    from flashattn_tpu.utils.timing import attention_flops, time_chained_stats

    dtype = jnp.bfloat16
    q, k, v = make_qkv(jax.random.PRNGKey(0), B, H, N, D, dtype=dtype)

    causal = os.environ.get("FLASHATTN_TPU_TUNE_CAUSAL", "1") == "1"
    win_env = os.environ.get("FLASHATTN_TPU_TUNE_WINDOW")
    window = (int(win_env) - 1, 0) if win_env else None
    if window is not None:
        causal = False  # the sweep convention: window=(w-1, 0), causal off
    bs = None
    if os.environ.get("FLASHATTN_TPU_BQ") or os.environ.get(
            "FLASHATTN_TPU_BK"):
        from flashattn_tpu.ops.flash import BlockSizes, choose_block_sizes

        auto = choose_block_sizes(N, N, D, dtype, False, causal)
        bs = BlockSizes(
            block_q=int(os.environ.get("FLASHATTN_TPU_BQ", auto.block_q)),
            block_k=int(os.environ.get("FLASHATTN_TPU_BK", auto.block_k)),
            block_q_dkv=auto.block_q_dkv, block_k_dkv=auto.block_k_dkv,
            block_q_dq=auto.block_q_dq, block_k_dq=auto.block_k_dq)

    if mode == "check":
        # Numerics vs the O(N)-memory golden model (1 head) on this chip.
        from flashattn_tpu.ops.reference import flash_attention_reference

        qs, ks, vs = (x[:, :1] for x in (q, k, v))
        o = flash_attention(qs, ks, vs, causal=True)
        w = flash_attention_reference(
            *(x.astype(jnp.float32) for x in (qs, ks, vs)), causal=True,
            block_q=512, block_k=1024)
        md = float(jnp.max(jnp.abs(o.astype(jnp.float32) - w)))
        g = jax.grad(lambda a, b, c: (
            flash_attention(a, b, c, causal=True)
            .astype(jnp.float32) ** 2).sum(), (0, 1, 2))(qs, ks, vs)
        jax.block_until_ready(g)
        print(json.dumps({"mode": "check", "N": N, "D": D,
                          "maxdiff": round(md, 6),
                          "ok": bool(md < 2e-2)}), flush=True)
        return

    if mode == "fwd":
        def step(qq, kk, vv):
            return flash_attention(qq, kk, vv, causal=causal,
                                   block_sizes=bs, window=window)
    else:
        def step(qq, kk, vv):
            dq, dk, dv = jax.grad(
                lambda a, b, c: (flash_attention(a, b, c, causal=causal,
                                                 block_sizes=bs,
                                                 window=window)
                                 .astype(jnp.float32) ** 2).sum(),
                (0, 1, 2))(qq, kk, vv)
            return (qq + 1e-30 * (dq + dk.astype(qq.dtype)
                                  + dv.astype(qq.dtype))).astype(qq.dtype)

    stats = time_chained_stats(step, q, consts=(k, v), iters=16,
                               warmup_iters=4, repeats=5)
    t = stats["per_iter"]
    fl = attention_flops(B, H, N, N, D, causal=causal, mode=mode,
                         window=window)
    print(json.dumps({
        "mode": mode, "B": B, "H": H, "N": N, "D": D, "causal": causal,
        "ms": round(t * 1e3, 4), "tflops": round(fl / t / 1e12, 2),
        "spread_pct": round(stats["spread"] * 100, 1),
        "env": {kk: vv for kk, vv in os.environ.items()
                if kk.startswith("FLASHATTN_TPU_")
                and kk not in ("FLASHATTN_TPU_LOCK",
                               "FLASHATTN_TPU_TUNE_CAUSAL")},
    }), flush=True)


def run(tag, mode, env, B=1, H=24, N=4096, D=128, timeout=1800):
    e = dict(os.environ)
    e.update({k: str(v) for k, v in env.items()})
    print(f"--- {tag}: {mode} N={N} D={D} {env}", flush=True)
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode,
             str(B), str(H), str(N), str(D)],
            env=e, cwd=REPO, timeout=timeout, capture_output=True, text=True)
    except subprocess.TimeoutExpired:
        # a hung tunnel or a pathological Mosaic compile must not kill the
        # rest of the matrix — record and move on
        print(f"FAILED timeout after {timeout}s", flush=True)
        return
    out = r.stdout.strip()
    print(out if out else f"(no output, rc={r.returncode})", flush=True)
    if r.returncode != 0:
        tail = "\n".join(r.stderr.strip().splitlines()[-12:])
        print(f"FAILED rc={r.returncode}\n{tail}", flush=True)


MATRICES = {
    # causal fwd+bwd N=4096 D=128 — resident-bwd knob sweep + flat arm
    "bwd4k": [
        ("rb-default", "fwd_bwd", {}),
        ("rb-tri512", "fwd_bwd", {"FLASHATTN_TPU_RB_TRI": 512}),
        ("rb-tri1024", "fwd_bwd", {"FLASHATTN_TPU_RB_TRI": 1024}),
        ("rb-la2", "fwd_bwd", {"FLASHATTN_TPU_RB_LOOKAHEAD": 2}),
        ("rb-tri512-la2", "fwd_bwd", {"FLASHATTN_TPU_RB_TRI": 512,
                                      "FLASHATTN_TPU_RB_LOOKAHEAD": 2}),
        ("rb-sub512", "fwd_bwd", {"FLASHATTN_TPU_RB_SUB": 512}),
        ("flat-tri", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0}),
    ],
    # causal fwd N=8192 D=128 — resident geometry/lookahead vs flat grid
    "big": [
        ("rc8k-default", "fwd", {"FLASHATTN_TPU_RC_MAXN": 8192}, 8192),
        ("rc8k-p48", "fwd", {"FLASHATTN_TPU_RC_MAXN": 8192,
                             "FLASHATTN_TPU_RC_PENDING_MB": 48}, 8192),
        ("rc8k-subk1024", "fwd", {"FLASHATTN_TPU_RC_MAXN": 8192,
                                  "FLASHATTN_TPU_RC_SUBK": 1024}, 8192),
        ("rc8k-subq1024", "fwd", {"FLASHATTN_TPU_RC_MAXN": 8192,
                                  "FLASHATTN_TPU_RC_SUBQ": 1024,
                                  "FLASHATTN_TPU_RC_PENDING_MB": 48}, 8192),
        ("flat8k", "fwd", {"FLASHATTN_TPU_RC_MAXN": 4096}, 8192),
        ("rc8k-fwdbwd", "fwd_bwd", {"FLASHATTN_TPU_RC_MAXN": 8192,
                                    "FLASHATTN_TPU_RB_MAXN": 8192}, 8192),
        ("rc5k", "fwd", {"FLASHATTN_TPU_RC_MAXN": 8192}, 5120),
        ("rc6k", "fwd", {"FLASHATTN_TPU_RC_MAXN": 8192}, 6144),
    ],
    # numerics gate for the new big-N geometry (sub_q 512 everywhere)
    "n8kcheck": [
        ("rc8k-check", "check", {"FLASHATTN_TPU_RC_MAXN": 8192,
                                 "FLASHATTN_TPU_RB_MAXN": 8192}, 8192),
    ],
    # round 2 of the causal fwd+bwd hunt: the flat fused bwd beat the
    # resident (128.7 vs 121.4) — probe its block/chunk space, and check
    # whether flat also wins at 5120/6144 (resident measured 133.8/137.8).
    "bwd4k2": [
        ("flat-tri128", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0,
                                    "FLASHATTN_TPU_TRIF": 128}),
        ("flat-tri512", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0,
                                    "FLASHATTN_TPU_TRIF": 512}),
        ("flat-bq2048-tri512", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0,
                                           "FLASHATTN_TPU_BQF": 2048,
                                           "FLASHATTN_TPU_BKF": 2048,
                                           "FLASHATTN_TPU_TRIF": 512}),
        ("flat-bq2048-tri256", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0,
                                           "FLASHATTN_TPU_BQF": 2048,
                                           "FLASHATTN_TPU_BKF": 2048,
                                           "FLASHATTN_TPU_TRIF": 256}),
        ("flat-bwd5k", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0}, 5120),
        ("flat-bwd6k", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0}, 6144),
    ],
    # causal fwd N=4096: can the resident forward reach its pre-outage ~163?
    "fwd4k": [
        ("rc4k-default", "fwd", {}),
        ("rc4k-subk1024", "fwd", {"FLASHATTN_TPU_RC_SUBK": 1024}),
        ("rc4k-subq256", "fwd", {"FLASHATTN_TPU_RC_SUBQ": 256}),
        ("rc4k-subq1024", "fwd", {"FLASHATTN_TPU_RC_SUBQ": 1024}),
        ("flat4k-fwd", "fwd", {"FLASHATTN_TPU_RC_MAXN": 0}),
    ],
    # D=64 noncausal fwd (VERDICT #5): ~88 TF vs the measured ~109
    # thin-matmul ceiling. Wider q blocks amortize the per-grid-step floor;
    # split variants change the MXU/VPU interleave granularity.
    "d64": [
        ("d64-base", "fwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0}, 4096, 64),
        ("d64-bq2048", "fwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0,
                               "FLASHATTN_TPU_BQ": 2048}, 4096, 64),
        ("d64-bq2048-q2", "fwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0,
                                  "FLASHATTN_TPU_BQ": 2048,
                                  "FLASHATTN_TPU_Q_SPLITS": 2}, 4096, 64),
        ("d64-bk4096", "fwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0,
                               "FLASHATTN_TPU_BK": 4096}, 4096, 64),
        ("d64-bq2048-bk4096", "fwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0,
                                      "FLASHATTN_TPU_BQ": 2048,
                                      "FLASHATTN_TPU_BK": 4096}, 4096, 64),
        ("d64-kvs4", "fwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0,
                             "FLASHATTN_TPU_KV_SPLITS": 4}, 4096, 64),
    ],
    # round 3: combine the measured winners and find the crossovers
    "combo": [
        ("fwd-subq256-subk1024", "fwd", {"FLASHATTN_TPU_RC_SUBQ": 256,
                                         "FLASHATTN_TPU_RC_SUBK": 1024}),
        ("fwd-subq128", "fwd", {"FLASHATTN_TPU_RC_SUBQ": 128}),
        ("fwd5k-subq256", "fwd", {"FLASHATTN_TPU_RC_SUBQ": 256,
                                  "FLASHATTN_TPU_RC_MAXN": 8192}, 5120),
        ("fwd6k-subq256", "fwd", {"FLASHATTN_TPU_RC_SUBQ": 256,
                                  "FLASHATTN_TPU_RC_MAXN": 8192}, 6144),
        ("best-fwdbwd4k", "fwd_bwd", {"FLASHATTN_TPU_RC_SUBQ": 256,
                                      "FLASHATTN_TPU_RB_MAXN": 0,
                                      "FLASHATTN_TPU_BQF": 2048,
                                      "FLASHATTN_TPU_BKF": 2048,
                                      "FLASHATTN_TPU_TRIF": 256}),
        ("nc-fwdbwd-bq2048", "fwd_bwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0,
                                         "FLASHATTN_TPU_BQF": 2048,
                                         "FLASHATTN_TPU_BKF": 2048}),
        ("flat-bwd8k-bq2048", "fwd_bwd", {"FLASHATTN_TPU_RC_MAXN": 4096,
                                          "FLASHATTN_TPU_RB_MAXN": 0,
                                          "FLASHATTN_TPU_BQF": 2048,
                                          "FLASHATTN_TPU_BKF": 2048,
                                          "FLASHATTN_TPU_TRIF": 256}, 8192),
        ("res-bwd5k-subq256", "fwd_bwd", {"FLASHATTN_TPU_RC_SUBQ": 256,
                                          "FLASHATTN_TPU_RC_MAXN": 8192,
                                          "FLASHATTN_TPU_RB_MAXN": 8192},
         5120),
    ],
    "d64b": [
        ("d64-bq2048-bk4096-kvs2", "fwd", {
            "FLASHATTN_TPU_TUNE_CAUSAL": 0, "FLASHATTN_TPU_BQ": 2048,
            "FLASHATTN_TPU_BK": 4096, "FLASHATTN_TPU_KV_SPLITS": 2},
         4096, 64),
        ("d64-bq4096-bk4096", "fwd", {
            "FLASHATTN_TPU_TUNE_CAUSAL": 0, "FLASHATTN_TPU_BQ": 4096,
            "FLASHATTN_TPU_BK": 4096}, 4096, 64),
        ("d64-bq2048-bk4096-q2", "fwd", {
            "FLASHATTN_TPU_TUNE_CAUSAL": 0, "FLASHATTN_TPU_BQ": 2048,
            "FLASHATTN_TPU_BK": 4096, "FLASHATTN_TPU_Q_SPLITS": 2},
         4096, 64),
        # L=2 lookahead: pending 8 MB — does resident 8192 fit with H>1
        # (double-buffered seq blocks) and keep enough MXU/VPU overlap?
        ("rc8k-p8", "fwd", {"FLASHATTN_TPU_RC_MAXN": 8192,
                            "FLASHATTN_TPU_RC_PENDING_MB": 8}, 8192, 128),
    ],
    # round 3 (cont.): hierarchical causal decomposition past the resident
    # ceiling (flash._fwd_causal_decomposed) + fused-bwd tri lookahead
    "r3c": [
        ("decomp8k-check", "check", {}, 8192),
        ("decomp8k-fwd", "fwd", {}, 8192),
        ("decomp8k-fwdbwd", "fwd_bwd", {}, 8192),
        ("trila2-fwdbwd4k", "fwd_bwd", {}),
        ("trila1-fwdbwd4k", "fwd_bwd", {"FLASHATTN_TPU_TRI_LA": 1}),
        ("decomp12k-fwd", "fwd", {}, 12288),
    ],
    # round 3 (cont.): single-pair whole-sequence flat fused bwd at N=4096
    # — blocks 4096² make the causal pair table one triangular pair
    # (16×256-row chunks, 53% of square MXU work vs 3 pairs at 2048²).
    "bwd1p": [
        ("flat-bq4096-tri256", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0,
                                           "FLASHATTN_TPU_BQF": 4096,
                                           "FLASHATTN_TPU_BKF": 4096,
                                           "FLASHATTN_TPU_TRIF": 256}),
        ("flat-bq4096-tri512", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0,
                                           "FLASHATTN_TPU_BQF": 4096,
                                           "FLASHATTN_TPU_BKF": 4096,
                                           "FLASHATTN_TPU_TRIF": 512}),
        ("flat-bq4096-tri256-la3", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0,
                                               "FLASHATTN_TPU_BQF": 4096,
                                               "FLASHATTN_TPU_BKF": 4096,
                                               "FLASHATTN_TPU_TRIF": 256,
                                               "FLASHATTN_TPU_TRI_LA": 3}),
        ("flat-bq4096-tri128", "fwd_bwd", {"FLASHATTN_TPU_RB_MAXN": 0,
                                           "FLASHATTN_TPU_BQF": 4096,
                                           "FLASHATTN_TPU_BKF": 4096,
                                           "FLASHATTN_TPU_TRIF": 128}),
    ],
    # round 3 (cont. 2): corner-split tri chunks in the flat fused bwd
    # (mask only the trailing tri×tri corner) + macro-resident causal fwd
    # past the resident ceiling (one resident launch per 1024-row slab).
    "r3d": [
        ("corner-fwdbwd4k", "fwd_bwd", {}),
        ("corner-fwdbwd4k-la3", "fwd_bwd", {"FLASHATTN_TPU_TRI_LA": 3}),
        ("macro8k-check", "check", {}, 8192),
        ("macro8k-fwd", "fwd", {}, 8192),
        ("macro8k-fwdbwd", "fwd_bwd", {}, 8192),
        ("macro12k-fwd", "fwd", {}, 12288),
    ],
    # round 3 (cont. 3): fused-bwd kv sub-splits — full pairs at kvs=1
    # have no intra-pair MXU/VPU overlap (one lead per pair); probe whether
    # 2|4 sub-tiles lift the 153 TF noncausal / 135 TF causal raw rates.
    "bwdkvs": [
        ("kvs2-causal", "fwd_bwd", {"FLASHATTN_TPU_BWD_KVS": 2}),
        ("kvs2-la3-causal", "fwd_bwd", {"FLASHATTN_TPU_BWD_KVS": 2,
                                        "FLASHATTN_TPU_TRI_LA": 3}),
        ("kvs2-noncausal", "fwd_bwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0,
                                       "FLASHATTN_TPU_BWD_KVS": 2}),
        ("kvs4-noncausal", "fwd_bwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0,
                                       "FLASHATTN_TPU_BWD_KVS": 4}),
    ],
    # round 3 (cont. 4): macro-resident vs whole-sequence resident below
    # the ceiling — 8192 measured 160.5 (vs 132 flat), above even the
    # N=4096 resident's 149; does macro win everywhere?
    "macroN": [
        ("macro6k-fwd", "fwd", {"FLASHATTN_TPU_RC_MAXN": 0}, 6144),
        ("macro5k-fwd", "fwd", {"FLASHATTN_TPU_RC_MAXN": 0}, 5120),
        ("macro4k-fwd", "fwd", {"FLASHATTN_TPU_RC_MAXN": 0}, 4096),
        ("macro4k-fwdbwd", "fwd_bwd", {"FLASHATTN_TPU_RC_MAXN": 0}),
        ("macro4k-m2048", "fwd", {"FLASHATTN_TPU_RC_MAXN": 0,
                                  "FLASHATTN_TPU_MACRO_ROWS": 2048}, 4096),
        ("macro8k-m512", "fwd", {"FLASHATTN_TPU_MACRO_ROWS": 512}, 8192),
    ],
    # round 3 (cont. 5): recursive triangle decomposition in the fused-bwd
    # diag pairs (diag(n) → diag(n/2) + full(n/2)² + diag(n/2)).
    "tri2": [
        ("rectri-fwdbwd4k", "fwd_bwd", {}),
        ("rectri-fwdbwd4k-la3", "fwd_bwd", {"FLASHATTN_TPU_TRI_LA": 3}),
        ("rectri-fwdbwd4k-la1", "fwd_bwd", {"FLASHATTN_TPU_TRI_LA": 1}),
        ("rectri-fwdbwd8k", "fwd_bwd", {}, 8192),
    ],
    # D=160 mini-sweep (NOTES promise): partial-lane tile behavior
    "d160": [
        ("d160-fwd", "fwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0}, 4096, 160),
        ("d160-fwdbwd", "fwd_bwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0},
         4096, 160),
    ],
    # r5 (VERDICT r4 #2): measured bwd MXU-only ceiling — same 5-dot
    # dataflow, VPU softmax chain skipped (FLASHATTN_TPU_BWD_NOVPU; timing
    # only, numerics garbage). bwd ceiling = 5·fpm/(t_novpu − t_fwd).
    "d64ceil": [
        ("fwd-c-d64", "fwd", {}, 4096, 64),
        ("base-c-d64", "fwd_bwd", {}, 4096, 64),
        ("novpu-c-d64", "fwd_bwd", {"FLASHATTN_TPU_BWD_NOVPU": 1},
         4096, 64),
        ("base-nc-d64", "fwd_bwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0},
         4096, 64),
        ("novpu-nc-d64", "fwd_bwd", {"FLASHATTN_TPU_TUNE_CAUSAL": 0,
                                     "FLASHATTN_TPU_BWD_NOVPU": 1},
         4096, 64),
        ("novpu-c-d128", "fwd_bwd", {"FLASHATTN_TPU_BWD_NOVPU": 1},
         4096, 128),
        # untried structural lever: resident bwd forced onto 4096 at D=64
        ("rbforce-c-d64", "fwd_bwd", {"FLASHATTN_TPU_RB_FORCE": 1},
         4096, 64),
        ("rbforce-tri128", "fwd_bwd", {"FLASHATTN_TPU_RB_FORCE": 1,
                                       "FLASHATTN_TPU_RB_TRI": 128},
         4096, 64),
    ],
    # r5 (VERDICT r4 #5): windowed fwd+bwd decays 119→100 TF band-area
    # from N=8k to 32k — the KV-slab macro bwd pays a per-slab cost the fwd
    # tier doesn't. Wider slabs at long N + dQ-partial layout.
    "win32k": [
        ("w32k-default", "fwd_bwd", {"FLASHATTN_TPU_TUNE_WINDOW": 2048},
         32768, 128),
        ("w32k-cols4096", "fwd_bwd", {"FLASHATTN_TPU_TUNE_WINDOW": 2048,
                                      "FLASHATTN_TPU_MACRO_BWD_COLS": 4096},
         32768, 128),
        ("w32k-cols8192", "fwd_bwd", {"FLASHATTN_TPU_TUNE_WINDOW": 2048,
                                      "FLASHATTN_TPU_MACRO_BWD_COLS": 8192},
         32768, 128),
        ("w32k-cols4096-sub1024", "fwd_bwd", {
            "FLASHATTN_TPU_TUNE_WINDOW": 2048,
            "FLASHATTN_TPU_MACRO_BWD_COLS": 4096,
            "FLASHATTN_TPU_MACRO_BWD_SUB": 1024}, 32768, 128),
        ("w16k-cols4096", "fwd_bwd", {"FLASHATTN_TPU_TUNE_WINDOW": 2048,
                                      "FLASHATTN_TPU_MACRO_BWD_COLS": 4096},
         16384, 128),
    ],
    # r5 (VERDICT r4 #3): causal fwd D=160 outlier — 79.5 TF vs 95
    # noncausal. Resident chain geometry × the flat-grid alternative.
    "d160c": [
        ("d160c-default", "fwd", {}, 4096, 160),
        ("d160c-subq256", "fwd", {"FLASHATTN_TPU_RC_SUBQ": 256}, 4096, 160),
        ("d160c-subq512", "fwd", {"FLASHATTN_TPU_RC_SUBQ": 512}, 4096, 160),
        ("d160c-subk1024", "fwd", {"FLASHATTN_TPU_RC_SUBK": 1024},
         4096, 160),
        ("d160c-subq256-subk1024", "fwd", {"FLASHATTN_TPU_RC_SUBQ": 256,
                                           "FLASHATTN_TPU_RC_SUBK": 1024},
         4096, 160),
        ("d160c-flat", "fwd", {"FLASHATTN_TPU_RC_MAXN": 0,
                               "FLASHATTN_TPU_MACRO": 0}, 4096, 160),
        ("d160c-fwdbwd-default", "fwd_bwd", {}, 4096, 160),
    ],
}


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        mode, B, H, N, D = (sys.argv[2], int(sys.argv[3]), int(sys.argv[4]),
                            int(sys.argv[5]), int(sys.argv[6]))
        child(mode, B, H, N, D)
        return
    names = sys.argv[1:] or ["bwd4k", "big"]
    for name in names:
        for row in MATRICES[name]:
            tag, mode, env = row[0], row[1], row[2]
            N = row[3] if len(row) > 3 else 4096
            D = row[4] if len(row) > 4 else 128
            run(tag, mode, env, N=N, D=D)


if __name__ == "__main__":
    main()
