"""Low-D ceiling probe (VERDICT r4 missing #3): below D=64 the D-scan rows
measure almost exactly 1 TF per unit of D (16.3/32.4/48.8 at D=16/32/48) —
wall-time constant in D, i.e. the online-softmax VPU chain over the N²
score tiles is the binding resource, not the MXU. This probe measures the
standalone VPU softmax-update rate (elements/s) on score-tile-shaped
arrays; equal-work ceiling at head dim D is then TF(D) = 4·D·R_vpu.

Also re-runs the head-packing MXU arms at D=16/32 (the D=64-negative
result does not transfer a priori: at D=16 the PV matmul wastes 7/8 of the
MXU output lanes) — if the VPU floor binds, even a winning packing cannot
move the end-to-end number, which closes the lever measurably.
"""
import os, sys, json
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from flashattn_tpu.utils.platform import enable_compilation_cache, start_transfer_warmup, join_transfer_warmup
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock
acquire_tpu_lock(timeout=3600, on_timeout="abort")
enable_compilation_cache(); start_transfer_warmup()
import jax, jax.numpy as jnp
from flashattn_tpu.utils.timing import time_chained_stats
join_transfer_warmup()

R, C = 2048, 2048
ELEMS = R * C

def run(label, step, carry, consts=()):
    st = time_chained_stats(step, carry, consts=consts, iters=64,
                            warmup_iters=16, repeats=5)
    rate = ELEMS / st["per_iter"]
    print(json.dumps({
        "arm": label, "us": round(st["per_iter"] * 1e6, 2),
        "gelems_per_s": round(rate / 1e9, 1),
        "ceiling_tf_at_D16": round(4 * 16 * rate / 1e12, 1),
        "ceiling_tf_at_D64": round(4 * 64 * rate / 1e12, 1),
        "spread_pct": round(st["spread"] * 100, 1),
    }), flush=True)

key = jax.random.PRNGKey(0)
s32 = jax.random.normal(key, (R, C), jnp.float32)
s16 = s32.astype(jnp.bfloat16)

# (a) the kernel's aug-path per-tile softmax update: rowmax (f32), exp2 in
# bf16 (the ones-augmented-V path skips the VPU l update entirely)
def aug_update(c):
    m = jnp.max(c, axis=1, keepdims=True)
    p = jnp.exp2((c - m).astype(jnp.bfloat16))
    return c + 1e-30 * p.astype(jnp.float32)

run("a_softmax_update_aug_bf16exp", aug_update, s32)

# (b) full f32 chain incl. the l rowsum (the non-aug path)
def full_update(c):
    m = jnp.max(c, axis=1, keepdims=True)
    p = jnp.exp2(c - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    return c + 1e-30 * (p + l)

run("b_softmax_update_f32", full_update, s32)

# (c) exp2 alone, bf16 — the irreducible transcendental
run("c_exp2_bf16",
    lambda c: c * 0.999 + 1e-30 * jnp.exp2(
        c.astype(jnp.bfloat16)).astype(jnp.float32), s32)

# (d) packed-QK MXU arms at D=16: does block-diagonal 8-head packing win
# at the MXU level (PV wastes 7/8 lanes unpacked)?
D = 16
q8 = [jax.random.normal(jax.random.PRNGKey(i), (R, D), jnp.bfloat16) for i in range(8)]
k8 = [jax.random.normal(jax.random.PRNGKey(8+i), (C, D), jnp.bfloat16) for i in range(8)]
qk_flops = 8 * 2 * R * C * D

def thin8(c, *ks):
    acc = None
    for i in range(8):
        s = jax.lax.dot_general(c[i], ks[i], (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        acc = s[:, :1] if acc is None else acc + s[:, :1]
    return tuple(c[i] + 1e-30 * acc.astype(c[i].dtype) for i in range(8))

st = time_chained_stats(lambda c, *ks: thin8(c, *ks), tuple(q8), consts=tuple(k8),
                        iters=64, warmup_iters=16, repeats=5)
print(json.dumps({"arm": "d_8_thin_qk_D16",
                  "us": round(st["per_iter"]*1e6, 2),
                  "useful_tflops": round(qk_flops/st["per_iter"]/1e12, 1),
                  "spread_pct": round(st["spread"]*100, 1)}), flush=True)

# (e) one packed 128-deep dot: q8 side-by-side (R,128), K' block-diag (8C,128)
qp = jnp.concatenate(q8, axis=1)
blocks = []
for i in range(8):
    row = [jnp.zeros((C, D), jnp.bfloat16)] * 8
    row[i] = k8[i]
    blocks.append(jnp.concatenate(row, axis=1))
kp = jnp.concatenate(blocks, axis=0)  # (8C, 128)

def packed(c, kpc):
    s = jax.lax.dot_general(c, kpc, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return c + 1e-30 * jnp.sum(s[:, :1], axis=1, keepdims=True).astype(c.dtype)

st = time_chained_stats(packed, qp, consts=(kp,), iters=64,
                        warmup_iters=16, repeats=5)
print(json.dumps({"arm": "e_packed8_qk_D16",
                  "us": round(st["per_iter"]*1e6, 2),
                  "useful_tflops": round(qk_flops/st["per_iter"]/1e12, 1),
                  "spread_pct": round(st["spread"]*100, 1)}), flush=True)
print("LOWD DONE", flush=True)
