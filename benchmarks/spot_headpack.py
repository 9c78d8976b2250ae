"""Head-packing experiment for thin head dims (VERDICT r4 item: D=64's
92.8 TF sits at 85% of a ~109 modeled thin-matmul ceiling; the one untried
structural lever is packing two D=64 heads per grid step).

MXU-cost probes, timed as chained XLA dots on-chip (the MXU behavior is
identical inside Pallas — this isolates the matmul economics from kernel
plumbing):

  a) baseline      two dots  (bq,64)·(bk,64)^T per head — the thin
                   contraction the D=64 kernel runs today;
  b) packed-qk     ONE dot (bq,128)·(2bk,128)^T against a block-diagonal
                   K' = [[K1|0],[0|K2]] — full 128-deep contraction, both
                   heads' score tiles side-by-side in the output lanes;
  c) build-cost    (b) plus constructing K' from K1/K2 in the step (the
                   concat/pad the kernel would pay per KV tile);
  d) pv-baseline   two dots (bq,bk)·(bk,64) — PV as the kernel runs it
                   WITHOUT the ones-augmentation (for reference);
  e) pv-aug        two dots (bq,bk)·(bk,128) — PV with the free-lane
                   augmentation (what the kernel actually does).

If (b) < (a) by more than the softmax restructuring would cost, the packing
is worth building into the kernel; if not, the D=64 ceiling story is closed
with every structural lever measured. FLOPs are counted as USEFUL work
(2·bq·bk·64 per head per dot) so arms are comparable.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import jax
import jax.numpy as jnp

from flashattn_tpu.utils.platform import enable_compilation_cache
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock

acquire_tpu_lock(timeout=3600, on_timeout="abort")
enable_compilation_cache()

from flashattn_tpu.utils.timing import time_chained_stats

BQ, BK, D = 2048, 2048, 64


def dotT(a, b):
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def run(label, step, carry, consts, useful_flops):
    st = time_chained_stats(step, carry, consts=consts, iters=64,
                            warmup_iters=16, repeats=5)
    print(json.dumps({
        "arm": label, "us": round(st["per_iter"] * 1e6, 2),
        "useful_tflops": round(useful_flops / st["per_iter"] / 1e12, 1),
        "spread_pct": round(st["spread"] * 100, 1),
    }), flush=True)


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    q1 = jax.random.normal(ks[0], (BQ, D), jnp.bfloat16)
    q2 = jax.random.normal(ks[1], (BQ, D), jnp.bfloat16)
    k1 = jax.random.normal(ks[2], (BK, D), jnp.bfloat16)
    k2 = jax.random.normal(ks[3], (BK, D), jnp.bfloat16)
    p1 = jax.random.normal(ks[4], (BQ, BK), jnp.bfloat16)
    p2 = jax.random.normal(ks[5], (BQ, BK), jnp.bfloat16)
    v1 = jax.random.normal(ks[6], (BK, D), jnp.bfloat16)
    v128 = jax.random.normal(ks[7], (BK, 128), jnp.bfloat16)

    qk_flops = 2 * 2 * BQ * BK * D  # two heads of useful score work

    # (a) two thin dots, carry feeds q so the chain serializes
    def a(q1c, q2c, k1c, k2c):
        s1 = dotT(q1c, k1c)
        s2 = dotT(q2c, k2c)
        d = (jnp.sum(s1, axis=1, keepdims=True)
             + jnp.sum(s2, axis=1, keepdims=True))
        return q1c + 1e-30 * d.astype(q1c.dtype), q2c

    run("a_two_thin_qk", lambda c, k1c, k2c: a(c[0], c[1], k1c, k2c),
        (q1, q2), (k1, k2), qk_flops)

    # (b) one packed dot against prebuilt block-diagonal K'
    qp = jnp.concatenate([q1, q2], axis=1)                    # (BQ, 128)
    z = jnp.zeros((BK, D), jnp.bfloat16)
    kp = jnp.concatenate([jnp.concatenate([k1, z], axis=1),
                          jnp.concatenate([z, k2], axis=1)], axis=0)

    def b(qc, kpc):
        s = dotT(qc, kpc)                                     # (BQ, 2BK)
        return qc + 1e-30 * jnp.sum(s, axis=1, keepdims=True).astype(qc.dtype)

    run("b_packed_qk_prebuilt", b, qp, (kp,), qk_flops)

    # (c) packed dot + in-step K' construction
    def c(qc, k1c, k2c):
        kpc = jnp.concatenate([jnp.concatenate([k1c, z], axis=1),
                               jnp.concatenate([z, k2c], axis=1)], axis=0)
        s = dotT(qc, kpc)
        return qc + 1e-30 * jnp.sum(s, axis=1, keepdims=True).astype(qc.dtype)

    run("c_packed_qk_built", c, qp, (k1, k2), qk_flops)

    pv_flops = 2 * 2 * BQ * BK * D

    # (d) PV without augmentation: two (bq,bk)@(bk,64)
    def dstep(p1c, p2c, v1c):
        o1 = jax.lax.dot(p1c, v1c, preferred_element_type=jnp.float32)
        o2 = jax.lax.dot(p2c, v1c, preferred_element_type=jnp.float32)
        return p1c + 1e-30 * (o1[:, :1] + o2[:, :1]).astype(p1c.dtype), p2c

    run("d_pv_thin", lambda cr, v1c: dstep(cr[0], cr[1], v1c),
        (p1, p2), (v1,), pv_flops)

    # (e) PV with free-lane augmentation: two (bq,bk)@(bk,128)
    def estep(p1c, p2c, v128c):
        o1 = jax.lax.dot(p1c, v128c, preferred_element_type=jnp.float32)
        o2 = jax.lax.dot(p2c, v128c, preferred_element_type=jnp.float32)
        return p1c + 1e-30 * (o1[:, :1] + o2[:, :1]).astype(p1c.dtype), p2c

    run("e_pv_aug128", lambda cr, vc: estep(cr[0], cr[1], vc),
        (p1, p2), (v128,), pv_flops)
    print("HEADPACK DONE", flush=True)


if __name__ == "__main__":
    main()
