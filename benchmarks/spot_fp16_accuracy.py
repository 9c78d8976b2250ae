"""fp16 accuracy contract (VERDICT r4 weak #7): measured forward/grad error
of each (input dtype, compute dtype) pair vs the f32 oracle, plus the
relative speed of the f32-compute opt-in. Writes
results/fp16_accuracy.jsonl; quoted in README's dtype-policy note.

The reference's primary dtype is fp16 with a native kernel
(kernel_fp16.cu); TPU has no fp16 MXU, so fp16 defaults to bf16 compute
(3 fewer mantissa bits than the fp16 payload). compute_dtype=float32 is
the accuracy escape hatch — this script records exactly what each choice
costs."""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flashattn_tpu.utils.platform import (enable_compilation_cache,
                                          join_transfer_warmup,
                                          start_transfer_warmup)
from flashattn_tpu.utils.tpu_lock import acquire_tpu_lock

acquire_tpu_lock(on_timeout="abort")
enable_compilation_cache()
start_transfer_warmup()

import jax
import jax.numpy as jnp

from flashattn_tpu import flash_attention
from flashattn_tpu.ops.oracle import attention_reference
from flashattn_tpu.utils.testing import make_qkv
from flashattn_tpu.utils.timing import attention_flops, time_chained_stats

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results",
                   "fp16_accuracy.jsonl")
B, H, N, D = 1, 8, 1024, 64


def run():
    rows = []
    qf, kf, vf = make_qkv(jax.random.PRNGKey(0), B, H, N, D,
                          dtype=jnp.float32)
    w = attention_reference(qf, kf, vf, causal=True)
    gw = jax.grad(lambda q, k, v: (attention_reference(q, k, v, causal=True)
                                   ** 2).sum(), argnums=(0, 1, 2))(qf, kf, vf)
    join_transfer_warmup()
    for in_dt in ("float16", "bfloat16", "float32"):
        for comp in (None, "float32"):
            if in_dt == "float32" and comp is not None:
                continue
            dt = jnp.dtype(in_dt)
            q, k, v = (x.astype(dt) for x in (qf, kf, vf))
            cd = jnp.float32 if comp else None
            o = flash_attention(q, k, v, causal=True, compute_dtype=cd)
            g = jax.grad(lambda q, k, v: (flash_attention(
                q, k, v, causal=True, compute_dtype=cd).astype(jnp.float32)
                ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
            fmax = float(jnp.max(jnp.abs(o.astype(jnp.float32) - w)))
            gmax = max(float(jnp.max(jnp.abs(a.astype(jnp.float32) - b)))
                       for a, b in zip(g, gw))
            t = time_chained_stats(
                lambda qq, kk, vv: flash_attention(
                    qq, kk, vv, causal=True, compute_dtype=cd),
                q, consts=(k, v), iters=32, warmup_iters=8,
                repeats=3)["per_iter"]
            fl = attention_flops(B, H, N, N, D, causal=True, mode="fwd")
            rows.append({
                "input_dtype": in_dt,
                "compute_dtype": comp or ("bfloat16" if in_dt != "float32"
                                          else "float32"),
                "fwd_maxdiff": fmax, "grad_maxdiff": gmax,
                "ms": round(t * 1e3, 4),
                "tflops": round(fl / t / 1e12, 2),
            })
            print(json.dumps(rows[-1]), flush=True)
    with open(OUT, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    run()
